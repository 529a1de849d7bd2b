import numpy as np
import pyarrow as pa


def _corpus(n):
    import ray.data as rd

    from osm_cut_ray.sources.images import images_batch_from_keys

    def synth(t):
        return images_batch_from_keys(
            t["id"].to_numpy(zero_copy_only=False), with_bytes=True)

    return rd.range(n).map_batches(synth, batch_format="pyarrow") \
        .repartition(4)


def test_pack_atlases(ray_session):
    from osm_cut_ray.sources.images import decode_image, resize_stack
    from osm_cut_ray.stages.image_atlas import pack_atlases

    ds = _corpus(300).materialize()
    grid, thumb = 4, 8
    out = pack_atlases(ds, grid=grid, thumb=thumb, n_groups=10) \
        .to_pandas().sort_values(["atlas_id", "page"]) \
        .reset_index(drop=True)

    # every image appears exactly once across all sheets
    all_ids = [i for ids in out["ids"] for i in ids]
    assert sorted(all_ids) == sorted(
        r["image_id"] for r in ds.take_all())
    # overflow pages exist (300 images / 10 groups = 30 > 16 slots)
    assert (out.groupby("atlas_id")["page"].max() >= 1).all()

    # each slot decodes to the NN-resized thumbnail of its source
    src = {r["image_id"]: r["bytes"] for r in ds.take_all()}
    checked = 0
    for r in out.itertuples():
        sheet = decode_image(r.bytes)[0]
        assert sheet.shape == (grid * thumb, grid * thumb)
        for s, iid in enumerate(r.ids):
            rr, cc = divmod(s, grid)
            got = sheet[rr * thumb:(rr + 1) * thumb,
                        cc * thumb:(cc + 1) * thumb]
            exp = resize_stack(decode_image(src[iid])[0][None],
                               thumb, thumb)[0]
            assert (got == exp).all()
            checked += 1
        # trailing slots of a short page are black
        for s in range(len(r.ids), grid * grid):
            rr, cc = divmod(s, grid)
            assert (sheet[rr * thumb:(rr + 1) * thumb,
                          cc * thumb:(cc + 1) * thumb] == 0).all()
    assert checked == 300

    # ids are sorted within a group across its pages (determinism)
    for aid, sub in out.groupby("atlas_id"):
        flat = [i for ids in sub.sort_values("page")["ids"]
                for i in ids]
        assert flat == sorted(flat)

    # partitioning invariance: same sheets from a different layout
    out2 = pack_atlases(ds.repartition(9), grid=grid, thumb=thumb,
                        n_groups=10).to_pandas() \
        .sort_values(["atlas_id", "page"]).reset_index(drop=True)
    assert out2["atlas_id"].tolist() == out["atlas_id"].tolist()
    assert all(a == b for a, b in zip(out2["bytes"], out["bytes"]))


def test_pack_atlases_empty(ray_session):
    from osm_cut_ray.stages.image_atlas import pack_atlases

    assert pack_atlases(_corpus(0), n_groups=4).count() == 0

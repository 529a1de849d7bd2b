"""Image-axis pipeline tests: quality scoring, patch extraction, and
the composed resumable image-curation pipeline (spatial gate + dedup +
quality + caption gates + resize)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from osm_cut_ray.geometry.geotag import encode_geotag
from osm_cut_ray.geometry.polygon import PolygonIndex
from osm_cut_ray.sources.images import decode_image, encode_image, \
    pixels_for_key

EN_CAP = "a photo of the tree and the garden in spring"
DE_CAP = "der die und das ist nicht gut hier"


def _hint(entries):
    """entries: [(key:int, pixels, fmt, caption, lon, lat)] ->
    input_hint-shaped pa.Table."""
    ids, blobs, ws, hs, fmts, caps, phs = [], [], [], [], [], [], []
    for k, px, fmt, cap, lon, lat in entries:
        ids.append(f"img{k:08d}")
        blobs.append(encode_image(px, fmt))
        h, w = px.shape
        ws.append(w)
        hs.append(h)
        fmts.append(fmt)
        caps.append(cap)
        phs.append(int(encode_geotag(np.array([lon]),
                                     np.array([lat]))[0]))
    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "w": pa.array(ws, pa.int32()), "h": pa.array(hs, pa.int32()),
        "fmt": pa.array(fmts, pa.string()),
        "caption": pa.array(caps, pa.string()),
        "phash": pa.array(phs, pa.int64()),
    })


def _collect(ds) -> pa.Table:
    bs = [b for b in ds.iter_batches(batch_size=None,
                                     batch_format="pyarrow") if b.num_rows]
    return pa.concat_tables(bs) if bs \
        else ds.schema().base_schema.empty_table()


# ------------------------------------------------------ quality scores

def _brute_quality(px: np.ndarray) -> dict:
    f = px.astype(np.float64)
    _, counts = np.unique(px, return_counts=True)
    p = counts / px.size
    return {
        "brightness": f.mean() / 255.0,
        "contrast": f.std() / 255.0,
        "entropy": float(-(p * np.log2(p)).sum()),
        "sharpness": (np.abs(np.diff(f, axis=1)).mean()
                      + np.abs(np.diff(f, axis=0)).mean()) / 2 / 255.0,
        "extreme_frac": float(((px <= 1) | (px >= 254)).mean()),
    }


def test_quality_stack_matches_brute_force():
    from osm_cut_ray.stages.image_quality import quality_stack
    rng = np.random.default_rng(11)
    imgs = [rng.integers(0, 256, (32, 32)).astype(np.uint8),
            np.full((32, 32), 128, np.uint8),          # constant
            np.clip(rng.integers(-200, 456, (32, 32)),  # heavy clipping
                    0, 255).astype(np.uint8)]
    got = quality_stack(np.stack(imgs))
    for i, px in enumerate(imgs):
        exp = _brute_quality(px)
        for k, v in exp.items():
            assert abs(got[k][i] - v) < 1e-9, (i, k)
    # constant image: zero entropy/contrast/sharpness
    assert got["entropy"][1] == 0.0
    assert got["contrast"][1] == 0.0
    # non-square shape doesn't mix h/w
    ns = rng.integers(0, 256, (21, 13)).astype(np.uint8)
    g2 = quality_stack(ns[None])
    e2 = _brute_quality(ns)
    for k, v in e2.items():
        assert abs(g2[k][0] - v) < 1e-9, k


def test_quality_keep_mask_gates():
    from osm_cut_ray.stages.image_quality import quality_keep_mask, \
        quality_stack
    rng = np.random.default_rng(12)
    good = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    flat = np.full((32, 32), 77, np.uint8)
    black = np.zeros((32, 32), np.uint8)
    scores = quality_stack(np.stack([good, flat, black]))
    keep = quality_keep_mask(scores)
    assert keep.tolist() == [True, False, False]


def test_image_quality_dataset(ray_session):
    from osm_cut_ray.stages.image_quality import image_quality, \
        image_quality_batch
    rng = np.random.default_rng(13)
    entries = [(i, rng.integers(0, 256, (s, s)).astype(np.uint8),
                "fpng", EN_CAP, 1.0, 1.0)
               for i, s in enumerate([16, 32, 64, 32])]
    tbl = _hint(entries)
    got = _collect(image_quality(rd.from_arrow(tbl))) \
        .sort_by("image_id")
    exp = image_quality_batch(tbl).sort_by("image_id")
    assert got.equals(exp)
    assert got.column_names == ["image_id", "w", "h", "fmt",
                                "brightness", "contrast", "entropy",
                                "sharpness", "extreme_frac"]
    assert len(got) == 4


# ------------------------------------------------------ patch extraction

def test_patch_stack_reassembles():
    from osm_cut_ray.stages.image_patch import patch_stack
    rng = np.random.default_rng(21)
    stack = rng.integers(0, 256, (3, 40, 24)).astype(np.uint8)
    tiles, ny, nx = patch_stack(stack, 16)
    assert (ny, nx) == (2, 1)          # 40//16, 24//16
    assert tiles.shape == (6, 16, 16)
    for m in range(3):
        for r in range(ny):
            for c in range(nx):
                np.testing.assert_array_equal(
                    tiles[m * ny * nx + r * nx + c],
                    stack[m, r * 16:(r + 1) * 16, c * 16:(c + 1) * 16])
    # too-small image -> zero patches
    t2, ny2, nx2 = patch_stack(stack[:, :8, :8], 16)
    assert len(t2) == 0 and ny2 == 0 and nx2 == 0


def test_image_patches_dataset(ray_session):
    from osm_cut_ray.stages.image_patch import image_patches
    entries = [(k, pixels_for_key(k, s, s), "fpng", EN_CAP,
                float(k), float(k))
               for k, s in [(0, 16), (1, 32), (2, 64)]]
    tbl = _hint(entries)
    got = _collect(image_patches(rd.from_arrow(tbl), patch=16))
    per = {iid: n for iid, n in
           zip(*np.unique(got["image_id"].to_numpy(zero_copy_only=False),
                          return_counts=True))}
    assert per == {"img00000000": 1, "img00000001": 4, "img00000002": 16}
    assert set(got["w"].to_pylist()) == {16}
    # every patch decodes to the parent's crop; caption/phash inherited
    parent = {f"img{k:08d}": (pixels_for_key(k, s, s),
                              int(tbl["phash"][i].as_py()))
              for i, (k, s) in enumerate([(0, 16), (1, 32), (2, 64)])}
    for i in range(len(got)):
        iid = got["image_id"][i].as_py()
        r = got["patch_row"][i].as_py()
        c = got["patch_col"][i].as_py()
        px, _ = decode_image(got["bytes"][i].as_py())
        src, ph = parent[iid]
        np.testing.assert_array_equal(
            px, src[r * 16:(r + 1) * 16, c * 16:(c + 1) * 16])
        assert got["phash"][i].as_py() == ph
        assert got["caption"][i].as_py() == EN_CAP


# -------------------------------------------------- composed curation

def _curate_corpus(rng):
    """shard_a: 12 clean random images inside the polygon; shard_b: one
    planted problem per drop cause + one clean keeper."""
    base = [rng.integers(0, 256, (32, 32)).astype(np.uint8)
            for _ in range(12)]
    a = [(i, base[i], "fpng", EN_CAP, 4.0 + 0.1 * i, 5.0)
         for i in range(12)]
    near = np.clip(base[1].astype(np.int16)
                   + rng.integers(-1, 2, base[1].shape),
                   0, 255).astype(np.uint8)
    b = [
        (100, base[0], "fpng", EN_CAP, 5.0, 4.0),      # exact dup of 0
        (101, near, "fpng", EN_CAP, 5.0, 4.1),         # near dup of 1
        (102, rng.integers(0, 256, (32, 32)).astype(np.uint8),
         "fpng", EN_CAP, 50.0, 5.0),                   # outside polygon
        (103, np.full((32, 32), 99, np.uint8),
         "fpng", EN_CAP, 5.0, 4.2),                    # flat -> quality
        (104, rng.integers(0, 256, (32, 32)).astype(np.uint8),
         "fpng", DE_CAP, 5.0, 4.3),                    # German caption
        (105, rng.integers(0, 256, (32, 32)).astype(np.uint8),
         "fpng", "x", 5.0, 4.4),                       # 1-token caption
        (106, rng.integers(0, 256, (32, 32)).astype(np.uint8),
         "fpng", EN_CAP, 5.0, 4.5),                    # clean -> keep
    ]
    return a, b


def _kept_ids(out, shards):
    kept = pa.concat_tables([
        pq.read_table(os.path.join(out, s, f))
        for s in shards
        for f in os.listdir(os.path.join(out, s))
        if f.endswith(".parquet")])
    return kept, {int(i[3:]) for i in kept["image_id"].to_pylist()}


def test_curate_images_end_to_end(ray_session, tmp_path):
    from osm_cut_ray.pipelines.curate_images import curate_images
    rng = np.random.default_rng(31)
    a, b = _curate_corpus(rng)
    p1 = str(tmp_path / "shard_a.parquet")
    p2 = str(tmp_path / "shard_b.parquet")
    pq.write_table(_hint(a), p1)
    pq.write_table(_hint(b), p2)
    poly = PolygonIndex.compile(
        [("include", [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0),
                      (0.0, 10.0)])])
    out = str(tmp_path / "curated")
    kw = dict(polygon=poly, langs=("en",), min_caption_tokens=2)

    report = curate_images([p1, p2], out, **kw)
    assert sorted(report["completed"]) == ["shard_a", "shard_b"]
    assert report["n_drop_exact_dup"] == 1          # 100
    assert report["n_drop_near_dup"] >= 1           # 101 (and maybe 100)

    kept, kept_ids = _kept_ids(out, ("shard_a", "shard_b"))
    for bad in (100, 101, 102, 103, 104, 105):
        assert bad not in kept_ids, bad
    assert 106 in kept_ids
    assert set(range(12)) <= kept_ids               # clean base all kept
    # output keeps the exact input_hint schema
    assert kept.column_names == ["image_id", "bytes", "w", "h", "fmt",
                                 "caption", "phash"]
    assert kept.schema.field("w").type == pa.int32()

    # resume: second run skips both shards
    report2 = curate_images([p1, p2], out, **kw)
    assert sorted(report2["skipped"]) == ["shard_a", "shard_b"]
    assert report2["rows_out"] == report["rows_out"]

    # changed params -> recompute
    report3 = curate_images([p1, p2], out, **kw, min_entropy=0.6)
    assert sorted(report3["completed"]) == ["shard_a", "shard_b"]


def test_curate_images_resize(ray_session, tmp_path):
    from osm_cut_ray.pipelines.curate_images import curate_images
    rng = np.random.default_rng(33)
    a, b = _curate_corpus(rng)
    # one already-small image: must pass through byte-identical
    small = rng.integers(0, 256, (12, 12)).astype(np.uint8)
    a.append((50, small, "fpng", EN_CAP, 6.0, 6.0))
    p1 = str(tmp_path / "shard_a.parquet")
    p2 = str(tmp_path / "shard_b.parquet")
    pq.write_table(_hint(a), p1)
    pq.write_table(_hint(b), p2)
    poly = PolygonIndex.compile(
        [("include", [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0),
                      (0.0, 10.0)])])
    out = str(tmp_path / "curated16")
    report = curate_images([p1, p2], out, polygon=poly,
                           resize_target=16)
    assert report["rows_out"] > 0
    kept, kept_ids = _kept_ids(out, ("shard_a", "shard_b"))
    assert 106 in kept_ids and 50 in kept_ids
    for i in range(len(kept)):
        w = kept["w"][i].as_py()
        h = kept["h"][i].as_py()
        assert max(w, h) <= 16
        px, _ = decode_image(kept["bytes"][i].as_py())
        assert px.shape == (h, w)
        if kept["image_id"][i].as_py() == "img00000050":
            np.testing.assert_array_equal(px, small)  # passthrough


# ------------------------------------------------ stub embeddings / CLIP

def test_embed_stack_and_captions_contracts():
    from osm_cut_ray.stages.image_embed import EMBED_DIM, embed_captions, \
        embed_stack
    from osm_cut_ray.sources.images import resize_stack
    rng = np.random.default_rng(41)
    stack = rng.integers(0, 256, (5, 32, 32)).astype(np.uint8)
    e = embed_stack(stack)
    assert e.shape == (5, EMBED_DIM)
    np.testing.assert_allclose(np.linalg.norm(e, axis=1), 1.0, atol=1e-12)
    # brute: 8x8 block-mean -> center -> normalize
    small = resize_stack(stack, 8, 8).reshape(5, 64).astype(np.float64)
    small -= small.mean(axis=1, keepdims=True)
    exp = small / np.linalg.norm(small, axis=1, keepdims=True)
    np.testing.assert_allclose(e, exp, atol=1e-12)
    # deterministic + near-dup locality: tiny noise keeps cosine high
    noisy = np.clip(stack[0].astype(np.int16)
                    + rng.integers(-1, 2, (32, 32)), 0, 255) \
        .astype(np.uint8)
    e2 = embed_stack(noisy[None])[0]
    assert float(e[0] @ e2) > 0.99

    ce = embed_captions(["a photo of a cat", "a photo of a cat",
                         "stock chart of prices", ""])
    np.testing.assert_allclose(np.linalg.norm(ce[:3], axis=1), 1.0,
                               atol=1e-12)
    np.testing.assert_array_equal(ce[0], ce[1])       # deterministic
    assert float(ce[0] @ ce[2]) < 0.9                 # different text
    np.testing.assert_array_equal(ce[3], 0.0)         # empty -> zeros


def test_image_knn_retrieves_near_dup(ray_session):
    from osm_cut_ray.stages.image_embed import image_knn_brute
    rng = np.random.default_rng(43)
    base = [rng.integers(0, 256, (32, 32)).astype(np.uint8)
            for _ in range(20)]
    twin = np.clip(base[0].astype(np.int16)
                   + rng.integers(-1, 2, (32, 32)), 0, 255) \
        .astype(np.uint8)
    entries = [(i, px, "fpng", EN_CAP, 1.0, 1.0)
               for i, px in enumerate(base)]
    entries.append((100, twin, "fpng", EN_CAP, 1.0, 1.0))
    tbl = _hint(entries)
    res = image_knn_brute(rd.from_arrow(tbl), [0], k=3)
    assert res["probe_id"].to_pylist()[0] == 0
    assert res["neighbor_id"].to_pylist()[0] == 100   # the twin wins
    assert res["sim"].to_pylist()[0] > 0.99


def test_clip_scores_and_filter(ray_session):
    from osm_cut_ray.stages.image_embed import clip_filter, clip_scores, \
        embed_captions, embed_stack
    rng = np.random.default_rng(45)
    caps = [f"a photo of the {w} in the field number {i}"
            for i, w in enumerate(["cat", "dog", "tree", "car", "boat",
                                   "lake", "bird", "rock"])]
    entries = [(i, rng.integers(0, 256, (32, 32)).astype(np.uint8),
                "fpng", caps[i], 1.0, 1.0) for i in range(8)]
    tbl = _hint(entries)
    got = _collect(clip_scores(rd.from_arrow(tbl))).sort_by("image_id")
    # brute: decode-free (we still hold the patterns)
    ie = embed_stack(np.stack([e[1] for e in entries]))
    ce = embed_captions(caps)
    exp = (ie * ce).sum(axis=1)
    np.testing.assert_allclose(
        np.array(got["clip_score"].to_pylist()), exp, atol=1e-12)
    thr = float(np.median(exp))
    kept = _collect(clip_filter(rd.from_arrow(tbl), min_score=thr))
    exp_ids = {f"img{i:08d}" for i in range(8) if exp[i] >= thr}
    assert set(kept["image_id"].to_pylist()) == exp_ids
    assert kept.column_names == ["image_id", "bytes", "w", "h", "fmt",
                                 "caption", "phash"]


def test_curate_images_clip_gate(ray_session, tmp_path):
    from osm_cut_ray.pipelines.curate_images import curate_images
    from osm_cut_ray.stages.image_embed import embed_captions, embed_stack
    rng = np.random.default_rng(47)
    pxs = [rng.integers(0, 256, (32, 32)).astype(np.uint8)
           for _ in range(4)]
    caps = [f"a photo of the {w} in the field"
            for w in ("cat", "dog", "tree", "car")]
    scores = (embed_stack(np.stack(pxs))
              * embed_captions(caps)).sum(axis=1)
    order = np.argsort(scores)
    thr = float((scores[order[0]] + scores[order[1]]) / 2)
    entries = [(i, pxs[i], "fpng", caps[i], 1.0, 1.0) for i in range(4)]
    p = str(tmp_path / "shard.parquet")
    pq.write_table(_hint(entries), p)
    out = str(tmp_path / "clipcur")
    curate_images([p], out, min_clip_score=thr)
    _, kept_ids = _kept_ids(out, ("shard",))
    assert kept_ids == set(range(4)) - {int(order[0])}


def test_image_embedding_dup_pairs(ray_session):
    from osm_cut_ray.stages.image_embed import image_embedding_dup_pairs
    rng = np.random.default_rng(49)
    base = [rng.integers(0, 256, (32, 32)).astype(np.uint8)
            for _ in range(15)]
    entries = [(i, px, "fpng", EN_CAP, 1.0, 1.0)
               for i, px in enumerate(base)]
    # exact pixel copies at new ids: embedding-identical -> same LSH
    # bucket by construction, cosine exactly 1
    entries += [(100 + i, base[i], "fpng", EN_CAP, 1.0, 1.0)
                for i in range(3)]
    tbl = _hint(entries)
    got = image_embedding_dup_pairs(rd.from_arrow(tbl),
                                    cosine_threshold=0.9999)
    pairs = set(zip(got["a_id"].to_pylist(), got["b_id"].to_pylist()))
    assert {(i, 100 + i) for i in range(3)} <= pairs
    # no random-pair false positives at this threshold
    assert all(b - a == 100 for a, b in pairs)


# ------------------------------------------- cross-corpus image dedup

def test_ref_fp_index_matches_brute(ray_session):
    from osm_cut_ray.stages.dedup import hamming64
    from osm_cut_ray.stages.image_dedup import RefFpIndex
    rng = np.random.default_rng(81)
    ref_fps = rng.integers(0, 2**63, 200, dtype=np.int64)
    ref_ids = np.arange(200, dtype=np.int64)
    # probes: 30 random + 10 refs with <=3 flipped bits
    probes = rng.integers(0, 2**63, 30, dtype=np.int64).tolist()
    for i in range(10):
        f = np.uint64(ref_fps[i])
        for b in rng.choice(64, int(rng.integers(0, 4)), replace=False):
            f ^= np.uint64(1) << np.uint64(b)
        probes.append(np.int64(f))
    probes = np.array(probes, np.int64)
    idx = RefFpIndex(ref_ids, ref_fps, n_bands=4)
    hit, refid, trunc = idx.query(probes, threshold=3)
    assert trunc == 0
    for j in range(len(probes)):
        d = hamming64(ref_fps, np.full(200, probes[j], np.int64))
        assert hit[j] == bool(d.min() <= 3), j
        if hit[j]:
            assert d[np.flatnonzero(ref_ids == refid[j])[0]] <= 3


def test_image_cross_dup_filter(ray_session):
    from osm_cut_ray.stages.image_dedup import build_ref_fp_index, \
        image_cross_dup_filter
    rng = np.random.default_rng(83)
    ref_px = [rng.integers(0, 256, (32, 32)).astype(np.uint8)
              for _ in range(10)]
    new_px = [rng.integers(0, 256, (32, 32)).astype(np.uint8)
              for _ in range(5)]
    copies = [np.clip(ref_px[i].astype(np.int16)
                      + rng.integers(-1, 2, (32, 32)), 0, 255)
              .astype(np.uint8) for i in range(3)]
    ref = _hint([(i, px, "fpng", EN_CAP, 1.0, 1.0)
                 for i, px in enumerate(ref_px)])
    new = _hint([(100 + i, px, "fpng", EN_CAP, 1.0, 1.0)
                 for i, px in enumerate(new_px + copies)])
    idx = build_ref_fp_index(rd.from_arrow(ref))
    kept = _collect(image_cross_dup_filter(rd.from_arrow(new), idx,
                                           mode="anti"))
    dups = _collect(image_cross_dup_filter(rd.from_arrow(new), idx,
                                           mode="semi"))
    kept_ids = {int(i[3:]) for i in kept["image_id"].to_pylist()}
    dup_ids = {int(i[3:]) for i in dups["image_id"].to_pylist()}
    assert {105, 106, 107} <= dup_ids          # the near-copies
    assert kept_ids | dup_ids == set(range(100, 108))
    assert kept_ids & dup_ids == set()
    assert kept.column_names == ["image_id", "bytes", "w", "h", "fmt",
                                 "caption", "phash"]


# ------------------------------------------------- geo-debias sampling

def test_geo_debias_sample(ray_session):
    from osm_cut_ray.geometry.cells import hex_cell
    from osm_cut_ray.stages.geo_sample import geo_debias_sample, \
        sample_hash
    rng = np.random.default_rng(91)
    # three far-apart clusters: 30 / 10 / 2 images
    spots = [(10.0, 10.0, 30), (60.0, -20.0, 10), (-120.0, 45.0, 2)]
    entries, k = [], 0
    for lon, lat, n in spots:
        for _ in range(n):
            entries.append((k, rng.integers(0, 256, (16, 16))
                            .astype(np.uint8), "fpng", EN_CAP,
                            lon + rng.uniform(-1e-4, 1e-4),
                            lat + rng.uniform(-1e-4, 1e-4)))
            k += 1
    tbl = _hint(entries)
    got = _collect(geo_debias_sample(rd.from_arrow(tbl), hex_res=7,
                                     per_cell_k=5))
    kept_ids = sorted(int(i[3:]) for i in got["image_id"].to_pylist())
    # expected: per true cell, hash-smallest 5 ids
    from osm_cut_ray.geometry.geotag import decode_geotag
    lon, lat = decode_geotag(tbl["phash"].to_numpy(zero_copy_only=False))
    cells = hex_cell(lon, lat, 7)
    ids = np.arange(len(entries), dtype=np.int64)
    exp = []
    for c in np.unique(cells):
        m = ids[cells == c]
        order = np.lexsort((m, sample_hash(m)))
        exp.extend(m[order][:5].tolist())
    assert kept_ids == sorted(exp)
    assert len(kept_ids) == 5 + 5 + 2
    assert got.column_names == ["image_id", "bytes", "w", "h", "fmt",
                                "caption", "phash"]


# --------------------------------------------------- corpus validation

def test_validate_images(ray_session):
    from osm_cut_ray.stages.image_quality import validate_images
    rng = np.random.default_rng(93)
    entries = [(i, rng.integers(0, 256, (16, 16)).astype(np.uint8),
                "fpng", EN_CAP, 1.0, 1.0) for i in range(5)]
    tbl = _hint(entries)
    # plant: corrupt blob (truncated), wrong metadata dims, empty blob
    bad = tbl.to_pydict()
    bad["image_id"] += ["img00000100", "img00000101", "img00000102"]
    bad["bytes"] += [bad["bytes"][0][:10], bad["bytes"][1], b""]
    bad["w"] += [16, 99, 16]
    bad["h"] += [16, 16, 16]
    bad["fmt"] += ["fpng"] * 3
    bad["caption"] += [EN_CAP] * 3
    bad["phash"] += [0, 0, 0]
    t2 = pa.table({
        "image_id": pa.array(bad["image_id"], pa.string()),
        "bytes": pa.array(bad["bytes"], pa.binary()),
        "w": pa.array(bad["w"], pa.int32()),
        "h": pa.array(bad["h"], pa.int32()),
        "fmt": pa.array(bad["fmt"], pa.string()),
        "caption": pa.array(bad["caption"], pa.string()),
        "phash": pa.array(bad["phash"], pa.int64())})
    got = _collect(validate_images(rd.from_arrow(t2))) \
        .sort_by("image_id")
    errs = dict(zip(got["image_id"].to_pylist(),
                    got["error"].to_pylist()))
    assert set(errs) == {"img00000100", "img00000101", "img00000102"}
    assert "decode failed" in errs["img00000100"]
    assert "99" in errs["img00000101"]
    assert errs["img00000102"] == "empty payload"


def test_caption_dup_pairs(ray_session):
    from osm_cut_ray.stages.image_embed import caption_dup_pairs
    rng = np.random.default_rng(95)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa"]
    caps = [" ".join(rng.choice(words, 25)) for _ in range(10)]
    entries = [(i, rng.integers(0, 256, (16, 16)).astype(np.uint8),
                "fpng", caps[i], 1.0, 1.0) for i in range(10)]
    # 100 repeats caption 0 verbatim; 101 near-repeats caption 1
    entries.append((100, rng.integers(0, 256, (16, 16))
                    .astype(np.uint8), "fpng", caps[0], 1.0, 1.0))
    entries.append((101, rng.integers(0, 256, (16, 16))
                    .astype(np.uint8), "fpng", caps[1] + " tail",
                    1.0, 1.0))
    got = caption_dup_pairs(rd.from_arrow(_hint(entries)),
                            jaccard_threshold=0.6)
    pairs = set(zip(got["a_id"].to_pylist(), got["b_id"].to_pylist()))
    assert (0, 100) in pairs and (1, 101) in pairs


def test_image_knn_ivf_recall(ray_session):
    from osm_cut_ray.stages.image_embed import image_knn_brute, \
        image_knn_ivf
    rng = np.random.default_rng(97)
    # clustered corpus: 4 pattern families so IVF cells are meaningful
    entries = []
    fams = [rng.integers(0, 256, (32, 32)).astype(np.uint8)
            for _ in range(4)]
    for i in range(80):
        fam = fams[i % 4].astype(np.int16)
        px = np.clip(fam + rng.integers(-6, 7, fam.shape), 0, 255) \
            .astype(np.uint8)
        entries.append((i, px, "fpng", EN_CAP, 1.0, 1.0))
    ds = rd.from_arrow(_hint(entries))
    probes = [0, 1, 2, 3]
    brute = image_knn_brute(ds, probes, k=5)
    ivf = image_knn_ivf(ds, probes, k=5, n_centroids=8, nprobe=4)
    hits = tot = 0
    for p in probes:
        bset = {n for pp, n in zip(brute["probe_id"].to_pylist(),
                                   brute["neighbor_id"].to_pylist())
                if pp == p}
        iset = {n for pp, n in zip(ivf["probe_id"].to_pylist(),
                                   ivf["neighbor_id"].to_pylist())
                if pp == p}
        hits += len(bset & iset)
        tot += len(bset)
    assert hits / tot >= 0.8, (hits, tot)


def test_split_by_hash(ray_session):
    from osm_cut_ray.stages.geo_sample import split_by_hash
    rng = np.random.default_rng(99)
    entries = [(i, rng.integers(0, 256, (16, 16)).astype(np.uint8),
                "fpng", EN_CAP, 1.0, 1.0) for i in range(200)]
    ds = rd.from_arrow(_hint(entries))
    splits = split_by_hash(ds, fractions={"train": 0.8, "val": 0.1,
                                          "test": 0.1})
    got = {n: set(_collect(s)["image_id"].to_pylist())
           for n, s in splits.items()}
    allids = got["train"] | got["val"] | got["test"]
    assert len(allids) == 200                       # disjoint cover
    assert not (got["train"] & got["val"])
    assert not (got["train"] & got["test"])
    assert not (got["val"] & got["test"])
    assert len(got["train"]) > len(got["val"])
    # deterministic: a second evaluation yields the same membership
    splits2 = split_by_hash(ds, fractions={"train": 0.8, "val": 0.1,
                                           "test": 0.1})
    assert set(_collect(splits2["val"])["image_id"].to_pylist()) \
        == got["val"]


def test_new_ops_handle_empty_corpus(ray_session, tmp_path):
    """Degenerate-input sweep: every new image op must survive an
    empty (0-row) corpus with a typed schema, not crash on Ray's
    schema-less empty blocks."""
    import pyarrow.parquet as pq

    from osm_cut_ray.pipelines.curate_images import EMPTY_HINT, \
        curate_images
    from osm_cut_ray.sources.webdataset import write_wds_shards
    from osm_cut_ray.stages.geo_sample import geo_debias_sample
    from osm_cut_ray.stages.image_dedup import RefFpIndex, \
        image_cross_dup_filter
    from osm_cut_ray.stages.image_patch import image_patches
    from osm_cut_ray.stages.image_quality import image_quality, \
        validate_images
    from osm_cut_ray.stages.simplify import simplify_ways

    empty = rd.from_arrow(EMPTY_HINT)
    assert image_quality(empty).count() == 0
    assert validate_images(empty).count() == 0
    assert image_patches(empty).count() == 0
    assert geo_debias_sample(empty).count() == 0
    idx = RefFpIndex(np.array([], np.int64), np.array([], np.int64))
    assert image_cross_dup_filter(empty, idx).count() == 0
    man = write_wds_shards(empty, str(tmp_path / "wds0"))
    assert len(man) == 0
    ways = rd.from_arrow(pa.table({
        "id": pa.array([], pa.int64()),
        "refs": pa.array([], pa.list_(pa.int64()))}))
    nodes = rd.from_arrow(pa.table({
        "id": pa.array([], pa.int64()),
        "lon": pa.array([], pa.float64()),
        "lat": pa.array([], pa.float64())}))
    assert simplify_ways(ways, nodes, 1.0).count() == 0
    # empty shard through the full curation (exact/near passes + gate)
    p = str(tmp_path / "empty.parquet")
    pq.write_table(EMPTY_HINT, p)
    rep = curate_images([p], str(tmp_path / "out0"))
    assert rep["rows_out"] == 0 and rep["completed"] == ["empty"]


def test_geo_debias_shuffle_path_matches_broadcast(ray_session):
    from osm_cut_ray.stages.geo_sample import geo_debias_sample
    rng = np.random.default_rng(101)
    entries = [(i, rng.integers(0, 256, (16, 16)).astype(np.uint8),
                "fpng", EN_CAP,
                float((i % 7) * 20 - 60) + rng.uniform(-1e-4, 1e-4),
                float((i % 3) * 15) + rng.uniform(-1e-4, 1e-4))
               for i in range(60)]
    ds = rd.from_arrow(_hint(entries))
    bc = _collect(geo_debias_sample(ds, hex_res=7, per_cell_k=3))
    sh = _collect(geo_debias_sample(ds, hex_res=7, per_cell_k=3,
                                    max_broadcast_keys=0))
    assert sorted(bc["image_id"].to_pylist()) \
        == sorted(sh["image_id"].to_pylist())
    assert sh.column_names == ["image_id", "bytes", "w", "h", "fmt",
                               "caption", "phash"]
    b = bc.sort_by("image_id")
    s = sh.sort_by("image_id")
    for c in b.column_names:
        assert b[c].to_pylist() == s[c].to_pylist(), c


def test_full_image_pipeline_composition(ray_session, tmp_path):
    """A user chains every stage: validate -> curate -> geo-debias ->
    patches -> quality -> WebDataset export -> read back."""
    import pyarrow.parquet as pq

    from osm_cut_ray.geometry.polygon import PolygonIndex
    from osm_cut_ray.pipelines.curate_images import curate_images
    from osm_cut_ray.sources.webdataset import read_wds_shards, \
        write_wds_shards
    from osm_cut_ray.stages.geo_sample import geo_debias_sample
    from osm_cut_ray.stages.image_patch import image_patches
    from osm_cut_ray.stages.image_quality import image_quality, \
        validate_images

    rng = np.random.default_rng(103)
    entries = [(i, rng.integers(0, 256, (32, 32)).astype(np.uint8),
                "fpng", EN_CAP, 2.0 + (i % 5) * 0.001,
                3.0 + (i % 4) * 0.001) for i in range(40)]
    entries.append((100, entries[0][1], "fpng", EN_CAP, 2.0, 3.0))
    entries.append((101, np.full((32, 32), 7, np.uint8), "fpng",
                    EN_CAP, 2.0, 3.0))
    p = str(tmp_path / "raw.parquet")
    pq.write_table(_hint(entries), p)

    raw = rd.read_parquet(p)
    assert validate_images(raw).count() == 0       # healthy corpus

    poly = PolygonIndex.compile(
        [("include", [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0),
                      (0.0, 10.0)])])
    out = str(tmp_path / "curated")
    rep = curate_images([p], out, polygon=poly)
    assert rep["n_drop_exact_dup"] == 1
    parts = [os.path.join(out, "raw", f)
             for f in os.listdir(os.path.join(out, "raw"))
             if f.endswith(".parquet")]
    curated = rd.read_parquet(parts)
    n_curated = curated.count()
    assert 0 < n_curated <= 40                     # 100/101 dropped

    balanced = geo_debias_sample(curated, hex_res=9, per_cell_k=50)
    assert balanced.count() == n_curated           # cap not binding

    q = _collect(image_quality(balanced))
    assert len(q) == n_curated
    assert (np.array(q["entropy"].to_pylist()) > 0.5).all()

    patches = image_patches(balanced, patch=16)
    n_patches = patches.count()
    assert n_patches == 4 * n_curated              # 32px -> 4 tiles

    wds = str(tmp_path / "wds")
    man = write_wds_shards(balanced, wds, rows_per_shard=16,
                           shuffle_seed=1)
    shards = [os.path.join(wds, s) for s in man["shard"].to_pylist()]
    back = read_wds_shards(shards)
    assert back.count() == n_curated


def test_image_augment(ray_session):
    from osm_cut_ray.stages.image_patch import image_augment
    rng = np.random.default_rng(105)
    entries = [(i, rng.integers(0, 256, (16, 24)).astype(np.uint8),
                "fpng", EN_CAP, 1.0, 1.0) for i in range(6)]
    tbl = _hint(entries)
    got = _collect(image_augment(rd.from_arrow(tbl),
                                 ops=("hflip", "rot90")))
    assert len(got) == 6 * 3
    by = {}
    for i in range(len(got)):
        key = (got["image_id"][i].as_py(), got["aug"][i].as_py())
        px, _ = decode_image(got["bytes"][i].as_py())
        by[key] = (px, got["w"][i].as_py(), got["h"][i].as_py())
    for k, (orig_px, *_rest) in enumerate(
            [(e[1],) for e in entries]):
        iid = f"img{k:08d}"
        np.testing.assert_array_equal(by[(iid, "")][0], orig_px)
        np.testing.assert_array_equal(by[(iid, "hflip")][0],
                                      orig_px[:, ::-1])
        np.testing.assert_array_equal(by[(iid, "rot90")][0],
                                      np.rot90(orig_px))
        # rot90 swaps dims: 16h x 24w -> 24h x 16w
        assert by[(iid, "rot90")][1] == 16        # w
        assert by[(iid, "rot90")][2] == 24        # h
        assert by[(iid, "")][1] == 24


def test_pack_training_batches(ray_session):
    """Aspect-bucketed batch packing: globally consistent, exactly
    batch_size members per emitted batch, bit-deterministic under any
    partitioning, equal to the driver brute-force assignment."""
    import pandas as pd

    from osm_cut_ray.stages.batching import (aspect_bucket,
                                             pack_training_batches)
    from osm_cut_ray.stages.geo_sample import sample_hash

    rng = np.random.default_rng(23)
    n, B = 1500, 16
    ids = np.arange(n, dtype=np.int64)
    dims = np.array([(64, 64), (128, 64), (64, 128), (256, 64),
                     (96, 64)])
    pick = rng.integers(0, len(dims), n)
    w = dims[pick, 0].astype(np.int32)
    h = dims[pick, 1].astype(np.int32)
    tbl = pa.table({
        "image_id": [f"img{i:08d}" for i in ids.tolist()],
        "w": w, "h": h,
        "bytes": pa.array([b"x"] * n, pa.binary()),  # must never be read
    })

    # driver brute force
    ab = aspect_bucket(w, h)
    hv = sample_hash(ids)
    rows = pd.DataFrame({"doc_id": ids, "ab": ab, "h": hv})
    parts = []
    for a, g in rows.groupby("ab"):
        g = g.sort_values(["h", "doc_id"]).reset_index(drop=True)
        keep = (len(g) // B) * B
        g = g.iloc[:keep]
        g["batch_seq"] = np.arange(keep) // B
        g["slot"] = np.arange(keep) % B
        parts.append(g[["doc_id", "ab", "batch_seq", "slot"]])
    want = pd.concat(parts).sort_values("doc_id").reset_index(drop=True)

    for nparts in (1, 7):
        ds = rd.from_arrow(tbl).repartition(nparts)
        got = pack_training_batches(ds, batch_size=B)\
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype(np.int64), want.astype(np.int64))

    # structural invariants on one run
    sizes = got.groupby(["ab", "batch_seq"]).size()
    assert (sizes == B).all()
    assert got["doc_id"].is_unique


def test_curate_images_ref_dedup_gate(ray_session, tmp_path):
    """ref_index: images near-duplicating an EXISTING corpus are
    dropped by the global slim pass (one extra fingerprint probe,
    per-shard rewrite unchanged)."""
    from osm_cut_ray.pipelines.curate_images import curate_images
    from osm_cut_ray.stages.image_dedup import build_ref_fp_index

    rng = np.random.default_rng(33)
    a, _ = _curate_corpus(rng)
    p1 = str(tmp_path / "shard_a.parquet")
    pq.write_table(_hint(a), p1)

    # reference corpus: copies of base images 2 and 3 under other ids
    ref_rows = [(900, a[2][1], "fpng", EN_CAP, 5.0, 5.0),
                (901, a[3][1], "fpng", EN_CAP, 5.0, 5.0)]
    ref_p = str(tmp_path / "ref.parquet")
    pq.write_table(_hint(ref_rows), ref_p)
    ref = rd.read_parquet(ref_p)
    idx = build_ref_fp_index(ref)

    poly = PolygonIndex.compile(
        [("include", [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0),
                      (0.0, 10.0)])])
    out = str(tmp_path / "curated")
    report = curate_images([p1], out, polygon=poly, langs=("en",),
                           min_caption_tokens=2, ref_index=idx)
    assert report["n_drop_ref_dup"] == 2
    _, kept_ids = _kept_ids(out, ("shard_a",))
    assert 2 not in kept_ids and 3 not in kept_ids
    assert {0, 1} <= kept_ids

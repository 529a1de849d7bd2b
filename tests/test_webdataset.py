"""WebDataset tar shard sink/source: roundtrip, sharding, determinism."""

import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from osm_cut_ray.sources.webdataset import read_wds_shards, \
    write_wds_shards
from tests.test_image_pipeline import EN_CAP, _hint


def _corpus(rng, n=25):
    sizes = [16, 32, 64]
    return _hint([
        (i, rng.integers(0, 256, (sizes[i % 3], sizes[i % 3]))
         .astype(np.uint8),
         "fpng" if i % 2 else "fjpg", f"{EN_CAP} {i}",
         float(i % 10), float(i % 5)) for i in range(n)])


def test_wds_roundtrip_and_sharding(ray_session, tmp_path):
    rng = np.random.default_rng(71)
    tbl = _corpus(rng)
    out = str(tmp_path / "wds")
    man = write_wds_shards(rd.from_arrow(tbl), out, rows_per_shard=10)
    assert man["rows"].to_pylist() and sum(man["rows"].to_pylist()) == 25
    assert all(r <= 10 for r in man["rows"].to_pylist())
    shards = [os.path.join(out, s) for s in man["shard"].to_pylist()]
    assert all(os.path.getsize(p) == b for p, b in
               zip(shards, man["bytes"].to_pylist()))
    back = pa.concat_tables([
        b for b in read_wds_shards(shards).iter_batches(
            batch_size=None, batch_format="pyarrow") if b.num_rows])
    back = back.sort_by("image_id")
    exp = tbl.sort_by("image_id")
    assert back.column_names == exp.column_names
    for c in exp.column_names:
        assert back[c].to_pylist() == exp[c].to_pylist(), c


def test_wds_shards_are_deterministic(ray_session, tmp_path):
    rng = np.random.default_rng(73)
    tbl = _corpus(rng, n=12)
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = write_wds_shards(rd.from_arrow(tbl), d1, rows_per_shard=12)
    m2 = write_wds_shards(rd.from_arrow(tbl), d2, rows_per_shard=12)
    assert m1["shard"].to_pylist() == m2["shard"].to_pylist()
    for s in m1["shard"].to_pylist():
        b1 = open(os.path.join(d1, s), "rb").read()
        b2 = open(os.path.join(d2, s), "rb").read()
        assert b1 == b2                      # byte-identical shards


def test_wds_seeded_shuffle_is_reproducible(ray_session, tmp_path):
    rng = np.random.default_rng(77)
    tbl = _corpus(rng, n=20)
    d1, d2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    m1 = write_wds_shards(rd.from_arrow(tbl), d1, rows_per_shard=7,
                          shuffle_seed=5)
    m2 = write_wds_shards(rd.from_arrow(tbl), d2, rows_per_shard=7,
                          shuffle_seed=5)
    assert m1["shard"].to_pylist() == m2["shard"].to_pylist()
    assert sum(m1["rows"].to_pylist()) == 20
    # all samples survive the shuffle+shard roundtrip
    shards = [os.path.join(d1, s) for s in m1["shard"].to_pylist()]
    back = pa.concat_tables([
        b for b in read_wds_shards(shards).iter_batches(
            batch_size=None, batch_format="pyarrow") if b.num_rows])
    assert sorted(back["image_id"].to_pylist()) == \
        sorted(tbl["image_id"].to_pylist())


def test_export_packed_wds(ray_session, tmp_path):
    """Aspect-packed export: every batch_size-run in a shard shares an
    aspect bucket, order follows the packing assignment, the dropped
    tail is exactly the per-bucket remainder, and the broadcast and
    bucketed-join attach paths produce byte-identical shards."""
    import tarfile

    from osm_cut_ray.sources.webdataset import export_packed_wds
    from osm_cut_ray.stages.batching import pack_training_batches

    rng = np.random.default_rng(83)
    shapes = [(16, 16), (16, 32), (32, 16)]  # (h, w): sq, wide, tall
    n = 61
    tbl = _hint([
        (i, rng.integers(0, 256, shapes[i % 3]).astype(np.uint8),
         "fpng", f"{EN_CAP} {i}", float(i % 10), float(i % 5))
        for i in range(n)])
    B, BPS = 8, 2
    out = str(tmp_path / "packed")
    man = export_packed_wds(rd.from_arrow(tbl), out, batch_size=B,
                            batches_per_shard=BPS)

    assign = pack_training_batches(rd.from_arrow(tbl), batch_size=B)\
        .to_pandas().sort_values(["ab", "batch_seq", "slot"])
    assert sum(man["rows"].to_pylist()) == len(assign)
    assert all(r % B == 0 and r <= B * BPS
               for r in man["rows"].to_pylist())

    seen = []
    for s in man["shard"].to_pylist():
        with tarfile.open(os.path.join(out, s)) as tf:
            keys = [m.name[:-4] for m in tf if m.name.endswith(".img")]
        ids = [int(k[3:]) for k in keys]
        seen.extend(ids)
        # all members of one shard share the aspect bucket, and the
        # order inside the shard is the assignment's (batch_seq, slot)
        sub = assign[assign["doc_id"].isin(ids)]
        assert sub["ab"].nunique() == 1
        want_order = sub.sort_values(["batch_seq", "slot"])["doc_id"]
        assert ids == want_order.tolist(), s
    assert sorted(seen) == sorted(assign["doc_id"].tolist())

    # forced bucketed-join attach path: identical bytes
    out2 = str(tmp_path / "packed2")
    man2 = export_packed_wds(rd.from_arrow(tbl), out2, batch_size=B,
                             batches_per_shard=BPS,
                             max_broadcast_assign=0)
    assert man2["shard"].to_pylist() == man["shard"].to_pylist()
    for s in man["shard"].to_pylist():
        assert open(os.path.join(out, s), "rb").read() == \
            open(os.path.join(out2, s), "rb").read()

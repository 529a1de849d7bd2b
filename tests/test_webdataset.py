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

"""Checkpoint/resume + hot-cell salting tests."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd


def _make_shards(tmp_path, n_shards=3, rows=200):
    shards = []
    for i in range(n_shards):
        p = tmp_path / f"shard{i}.parquet"
        pq.write_table(pa.table({
            "id": np.arange(rows, dtype=np.int64) + i * rows,
            "v": np.arange(rows, dtype=np.float64)}), str(p))
        shards.append((f"shard{i}", str(p)))
    return shards


def test_resumable_run_skips_completed(tmp_path, ray_session):
    from osm_cut_ray.state.checkpoint import run_resumable
    shards = _make_shards(tmp_path)
    out = str(tmp_path / "out")
    calls = []

    def process(path):
        calls.append(path)
        return rd.read_parquet(path).map_batches(
            lambda t: t.filter(pa.compute.equal(
                pa.compute.bit_wise_and(t["id"], 1), 0)),
            batch_format="pyarrow")

    r1 = run_resumable(shards, process, out, params={"mode": "even"})
    assert r1["completed"] == ["shard0", "shard1", "shard2"]
    assert r1["rows_out"] == 300 and len(calls) == 3

    # resume: nothing recomputed
    calls.clear()
    r2 = run_resumable(shards, process, out, params={"mode": "even"})
    assert r2["skipped"] == ["shard0", "shard1", "shard2"]
    assert r2["rows_out"] == 300 and calls == []

    # changed params -> full recompute
    r3 = run_resumable(shards, process, out, params={"mode": "odd"})
    assert r3["completed"] == ["shard0", "shard1", "shard2"]


def test_resumable_run_recovers_after_crash(tmp_path, ray_session):
    from osm_cut_ray.state.checkpoint import run_resumable
    shards = _make_shards(tmp_path)
    out = str(tmp_path / "out")

    boom = {"armed": True}

    def process(path):
        if boom["armed"] and path.endswith("shard2.parquet"):
            raise RuntimeError("simulated crash")
        return rd.read_parquet(path)

    with pytest.raises(RuntimeError):
        run_resumable(shards, process, out, params={})
    # shards 0-1 committed, shard2 absent
    assert os.path.exists(os.path.join(out, "_manifests", "shard0.json"))
    assert not os.path.exists(os.path.join(out, "_manifests", "shard2.json"))

    boom["armed"] = False
    r = run_resumable(shards, process, out, params={})
    assert r["skipped"] == ["shard0", "shard1"]
    assert r["completed"] == ["shard2"]
    assert r["rows_out"] == 600

    # input fingerprint change invalidates just that shard
    pq.write_table(pa.table({"id": np.arange(5, dtype=np.int64),
                             "v": np.zeros(5)}), shards[0][1])
    r2 = run_resumable(shards, process, out, params={})
    assert r2["completed"] == ["shard0"] and "shard1" in r2["skipped"]


def test_salted_counts_match_plain_groupby(ray_session):
    from osm_cut_ray.stages.salt import hot_cells, salted_cell_counts
    rng = np.random.default_rng(9)
    # skewed: cell 7 holds half the rows
    cells = np.where(rng.random(20000) < 0.5, 7,
                     rng.integers(0, 50, 20000))
    ds = rd.from_arrow(pa.table({"cell": cells.astype(np.int64),
                                 "id": np.arange(20000, dtype=np.int64)}))
    hot = hot_cells(ds, "cell", threshold_rows=2000)
    assert 7 in hot.tolist()

    got = {r["cell"]: r["n"]
           for r in salted_cell_counts(ds, "cell", hot_threshold=2000,
                                       split_factor=8).take_all()}
    want_cells, want_counts = np.unique(cells, return_counts=True)
    want = dict(zip(want_cells.tolist(), want_counts.tolist()))
    assert got == want


def test_salt_spreads_hot_cell(ray_session):
    from osm_cut_ray.stages.salt import with_salted_key
    ds = rd.from_arrow(pa.table({
        "cell": np.full(1000, 7, np.int64),
        "id": np.arange(1000, dtype=np.int64)}))
    salted = with_salted_key(ds, "cell", np.array([7]), split_factor=8,
                             row_key_col="id")
    salts = np.array([r["salt"] for r in salted.take_all()])
    counts = np.bincount(salts, minlength=8)
    assert (counts > 0).all() and counts.max() < 1000  # actually split


def test_flagship_resumable(tmp_path, ray_session):
    from osm_cut_ray.pipelines.flagship import flagship_resumable
    out = str(tmp_path / "ck")
    r1 = flagship_resumable("/root/testdata/sf0.001", out)
    assert len(r1["completed"]) == 1 and r1["rows_out"] > 0
    r2 = flagship_resumable("/root/testdata/sf0.001", out)
    assert r2["skipped"] == r1["completed"] and r2["completed"] == []
    assert r2["rows_out"] == r1["rows_out"]
    # param change invalidates
    r3 = flagship_resumable("/root/testdata/sf0.001", out,
                            params_version="flagship-v2")
    assert r3["completed"] == r1["completed"]

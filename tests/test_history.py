"""History snapshot — DuckDB-pinned (window-function oracle) plus
OSM delete semantics."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray

from osm_cut_ray.stages.history import snapshot_at, version_churn


def _history(parts=4, n_objects=200, seed=9):
    rng = np.random.RandomState(seed)
    rows = []
    for oid in range(1, n_objects + 1):
        n_ver = rng.randint(1, 6)
        ts0 = rng.randint(0, 50)
        for v in range(1, n_ver + 1):
            rows.append({
                "id": oid, "version": v,
                "timestamp": f"2020-01-{ts0 + v * 2:02d}T00:00:00Z",
                "visible": not (v == n_ver and oid % 7 == 0),
                "val": oid * 100 + v})
    t = pa.Table.from_pandas(pd.DataFrame(rows),
                             preserve_index=False)\
        .replace_schema_metadata(None)
    return t, ray.data.from_arrow(t).repartition(parts)


AT = "2020-01-30T00:00:00Z"


def test_matches_duckdb_window_oracle(ray_session):
    tbl, ds = _history()
    got = snapshot_at(ds, AT, visible_col="visible").to_pandas()
    got = got.sort_values("id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("h", tbl)
    exp = con.execute(f"""
        SELECT * FROM (
          SELECT *, row_number() OVER (
              PARTITION BY id
              ORDER BY timestamp DESC, version DESC) AS rn
          FROM h WHERE timestamp <= '{AT}')
        WHERE rn = 1 AND visible ORDER BY id""").df()\
        .drop(columns=["rn"]).reset_index(drop=True)
    assert list(got["id"]) == list(exp["id"])
    assert list(got["version"]) == list(exp["version"])
    assert list(got["val"]) == list(exp["val"])


def test_deleted_objects_absent(ray_session):
    _, ds = _history()
    late = snapshot_at(ds, "2020-12-31T00:00:00Z",
                       visible_col="visible").to_pandas()
    # ids divisible by 7 have an invisible latest version -> gone
    assert not (late["id"] % 7 == 0).any()
    # without the visible column they'd be present
    raw = snapshot_at(ds, "2020-12-31T00:00:00Z").to_pandas()
    assert (raw["id"] % 7 == 0).any()


def test_early_cut_picks_early_versions(ray_session):
    _, ds = _history()
    early = snapshot_at(ds, "2020-01-08T00:00:00Z",
                        visible_col="visible").to_pandas()
    assert len(early) > 0
    full = snapshot_at(ds, "2020-12-31T00:00:00Z").to_pandas()
    merged = early.merge(full, on="id", suffixes=("_e", "_f"))
    assert (merged["version_e"] <= merged["version_f"]).all()


def test_partition_invariance(ray_session):
    _, a = _history(parts=1)
    _, b = _history(parts=9)
    ga = snapshot_at(a, AT, visible_col="visible").to_pandas()\
        .sort_values("id").reset_index(drop=True)
    gb = snapshot_at(b, AT, visible_col="visible").to_pandas()\
        .sort_values("id").reset_index(drop=True)
    assert ga.equals(gb)


def test_version_churn(ray_session):
    tbl, ds = _history()
    got = version_churn(ds).to_pandas().sort_values("id")\
        .reset_index(drop=True)
    exp = tbl.to_pandas().groupby("id")["version"]\
        .agg(["size", "min", "max"]).reset_index()
    assert list(got["n_versions"]) == list(exp["size"])
    assert list(got["max_version"]) == list(exp["max"])

"""resample_series — binned aggregate DuckDB-pinned; gap fill
replay-pinned."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray

from osm_cut_ray.stages.resample import resample_series


def _events(parts=4, n=3000, seed=5):
    rng = np.random.RandomState(seed)
    key = rng.randint(1, 20, n).astype(np.int64)
    ts = np.round(rng.uniform(0, 500, n), 3)
    # plant gaps: keys 1-5 lose the middle third of their span
    gap = (key <= 5) & (ts > 160) & (ts < 340)
    key, ts = key[~gap], ts[~gap]
    val = np.round(rng.randn(len(key)) * 10, 3)
    t = pa.table({"key": key, "ts": ts, "value": val})
    return t, ray.data.from_arrow(t).repartition(parts)


def test_binned_aggregate_matches_duckdb(ray_session):
    tbl, ds = _events()
    for how in ("mean", "sum", "min", "max", "count"):
        got = resample_series(ds, freq=50.0, how=how).to_pandas()
        got = got[got.n > 0].sort_values(["key", "bin_ts"])\
            .reset_index(drop=True)
        con = duckdb.connect()
        con.register("e", tbl)
        fn = {"mean": "avg(value)", "sum": "sum(value)",
              "min": "min(value)", "max": "max(value)",
              "count": "count(*)"}[how]
        exp = con.execute(f"""
            SELECT key, floor(ts/50.0)*50.0 AS bin_ts, {fn} AS v,
                   count(*) AS n
            FROM e GROUP BY 1, 2 ORDER BY 1, 2""").df()
        assert len(got) == len(exp), how
        assert (got["key"].to_numpy() == exp["key"].to_numpy()).all()
        np.testing.assert_allclose(got["value"], exp["v"],
                                   rtol=1e-12, err_msg=how)
        assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()


def test_gap_fill_modes(ray_session):
    _, ds = _events()
    null_f = resample_series(ds, freq=50.0).to_pandas()
    for key, g in null_f.groupby("key"):
        bins = g["bin_ts"].to_numpy()
        # contiguous grid between first and last bin
        assert np.allclose(np.diff(np.sort(bins)), 50.0)
    gaps = null_f[null_f.n == 0]
    assert len(gaps) > 0 and gaps["value"].isna().all()
    zero_f = resample_series(ds, freq=50.0, fill="zero").to_pandas()
    assert (zero_f[zero_f.n == 0]["value"] == 0.0).all()
    ff = resample_series(ds, freq=50.0, fill="ffill").to_pandas()
    merged = ff.merge(null_f, on=["key", "bin_ts"],
                      suffixes=("_f", "_0"))
    for r in merged[merged.n_0 == 0].itertuples():
        prior = null_f[(null_f.key == r.key)
                       & (null_f.bin_ts < r.bin_ts)
                       & (null_f.n > 0)]
        assert r.value_f == prior.sort_values("bin_ts")["value"]\
            .iloc[-1]


def test_partition_invariance_and_guards(ray_session):
    _, a = _events(parts=1)
    _, b = _events(parts=9)
    ga = resample_series(a, freq=25.0, fill="ffill").to_pandas()\
        .sort_values(["key", "bin_ts"]).reset_index(drop=True)
    gb = resample_series(b, freq=25.0, fill="ffill").to_pandas()\
        .sort_values(["key", "bin_ts"]).reset_index(drop=True)
    assert ga.equals(gb)
    _, ds = _events()
    with pytest.raises(ValueError, match="how"):
        resample_series(ds, freq=1.0, how="median")
    with pytest.raises(ValueError, match="freq"):
        resample_series(ds, freq=0.0)
    with pytest.raises(Exception, match="max_bins_per_key"):
        resample_series(ds, freq=0.001,
                        max_bins_per_key=100).materialize()

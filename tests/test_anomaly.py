import numpy as np
import pyarrow as pa


def _collect(ds):
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.to_pandas().sort_values(
        ["key", "ts", "value"]).reset_index(drop=True)


def _brute(rows, window, z_thresh):
    """Independent per-key python loop."""
    out = {}
    bykey = {}
    for k, ts, v in rows:
        bykey.setdefault(k, []).append((ts, v))
    for k, seq in bykey.items():
        seq.sort()
        vals = [v for _, v in seq]
        for i, (ts, v) in enumerate(seq):
            if i < window:
                out[(k, ts, v)] = (np.nan, np.nan, np.nan, 0)
                continue
            w = np.array(vals[i - window:i])
            m = float(np.median(w))
            d = float(np.median(np.abs(w - m)))
            dev = abs(v - m)
            if d == 0:
                z = 0.0 if dev == 0 else np.inf
            else:
                z = dev / (1.4826 * d)
            out[(k, ts, v)] = (m, d, z, int(z > z_thresh))
    return out


def test_rolling_anomalies_match_brute(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.anomaly import rolling_anomalies

    rng = np.random.default_rng(92)
    rows = []
    for k in range(12):
        n = int(rng.integers(5, 120))
        ts = np.sort(rng.uniform(0, 1000, n))
        v = rng.normal(10, 2, n)
        # inject spikes
        v[rng.integers(0, n, max(1, n // 15))] += 40
        rows += [(k, float(t), float(x)) for t, x in zip(ts, v)]

    ds = rd.from_items([{"cell": k, "t": ts, "x": v}
                        for k, ts, v in rows])
    got = _collect(rolling_anomalies(
        ds, key_col="cell", ts_col="t", val_col="x", window=10,
        z_thresh=3.5))
    exp = _brute(rows, 10, 3.5)
    assert len(got) == len(rows)
    n_anom = 0
    for _, r in got.iterrows():
        m, d, z, f = exp[(int(r["key"]), r["ts"], r["value"])]
        if np.isnan(m):
            assert np.isnan(r["med"]) and r["is_anomaly"] == 0
            continue
        assert abs(r["med"] - m) < 1e-12
        assert abs(r["mad"] - d) < 1e-12
        if np.isinf(z):
            assert np.isinf(r["z"])
        else:
            assert abs(r["z"] - z) < 1e-9
        assert int(r["is_anomaly"]) == f
        n_anom += f
    assert n_anom > 0  # the spikes must actually be caught


def test_rolling_anomalies_constant_history(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.anomaly import rolling_anomalies

    vals = [5.0] * 6 + [5.0, 9.0]
    ds = rd.from_items([{"k": 1, "t": float(i), "v": v}
                        for i, v in enumerate(vals)])
    got = _collect(rolling_anomalies(
        ds, key_col="k", ts_col="t", val_col="v", window=5))
    by_ts = {r["ts"]: r for _, r in got.iterrows()}
    assert by_ts[6.0]["z"] == 0.0 and by_ts[6.0]["is_anomaly"] == 0
    assert np.isinf(by_ts[7.0]["z"]) and by_ts[7.0]["is_anomaly"] == 1


def test_rolling_anomalies_key_cap_raises(ray_session):
    import pytest
    import ray.data as rd

    from osm_cut_ray.stages.anomaly import rolling_anomalies

    ds = rd.from_items([{"k": 1, "t": float(i), "v": 0.0}
                        for i in range(100)])
    with pytest.raises(Exception, match="max_key_rows"):
        rolling_anomalies(ds, key_col="k", ts_col="t", val_col="v",
                          window=5, max_key_rows=10).materialize()

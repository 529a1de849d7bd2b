import numpy as np
import pyarrow as pa


def _collect(ds):
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.to_pandas()


def _brute_acf(x, max_lag):
    """Independent formulation via np.correlate (full), not the
    stage's per-lag dot loop."""
    x = np.asarray(x, np.float64)
    d = x - x.mean()
    denom = (d * d).sum()
    full = np.correlate(d, d, "full")[len(d) - 1:]
    lags = np.arange(0, min(max_lag, len(x) - 1) + 1)
    out = full[lags] / denom if denom > 0 else \
        np.full(len(lags), np.nan)
    if denom > 0:
        out[0] = 1.0
    else:
        out = out.copy()
        out[0] = 1.0
    return lags, out


def test_acf_matches_brute_and_partition_invariant(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.acf import acf_per_key

    rng = np.random.default_rng(8)
    rows_k, rows_i, rows_t, rows_v = [], [], [], []
    series = {}
    rid = 0
    for key in range(7):
        n = int(rng.integers(4, 200))
        # AR(1)-ish so the ACF is non-trivial
        x = np.zeros(n)
        for t in range(1, n):
            x[t] = 0.7 * x[t - 1] + rng.normal()
        series[key] = x
        ts = np.sort(rng.choice(10_000, n, replace=False))
        for t, v in zip(ts, x):
            rows_k.append(key)
            rows_i.append(rid)
            rows_t.append(int(t))
            rows_v.append(float(v))
            rid += 1
    # a constant series: acf null past lag 0
    for t in range(5):
        rows_k.append(99)
        rows_i.append(rid)
        rows_t.append(t)
        rows_v.append(3.5)
        rid += 1
    series[99] = np.full(5, 3.5)

    t = pa.table({"k": pa.array(rows_k, pa.int64()),
                  "eid": pa.array(rows_i, pa.int64()),
                  "ts": pa.array(rows_t, pa.int64()),
                  "v": pa.array(rows_v)})

    outs = []
    for parts in (3, 13):
        got = _collect(acf_per_key(
            rd.from_arrow(t).repartition(parts), key_col="k",
            id_col="eid", ts_col="ts", val_col="v", max_lag=12)) \
            .sort_values(["key", "lag"]).reset_index(drop=True)
        outs.append(got)
    assert outs[0].equals(outs[1])  # bit-identical across partitions

    got = outs[0]
    for key, x in series.items():
        lags, exp = _brute_acf(x, 12)
        sub = got[got["key"] == key]
        assert np.array_equal(sub["lag"].to_numpy(), lags)
        assert (sub["n"] == len(x)).all()
        g = sub["acf"].to_numpy()
        if key == 99:
            assert g[0] == 1.0 and np.isnan(g[1:]).all()
        else:
            assert np.allclose(g, exp, rtol=1e-12, atol=1e-12)
            # AR(1) signature: positive lag-1 autocorrelation
            if len(x) > 50:
                assert g[1] > 0.3


def test_acf_orders_by_timestamp_not_input(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.acf import acf_per_key

    x = np.array([1.0, 5.0, 2.0, 8.0, 3.0, 9.0])
    ts = np.array([10, 20, 30, 40, 50, 60])
    perm = np.array([3, 0, 5, 1, 4, 2])  # scrambled input order
    t = pa.table({"k": pa.array(np.zeros(6, np.int64)),
                  "eid": pa.array(perm.astype(np.int64)),
                  "ts": pa.array(ts[perm]),
                  "v": pa.array(x[perm])})
    got = _collect(acf_per_key(
        rd.from_arrow(t).repartition(3), key_col="k", id_col="eid",
        ts_col="ts", val_col="v", max_lag=3)) \
        .sort_values("lag")
    from tests.test_acf import _brute_acf as brute
    _, exp = brute(x, 3)
    assert np.allclose(got["acf"].to_numpy(), exp)

import numpy as np
import pyarrow as pa


def _brute(x, m):
    """Loop implementation of FPP classical additive decomposition."""
    n = len(x)
    trend = [float("nan")] * n
    if n >= 2 * m:
        for t in range(n):
            if m % 2 == 1:
                h = (m - 1) // 2
                if t - h >= 0 and t + h < n:
                    trend[t] = sum(x[t - h:t + h + 1]) / m
            else:
                h = m // 2
                if t - h >= 0 and t + h < n:
                    s = 0.5 * x[t - h] + 0.5 * x[t + h] \
                        + sum(x[t - h + 1:t + h])
                    trend[t] = s / m
    if n < 2 * m:
        return trend, [float("nan")] * n, [float("nan")] * n
    sums = [0.0] * m
    cnts = [0] * m
    for t in range(n):
        if not np.isnan(trend[t]):
            sums[t % m] += x[t] - trend[t]
            cnts[t % m] += 1
    idx = [sums[j] / cnts[j] if cnts[j] else 0.0 for j in range(m)]
    mean = sum(idx) / m
    idx = [v - mean for v in idx]
    seas = [idx[t % m] for t in range(n)]
    resid = [x[t] - trend[t] - seas[t] for t in range(n)]
    return trend, seas, resid


def test_decompose_series_matches_brute():
    from osm_cut_ray.stages.decompose import decompose_series

    rng = np.random.default_rng(8)
    for trial in range(30):
        m = int(rng.integers(2, 13))
        n = int(rng.integers(1, 90))
        x = rng.normal(10, 3, n)
        tr, se, re = decompose_series(x, m)
        bt, bs, br = _brute(x.tolist(), m)
        np.testing.assert_allclose(tr, bt, atol=1e-10)
        np.testing.assert_allclose(se, bs, atol=1e-10)
        np.testing.assert_allclose(re, br, atol=1e-10)


def test_decompose_recovers_planted_components():
    from osm_cut_ray.stages.decompose import decompose_series

    m = 7
    n = 10 * m
    t = np.arange(n)
    season = np.array([3.0, -1, 0, 2, -4, 1, -1])
    x = 0.5 * t + season[t % m]  # exact linear trend + seasonality
    tr, se, re = decompose_series(x, m)
    mid = slice(m, n - m)
    np.testing.assert_allclose(tr[mid], 0.5 * t[mid], atol=1e-9)
    np.testing.assert_allclose(se[:m], season, atol=1e-9)
    np.testing.assert_allclose(re[mid], 0.0, atol=1e-9)
    # seasonal indexes sum to zero by construction
    assert abs(se[:m].sum()) < 1e-9


def test_decompose_per_key(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.decompose import (decompose_per_key,
                                              decompose_series)

    rng = np.random.default_rng(6)
    rows = []
    series = {}
    for key in range(9):
        n = int(rng.integers(3, 70))
        x = rng.normal(0, 5, n)
        series[key] = x
        for i in range(n):
            rows.append((key, float(i), x[i]))
    arr = np.array(rows)
    ds = rd.from_arrow(pa.table({
        "key": arr[:, 0].astype(np.int64), "ts": arr[:, 1],
        "value": arr[:, 2]})).repartition(5)
    out = decompose_per_key(ds, period=6)
    tab = pa.concat_tables([b for b in out.iter_batches(
        batch_size=None, batch_format="pyarrow") if b.num_rows]) \
        .to_pandas().sort_values(["key", "ts"])
    assert len(tab) == len(rows)
    for key, x in series.items():
        sub = tab[tab["key"] == key]
        bt, bs, br = decompose_series(x, 6)
        np.testing.assert_allclose(sub["trend"].to_numpy(), bt,
                                   atol=1e-12)
        np.testing.assert_allclose(sub["seasonal"].to_numpy(), bs,
                                   atol=1e-12)
        np.testing.assert_allclose(sub["resid"].to_numpy(), br,
                                   atol=1e-12)

import numpy as np
import pyarrow as pa


def _brute_dp(x, beta):
    """Exact O(n^2) DP — independent of the PELT pruning."""
    n = len(x)
    cs = np.concatenate(([0.0], np.cumsum(x)))
    ss = np.concatenate(([0.0], np.cumsum(x * x)))
    F = np.empty(n + 1)
    F[0] = -beta
    prev = np.zeros(n + 1, np.int64)
    for e in range(1, n + 1):
        s = np.arange(e)
        seg = ss[e] - ss[s] - (cs[e] - cs[s]) ** 2 / (e - s)
        tot = F[s] + seg + beta
        i = int(np.argmin(tot))
        F[e] = tot[i]
        prev[e] = i
    cps = []
    e = n
    while e > 0:
        s = int(prev[e])
        if s > 0:
            cps.append(s)
        e = s
    return cps[::-1], float(F[n])


def test_pelt_equals_exact_dp():
    from osm_cut_ray.stages.changepoint import pelt_mean

    rng = np.random.default_rng(21)
    for trial in range(20):
        n = int(rng.integers(5, 300))
        x = rng.normal(0, 1, n)
        # random mean shifts
        for _ in range(int(rng.integers(0, 4))):
            p = int(rng.integers(1, n))
            x[p:] += rng.normal(0, 5)
        beta = float(rng.uniform(0.5, 20))
        got = pelt_mean(x, beta)
        exp, _ = _brute_dp(x, beta)
        assert got == exp, (trial, beta)


def test_changepoints_detect_known_shifts(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.changepoint import changepoints

    rng = np.random.default_rng(2)
    rows = []
    true_cps = {}
    for key in range(6):
        n = 200
        x = rng.normal(0, 0.5, n)
        cp1, cp2 = 60, 140
        x[cp1:] += 8.0
        x[cp2:] -= 16.0
        true_cps[key] = [cp1, cp2]
        rows += [{"k": key, "t": float(i), "v": float(v)}
                 for i, v in enumerate(x)]
    # one flat key: no changepoints
    rows += [{"k": 99, "t": float(i), "v": 1.0 + 0.001 * (i % 2)}
             for i in range(100)]

    ds = rd.from_items(rows).repartition(8)
    out = pa.concat_tables(
        [pa.table(b) for b in changepoints(
            ds, key_col="k", ts_col="t", val_col="v")
         .iter_batches(batch_format="pyarrow")]).to_pandas()

    for key, cps in true_cps.items():
        got = sorted(out[out["key"] == key]["cp_index"].tolist())
        assert len(got) == 2, (key, got)
        assert abs(got[0] - cps[0]) <= 2 and \
            abs(got[1] - cps[1]) <= 2, (key, got)
    assert (out["key"] == 99).sum() == 0
    # cp_ts mirrors the index into the time axis
    r = out[(out["key"] == 0)].sort_values("cp_index")
    assert r["cp_ts"].tolist() == [float(i) for i in
                                   r["cp_index"].tolist()]


def test_changepoints_key_cap_raises(ray_session):
    import pytest
    import ray.data as rd

    from osm_cut_ray.stages.changepoint import changepoints

    ds = rd.from_items([{"k": 1, "t": float(i), "v": 0.0}
                        for i in range(50)])
    with pytest.raises(Exception, match="max_key_rows"):
        changepoints(ds, key_col="k", ts_col="t", val_col="v",
                     max_key_rows=10).materialize()

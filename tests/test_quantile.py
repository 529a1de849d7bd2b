import numpy as np
import pyarrow as pa


def test_exact_quantiles_match_numpy_and_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from osm_cut_ray.stages.quantile import quantiles

    rng = np.random.default_rng(17)
    # negatives, duplicates, wide magnitudes, NaNs
    v = np.concatenate([
        rng.normal(0, 1000, 5000),
        rng.uniform(-1e-6, 1e-6, 2000),
        np.repeat([3.25, -17.5], 500),
        [np.nan] * 37])
    rng.shuffle(v)
    t = pa.table({"x": pa.array(v)})
    ds = rd.from_arrow(t).repartition(16)

    qs = [0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0]
    got = quantiles(ds, "x", qs)
    clean = v[~np.isnan(v)]
    for q, val in zip(got["q"].to_pylist(),
                      got["value"].to_pylist()):
        exp = float(np.percentile(clean, q * 100, method="lower"))
        assert val == exp, (q, val, exp)

    con = duckdb.connect()
    con.register("t", pa.table({"x": pa.array(clean)}))
    for q, val in zip(got["q"].to_pylist(),
                      got["value"].to_pylist()):
        d = con.execute(
            f"SELECT quantile_disc(x, {q}) FROM t").fetchone()[0]
        assert val == float(d), (q, val, d)


def test_kth_smallest_exact(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.quantile import kth_smallest

    rng = np.random.default_rng(9)
    v = rng.permutation(np.arange(-500.0, 500.0))
    ds = rd.from_arrow(pa.table({"x": pa.array(v)})).repartition(8)
    s = np.sort(v)
    for k in (1, 2, 17, 500, 999, 1000):
        assert kth_smallest(ds, "x", k) == float(s[k - 1]), k

    import pytest
    with pytest.raises(ValueError, match="out of range"):
        kth_smallest(ds, "x", 0)
    with pytest.raises(ValueError, match="out of range"):
        kth_smallest(ds, "x", 1001)


def test_quantiles_infinities_and_tiny(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.quantile import quantiles

    v = np.array([np.inf, -np.inf, 0.0, -0.0, 1.0, -1.0, 1e300,
                  -1e300, 5e-324])
    ds = rd.from_arrow(pa.table({"x": pa.array(v)}))
    got = quantiles(ds, "x", [0.0, 0.5, 1.0])
    vals = got["value"].to_pylist()
    assert vals[0] == -np.inf
    assert vals[1] == float(np.percentile(v, 50, method="lower"))
    assert vals[2] == np.inf

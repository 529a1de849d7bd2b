import numpy as np
import pyarrow as pa


def _collect(ds):
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.to_pandas().set_index("key").sort_index()


def test_linreg_matches_duckdb_and_numpy(ray_session):
    import duckdb
    import ray.data as rd

    from osm_cut_ray.stages.regression import linreg_per_key

    rng = np.random.default_rng(44)
    ks, xs, ys = [], [], []
    for key in range(15):
        n = int(rng.integers(2, 400))
        x = np.round(rng.uniform(-50, 50, n), 6)
        y = np.round(3.5 * key * x + rng.normal(0, 10, n), 6)
        ks += [key] * n
        xs += x.tolist()
        ys += y.tolist()
    t = pa.table({"k": pa.array(ks, pa.int64()),
                  "x": pa.array(xs), "y": pa.array(ys)})

    got = _collect(linreg_per_key(
        rd.from_arrow(t).repartition(16),
        key_col="k", x_col="x", y_col="y"))

    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute(
        "SELECT k, count(*) n, regr_slope(y, x) s, "
        "regr_intercept(y, x) i, corr(y, x) r FROM t GROUP BY k "
        "ORDER BY k").fetchdf().set_index("k")
    for key in exp.index:
        assert got.loc[key, "n"] == exp.loc[key, "n"]
        assert abs(got.loc[key, "slope"] - exp.loc[key, "s"]) \
            < 1e-9, key
        assert abs(got.loc[key, "intercept"] - exp.loc[key, "i"]) \
            < 1e-7, key
        assert abs(got.loc[key, "r"] - exp.loc[key, "r"]) < 1e-9, key
        assert abs(got.loc[key, "r2"] - exp.loc[key, "r"] ** 2) \
            < 1e-9, key

    # numpy cross-check on one key
    m = np.array(ks) == 3
    s_np, i_np = np.polyfit(np.array(xs)[m], np.array(ys)[m], 1)
    assert abs(got.loc[3, "slope"] - s_np) < 1e-8
    assert abs(got.loc[3, "intercept"] - i_np) < 1e-6


def test_linreg_partition_invariance_bit_exact(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.regression import linreg_per_key

    rng = np.random.default_rng(7)
    n = 5000
    t = pa.table({
        "k": pa.array((rng.integers(0, 7, n)).astype(np.int64)),
        "x": pa.array(np.round(rng.uniform(0, 1000, n), 6)),
        "y": pa.array(np.round(rng.uniform(0, 1000, n), 6))})
    a = _collect(linreg_per_key(rd.from_arrow(t).repartition(3),
                                key_col="k", x_col="x", y_col="y"))
    b = _collect(linreg_per_key(rd.from_arrow(t).repartition(37),
                                key_col="k", x_col="x", y_col="y"))
    for col in ("slope", "intercept", "r", "r2"):
        assert (a[col].to_numpy() == b[col].to_numpy()).all(), col


def test_linreg_degenerate_keys(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.regression import linreg_per_key

    rows = ([{"k": 1, "x": 2.0, "y": 9.0}]                # n = 1
            + [{"k": 2, "x": 5.0, "y": float(v)}          # zero vx
               for v in (1, 2, 3)]
            + [{"k": 3, "x": float(v), "y": 4.0}          # zero vy
               for v in (1, 2, 3)])
    got = _collect(linreg_per_key(rd.from_items(rows), key_col="k",
                                  x_col="x", y_col="y"))
    assert got.loc[1].isna()[["slope", "intercept", "r"]].all()
    assert got.loc[2].isna()[["slope", "intercept", "r"]].all()
    assert got.loc[3, "slope"] == 0.0
    assert got.loc[3, "intercept"] == 4.0
    assert np.isnan(got.loc[3, "r"])

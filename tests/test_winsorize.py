import numpy as np
import pyarrow as pa


def _collect(ds):
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.to_pandas()


def test_winsorize_matches_numpy_and_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from osm_cut_ray.stages.winsorize import winsorize_per_key

    rng = np.random.default_rng(33)
    ks, ids, vs = [], [], []
    rid = 0
    # key 0 gets n=100 so q*n is integral at 0.05/0.95 — the one case
    # where numpy method='lower' == DuckDB quantile_disc (floor(q*(n-1))
    # == ceil(q*n)-1 iff q*n is an integer); other keys get random n
    # and are pinned to numpy only.
    sizes = [100] + [int(rng.integers(3, 300)) for _ in range(8)]
    for key, n in enumerate(sizes):
        v = rng.normal(key * 10, 5, n)
        v[rng.integers(0, n, max(1, n // 20))] += 500  # outliers
        for x in v:
            ks.append(key)
            ids.append(rid)
            vs.append(float(x))
            rid += 1
    t = pa.table({"k": pa.array(ks, pa.int64()),
                  "rid": pa.array(ids, pa.int64()),
                  "v": pa.array(vs)})

    got = _collect(winsorize_per_key(
        rd.from_arrow(t).repartition(12), key_col="k",
        id_col="rid", val_col="v", q_lo=0.05, q_hi=0.95)) \
        .set_index("id").sort_index()
    assert len(got) == len(ids)

    con = duckdb.connect()
    con.register("t", t)
    lim = con.execute(
        "SELECT k, quantile_disc(v, 0.05) lo, "
        "quantile_disc(v, 0.95) hi FROM t GROUP BY k").fetchdf() \
        .set_index("k")
    vals = np.array(vs)
    keys = np.array(ks)
    for key in range(9):
        kv = vals[keys == key]
        lo = float(np.percentile(kv, 5, method="lower"))
        hi = float(np.percentile(kv, 95, method="lower"))
        if key == 0:  # q*n integral: lower == quantile_disc
            assert abs(lo - lim.loc[key, "lo"]) < 1e-12
            assert abs(hi - lim.loc[key, "hi"]) < 1e-12
        sub = got[got["key"] == key]
        assert (sub["lo"] == lo).all() and (sub["hi"] == hi).all()
        exp_w = np.clip(sub["value"].to_numpy(), lo, hi)
        assert (sub["value_w"].to_numpy() == exp_w).all()
    # clipping must actually fire on the outliers
    assert (got["value_w"] != got["value"]).sum() > 0


def test_winsorize_degenerate_and_full_range(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.winsorize import winsorize_per_key

    rows = [{"k": 1, "rid": 1, "v": 42.0}] + \
        [{"k": 2, "rid": 10 + i, "v": float(i)} for i in range(5)]
    # q 0..1 keeps everything
    got = _collect(winsorize_per_key(
        rd.from_items(rows), key_col="k", id_col="rid",
        val_col="v", q_lo=0.0, q_hi=1.0))
    assert (got["value_w"] == got["value"]).all()
    one = got[got["key"] == 1]
    assert one["lo"].iloc[0] == 42.0 and one["hi"].iloc[0] == 42.0

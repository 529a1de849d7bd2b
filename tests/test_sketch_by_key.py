import numpy as np
import pyarrow as pa


def _map(ds, vcol):
    bs = [pa.table(b)
          for b in ds.iter_batches(batch_format="pyarrow")]
    if not bs:
        return {}
    t = pa.concat_tables(bs)
    return dict(zip(t["key"].to_pylist(), t[vcol].to_pylist()))


def test_approx_distinct_by_key_vs_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from osm_cut_ray.stages.sketch_by_key import \
        approx_distinct_by_key

    rng = np.random.default_rng(6)
    n = 60_000
    key = rng.integers(0, 20, n).astype(np.int64)
    # distinct cardinality varies with the key
    val = (rng.integers(0, 1, n) if False else
           rng.integers(0, 1_000_000, n))
    val = np.where(key < 5, val % (10 + key * 7), val)
    ds = rd.from_arrow(pa.table({
        "k": pa.array(key), "v": pa.array(val)})).repartition(16)
    got = _map(approx_distinct_by_key(ds, key_col="k",
                                      value_col="v"),
               "distinct_est")

    con = duckdb.connect()
    con.register("t", pa.table({"k": pa.array(key),
                                "v": pa.array(val)}))
    want = dict(con.execute(
        "SELECT k, count(DISTINCT v) FROM t GROUP BY k").fetchall())
    assert set(got) == set(want)
    for k in want:
        err = abs(got[k] - want[k]) / max(want[k], 1)
        assert err <= 0.05, (k, got[k], want[k])
    # bit-determinism under repartitioning (register max is
    # order-free)
    got2 = _map(approx_distinct_by_key(ds.repartition(3),
                                       key_col="k", value_col="v"),
                "distinct_est")
    assert got2 == got


def test_approx_distinct_string_values(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.sketch_by_key import \
        approx_distinct_by_key

    rows = [{"k": i % 3, "v": f"doc-{i % (50 * (1 + i % 3))}"}
            for i in range(9000)]
    ds = rd.from_items(rows).repartition(7)
    got = _map(approx_distinct_by_key(ds, key_col="k",
                                      value_col="v"),
               "distinct_est")
    want = {}
    for r in rows:
        want.setdefault(r["k"], set()).add(r["v"])
    for k in want:
        err = abs(got[k] - len(want[k])) / len(want[k])
        assert err <= 0.05


def test_approx_quantiles_by_key_rank_error(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.sketch_by_key import \
        approx_quantiles_by_key

    rng = np.random.default_rng(8)
    n = 40_000
    key = rng.integers(0, 4, n).astype(np.int64)
    val = rng.lognormal(0, 1.5, n)
    ds = rd.from_arrow(pa.table({
        "k": pa.array(key), "v": pa.array(val)})).repartition(9)
    qs = [0.1, 0.5, 0.9]
    got = _map(approx_quantiles_by_key(ds, key_col="k",
                                       value_col="v", qs=qs),
               "quantiles")
    for k in range(4):
        sv = np.sort(val[key == k])
        for q, est in zip(qs, got[k]):
            # rank error <= 3% of the key's population
            rank = np.searchsorted(sv, est) / len(sv)
            assert abs(rank - q) <= 0.03, (k, q, rank)


def test_sketch_by_key_empty(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.sketch_by_key import (
        approx_distinct_by_key, approx_quantiles_by_key)

    t = pa.table({"k": pa.array([], pa.int64()),
                  "v": pa.array([], pa.int64())})
    ds = rd.from_arrow(t)
    assert approx_distinct_by_key(ds, key_col="k",
                                  value_col="v").count() == 0
    assert approx_quantiles_by_key(ds, key_col="k", value_col="v",
                                   qs=[0.5]).count() == 0

import numpy as np
import pyarrow as pa


def _collect(ds):
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.to_pandas()


def test_skyline_matches_brute_and_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from osm_cut_ray.stages.skyline import skyline

    rng = np.random.default_rng(3)
    n = 800
    t = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "price": pa.array(np.round(rng.uniform(0, 100, n), 3)),
        "quality": pa.array(np.round(rng.uniform(0, 10, n), 3)),
        "weight": pa.array(np.round(rng.uniform(0, 5, n), 3))})
    # duplicates must both survive if undominated
    t = pa.concat_tables([t, t.slice(0, 5)])

    got = _collect(skyline(
        rd.from_arrow(t).repartition(16),
        {"price": "min", "quality": "max", "weight": "min"}))

    p = t["price"].to_numpy()
    q = t["quality"].to_numpy()
    w = t["weight"].to_numpy()
    keep = []
    for i in range(len(t)):
        dom = (p <= p[i]) & (q >= q[i]) & (w <= w[i]) \
            & ((p < p[i]) | (q > q[i]) | (w < w[i]))
        if not dom.any():
            keep.append(i)
    exp = t.take(pa.array(keep)).to_pandas()
    key = ["id", "price", "quality", "weight"]
    got_s = got.sort_values(key).reset_index(drop=True)
    exp_s = exp.sort_values(key).reset_index(drop=True)
    assert got_s.equals(exp_s)

    con = duckdb.connect()
    con.register("t", t)
    sql = con.execute(
        "SELECT id FROM t a WHERE NOT EXISTS (SELECT 1 FROM t b "
        "WHERE b.price <= a.price AND b.quality >= a.quality AND "
        "b.weight <= a.weight AND (b.price < a.price OR "
        "b.quality > a.quality OR b.weight < a.weight)) "
        "ORDER BY id").fetchall()
    assert sorted(got["id"].tolist()) == [r[0] for r in sql]


def test_skyline_2d_known(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.skyline import skyline

    t = pa.table({
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "x": pa.array([1.0, 2.0, 3.0, 1.0, 2.5]),
        "y": pa.array([3.0, 2.0, 1.0, 3.0, 2.5])})
    got = _collect(skyline(rd.from_arrow(t),
                           {"x": "min", "y": "min"}))
    # (1,3) twice (ids 1 and 4 identical, both kept), (2,2), (3,1);
    # (2.5, 2.5) dominated by (2,2)
    assert sorted(got["id"].tolist()) == [1, 2, 3, 4]


def test_skyline_raises_on_huge_frontier(ray_session):
    import pytest
    import ray.data as rd

    from osm_cut_ray.stages.skyline import skyline

    # perfectly anti-correlated: every row is on the frontier
    n = 300
    t = pa.table({
        "x": pa.array(np.arange(n, dtype=np.float64)),
        "y": pa.array(np.arange(n, dtype=np.float64)[::-1].copy())})
    with pytest.raises(RuntimeError, match="will not shrink"):
        skyline(rd.from_arrow(t).repartition(8),
                {"x": "min", "y": "min"}, max_driver_rows=50)

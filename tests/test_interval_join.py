import numpy as np
import pyarrow as pa


def _pairs(ds):
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return {(a, b): o for a, b, o in zip(
        t["a_id"].to_pylist(), t["b_id"].to_pylist(),
        t["overlap"].to_pylist())}


def _mk(rng, n, base, max_len, id0):
    s = rng.uniform(0, base, n)
    ln = rng.uniform(0, max_len, n)
    return pa.table({
        "id": pa.array(np.arange(id0, id0 + n, dtype=np.int64)),
        "start": pa.array(s),
        "end": pa.array(s + ln)})


def test_interval_join_matches_brute_and_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from osm_cut_ray.stages.interval_join import interval_join

    rng = np.random.default_rng(31)
    ta = _mk(rng, 300, 100.0, 5.0, 0)
    tb = _mk(rng, 400, 100.0, 3.0, 10_000)

    got = _pairs(interval_join(rd.from_arrow(ta),
                               rd.from_arrow(tb)))

    a_s = ta["start"].to_numpy()
    a_e = ta["end"].to_numpy()
    b_s = tb["start"].to_numpy()
    b_e = tb["end"].to_numpy()
    lo = np.maximum(a_s[:, None], b_s[None, :])
    hi = np.minimum(a_e[:, None], b_e[None, :])
    ia, ib = np.nonzero(lo <= hi)
    brute = {(int(ta["id"][i].as_py()), int(tb["id"][j].as_py())):
             float((hi - lo)[i, j]) for i, j in zip(ia, ib)}
    assert set(got) == set(brute)
    for k in brute:
        assert abs(got[k] - brute[k]) < 1e-12, k

    con = duckdb.connect()
    con.register("ta", ta)
    con.register("tb", tb)
    sql = con.execute(
        "SELECT ta.id, tb.id FROM ta JOIN tb ON "
        "ta.start <= tb.\"end\" AND tb.start <= ta.\"end\""
    ).fetchall()
    assert set(got) == {(int(a), int(b)) for a, b in sql}


def test_interval_join_touching_and_cell_widths(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.interval_join import interval_join

    ta = pa.table({"id": pa.array([1, 2], pa.int64()),
                   "start": pa.array([0.0, 10.0]),
                   "end": pa.array([5.0, 20.0])})
    tb = pa.table({"id": pa.array([7, 8], pa.int64()),
                   "start": pa.array([5.0, 30.0]),
                   "end": pa.array([12.0, 40.0])})
    for w in (0.75, 3.0, 50.0):
        got = _pairs(interval_join(rd.from_arrow(ta),
                                   rd.from_arrow(tb),
                                   cell_width=w))
        # touching at 5.0 counts with overlap 0; (2,7) overlaps 2
        assert set(got) == {(1, 7), (2, 7)}, w
        assert got[(1, 7)] == 0.0
        assert abs(got[(2, 7)] - 2.0) < 1e-12


def test_interval_join_caps_raise(ray_session):
    import pytest
    import ray.data as rd

    from osm_cut_ray.stages.interval_join import interval_join

    ta = pa.table({"id": pa.array([1], pa.int64()),
                   "start": pa.array([0.0]),
                   "end": pa.array([1000.0])})
    tb = pa.table({"id": pa.array([2], pa.int64()),
                   "start": pa.array([1.0]), "end": pa.array([2.0])})
    with pytest.raises(Exception, match="max_span_cells"):
        interval_join(rd.from_arrow(ta), rd.from_arrow(tb),
                      cell_width=0.5, max_span_cells=100) \
            .materialize()

    n = 50
    piles = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "start": pa.array(np.zeros(n)),
        "end": pa.array(np.ones(n))})
    with pytest.raises(Exception, match="max_cell_side"):
        interval_join(rd.from_arrow(piles), rd.from_arrow(piles),
                      cell_width=10.0, max_cell_side=10) \
            .materialize()

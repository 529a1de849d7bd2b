import numpy as np
import pyarrow as pa


def _collect(ds):
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.to_pandas().sort_values("id").reset_index(drop=True)


def _duck(t, k):
    import duckdb
    con = duckdb.connect()
    con.register("t", t)
    return con.execute(
        "SELECT id, v AS value, "
        "ROW_NUMBER() OVER w2 AS row_number, "
        "RANK() OVER w AS rank, "
        "DENSE_RANK() OVER w AS dense_rank, "
        "PERCENT_RANK() OVER w AS percent_rank, "
        f"NTILE({k}) OVER w2 AS ntile "
        "FROM t WINDOW w AS (ORDER BY v), w2 AS (ORDER BY v, id) "
        "ORDER BY id").fetchdf()


def test_global_rank_matches_duckdb(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.rank import global_rank

    rng = np.random.default_rng(19)
    n = 5000
    # heavy duplicates: values drawn from a small grid
    v = np.round(rng.normal(0, 3, n), 1)
    ids = rng.permutation(np.arange(n, dtype=np.int64) * 3 + 1)
    t = pa.table({"id": pa.array(ids), "v": pa.array(v)})
    exp = _duck(t, 7)

    outs = []
    for parts, buckets in ((4, 16), (13, 5)):
        got = _collect(global_rank(
            rd.from_arrow(t).repartition(parts), id_col="id",
            val_col="v", n_buckets=buckets, ntile_k=7))
        outs.append(got)
        assert len(got) == n
        for col in ("row_number", "rank", "dense_rank", "ntile"):
            assert np.array_equal(
                got[col].to_numpy(np.int64),
                exp[col].to_numpy(np.int64)), col
        assert np.allclose(got["percent_rank"].to_numpy(),
                           exp["percent_rank"].to_numpy())
    assert outs[0].equals(outs[1])  # bucket-count invariant


def test_global_rank_degenerates(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.rank import global_rank

    # all-equal values: rank 1 everywhere, row_number by id
    t = pa.table({"id": pa.array([5, 1, 9, 3], pa.int64()),
                  "v": pa.array([2.0] * 4)})
    got = _collect(global_rank(
        rd.from_arrow(t).repartition(2), id_col="id", val_col="v",
        n_buckets=4, ntile_k=2))
    assert (got["rank"] == 1).all()
    assert (got["dense_rank"] == 1).all()
    assert (got["percent_rank"] == 0.0).all()
    assert got.sort_values("row_number")["id"].tolist() == \
        [1, 3, 5, 9]
    assert _duck(t, 2)["ntile"].tolist() == \
        got["ntile"].tolist()

    # single row + nulls/NaNs excluded
    t2 = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                   "v": pa.array([4.0, None, float("nan")])})
    got2 = _collect(global_rank(
        rd.from_arrow(t2), id_col="id", val_col="v"))
    assert len(got2) == 1
    assert got2["percent_rank"].iloc[0] == 0.0
    assert got2["row_number"].iloc[0] == 1

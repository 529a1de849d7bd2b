import numpy as np
import pandas as pd
import pyarrow as pa


def _collect(ds):
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.to_pandas().sort_values("id").reset_index(drop=True)


def _mk(seed=13, n_keys=6, n_left=400, n_right=300,
        unique_right_ts=False):
    rng = np.random.default_rng(seed)
    lk = rng.integers(0, n_keys, n_left).astype(np.int64)
    lts = rng.integers(0, 1000, n_left).astype(np.int64)
    lid = np.arange(n_left, dtype=np.int64)
    rk = rng.integers(0, n_keys + 1, n_right).astype(np.int64)
    if unique_right_ts:
        seen = set()
        rts = []
        for k in rk:
            t = int(rng.integers(0, 1000))
            while (int(k), t) in seen:
                t = int(rng.integers(0, 1000))
            seen.add((int(k), t))
            rts.append(t)
        rts = np.array(rts, np.int64)
    else:
        rts = rng.integers(0, 1000, n_right).astype(np.int64)
    rid = np.arange(n_right, dtype=np.int64) + 10_000
    rv = rng.normal(0, 1, n_right)
    return (lk, lid, lts), (rk, rid, rts, rv)


def _dsets(left, right, parts):
    import ray.data as rd
    lds = rd.from_arrow(pa.table({
        "k": pa.array(left[0]), "lid": pa.array(left[1]),
        "ts": pa.array(left[2])})).repartition(parts)
    rds = rd.from_arrow(pa.table({
        "k": pa.array(right[0]), "rid": pa.array(right[1]),
        "ts": pa.array(right[2]),
        "v": pa.array(right[3])})).repartition(parts)
    return lds, rds


def _run(left, right, parts, strict=False):
    from osm_cut_ray.stages.asof_join import asof_join
    lds, rds = _dsets(left, right, parts)
    return _collect(asof_join(
        lds, rds, key_col="k", left_id_col="lid",
        left_ts_col="ts", right_id_col="rid", right_ts_col="ts",
        value_col="v", strict=strict))


def test_asof_matches_duckdb(ray_session):
    import duckdb

    left, right = _mk(unique_right_ts=True)
    got = _run(left, right, 7)

    con = duckdb.connect()
    con.register("l", pa.table({"k": left[0], "lid": left[1],
                                "ts": left[2]}))
    con.register("r", pa.table({"k": right[0], "rid": right[1],
                                "ts": right[2], "v": right[3]}))
    exp = con.execute(
        'SELECT l.lid id, l.k AS "key", l.ts ts, r.ts r_ts, '
        'r.v AS "value" '
        "FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.ts "
        "ORDER BY id").fetchdf()
    assert len(got) == len(exp) == len(left[1])
    assert np.array_equal(got["id"].to_numpy(),
                          exp["id"].to_numpy())
    for col in ("r_ts", "value"):
        g, e = got[col], exp[col]
        assert g.isna().equals(e.isna())
        m = ~g.isna()
        assert np.allclose(g[m].to_numpy(np.float64),
                           e[m].to_numpy(np.float64))


def test_asof_brute_duplicates_strict_and_partitions(ray_session):
    from osm_cut_ray.stages.asof_join import asof_join_brute

    left, right = _mk(seed=29, unique_right_ts=False)
    for strict in (False, True):
        exp = asof_join_brute(*left, *right, strict=strict) \
            .sort_values("id").reset_index(drop=True)
        outs = []
        for parts in (3, 11):
            got = _run(left, right, parts, strict=strict)
            outs.append(got)
            assert len(got) == len(exp)
            assert got["r_ts"].isna().equals(exp["r_ts"].isna())
            m = ~got["r_ts"].isna()
            assert np.array_equal(
                got.loc[m, "r_ts"].to_numpy(np.int64),
                exp.loc[m, "r_ts"].to_numpy(np.int64))
            assert np.allclose(
                got.loc[m, "value"].to_numpy(np.float64),
                exp.loc[m, "value"].to_numpy(np.float64))
        assert outs[0].equals(outs[1])


def test_asof_empty_right_and_timestamp_cols(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.asof_join import asof_join

    lds = rd.from_arrow(pa.table({
        "k": pa.array([1, 1], pa.int64()),
        "lid": pa.array([1, 2], pa.int64()),
        "ts": pa.array(pd.to_datetime(["2024-01-02", "2024-01-05"]))
    }))
    rds = rd.from_arrow(pa.table({
        "k": pa.array([1], pa.int64()),
        "rid": pa.array([7], pa.int64()),
        "ts": pa.array(pd.to_datetime(["2024-01-03"])),
        "v": pa.array([2.5])}))
    got = _collect(asof_join(
        lds, rds, key_col="k", left_id_col="lid", left_ts_col="ts",
        right_id_col="rid", right_ts_col="ts", value_col="v"))
    assert got["r_ts"].isna().tolist() == [True, False]
    assert got.loc[1, "value"] == 2.5

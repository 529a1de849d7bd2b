import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

SCALE = 1 << 20


def _corpus(rng, n=4000, n_keys=60):
    keys = rng.integers(0, n_keys, n).astype(np.int64)
    # include singleton + huge keys
    keys[:5] = np.arange(10_000, 10_005)
    y = np.round(rng.normal(3.0, 2.0, n), 4)
    return pd.DataFrame({"rid": np.arange(n, dtype=np.int64),
                         "key": keys, "y": y})


def _duck_oracle(df, m, loo):
    con = duckdb.connect()
    con.register("t", df)
    num = "CAST(s.sq - q.yq AS DOUBLE)/1048576.0" if loo \
        else "CAST(s.sq AS DOUBLE)/1048576.0"
    den = f"(s.cnt - 1 + {m})" if loo else f"(s.cnt + {m})"
    sql = f"""
    WITH q AS (SELECT rid, key, y,
                      CAST(ROUND(y * 1048576) AS BIGINT) AS yq FROM t),
         s AS (SELECT key, SUM(yq) AS sq, COUNT(*) AS cnt
               FROM q GROUP BY key),
         g AS (SELECT (CAST(SUM(yq) AS DOUBLE) / COUNT(*)) / 1048576.0
               AS prior FROM q)
    SELECT q.rid, ({num} + {m} * g.prior) / {den} AS te
    FROM q JOIN s USING (key) CROSS JOIN g
    """
    return {int(r[0]): float(r[1]) for r in con.execute(sql).fetchall()}


def test_target_encode_matches_duckdb_bitwise(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.target_encode import target_encode

    rng = np.random.default_rng(19)
    df = _corpus(rng)
    for loo, m, parts in ((True, 20.0, 7), (False, 5.0, 3)):
        ds = rd.from_arrow(
            pa.Table.from_pandas(df, preserve_index=False)
            .replace_schema_metadata(None)).repartition(parts)
        out = target_encode(ds, key_col="key", target_col="y",
                            m=m, loo=loo)
        tab = pa.concat_tables([b for b in out.iter_batches(
            batch_size=None, batch_format="pyarrow") if b.num_rows])
        assert tab.num_rows == len(df)
        oracle = _duck_oracle(df, m, loo)
        rid = tab["rid"].to_numpy(zero_copy_only=False)
        te = tab["te"].to_numpy(zero_copy_only=False)
        for r, v in zip(rid, te):
            assert v == oracle[int(r)], (loo, int(r))  # BIT-equal


def test_target_encode_loo_semantics(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.target_encode import target_encode

    # two keys: one with identical labels (loo mean == smoothed mix),
    # one singleton (loo encodes exactly the prior)
    df = pd.DataFrame({
        "rid": np.arange(5, dtype=np.int64),
        "key": np.array([1, 1, 1, 1, 2], np.int64),
        "y": np.array([4.0, 4.0, 4.0, 4.0, 0.0])})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)
                       .replace_schema_metadata(None))
    out = {r["rid"]: r["te"] for r in
           target_encode(ds, key_col="key", target_col="y",
                         m=2.0).take_all()}
    prior = 3.2  # (4*4 + 0) / 5
    exp_key1 = (3 * 4.0 + 2.0 * prior) / (4 - 1 + 2.0)
    assert abs(out[0] - exp_key1) < 1e-12
    assert abs(out[4] - prior) < 1e-12  # singleton -> pure prior


def test_target_encode_validates_m(ray_session):
    import pytest
    import ray.data as rd

    from osm_cut_ray.stages.target_encode import target_encode

    ds = rd.from_arrow(pa.table({"key": pa.array([1], pa.int64()),
                                 "y": pa.array([1.0])}))
    with pytest.raises(ValueError, match="m must be > 0"):
        target_encode(ds, key_col="key", target_col="y", m=0.0)

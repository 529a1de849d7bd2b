import numpy as np
import pandas as pd
import pyarrow as pa


def _synth(n=4000, seed=9):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "rid": np.arange(n, dtype=np.int64),
        "zipc": rng.integers(100, 140, n).astype(np.int64),
        "age_band": np.array(["18-25", "26-40", "41-65", "65+"],
                             object)[rng.integers(0, 4, n)],
        "diag": np.array(["a", "b", "c", "d", "e", "f"],
                         object)[rng.integers(0, 6, n)],
    })


def _groups_df(ds):
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.to_pandas().sort_values(["zipc", "age_band"]) \
        .reset_index(drop=True)


def test_qi_groups_match_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from osm_cut_ray.stages.anonymity import qi_groups

    df = _synth()
    ds = rd.from_pandas(df).repartition(7)
    got = _groups_df(qi_groups(ds, qi_cols=["zipc", "age_band"],
                               sensitive_col="diag"))
    exp = duckdb.sql(
        "SELECT zipc, age_band, count(*)::BIGINT AS group_size, "
        "count(DISTINCT diag)::BIGINT AS l_diversity "
        "FROM df GROUP BY 1, 2 ORDER BY 1, 2").df()
    assert len(got) == len(exp)
    assert (got["zipc"].to_numpy() == exp["zipc"].to_numpy()).all()
    assert (got["age_band"].to_numpy()
            == exp["age_band"].to_numpy()).all()
    assert (got["group_size"].to_numpy()
            == exp["group_size"].to_numpy()).all()
    assert (got["l_diversity"].to_numpy()
            == exp["l_diversity"].to_numpy()).all()


def test_report_matches_brute_and_partition_invariant(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.anonymity import k_anonymity_report

    df = _synth(n=2500, seed=3)
    gsz = df.groupby(["zipc", "age_band"])["rid"].size()
    ldv = df.groupby(["zipc", "age_band"])["diag"].nunique()
    k_thr, l_thr = 12, 3
    exp = {
        "n_rows": len(df),
        "n_groups": len(gsz),
        "k_anonymity": int(gsz.min()),
        "l_diversity": int(ldv.min()),
        "max_group": int(gsz.max()),
        "rows_at_risk": int(gsz[gsz < k_thr].sum()),
        "rows_low_diversity": int(gsz[ldv < l_thr].sum()),
    }
    for parts in (1, 11):
        ds = rd.from_pandas(df).repartition(parts)
        _groups, rep = k_anonymity_report(
            ds, qi_cols=["zipc", "age_band"], sensitive_col="diag",
            k_threshold=k_thr, l_threshold=l_thr)
        for key, v in exp.items():
            assert rep[key] == v, (parts, key, rep[key], v)


def test_no_sensitive_l_diversity_is_group_size(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.anonymity import qi_groups

    df = _synth(n=800, seed=5)
    ds = rd.from_pandas(df).repartition(5)
    got = _groups_df(qi_groups(ds, qi_cols=["zipc", "age_band"]))
    assert (got["l_diversity"] == got["group_size"]).all()


def test_suppress_below_k_matches_brute(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.anonymity import suppress_below_k

    df = _synth(n=1500, seed=21)
    k = 10
    keep_mask = df.groupby(["zipc", "age_band"])["rid"] \
        .transform("size") >= k
    exp_ids = set(df.loc[keep_mask, "rid"].tolist())
    ds = rd.from_pandas(df).repartition(9)
    out = suppress_below_k(ds, qi_cols=["zipc", "age_band"], k=k)
    got_ids = {r["rid"] for r in out.take_all()}
    assert got_ids == exp_ids
    # schema preserved (no helper column leaks)
    assert set(out.schema().base_schema.names) == set(df.columns)

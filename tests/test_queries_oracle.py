"""Mirror of the driver's correctness gate: run every queries() entry
at sf0.001 and compare with its oracle_sql() via DuckDB — row count,
column names, and order-insensitive value equality."""

import glob
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

# default sf0.001 (suite speed); the round-end gate mirror re-runs
# this file with GRAFT_ORACLE_SF=/root/testdata/sf0.01 — the driver's
# actual gate scale
SF_DIR = os.environ.get("GRAFT_ORACLE_SF", "/root/testdata/sf0.001")


def _duck(sf_dir):
    con = duckdb.connect()
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(f)[:-8]
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    return con


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd
    if isinstance(res, rd.Dataset):
        res = res.to_pandas()
    if isinstance(res, pa.Table):
        res = res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort")\
        .reset_index(drop=True)


def _query_names():
    from osm_cut_ray.pipelines.queries import ORACLES
    return sorted(ORACLES)


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(name, ray_session):
    from osm_cut_ray.pipelines.queries import ORACLES, QUERIES
    got = _canon(_to_df(QUERIES[name](SF_DIR)))
    con = _duck(SF_DIR)
    want = _canon(con.sql(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), \
        f"{name}: columns {list(got.columns)} vs {list(want.columns)}"
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            np.testing.assert_allclose(
                g.astype(float), w.astype(float), rtol=0, atol=0,
                err_msg=f"{name}.{c}")
        else:
            assert (g.astype(str) == w.astype(str)).all(), \
                f"{name}.{c} first diff at " \
                f"{np.argmax(g.astype(str) != w.astype(str))}"


def test_rows_only_queries_run(ray_session):
    from osm_cut_ray.pipelines.queries import ORACLES, QUERIES
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = _to_df(QUERIES[name](SF_DIR))
        assert len(df) >= 0 and len(df.columns) > 0, name


def test_entry_smoke(ray_session):
    import __ray_entry__ as E
    ds = E.entry()
    n = ds.count()
    assert n > 0
    assert "hex_8" in ds.schema().names and "s2_12" in ds.schema().names

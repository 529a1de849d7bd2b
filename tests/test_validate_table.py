"""Table-constraint audit — every count DuckDB-pinned on the real
sf0.001 tables plus a synthetic dirty table with planted violations."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray

from osm_cut_ray.stages.validate_table import validate_table

SF = "/root/testdata/sf0.001"


def _report(tbl):
    return {r["name"]: r for r in tbl.to_pylist()}


def test_clean_orders_duckdb_pinned(ray_session):
    orders = ray.data.read_parquet(f"{SF}/orders.parquet")
    customer = ray.data.read_parquet(f"{SF}/customer.parquet")
    rep = _report(validate_table(orders, [
        {"kind": "not_null", "column": "o_orderkey"},
        {"kind": "unique", "column": "o_orderkey"},
        {"kind": "range", "column": "o_totalprice", "min": 0.0},
        {"kind": "in_set", "column": "o_orderstatus",
         "values": ["O", "F", "P"]},
        {"kind": "regex", "column": "o_orderpriority",
         "pattern": r"^\d-"},
        {"kind": "ref_integrity", "column": "o_custkey",
         "ref": "customer", "ref_column": "c_custkey"},
        {"kind": "dtype", "column": "o_orderkey", "type": "int64"},
    ], ref_tables={"customer": customer}))

    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{SF}/orders.parquet')")
    con.execute(f"CREATE VIEW customer AS SELECT * FROM "
                f"read_parquet('{SF}/customer.parquet')")

    def one(sql):
        return con.execute(sql).fetchone()[0]

    n = one("SELECT count(*) FROM orders")
    assert rep["not_null:o_orderkey"]["checked"] == n
    assert rep["not_null:o_orderkey"]["violations"] == \
        one("SELECT count(*) FROM orders WHERE o_orderkey IS NULL")
    assert rep["unique:o_orderkey"]["violations"] == one(
        "SELECT count(o_orderkey) - count(DISTINCT o_orderkey) "
        "FROM orders")
    assert rep["range:o_totalprice"]["violations"] == one(
        "SELECT count(*) FROM orders WHERE o_totalprice < 0")
    assert rep["in_set:o_orderstatus"]["violations"] == one(
        "SELECT count(*) FROM orders WHERE o_orderstatus IS NOT NULL "
        "AND o_orderstatus NOT IN ('O','F','P')")
    assert rep["regex:o_orderpriority"]["violations"] == one(
        "SELECT count(*) FROM orders "
        "WHERE o_orderpriority IS NOT NULL "
        r"AND NOT regexp_matches(o_orderpriority, '^\d-')")
    assert rep["ref_integrity:o_custkey"]["violations"] == one(
        "SELECT count(*) FROM orders o WHERE o_custkey IS NOT NULL "
        "AND NOT EXISTS (SELECT 1 FROM customer c "
        "WHERE c.c_custkey = o.o_custkey)")
    assert rep["dtype:o_orderkey"]["passed"]
    assert all(r["passed"] == (r["violations"] == 0)
               for r in rep.values())


def _dirty_ds(parts=4):
    t = pa.table({
        "id": pa.array([1, 2, 2, 3, None, 5, 6, 7], pa.int64()),
        "score": pa.array([0.5, -1.0, 2.5, 0.1, 0.9, None, 1.5, 0.0]),
        "code": pa.array(["AB", "XY", "ab", None, "CD", "AB", "Z9",
                          "EF"]),
        "fk": pa.array([10, 11, 99, 10, None, 12, 98, 11],
                       pa.int64())})
    return ray.data.from_arrow(t).repartition(parts)


def _ref_ds():
    return ray.data.from_arrow(pa.table({
        "rid": pa.array([10, 11, 12, 13], pa.int64())}))


def test_dirty_table_planted_counts(ray_session):
    rep = _report(validate_table(_dirty_ds(), [
        {"kind": "not_null", "column": "id", "name": "nn"},
        {"kind": "unique", "column": "id", "name": "uq"},
        {"kind": "range", "column": "score", "min": 0.0, "max": 2.0,
         "name": "rg"},
        {"kind": "regex", "column": "code", "pattern": "^[A-Z]{2}$",
         "name": "rx"},
        {"kind": "in_set", "column": "code",
         "values": ["AB", "CD", "EF"], "name": "st"},
        {"kind": "ref_integrity", "column": "fk", "ref": "r",
         "ref_column": "rid", "name": "fk"},
        {"kind": "dtype", "column": "score", "type": "int64",
         "name": "dt"},
    ], ref_tables={"r": _ref_ds()}))
    assert (rep["nn"]["checked"], rep["nn"]["violations"]) == (8, 1)
    assert (rep["uq"]["checked"], rep["uq"]["violations"]) == (7, 1)
    assert (rep["rg"]["checked"], rep["rg"]["violations"]) == (7, 2)
    assert (rep["rx"]["checked"], rep["rx"]["violations"]) == (7, 2)
    assert (rep["st"]["checked"], rep["st"]["violations"]) == (7, 3)
    assert (rep["fk"]["checked"], rep["fk"]["violations"]) == (7, 2)
    assert rep["dt"]["violations"] == 1 and not rep["dt"]["passed"]


def test_partition_invariance(ray_session):
    cs = [{"kind": "not_null", "column": "id"},
          {"kind": "range", "column": "score", "min": 0.0}]
    a = validate_table(_dirty_ds(1), cs)
    b = validate_table(_dirty_ds(7), cs)
    assert a.equals(b)


def test_validation_errors(ray_session):
    ds = _dirty_ds()
    with pytest.raises(ValueError, match="unknown constraint"):
        validate_table(ds, [{"kind": "nope", "column": "id"}])
    with pytest.raises(ValueError, match="min and/or max"):
        validate_table(ds, [{"kind": "range", "column": "id"}])
    with pytest.raises(ValueError, match="ref_tables"):
        validate_table(ds, [{"kind": "ref_integrity", "column": "fk",
                             "ref": "missing", "ref_column": "rid"}])
    with pytest.raises(ValueError, match="pattern"):
        validate_table(ds, [{"kind": "regex", "column": "code"}])

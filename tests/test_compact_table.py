"""compact_table — value preservation, file sizing, and the sorted
layout that enables row-group pruning."""

import glob
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray

from osm_cut_ray.sources.tables import compact_table

SF = "/root/testdata/sf0.001"


def test_values_preserved_and_file_count(ray_session, tmp_path):
    out = str(tmp_path / "compacted")
    res = compact_table(f"{SF}/orders.parquet", out,
                        target_rows_per_file=4000)
    n = duckdb.sql(f"SELECT count(*) FROM "
                   f"read_parquet('{SF}/orders.parquet')").fetchone()[0]
    assert res["rows"] == n
    assert res["files"] == -(-n // 4000)
    same = duckdb.sql(
        f"SELECT count(*) FROM (SELECT * FROM "
        f"read_parquet('{SF}/orders.parquet') INTERSECT ALL "
        f"SELECT * FROM read_parquet('{out}/*.parquet'))").fetchone()[0]
    assert same == n


def test_sorted_layout_tightens_ranges(ray_session, tmp_path):
    out = str(tmp_path / "sorted")
    compact_table(f"{SF}/orders.parquet", out,
                  target_rows_per_file=300, sort_by="o_orderkey")
    files = sorted(glob.glob(os.path.join(out, "*.parquet")))
    assert len(files) > 1
    spans = []
    for f in files:
        t = pq.read_table(f, columns=["o_orderkey"])
        k = t["o_orderkey"].to_numpy()
        if len(k):
            spans.append((int(k.min()), int(k.max())))
    spans.sort()
    # key ranges are (near-)disjoint: each file covers a tight slice
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        assert a1 <= b0
    # vs the unsorted original: one file spanning everything
    total = (min(s[0] for s in spans), max(s[1] for s in spans))
    assert sum(s[1] - s[0] for s in spans) < (total[1] - total[0]) * 1.2


def test_column_pruned_compaction(ray_session, tmp_path):
    out = str(tmp_path / "slim")
    compact_table(f"{SF}/lineitem.parquet", out,
                  target_rows_per_file=100_000,
                  columns=["l_orderkey", "l_quantity"])
    t = pq.read_table(glob.glob(os.path.join(out, "*.parquet"))[0])
    assert t.column_names == ["l_orderkey", "l_quantity"]


def test_validation(ray_session, tmp_path):
    with pytest.raises(ValueError, match="target_rows"):
        compact_table(f"{SF}/orders.parquet", str(tmp_path / "x"),
                      target_rows_per_file=0)
    with pytest.raises(ValueError, match="sort_by"):
        compact_table(f"{SF}/orders.parquet", str(tmp_path / "y"),
                      sort_by="nope")

"""Snapshot diff vs a pure-Python to_pylist compare
(stages/diff.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from osm_cut_ray.sources.osm_fixture import (fixture_nodes,
                                             fixture_relations,
                                             fixture_ways)
from osm_cut_ray.stages.diff import diff_corpora, row_content_hashes


def brute_diff(old: pa.Table, new: pa.Table, id_col="id"):
    o = {r[id_col]: {k: v for k, v in r.items() if k != id_col}
         for r in old.to_pylist()}
    n = {r[id_col]: {k: v for k, v in r.items() if k != id_col}
         for r in new.to_pylist()}
    out = {}
    for i in o:
        if i not in n:
            out[i] = "removed"
        elif o[i] != n[i]:
            out[i] = "modified"
    for i in n:
        if i not in o:
            out[i] = "added"
    return out


def run_diff(old, new, **kw):
    ds = diff_corpora(rd.from_arrow(old).repartition(3),
                      rd.from_arrow(new), **kw)
    return {r["id"]: r["change"] for r in ds.take_all()}


def test_diff_nodes_modifications():
    old = fixture_nodes()
    rows = old.to_pylist()
    rows[0]["lat"] += 0.001                       # moved
    rows[1]["tags"] = [("amenity", "cafe")]       # tag changed
    removed = rows.pop(2)["id"]                   # removed
    rows.append({"id": 999, "lon": 1.0, "lat": 2.0,
                 "tags": []})                     # added
    new = pa.Table.from_pylist(rows, schema=old.schema)
    got = run_diff(old, new)
    assert got == brute_diff(old, new)
    assert got[removed] == "removed" and got[999] == "added"
    assert sorted(v for v in got.values()) == [
        "added", "modified", "modified", "removed"]


def test_diff_ways_and_relations_nested():
    for tbl, mutate in [
        (fixture_ways(), lambda r: r.__setitem__(
            "node_ids", list(reversed(r["node_ids"])))),
        (fixture_relations(), lambda r: r["members"].__setitem__(
            0, {**r["members"][0], "role": "inner"})),
    ]:
        rows = tbl.to_pylist()
        mutate(rows[0])  # reorder refs / change member role
        new = pa.Table.from_pylist(rows, schema=tbl.schema)
        got = run_diff(tbl, new)
        assert got == brute_diff(tbl, new)
        assert list(got.values()) == ["modified"]


def test_diff_unchanged_and_compare_cols():
    old = fixture_nodes()
    got = run_diff(old, old)
    assert got == {}
    got_u = run_diff(old, old, keep_unchanged=True)
    assert set(got_u.values()) == {"unchanged"}
    assert len(got_u) == len(old)
    # restrict compare to tags: a moved node counts as unchanged
    rows = old.to_pylist()
    rows[0]["lat"] += 5.0
    new = pa.Table.from_pylist(rows, schema=old.schema)
    assert run_diff(old, new, compare_cols=["tags"]) == {}
    assert run_diff(old, new) != {}


def test_diff_duplicate_id_raises():
    old = fixture_nodes()
    dup = pa.concat_tables([old, old.slice(0, 1)])
    with pytest.raises(Exception):
        run_diff(dup, old)


def test_row_hash_distinguishes_order_and_nulls():
    t1 = pa.table({"v": pa.array([[1, 2], [2, 1], [], None],
                                 pa.list_(pa.int64()))})
    h = row_content_hashes(t1)
    assert len(set(h.tolist())) == 4   # order + empty + null differ
    t2 = pa.table({"s": pa.array(["a", None, "", "b"])})
    h2 = row_content_hashes(t2)
    assert len(set(h2.tolist())) == 4
    # float canonicalization: -0.0 == +0.0, nan == nan
    t3 = pa.table({"f": pa.array([-0.0, float("nan")])})
    t4 = pa.table({"f": pa.array([0.0, float("nan")])})
    assert row_content_hashes(t3).tolist() == \
        row_content_hashes(t4).tolist()


def test_diff_large_randomized_invariance():
    rng = np.random.default_rng(3)
    n = 5000
    ids = np.arange(n, dtype=np.int64)
    vals = rng.integers(0, 100, n)
    txt = np.array([f"doc-{v % 37}" for v in vals], object)
    old = pa.table({"id": pa.array(ids), "v": pa.array(vals),
                    "s": pa.array(txt)})
    keep = rng.random(n) > 0.1
    ids2 = ids[keep]
    vals2 = vals[keep].copy()
    flip = rng.random(len(vals2)) < 0.2
    vals2[flip] += 1000
    new = pa.table({"id": pa.array(ids2), "v": pa.array(vals2),
                    "s": pa.array(txt[keep])})
    want = brute_diff(old, new)
    got = run_diff(old, new)
    assert got == want
    got2 = {r["id"]: r["change"] for r in diff_corpora(
        rd.from_arrow(old).repartition(11),
        rd.from_arrow(new).repartition(2)).take_all()}
    assert got2 == want

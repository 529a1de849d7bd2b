"""check_refs — complete fixture passes; planted dangling refs are
counted exactly per kind."""

import pyarrow as pa
import pytest

import ray

from osm_cut_ray.sources.osm_fixture import (fixture_nodes,
                                             fixture_relations,
                                             fixture_ways)
from osm_cut_ray.stages.osm_tools import check_refs


def _ds(tbl, parts=3):
    return ray.data.from_arrow(tbl).repartition(parts)


def test_complete_fixture_passes(ray_session):
    rep = check_refs(_ds(fixture_nodes()), _ds(fixture_ways()),
                     _ds(fixture_relations()))
    assert rep["complete"]
    assert rep["missing_way_node_refs"] == 0
    assert all(v == 0 for v in rep["missing_member_refs"].values())


def test_planted_dangles_counted(ray_session):
    nodes = fixture_nodes()
    # drop two nodes that ways reference
    way_refs = set()
    for refs in fixture_ways()["node_ids"].to_pylist():
        way_refs.update(refs)
    drop = sorted(way_refs)[:2]
    keep = pa.compute.invert(
        pa.compute.is_in(nodes["id"], value_set=pa.array(drop)))
    nodes_cut = nodes.filter(keep)
    rep = check_refs(_ds(nodes_cut), _ds(fixture_ways()),
                     _ds(fixture_relations()))
    assert not rep["complete"]
    n_refs = sum(r in set(drop)
                 for refs in fixture_ways()["node_ids"].to_pylist()
                 for r in refs)
    assert rep["missing_way_node_refs"] == n_refs
    assert rep["ways_affected"] >= 1
    assert set(rep["samples"]["way_node_refs"]) <= set(drop)
    # dropped nodes may also be relation node members
    exp_members = sum(
        m["type"] == "node" and m["ref"] in set(drop)
        for mem in fixture_relations()["members"].to_pylist()
        for m in (mem or []))
    assert rep["missing_member_refs"]["node"] == exp_members


def test_missing_relation_member(ray_session):
    rels = fixture_relations()
    # add a relation pointing at a nonexistent way and relation
    extra = {"id": 999999,
             "members": [
                 {"type": "way", "ref": 888888, "role": "outer"},
                 {"type": "relation", "ref": 777777, "role": ""}],
             "version": 1, "changeset": 1, "uid": 1, "user": "t",
             "timestamp": "2020-01-01T00:00:00Z", "tags": []}
    rows = rels.to_pylist() + [extra]
    aug = pa.Table.from_pylist(rows, schema=rels.schema)
    rep = check_refs(_ds(fixture_nodes()), _ds(fixture_ways()),
                     _ds(aug))
    assert rep["missing_member_refs"]["way"] == 1
    assert rep["missing_member_refs"]["relation"] == 1
    assert rep["samples"]["member_way"] == [888888]
    assert not rep["complete"]


def test_skip_relations_flag(ray_session):
    rep = check_refs(_ds(fixture_nodes()), _ds(fixture_ways()),
                     _ds(fixture_relations()), check_relations=False)
    assert rep["missing_member_refs"] == {}
    assert rep["complete"]

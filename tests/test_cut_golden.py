"""End-to-end golden cut tests — ported from the reference e2e suite
(/root/reference/test/processor_SUITE.erl:176-264, fixture 1.osm +
simple.poly). Comparison is order-insensitive row-set parity
(processor_SUITE.erl:104-109)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from osm_cut_ray.geometry.polygon import PolygonIndex
from osm_cut_ray.pipelines.cut import cut
from osm_cut_ray.sources.osm_fixture import (FIXTURE_POLY, fixture_nodes,
                                             fixture_relations, fixture_ways)


@pytest.fixture(scope="module")
def datasets(ray_session):
    return (rd.from_arrow(fixture_nodes()),
            rd.from_arrow(fixture_ways()),
            rd.from_arrow(fixture_relations()))


def _ways_as_dict(res):
    out = {}
    for row in res.ways.take_all():
        out[row["id"]] = list(row["node_ids"])
    return out


def _rels_as_dict(res):
    out = {}
    for row in res.relations.take_all():
        out[row["id"]] = sorted((m["type"], m["ref"]) for m in row["members"])
    return out


def test_complete_mode_golden(datasets):
    # processor_SUITE.erl:223-264: nodes {1,2,3,4}; way 1 FULL list
    # [1,2,3,4,1]; relations {1,2,4} with members [way 1], [node 4],
    # [relation 2].
    nodes, ways, rels = datasets
    poly = PolygonIndex.compile(FIXTURE_POLY)
    res = cut(nodes, ways, rels, poly, complete=True)

    assert sorted(res.node_ids.tolist()) == [1, 2, 3, 4]
    assert sorted(res.way_ids.tolist()) == [1]
    assert sorted(res.rel_ids.tolist()) == [1, 2, 4]
    assert _ways_as_dict(res) == {1: [1, 2, 3, 4, 1]}  # verbatim (M8)
    assert _rels_as_dict(res) == {
        1: [("way", 1)],
        2: [("node", 4)],
        4: [("relation", 2)],
    }
    kept_nodes = sorted(r["id"] for r in res.nodes.take_all())
    assert kept_nodes == [1, 2, 3, 4]


def test_noncomplete_mode_golden(datasets):
    # processor_SUITE.erl:176-218: nodes {1,2,3}; way 1 rewritten to
    # [1,2,3,1]; relation 1 with members [way 1] only.
    nodes, ways, rels = datasets
    poly = PolygonIndex.compile(FIXTURE_POLY)
    res = cut(nodes, ways, rels, poly, complete=False)

    assert sorted(res.node_ids.tolist()) == [1, 2, 3]
    assert sorted(res.way_ids.tolist()) == [1]
    assert sorted(res.rel_ids.tolist()) == [1]
    assert _ways_as_dict(res) == {1: [1, 2, 3, 1]}  # cut list (M8)
    assert _rels_as_dict(res) == {1: [("way", 1)]}


def test_rewrite_preserves_list_dtype(datasets):
    # ADVICE r1: rewritten list columns must keep list<T> (not drift to
    # large_list<T>) so both modes share the parquet-ingest schema
    nodes, ways, rels = datasets
    poly = PolygonIndex.compile(FIXTURE_POLY)
    c = cut(nodes, ways, rels, poly, complete=True)
    nc = cut(nodes, ways, rels, poly, complete=False)
    assert (nc.ways.schema().base_schema.field("node_ids").type
            == c.ways.schema().base_schema.field("node_ids").type)
    assert (nc.relations.schema().base_schema.field("members").type
            == c.relations.schema().base_schema.field("members").type)


def test_transitive_closure_depth(ray_session):
    # chain rel10 <- rel11 <- rel12 (parent contains child): all kept in
    # complete mode once the leaf matches; non-complete forward pass in
    # id order also resolves an ascending chain (child id < parent id).
    nodes = rd.from_arrow(fixture_nodes())
    ways = rd.from_arrow(fixture_ways())
    rels = rd.from_arrow(pa.table({
        "id": [10, 11, 12],
        "members": [
            [{"type": "node", "ref": 1, "role": ""}],
            [{"type": "relation", "ref": 10, "role": ""}],
            [{"type": "relation", "ref": 11, "role": ""}],
        ],
        "tags": [[], [], []],
    }, schema=rd.from_arrow(fixture_relations()).schema().base_schema))
    poly = PolygonIndex.compile(FIXTURE_POLY)
    res = cut(nodes, ways, rels, poly, complete=True)
    assert sorted(res.rel_ids.tolist()) == [10, 11, 12]
    # descending chain breaks the non-complete single-pass (order
    # sensitivity is reference behavior, non_complete.erl:90-105)
    rels_desc = rd.from_arrow(pa.table({
        "id": [10, 11, 12],
        "members": [
            [{"type": "relation", "ref": 11, "role": ""}],
            [{"type": "relation", "ref": 12, "role": ""}],
            [{"type": "node", "ref": 1, "role": ""}],
        ],
        "tags": [[], [], []],
    }, schema=rd.from_arrow(fixture_relations()).schema().base_schema))
    res_nc = cut(nodes, ways, rels_desc, poly, complete=False)
    assert sorted(res_nc.rel_ids.tolist()) == [12]
    res_c = cut(nodes, ways, rels_desc, poly, complete=True)
    assert sorted(res_c.rel_ids.tolist()) == [10, 11, 12]


def test_shuffle_semi_join_matches_broadcast(ray_session):
    from osm_cut_ray.stages import join as J
    rng = np.random.default_rng(5)
    left = rd.from_arrow(pa.table({
        "k": rng.integers(0, 200, 1000), "v": np.arange(1000)}))
    right = rd.from_arrow(pa.table({"k": rng.integers(0, 100, 300)}))
    via_shuffle = sorted(
        r["k"] for r in J.shuffle_semi_join_keys(left, right, "k").take_all())
    rk = np.unique(np.array([r["k"] for r in right.take_all()]))
    lk = np.unique(np.array([r["k"] for r in left.take_all()]))
    expected = sorted(np.intersect1d(lk, rk).tolist())
    assert via_shuffle == expected


def test_shuffle_inner_join(ray_session):
    from osm_cut_ray.stages import join as J
    left = rd.from_arrow(pa.table({"k": [1, 2, 2, 3], "a": [10, 20, 21, 30]}))
    right = rd.from_arrow(pa.table({"k": [2, 3, 4], "b": [200, 300, 400]}))
    got = sorted((r["k"], r["a"], r["b"])
                 for r in J.shuffle_inner_join(left, right, "k").take_all())
    assert got == [(2, 20, 200), (2, 21, 200), (3, 30, 300)]


def test_distributed_relation_closure_matches_driver(ray_session):
    """J4 escape hatch: the Dataset-join fixpoint must equal the
    driver worklist on a DEEP relation chain (depth 40) plus disjoint
    noise components."""
    import ray.data as rd
    from osm_cut_ray.pipelines.cut import close_relations_distributed
    # chain 0 <- 1 <- ... <- 40 (child, parent), seeds {0}; plus a
    # separate chain 100 <- 101 <- 102 with no seed
    child = list(range(40)) + [100, 101]
    parent = list(range(1, 41)) + [101, 102]
    edges = rd.from_arrow(pa.table({
        "child": np.array(child, np.int64),
        "parent": np.array(parent, np.int64)}))
    seeds = rd.from_arrow(pa.table({"rel_id": np.array([0], np.int64)}))
    got = close_relations_distributed(edges, seeds)
    assert got.tolist() == list(range(41))

    # driver fixpoint for comparison (same algorithm as cut())
    kept = {0}
    changed = True
    while changed:
        changed = False
        for c, p in zip(child, parent):
            if c in kept and p not in kept:
                kept.add(p)
                changed = True
    assert got.tolist() == sorted(kept)


def test_distributed_dup_clusters_match_driver(ray_session):
    """Min-label propagation must equal driver union-find on chains,
    stars and singleton pairs."""
    import ray.data as rd
    from osm_cut_ray.stages.dedup import dup_clusters, \
        dup_clusters_distributed
    rng = np.random.default_rng(11)
    # chain 0-1-2-...-15, star 100-{101..110}, random extra pairs
    a = list(range(15)) + [100] * 10 + rng.integers(200, 240, 20).tolist()
    b = list(range(1, 16)) + list(range(101, 111)) \
        + rng.integers(200, 240, 20).tolist()
    keep = [x != y for x, y in zip(a, b)]
    pairs = pa.table({
        "a_id": np.array(a, np.int64)[keep],
        "b_id": np.array(b, np.int64)[keep]})
    want = dup_clusters(pairs).to_pandas()
    got = dup_clusters_distributed(rd.from_arrow(pairs)).to_pandas()
    assert want.values.tolist() == got.values.tolist()


def test_distributed_fixpoints_raise_on_round_exhaustion(ray_session):
    """Both distributed fixpoints fail LOUDLY when max_rounds is too
    small for the component diameter / nesting depth — a silently
    partial result would diverge from the driver algorithms they are
    documented to equal (round-2 advice)."""
    import pytest
    import ray.data as rd
    from osm_cut_ray.pipelines.cut import close_relations_distributed
    from osm_cut_ray.stages.dedup import dup_clusters_distributed

    chain = pa.table({"a_id": np.arange(10, dtype=np.int64),
                      "b_id": np.arange(1, 11, dtype=np.int64)})
    with pytest.raises(RuntimeError, match="fixpoint"):
        dup_clusters_distributed(rd.from_arrow(chain), max_rounds=1)

    edges = rd.from_arrow(pa.table({
        "child": np.arange(5, dtype=np.int64),
        "parent": np.arange(1, 6, dtype=np.int64)}))
    seeds = rd.from_arrow(pa.table({"rel_id": np.array([0], np.int64)}))
    with pytest.raises(RuntimeError, match="fixpoint"):
        close_relations_distributed(edges, seeds, max_rounds=1)

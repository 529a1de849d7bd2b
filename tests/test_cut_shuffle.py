"""Shuffle-strategy cut must produce identical results to the
broadcast-strategy cut (same semantics, different join physics)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from osm_cut_ray.geometry.polygon import PolygonIndex
from osm_cut_ray.pipelines.cut import cut
from osm_cut_ray.pipelines.cut_shuffle import cut_shuffle
from osm_cut_ray.sources.osm_fixture import (FIXTURE_POLY, fixture_nodes,
                                             fixture_relations, fixture_ways)


def _ids(ds, col):
    return sorted(r[col] for r in ds.take_all())


@pytest.mark.parametrize("complete", [True, False])
def test_shuffle_cut_matches_broadcast_on_fixture(ray_session, complete):
    nodes = rd.from_arrow(fixture_nodes())
    ways = rd.from_arrow(fixture_ways())
    rels = rd.from_arrow(fixture_relations())
    poly = PolygonIndex.compile(FIXTURE_POLY)

    b = cut(nodes, ways, rels, poly, complete=complete)
    s = cut_shuffle(nodes, ways, rels, poly, complete=complete)

    assert _ids(s["node_ids"], "node_id") == sorted(b.node_ids.tolist())
    assert _ids(s["way_ids"], "way_id") == sorted(b.way_ids.tolist())
    assert _ids(s["rel_ids"], "rel_id") == sorted(b.rel_ids.tolist())

    # way node lists match (incl. the mode-divergent rewrite M8)
    b_ways = {r["id"]: list(r["node_ids"]) for r in b.ways.take_all()}
    s_ways = {r["id"]: list(r["node_ids"]) for r in s["ways"].take_all()}
    assert b_ways == s_ways

    # member projections match as (rel, type, ref, role) sets — roles
    # must survive the shuffle path's explode/regroup (ADVICE r1)
    b_mem = {(r["id"], m["type"], m["ref"], m["role"])
             for r in b.relations.take_all() for m in r["members"]}
    s_mem = {(r["rel_id"], m["type"], m["ref"], m["role"])
             for r in s["relation_members"].take_all()
             for m in r["members"]}
    assert b_mem == s_mem

    # payload columns survive the id semi-join
    assert _ids(s["nodes"], "id") == sorted(b.node_ids.tolist())


def test_shuffle_cut_matches_broadcast_on_corpus(ray_session):
    # bigger randomized corpus: 2000 nodes, 100 ways, relation chain
    rng = np.random.default_rng(17)
    n = 2000
    nodes = rd.from_arrow(pa.table({
        "id": np.arange(n, dtype=np.int64),
        "lon": rng.uniform(-180, 180, n),
        "lat": rng.uniform(-90, 90, n)}))
    way_ids = np.arange(100, dtype=np.int64)
    node_lists = [sorted(rng.choice(n, size=20, replace=False).tolist())
                  for _ in way_ids]
    ways = rd.from_arrow(pa.table({
        "id": way_ids, "node_ids": node_lists}))
    members = []
    for u in range(40):
        m = [{"type": "way", "ref": int(u), "role": f"outer{u % 3}"}]
        if u >= 5:
            m.append({"type": "relation", "ref": u - 5, "role": "sub"})
        members.append(m)
    rels = rd.from_arrow(pa.table({
        "id": np.arange(40, dtype=np.int64),
        "members": pa.array(members, pa.list_(pa.struct([
            ("type", pa.large_string()), ("ref", pa.int64()),
            ("role", pa.large_string())])))}))
    poly = PolygonIndex.compile(
        [("include", [(-60.0, -30.0), (60.0, -30.0), (60.0, 30.0),
                      (-60.0, 30.0)])])

    for complete in (True, False):
        b = cut(nodes, ways, rels, poly, complete=complete)
        s = cut_shuffle(nodes, ways, rels, poly, complete=complete)
        assert _ids(s["node_ids"], "node_id") == sorted(b.node_ids.tolist())
        assert _ids(s["way_ids"], "way_id") == sorted(b.way_ids.tolist())
        assert _ids(s["rel_ids"], "rel_id") == sorted(b.rel_ids.tolist())
        b_ways = {r["id"]: list(r["node_ids"]) for r in b.ways.take_all()}
        s_ways = {r["id"]: list(r["node_ids"])
                  for r in s["ways"].take_all()}
        assert b_ways == s_ways
        b_mem = {(r["id"], m["type"], m["ref"], m["role"])
                 for r in b.relations.take_all() for m in r["members"]}
        s_mem = {(r["rel_id"], m["type"], m["ref"], m["role"])
                 for r in s["relation_members"].take_all()
                 for m in r["members"]}
        assert b_mem == s_mem


_MEM_T = pa.list_(pa.struct([("type", pa.large_string()),
                             ("ref", pa.int64()),
                             ("role", pa.large_string())]))
_TAG_T = pa.list_(pa.struct([("k", pa.large_string()),
                             ("v", pa.large_string())]))


def _tiny_corpus(lons, way_lists, rel_members):
    n = len(lons)
    nodes = pa.table({"id": pa.array(range(n), pa.int64()),
                      "lon": pa.array(lons, pa.float64()),
                      "lat": pa.array([0.0] * n, pa.float64())})
    ways = pa.table({"id": pa.array(range(len(way_lists)), pa.int64()),
                     "node_ids": pa.array(way_lists,
                                          pa.list_(pa.int64()))})
    rels = pa.table({"id": pa.array(range(len(rel_members)), pa.int64()),
                     "members": pa.array(rel_members, _MEM_T),
                     "tags": pa.array([[]] * len(rel_members), _TAG_T)})
    return nodes, ways, rels


_DEGENERATE = {
    # nothing inside at all
    "zero_kept": _tiny_corpus(
        [10.0, 11.0, 12.0], [[0, 1], [1, 2]],
        [[{"type": "way", "ref": 0, "role": "w"}]]),
    # node 0 inside, ways reference only outside nodes, rel hits node 0
    "nodes_only": _tiny_corpus(
        [0.0, 10.0, 11.0], [[1, 2]],
        [[{"type": "node", "ref": 0, "role": "n"}]]),
    # nodes inside, ways kept, but no relation matches anything kept
    "no_rels": _tiny_corpus(
        [0.0, 1.0, 10.0], [[0, 1]],
        [[{"type": "node", "ref": 2, "role": "n"}]]),
    # relations table has ZERO rows
    "empty_rels": _tiny_corpus([0.0, 1.0, 10.0], [[0, 1]], []),
}


@pytest.mark.parametrize("case", sorted(_DEGENERATE))
def test_degenerate_corpora_both_strategies(ray_session, case):
    """Zero-kept edges (empty inside set / no kept ways / no kept or
    present relations) crashed cut_shuffle nondeterministically in Ray
    2.49: join aggregators drop zero-row blocks, so an empty or
    over-partitioned join side reaches Acero schema-less ("No match
    for key field"). Every join side is now count-short-circuited or
    data-size re-solidified (`_solid_ids`); broadcast `cut` also hit
    `pa.concat_tables([])` on a zero-row relations table. Both
    strategies must agree AND stream through a sink."""
    from osm_cut_ray.sources.sink import CollectSink, write_cut_result
    nt, wt, rt = _DEGENERATE[case]
    poly = PolygonIndex.compile(
        [("include", [(-5.0, -5.0), (5.0, -5.0), (5.0, 5.0),
                      (-5.0, 5.0)])])
    for complete in (True, False):
        nodes, ways, rels = (rd.from_arrow(nt), rd.from_arrow(wt),
                             rd.from_arrow(rt))
        b = cut(nodes, ways, rels, poly, complete=complete)
        s = cut_shuffle(nodes, ways, rels, poly, complete=complete)
        assert _ids(s["node_ids"], "node_id") == sorted(b.node_ids.tolist())
        assert _ids(s["way_ids"], "way_id") == sorted(b.way_ids.tolist())
        assert _ids(s["rel_ids"], "rel_id") == sorted(b.rel_ids.tolist())
        bsink, ssink = CollectSink(), CollectSink()
        assert write_cut_result(s, ssink) == write_cut_result(b, bsink)


def test_cut_auto_strategy_selection(ray_session):
    from osm_cut_ray.pipelines.cut import cut_auto
    nodes = rd.from_arrow(fixture_nodes())
    ways = rd.from_arrow(fixture_ways())
    rels = rd.from_arrow(fixture_relations())
    poly = PolygonIndex.compile(FIXTURE_POLY)

    strat_b, res_b = cut_auto(nodes, ways, rels, poly)
    assert strat_b == "broadcast"
    # force the cap below the input size -> the shuffle path, same result
    strat_s, res_s = cut_auto(nodes, ways, rels, poly,
                              broadcast_max_keys=1)
    assert strat_s == "shuffle"
    assert _ids(res_s["node_ids"], "node_id") == \
        sorted(res_b.node_ids.tolist())
    assert _ids(res_s["way_ids"], "way_id") == \
        sorted(res_b.way_ids.tolist())
    assert _ids(res_s["rel_ids"], "rel_id") == \
        sorted(res_b.rel_ids.tolist())


def test_noncomplete_forward_pass_member_visibility(ray_session):
    """Reference non-complete mode filters members against the set AT
    PROCESSING TIME (osm_process_non_complete.erl:90-105): a kept
    parent drops a member reference to a HIGHER-id kept relation.
    Complete mode re-projects at end-of-stream and keeps it."""
    nodes = rd.from_arrow(fixture_nodes())
    ways = rd.from_arrow(fixture_ways())
    schema = rd.from_arrow(fixture_relations()).schema().base_schema
    rels = rd.from_arrow(pa.table({
        "id": [10, 11, 12],
        "members": [
            [{"type": "node", "ref": 1, "role": ""}],
            [{"type": "node", "ref": 1, "role": ""},
             {"type": "relation", "ref": 12, "role": "fwd"},
             {"type": "relation", "ref": 10, "role": "bwd"}],
            [{"type": "node", "ref": 1, "role": ""}],
        ],
        "tags": [[], [], []],
    }, schema=schema))
    poly = PolygonIndex.compile(FIXTURE_POLY)

    def mem_of(res_or_dict):
        if isinstance(res_or_dict, dict):
            return {r["rel_id"]: sorted((m["type"], m["ref"])
                                        for m in r["members"])
                    for r in res_or_dict["relation_members"].take_all()}
        return {r["id"]: sorted((m["type"], m["ref"])
                                for m in r["members"])
                for r in res_or_dict.relations.take_all()}

    for engine in (cut, cut_shuffle):
        nc = engine(nodes, ways, rels, poly, complete=False)
        c = engine(nodes, ways, rels, poly, complete=True)
        # all three relations are kept in both modes (direct node hit)
        assert mem_of(nc)[11] == [("node", 1), ("relation", 10)]
        assert mem_of(c)[11] == [("node", 1), ("relation", 10),
                                 ("relation", 12)]


def test_cut_multi_matches_single_cuts(ray_session):
    """cut_multi: one shared scan over K regions == K independent
    cuts, both modes, per-region kept sets AND rewritten lists."""
    from osm_cut_ray.pipelines.cut_multi import cut_multi

    rng = np.random.default_rng(23)
    n = 1500
    nodes = rd.from_arrow(pa.table({
        "id": np.arange(n, dtype=np.int64),
        "lon": rng.uniform(-180, 180, n),
        "lat": rng.uniform(-90, 90, n)}))
    way_ids = np.arange(80, dtype=np.int64)
    node_lists = [sorted(rng.choice(n, size=15, replace=False).tolist())
                  for _ in way_ids]
    ways = rd.from_arrow(pa.table({
        "id": way_ids, "node_ids": node_lists}))
    members = []
    for u in range(30):
        m = [{"type": "way", "ref": int(u), "role": f"r{u % 3}"}]
        if u >= 4:
            m.append({"type": "relation", "ref": u - 4, "role": "sub"})
        members.append(m)
    rels = rd.from_arrow(pa.table({
        "id": np.arange(30, dtype=np.int64),
        "members": pa.array(members, _MEM_T)}))

    polys = [
        PolygonIndex.compile([("include", [(-120.0, -40.0), (0.0, -40.0),
                                           (0.0, 40.0), (-120.0, 40.0)])]),
        # overlaps region 0
        PolygonIndex.compile([("include", [(-30.0, -20.0), (100.0, -20.0),
                                           (100.0, 60.0), (-30.0, 60.0)])]),
        # with a hole
        PolygonIndex.compile([("include", [(100.0, -80.0), (175.0, -80.0),
                                           (175.0, -10.0), (100.0, -10.0)]),
                              ("exclude", [(120.0, -60.0), (150.0, -60.0),
                                           (150.0, -30.0),
                                           (120.0, -30.0)])]),
    ]

    for complete in (True, False):
        multi = cut_multi(nodes, ways, rels, polys, complete=complete)
        assert len(multi) == len(polys)
        for z, poly in enumerate(polys):
            single = cut(nodes, ways, rels, poly, complete=complete)
            assert sorted(multi[z].node_ids.tolist()) \
                == sorted(single.node_ids.tolist()), (complete, z)
            assert sorted(multi[z].way_ids.tolist()) \
                == sorted(single.way_ids.tolist()), (complete, z)
            assert sorted(multi[z].rel_ids.tolist()) \
                == sorted(single.rel_ids.tolist()), (complete, z)
            m_ways = {r["id"]: list(r["node_ids"])
                      for r in multi[z].ways.take_all()}
            s_ways = {r["id"]: list(r["node_ids"])
                      for r in single.ways.take_all()}
            assert m_ways == s_ways, (complete, z)
            m_mem = {(r["id"], m["type"], m["ref"], m["role"])
                     for r in multi[z].relations.take_all()
                     for m in r["members"]}
            s_mem = {(r["id"], m["type"], m["ref"], m["role"])
                     for r in single.relations.take_all()
                     for m in r["members"]}
            assert m_mem == s_mem, (complete, z)


def test_cut_multi_degenerate_zone(ray_session):
    """A zone with nothing inside must yield an EMPTY CutResult while
    its siblings are unaffected (the zero-row block class)."""
    from osm_cut_ray.pipelines.cut_multi import cut_multi

    rng = np.random.default_rng(29)
    n = 400
    nodes = rd.from_arrow(pa.table({
        "id": np.arange(n, dtype=np.int64),
        "lon": rng.uniform(-50, 50, n),
        "lat": rng.uniform(-50, 50, n)}))
    ways = rd.from_arrow(pa.table({
        "id": np.arange(20, dtype=np.int64),
        "node_ids": [sorted(rng.choice(n, 8, replace=False).tolist())
                     for _ in range(20)]}))
    rels = rd.from_arrow(pa.table({
        "id": np.array([0], np.int64),
        "members": pa.array([[{"type": "way", "ref": 0,
                               "role": "r"}]], _MEM_T)}))
    empty_zone = PolygonIndex.compile(
        [("include", [(160.0, 80.0), (170.0, 80.0), (170.0, 85.0),
                      (160.0, 85.0)])])
    full_zone = PolygonIndex.compile(
        [("include", [(-60.0, -60.0), (60.0, -60.0), (60.0, 60.0),
                      (-60.0, 60.0)])])
    for complete in (True, False):
        res = cut_multi(nodes, ways, rels, [empty_zone, full_zone],
                        complete=complete)
        assert len(res[0].node_ids) == 0
        assert len(res[0].way_ids) == 0
        assert len(res[0].rel_ids) == 0
        assert res[0].nodes.count() == 0
        assert len(res[1].node_ids) == n
        assert len(res[1].way_ids) == 20
        assert res[1].rel_ids.tolist() == [0]

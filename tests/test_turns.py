"""Turn-restriction routing — expanded graph pinned against an
independent networkx expansion; planted no_* / only_* detours."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from osm_cut_ray.stages.route import _edge_weight_cm
from osm_cut_ray.stages.turns import (directed_segments,
                                      parse_restrictions,
                                      restricted_distance, seg_way,
                                      turn_transitions)

# T-grid with a bypass: horizontal way 100 (1-2-3), spur 200 up
# (2-4), spur 300 down (2-5), bypass 400 (3-4)
NODES = {1: (0.0, 0.0), 2: (0.01, 0.0), 3: (0.02, 0.0),
         4: (0.01, 0.01), 5: (0.01, -0.01)}
WAYS = {100: [1, 2, 3], 200: [2, 4], 300: [2, 5], 400: [3, 4]}


def _nodes_ds():
    ids = sorted(NODES)
    return ray.data.from_arrow(pa.table({
        "id": pa.array(ids, pa.int64()),
        "lon": pa.array([NODES[i][0] for i in ids]),
        "lat": pa.array([NODES[i][1] for i in ids])}))


def _ways_ds():
    return ray.data.from_items(
        [{"id": w, "refs": r} for w, r in sorted(WAYS.items())])


def _rels_ds(rows):
    return ray.data.from_items(rows) if rows else \
        ray.data.from_items([{"tags": {}, "members": []}])


def _restr(kind, frm, via, to):
    return {"tags": {"type": "restriction", "restriction": kind},
            "members": [
                {"role": "from", "type": "way", "ref": frm},
                {"role": "via", "type": "node", "ref": via},
                {"role": "to", "type": "way", "ref": to}]}


def _w(a, b):
    return int(_edge_weight_cm(
        np.array([NODES[a][0]]), np.array([NODES[a][1]]),
        np.array([NODES[b][0]]), np.array([NODES[b][1]]))[0])


def _nx_restricted(source, target, restrictions):
    """Independent expansion: seg node = (way, i, dir)."""
    import networkx as nx
    segs = []
    for w, refs in WAYS.items():
        for i, (a, b) in enumerate(zip(refs[:-1], refs[1:])):
            segs.append((w, i, 0, a, b, _w(a, b)))
            segs.append((w, i, 1, b, a, _w(a, b)))
    no = {(r["from_way"], r["via_node"], r["to_way"])
          for r in restrictions if not r["only"]}
    only = {}
    for r in restrictions:
        if r["only"]:
            only.setdefault((r["from_way"], r["via_node"]),
                            set()).add(r["to_way"])
    g = nx.DiGraph()
    virt = "virt"
    for sw, si, sd, sa, sb, swt in segs:
        if sa == source:
            g.add_edge(virt, (sw, si, sd), weight=swt)
        for tw, ti, td, ta, tb, twt in segs:
            if sb != ta:
                continue
            key = (sw, sb)
            if key in only and tw not in only[key]:
                continue
            if (sw, sb, tw) in no:
                continue
            g.add_edge((sw, si, sd), (tw, ti, td), weight=twt)
    if source == target:
        return 0
    import math
    best = math.inf
    dist = nx.single_source_dijkstra_path_length(g, virt,
                                                 weight="weight") \
        if g.has_node(virt) else {}
    for sw, si, sd, sa, sb, swt in segs:
        if sb == target and (sw, si, sd) in dist:
            best = min(best, dist[(sw, si, sd)])
    return None if best is math.inf else int(best)


def _engine(restr_rows):
    segs = directed_segments(_ways_ds(), _nodes_ds()).materialize()
    restrictions = parse_restrictions(_rels_ds(restr_rows))
    trans = turn_transitions(segs, restrictions).materialize()
    return segs, trans, restrictions


def test_unrestricted_matches_expansion(ray_session):
    segs, trans, rs = _engine([])
    for s, t in [(1, 4), (1, 5), (3, 5), (4, 5), (1, 1)]:
        got = restricted_distance(segs, trans, s, t)
        assert got == _nx_restricted(s, t, rs), (s, t)


def test_no_turn_forces_detour(ray_session):
    base_segs, base_trans, _ = _engine([])
    base = restricted_distance(base_segs, base_trans, 1, 4)
    segs, trans, rs = _engine([_restr("no_left_turn", 100, 2, 200)])
    got = restricted_distance(segs, trans, 1, 4)
    exp = _nx_restricted(1, 4, rs)
    assert got == exp
    assert got > base  # forced around via way 400


def test_only_turn_blocks_others(ray_session):
    base_segs, base_trans, _ = _engine([])
    base15 = restricted_distance(base_segs, base_trans, 1, 5)
    segs, trans, rs = _engine(
        [_restr("only_straight_on", 100, 2, 100)])
    # 5 stays reachable only by looping 2-3-4-2 to arrive on way 200
    got15 = restricted_distance(segs, trans, 1, 5)
    assert got15 == _nx_restricted(1, 5, rs)
    assert got15 is not None and got15 > base15
    got14 = restricted_distance(segs, trans, 1, 4)
    assert got14 == _nx_restricted(1, 4, rs) and got14 is not None


def test_only_turn_unreachable_without_bypass(ray_session):
    # drop way 400: every arrival at node 2 is on way 100, so the
    # only_straight_on gate makes 5 genuinely unreachable
    global WAYS
    saved = WAYS
    WAYS = {k: v for k, v in WAYS.items() if k != 400}
    try:
        segs, trans, rs = _engine(
            [_restr("only_straight_on", 100, 2, 100)])
        assert restricted_distance(segs, trans, 1, 5) is None
        assert _nx_restricted(1, 5, rs) is None
    finally:
        WAYS = saved


def test_malformed_restrictions_skipped(ray_session, capsys):
    rows = [_restr("no_left_turn", 100, 2, 200)]
    rows.append({"tags": {"type": "restriction",
                          "restriction": "no_u_turn"},
                 "members": [{"role": "from", "type": "way",
                              "ref": 100}]})  # missing via/to
    rs = parse_restrictions(_rels_ds(rows))
    assert len(rs) == 1
    assert "skipped" in capsys.readouterr().out


def test_seg_pack_roundtrip_and_guard(ray_session):
    segs = directed_segments(_ways_ds(), _nodes_ds()).to_pandas()
    assert set(seg_way(segs["seg_id"].to_numpy())) == set(WAYS)
    big = ray.data.from_items(
        [{"id": 1 << 50, "refs": [1, 2]}])
    with pytest.raises(Exception, match="packed-id"):
        directed_segments(big, _nodes_ds()).materialize()

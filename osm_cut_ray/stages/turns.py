"""Turn-restriction-aware routing graph (OSM `type=restriction`
relations) via the edge-expanded (line) graph.

`route.way_edges` ignores turn restrictions — fine for reachability,
wrong for navigation. The standard fix: route over DIRECTED WAY
SEGMENTS instead of nodes. Each directed segment becomes a graph
node; a transition segment A -> segment B exists when A ends where B
starts; OSM restriction relations (`no_left_turn`, `no_u_turn`, ...
and the `only_*` family) delete transitions at their via node:

- no_*:   remove (from-way seg) -> (to-way seg) at via
- only_*: remove every (from-way seg) -> (seg NOT on to-way) at via

Packed segment ids: (way_id << 20) | (seg_idx << 1) | direction —
RAISES when way ids or segment counts exceed the packing range
(renumber first; the repo's `osm_tools.renumber_corpus` exists for
exactly this).

Ray-Data shape: segments are one map over ways with a bucketed
coordinate attach (reusing `route.way_edges`'s machinery via the
node-position pack); transitions are ONE bucketed fold on the shared
junction node (per-node in x out cross product, `max_node_degree`
RAISES on hub nodes); restrictions are driver-parsed (relations are
corpus-tiny) and applied as a broadcast ban filter — zero extra
shuffles. Routing reuses `route.sssp` unchanged on the expanded
graph via one virtual source node.

Pinned in tests/test_turns.py against networkx Dijkstra on an
independently expanded graph, with planted no_* / only_* detours.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_SEG_SHIFT = 20
_MAX_SEGS = 1 << (_SEG_SHIFT - 1)
_VIRTUAL = np.int64(-(1 << 62))


def _pack_seg(way: np.ndarray, seg: np.ndarray,
              rev: np.ndarray) -> np.ndarray:
    return (way << np.int64(_SEG_SHIFT)) | (seg << np.int64(1)) \
        | rev.astype(np.int64)


def seg_way(seg_id: np.ndarray) -> np.ndarray:
    """Packed segment id -> way id."""
    return np.asarray(seg_id, np.int64) >> np.int64(_SEG_SHIFT)


def directed_segments(ways_ds, nodes_ds, *, refs_col: str = "refs",
                      num_buckets: int = 64):
    """-> Dataset (seg_id, a, b, w): every way split into consecutive
    directed segments, BOTH directions, with int64-cm weights."""
    from .route import way_edges

    # way_edges already yields (src, dst, w, way_id, seg_idx)? It
    # yields (src, dst, w) — rebuild with way/seg provenance by
    # exploding refs here and reusing its weight kernel via a second
    # pass would duplicate logic; instead explode with provenance and
    # attach coordinates through the same packed-position columns.
    import pyarrow.compute as pc

    from .join import bucketed_attach_column
    from .route import _edge_weight_cm, _pack_pos, _unpack_pos

    def explode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"way": pa.array([], pa.int64()),
                             "seg": pa.array([], pa.int64()),
                             "a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        wid = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        col = t[refs_col].combine_chunks()
        lens = pc.fill_null(pc.list_value_length(col), 0)\
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)\
            .astype(np.int64)
        nseg = np.maximum(lens - 1, 0)
        if (wid >= (1 << (63 - _SEG_SHIFT))).any() \
                or (nseg >= _MAX_SEGS).any():
            raise ValueError(
                "directed_segments: way id or segment count exceeds "
                "the packed-id range — renumber_corpus first")
        off = np.concatenate(([0], np.cumsum(lens)))[:-1]
        w_rep = np.repeat(wid, nseg)
        s_idx = (np.arange(len(w_rep))
                 - np.repeat(np.concatenate(
                     ([0], np.cumsum(nseg)))[:-1], nseg))
        starts = np.repeat(off, nseg) + s_idx
        return pa.table({"way": w_rep, "seg": s_idx,
                         "a": flat[starts], "b": flat[starts + 1]})

    segs = ways_ds.map_batches(explode, batch_format="pyarrow")

    def pack_nodes(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(zero_copy_only=False).astype(np.float64)
        lat = t["lat"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"nid": t["id"].cast(pa.int64()),
                         "pos": pa.array(_pack_pos(lon, lat))})

    pos = nodes_ds.map_batches(pack_nodes, batch_format="pyarrow")\
        .materialize()
    segs = bucketed_attach_column(segs.materialize(), "a", pos, "nid",
                                  "pos", num_buckets=num_buckets)
    segs = segs.map_batches(
        lambda t: t.rename_columns(
            [c if c != "pos" else "pos_a" for c in t.column_names]),
        batch_format="pyarrow")
    segs = bucketed_attach_column(segs.materialize(), "b", pos, "nid",
                                  "pos", num_buckets=num_buckets)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"seg_id": pa.array([], pa.int64()),
                             "a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        la, fa = _unpack_pos(t["pos_a"].to_numpy(zero_copy_only=False)
                             .astype(np.int64))
        lb, fb = _unpack_pos(t["pos"].to_numpy(zero_copy_only=False)
                             .astype(np.int64))
        w = _edge_weight_cm(la, fa, lb, fb)
        way = t["way"].to_numpy(zero_copy_only=False).astype(np.int64)
        seg = t["seg"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        fwd = _pack_seg(way, seg, np.zeros(len(way), np.int64))
        rev = _pack_seg(way, seg, np.ones(len(way), np.int64))
        return pa.table({
            "seg_id": np.concatenate([fwd[keep], rev[keep]]),
            "a": np.concatenate([a[keep], b[keep]]),
            "b": np.concatenate([b[keep], a[keep]]),
            "w": np.concatenate([w[keep], w[keep]])})

    return segs.map_batches(finish, batch_format="pyarrow")


def parse_restrictions(rels_ds) -> list[dict]:
    """Driver-side parse of type=restriction relations (relations
    are corpus-tiny). -> [{kind, only, from_way, via_node, to_way}];
    malformed restrictions (missing roles, way-via) are skipped with
    a printed count, the osmium convention."""
    out, skipped = [], 0
    for row in rels_ds.take_all():
        tags = dict(row.get("tags") or {})
        if tags.get("type") != "restriction":
            continue
        r = tags.get("restriction") or ""
        frm = via = to = None
        for m in row.get("members") or []:
            role, typ, ref = m.get("role"), m.get("type"), int(m["ref"])
            if role == "from" and typ == "way":
                frm = ref
            elif role == "via" and typ == "node":
                via = ref
            elif role == "to" and typ == "way":
                to = ref
        if frm is None or via is None or to is None \
                or not (r.startswith("no_") or r.startswith("only_")):
            skipped += 1
            continue
        out.append({"kind": r, "only": r.startswith("only_"),
                    "from_way": frm, "via_node": via, "to_way": to})
    if skipped:
        print(f"parse_restrictions: {skipped} malformed/unsupported "
              "restriction relation(s) skipped")
    return out


def turn_transitions(segs_ds, restrictions: list[dict], *,
                     max_node_degree: int = 64,
                     num_buckets: int | None = None):
    """-> Dataset (src, dst, w): the edge-expanded graph. src/dst
    are packed seg ids; w = weight of the ENTERED segment. U-turns
    onto the same way segment's reverse are allowed unless a
    restriction bans them (data decides, not the engine)."""
    from .join import bucketed_group_apply

    no_set = set()
    only_map: dict[tuple[int, int], set[int]] = {}
    for r in restrictions:
        key = (r["from_way"], r["via_node"])
        if r["only"]:
            only_map.setdefault(key, set()).add(r["to_way"])
        else:
            no_set.add((r["from_way"], r["via_node"], r["to_way"]))
    via_nodes = {v for _, v, _ in no_set} \
        | {v for _, v in only_map}

    def tag(t: pa.Table) -> pa.Table:
        # each segment appears as IN at its end node and OUT at its
        # start node
        sid = t["seg_id"].to_numpy(zero_copy_only=False)
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        return pa.table({
            "node": np.concatenate([b, a]),
            "side": np.concatenate([np.zeros(len(sid), np.int8),
                                    np.ones(len(sid), np.int8)]),
            "seg_id": np.concatenate([sid, sid]),
            "w": np.concatenate([w, w])})

    tagged = segs_ds.map_batches(tag, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        out_s, out_d, out_w = [], [], []
        for node, ng in g.groupby("node", sort=True):
            side = ng["side"].to_numpy()
            ins = ng["seg_id"].to_numpy()[side == 0]
            outs = ng["seg_id"].to_numpy()[side == 1]
            outw = ng["w"].to_numpy()[side == 1]
            if len(ins) == 0 or len(outs) == 0:
                continue
            if len(ins) > max_node_degree \
                    or len(outs) > max_node_degree:
                raise ValueError(
                    f"turn_transitions: node {node} degree exceeds "
                    f"max_node_degree={max_node_degree}")
            iw = seg_way(ins)
            ow = seg_way(outs)
            src = np.repeat(ins, len(outs))
            dst = np.tile(outs, len(ins))
            w = np.tile(outw, len(ins))
            node_i = int(node)
            if node_i in via_nodes:
                # the per-pair Python check runs ONLY at restricted
                # junctions (corpus-sparse); every other node is a
                # pure vectorized cross product
                sw = np.repeat(iw, len(outs))
                dw = np.tile(ow, len(ins))
                allow = np.ones(len(src), bool)
                for j in range(len(src)):
                    key = (int(sw[j]), node_i)
                    if key in only_map \
                            and int(dw[j]) not in only_map[key]:
                        allow[j] = False
                    elif (int(sw[j]), node_i, int(dw[j])) in no_set:
                        allow[j] = False
                src, dst, w = src[allow], dst[allow], w[allow]
            out_s.append(src)
            out_d.append(dst)
            out_w.append(w)
        if not out_s:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        return pa.table({"src": np.concatenate(out_s),
                         "dst": np.concatenate(out_d),
                         "w": np.concatenate(out_w)})

    return bucketed_group_apply(tagged, "node", per_bucket,
                                num_buckets=num_buckets)


def restricted_distance(segs_ds, trans_ds, source_node: int,
                        target_node: int, *,
                        max_driver_edges: int = 5_000_000,
                        max_rounds: int = 64):
    """Exact turn-restricted shortest distance (int64 cm) between
    two junction nodes, or None if unreachable. One virtual source
    node + the EXISTING route.sssp over the expanded graph."""
    import ray

    from .route import sssp

    segs = segs_ds.materialize()

    def virt(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        sel = a == source_node
        return pa.table({"src": np.full(int(sel.sum()), _VIRTUAL),
                         "dst": t["seg_id"].to_numpy(
                             zero_copy_only=False)[sel],
                         "w": t["w"].to_numpy(
                             zero_copy_only=False)[sel]})

    virt_edges = segs.map_batches(virt, batch_format="pyarrow")
    full = trans_ds.union(virt_edges)
    res = sssp(full, [int(_VIRTUAL)],
               max_driver_edges=max_driver_edges,
               max_rounds=max_rounds)

    # arrival = min dist over segments ENTERING the target node
    enter = set()
    for t in segs.iter_batches(batch_size=None,
                               batch_format="pyarrow"):
        b = t["b"].to_numpy(zero_copy_only=False)
        enter.update(t["seg_id"].to_numpy(
            zero_copy_only=False)[b == target_node].tolist())
    if source_node == target_node:
        return 0
    best = None
    for t in res.iter_batches(batch_size=None,
                              batch_format="pyarrow"):
        nid = t["node_id"].to_numpy(zero_copy_only=False)
        dist = t["dist"].to_numpy(zero_copy_only=False)
        sel = np.isin(nid, np.fromiter(enter, np.int64,
                                       len(enter))) if enter \
            else np.zeros(len(nid), bool)
        if sel.any():
            m = int(dist[sel].min())
            best = m if best is None else min(best, m)
    return best

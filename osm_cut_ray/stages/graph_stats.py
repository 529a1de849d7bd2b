"""Exact triangle counting and local clustering coefficients — the
standard graph-statistics pass over road networks, co-occurrence
graphs and similarity graphs (community density, motif features).

Algorithm: compact-forward / node-iterator with degree orientation
(the public MapReduce formulation, Suri & Vassilvitskii 2011): orient
every undirected edge from its lower to its higher endpoint in the
total order (degree, node id); each node then emits wedges over PAIRS
of its out-neighbors, and a wedge is a triangle iff its closing pair
is itself an oriented edge. Orientation bounds every out-degree by
O(sqrt(m)), so wedge volume is O(m^1.5) even on power-law graphs —
the hub-safety argument — and each triangle is found EXACTLY once
(from its minimum-order apex).

Ray-Data shape: degree fold (one slim bucket pass) -> two bucketed
degree attaches -> per-source wedge emission (one bucket pass,
vectorized triu over each source's adjacency) -> wedge/edge match
(one bucket pass on the closing pair) -> per-node fold. Every
shuffled row is 2-3 int64s. A source whose out-degree exceeds
`max_out_degree` RAISES (the repo cap contract — at that point the
degree orientation has already failed, which signals a non-simple
input graph).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import join as J
from .join import bucketed_group_apply

_GOLD = np.uint64(0x9E3779B97F4A7C15)
_MIX = np.uint64(0xBF58476D1CE4E5B9)


def _canon_edges(edges_ds, src_col: str, dst_col: str):
    """Dedup to canonical undirected edges (lo < hi), self-loops
    dropped."""
    def canon(t: pa.Table) -> pa.Table:
        empty = pa.table({"lo": pa.array([], pa.int64()),
                          "hi": pa.array([], pa.int64()),
                          "ek": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        s = t[src_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = t[dst_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        if len(s) == 0:
            return empty
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        order = np.lexsort((hi, lo))
        lo, hi = lo[order], hi[order]
        first = np.concatenate(
            ([True], (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])))
        lo, hi = lo[first], hi[first]
        ek = ((lo.view(np.uint64) * _GOLD)
              ^ (hi.view(np.uint64) * _MIX)).view(np.int64)
        return pa.table({"lo": pa.array(lo), "hi": pa.array(hi),
                         "ek": pa.array(ek)})

    def dedup(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates(["lo", "hi"])
        return pa.table({
            "lo": pa.array(g["lo"].to_numpy(np.int64)),
            "hi": pa.array(g["hi"].to_numpy(np.int64))})

    rows = edges_ds.map_batches(canon, batch_format="pyarrow")
    return bucketed_group_apply(rows, "ek", dedup)


def triangle_stats(edges_ds, *, src_col: str = "src",
                   dst_col: str = "dst",
                   max_out_degree: int = 100_000):
    """-> (total_triangles: int, per_node: Dataset (node, degree,
    triangles, clustering)). clustering = 2T / (deg (deg - 1)), 0.0
    for degree < 2."""
    import ray.data as rd

    empty_out = rd.from_arrow(pa.table({
        "node": pa.array([], pa.int64()),
        "degree": pa.array([], pa.int64()),
        "triangles": pa.array([], pa.int64()),
        "clustering": pa.array([], pa.float64())}))
    edges, n_edges = J.solidify(_canon_edges(edges_ds, src_col,
                                             dst_col))
    if n_edges == 0:
        return 0, empty_out

    # degrees: each edge contributes to both endpoints
    def deg_rows(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        lo = t["lo"].to_numpy(zero_copy_only=False)
        hi = t["hi"].to_numpy(zero_copy_only=False)
        node = np.concatenate([lo, hi])
        uk, cnt = np.unique(node, return_counts=True)
        return pa.table({"node": pa.array(uk),
                         "n": pa.array(cnt.astype(np.int64))})

    def deg_fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "degree": pa.array([], pa.int64())})
        agg = g.groupby("node", as_index=False)["n"].sum()
        return pa.table({
            "node": pa.array(agg["node"].to_numpy(np.int64)),
            "degree": pa.array(agg["n"].to_numpy(np.int64))})

    degrees, _ = J.solidify(bucketed_group_apply(
        edges.map_batches(deg_rows, batch_format="pyarrow"),
        "node", deg_fold))
    degrees = degrees.materialize()

    dlo = degrees.map_batches(
        lambda t: t.rename_columns(["node", "deg_lo"]),
        batch_format="pyarrow")
    dhi = degrees.map_batches(
        lambda t: t.rename_columns(["node", "deg_hi"]),
        batch_format="pyarrow")
    with_lo, _ = J.solidify(J.bucketed_attach_column(
        edges, "lo", dlo, "node", "deg_lo"))
    with_deg, _ = J.solidify(J.bucketed_attach_column(
        with_lo, "hi", dhi, "node", "deg_hi"))

    # orient by (degree, id): src = lower-order endpoint
    def orient(t: pa.Table) -> pa.Table:
        empty = pa.table({"u": pa.array([], pa.int64()),
                          "v": pa.array([], pa.int64())})
        if len(t) == 0 or "lo" not in t.column_names:
            return empty
        lo = t["lo"].to_numpy(zero_copy_only=False)
        hi = t["hi"].to_numpy(zero_copy_only=False)
        delo = t["deg_lo"].to_numpy(zero_copy_only=False)
        dehi = t["deg_hi"].to_numpy(zero_copy_only=False)
        lo_first = (delo < dehi) | ((delo == dehi) & (lo < hi))
        u = np.where(lo_first, lo, hi)
        v = np.where(lo_first, hi, lo)
        return pa.table({"u": pa.array(u), "v": pa.array(v)})

    oriented, _ = J.solidify(
        with_deg.map_batches(orient, batch_format="pyarrow"))

    # wedges from each source's out-neighborhood
    def wedges(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "apex": pa.array([], pa.int64()),
                          "wk": pa.array([], pa.int64()),
                          "is_edge": pa.array([], pa.int8())})
        if len(g) == 0:
            return empty
        u = g["u"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(u[1:] != u[:-1]) + 1, [len(u)]))
        out_a, out_b, out_apex = [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            k = e - s
            if k > max_out_degree:
                raise ValueError(
                    f"node {u[s]} has oriented out-degree {k} > "
                    f"max_out_degree={max_out_degree}")
            if k < 2:
                continue
            nb = v[s:e]
            ai, bi = np.triu_indices(k, k=1)
            out_a.append(nb[ai])
            out_b.append(nb[bi])
            out_apex.append(np.full(len(ai), u[s], np.int64))
        if not out_a:
            return empty
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        apex = np.concatenate(out_apex)
        # canonical closing pair is unordered
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        wk = ((lo.view(np.uint64) * _GOLD)
              ^ (hi.view(np.uint64) * _MIX)).view(np.int64)
        return pa.table({"a": pa.array(lo), "b": pa.array(hi),
                         "apex": pa.array(apex),
                         "wk": pa.array(wk),
                         "is_edge": pa.array(
                             np.zeros(len(lo), np.int8))})

    wedge_rows, n_wedges = J.solidify(
        bucketed_group_apply(oriented, "u", wedges))

    def edge_rows(t: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "apex": pa.array([], pa.int64()),
                          "wk": pa.array([], pa.int64()),
                          "is_edge": pa.array([], pa.int8())})
        if len(t) == 0 or "lo" not in t.column_names:
            return empty
        lo = t["lo"].to_numpy(zero_copy_only=False)
        hi = t["hi"].to_numpy(zero_copy_only=False)
        wk = ((lo.view(np.uint64) * _GOLD)
              ^ (hi.view(np.uint64) * _MIX)).view(np.int64)
        return pa.table({"a": pa.array(lo), "b": pa.array(hi),
                         "apex": pa.array(
                             np.zeros(len(lo), np.int64)),
                         "wk": pa.array(wk),
                         "is_edge": pa.array(
                             np.ones(len(lo), np.int8))})

    def close_fold(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "tri": pa.array([], pa.int64())})
        if len(g) == 0:
            return empty
        is_e = g["is_edge"].to_numpy(np.int8) == 1
        if not is_e.any() or is_e.all():
            return empty
        edge_set = set(zip(g["a"].to_numpy(np.int64)[is_e].tolist(),
                           g["b"].to_numpy(np.int64)[is_e].tolist()))
        wa = g["a"].to_numpy(np.int64)[~is_e]
        wb = g["b"].to_numpy(np.int64)[~is_e]
        apex = g["apex"].to_numpy(np.int64)[~is_e]
        ok = np.fromiter(((a, b) in edge_set
                          for a, b in zip(wa.tolist(), wb.tolist())),
                         bool, len(wa))
        if not ok.any():
            return empty
        nodes = np.concatenate([apex[ok], wa[ok], wb[ok]])
        uk, cnt = np.unique(nodes, return_counts=True)
        return pa.table({"node": pa.array(uk),
                         "tri": pa.array(cnt.astype(np.int64))})

    def tri_fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "tri": pa.array([], pa.int64())})
        agg = g.groupby("node", as_index=False)["tri"].sum()
        return pa.table({
            "node": pa.array(agg["node"].to_numpy(np.int64)),
            "tri": pa.array(agg["tri"].to_numpy(np.int64))})

    # pad a zero row for every node so zero-triangle nodes survive
    # the (inner) attach below
    def zero_rows(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "tri": pa.array([], pa.int64())})
        return pa.table({
            "node": t["node"],
            "tri": pa.array(np.zeros(len(t), np.int64))})

    zeros = degrees.map_batches(zero_rows, batch_format="pyarrow")

    total = 0
    tri_full = None
    if n_wedges > 0:
        matched = wedge_rows.union(
            edges.map_batches(edge_rows, batch_format="pyarrow"))
        tri_partial, n_tri = J.solidify(
            bucketed_group_apply(matched, "wk", close_fold))
        if n_tri > 0:
            tri_per_node, _ = J.solidify(bucketed_group_apply(
                tri_partial, "node", tri_fold))
            import ray.data
            agg = tri_per_node.aggregate(
                ray.data.aggregate.Sum("tri", alias_name="s"))
            total = int(agg["s"] or 0) // 3
            tri_full, _ = J.solidify(bucketed_group_apply(
                tri_per_node.union(zeros), "node", tri_fold))
    if tri_full is None:
        tri_full, _ = J.solidify(zeros)

    trl = tri_full.map_batches(
        lambda t: t.rename_columns(["node", "triangles"]),
        batch_format="pyarrow").materialize()
    per_node = J.bucketed_attach_column(
        degrees, "node", trl, "node", "triangles",
    )

    def finish(t: pa.Table) -> pa.Table:
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "degree": pa.array([], pa.int64()),
                          "triangles": pa.array([], pa.int64()),
                          "clustering": pa.array([], pa.float64())})
        if len(t) == 0 or "node" not in t.column_names:
            return empty
        deg = t["degree"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        tri = np.asarray(
            t["triangles"].to_numpy(zero_copy_only=False))
        tri = np.where(np.isnan(tri.astype(np.float64)), 0,
                       tri).astype(np.int64)
        denom = deg * (deg - 1)
        cl = np.where(denom > 0, 2.0 * tri / np.maximum(denom, 1),
                      0.0)
        return pa.table({"node": t["node"],
                         "degree": pa.array(deg),
                         "triangles": pa.array(tri),
                         "clustering": pa.array(cl)})

    return total, per_node.map_batches(finish,
                                       batch_format="pyarrow")

"""Community detection by deterministic synchronous label
propagation (Raghavan, Albert, Kumara 2007 — "Near linear time
algorithm to detect community structures in large-scale networks"),
plus exact modularity (Newman 2004) for scoring the partition.

Documented update rule (the pinned spec, replayed by the brute test):
labels start as node ids; every round each node SIMULTANEOUSLY
computes the plurality winner — the smallest label among those with
the maximal vote count over {its own current label} ∪ {current labels
of all its neighbors} — and adopts min(current label, winner). The
monotone clamp makes labels strictly non-increasing integers, so the
fixpoint is GUARANTEED (synchronous LPA without it two-cycles even
with a self-vote — measured on a 400k-node planted-partition graph);
the min-label tie-break makes it deterministic and
partition-invariant (labels are int64 node ids, so every engine
agrees BIT-for-bit). Terminates when no label changes; RAISES on
`max_rounds` exhaustion (repo cap contract — the bound is label-chain
length, O(plurality-propagation depth), not a convergence gamble).

Engines, auto-selected like `stages/kcore.py:core_numbers`:

- **broadcast** (node count fits the driver): packed list-row
  adjacency built once + the label vector `ray.put` per round
  (~8 B/node); each round is ONE shuffle-free map over the packed
  rows and an n_nodes-row driver merge.
- **shuffle** (planet-scale fallback past `max_driver_nodes`): labels
  stay a Dataset; per round ONE bucketed attach of labels onto the
  directed adjacency + ONE bucketed per-node vote fold. Self rows
  ride the fold with an `is_self` marker, so the convergence test is
  an exact Sum of per-node `changed` flags — not a hash heuristic.

`modularity`: Q = Σ_c (e_c/m − (D_c/2m)²) from exact int64 counts
(e_c intra-community edges, D_c total degree of community c),
accumulated in sorted-label order on the driver — bit-deterministic;
pinned against networkx.algorithms.community.modularity.

Reference scope note: the reference engine (osm-cut) has no graph
analytics; this extends the repo's graph family (triangles, k-core,
pagerank/HITS, betweenness) with the partition-discovery op every
web-graph curation pipeline (domain clustering, link-farm detection)
reaches for at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from . import join as J
from .graph_stats import _canon_edges
from .join import bucketed_attach_column, bucketed_group_apply
from .kcore import _packed_adjacency


def _empty_out():
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "node": pa.array([], pa.int64()),
        "label": pa.array([], pa.int64())}))


def _vote_per_segment(row_id: np.ndarray, lab: np.ndarray,
                      n_rows: int) -> np.ndarray:
    """Winning label per dense row segment 0..n_rows-1: max vote
    count, ties -> smallest label. Fully vectorized: run-length
    counts under a (row, label) sort, then a (row, -count, label)
    lexsort whose first row per segment is the winner."""
    order = np.lexsort((lab, row_id))
    r, l = row_id[order], lab[order]
    if len(r) == 0:
        return np.zeros(n_rows, np.int64)
    new_run = np.concatenate(
        ([True], (r[1:] != r[:-1]) | (l[1:] != l[:-1])))
    starts = np.flatnonzero(new_run)
    cnt = np.diff(np.concatenate((starts, [len(r)])))
    rr, ll = r[starts], l[starts]
    o2 = np.lexsort((ll, -cnt, rr))
    rr2, ll2 = rr[o2], ll[o2]
    first = np.concatenate(([True], rr2[1:] != rr2[:-1]))
    out = np.zeros(n_rows, np.int64)
    out[rr2[first]] = ll2[first]
    return out


def _broadcast_loop(packed, max_rounds: int):
    head = pa.concat_tables([
        pa.table(b) for b in packed.map_batches(
            lambda t: pa.table({"node": t["node"]}),
            batch_format="pyarrow").iter_batches(
                batch_format="pyarrow")])
    keys = np.sort(head["node"].to_numpy(zero_copy_only=False)
                   .astype(np.int64))
    vals = keys.copy()  # labels start as node ids
    keys_ref = ray.put(keys)

    for _ in range(max_rounds):
        vals_ref = ray.put(vals)

        def round_map(t: pa.Table, _k=keys_ref, _v=vals_ref
                      ) -> pa.Table:
            if len(t) == 0 or "node" not in t.column_names:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "label": pa.array([], pa.int64())})
            k = ray.get(_k)
            vv = ray.get(_v)
            col = t["nbrs"].combine_chunks()
            if isinstance(col, pa.ChunkedArray):
                col = col.chunk(0)
            flat = col.flatten().to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            offs = col.offsets.to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            node = t["node"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            nbr_lab = vv[np.searchsorted(k, flat)]
            self_lab = vv[np.searchsorted(k, node)]
            lens = np.diff(offs)
            row_id = np.concatenate([
                np.repeat(np.arange(len(t), dtype=np.int64), lens),
                np.arange(len(t), dtype=np.int64)])
            lab = np.concatenate([nbr_lab, self_lab])
            win = _vote_per_segment(row_id, lab, len(t))
            win = np.minimum(win, self_lab)  # monotone clamp
            return pa.table({"node": t["node"],
                             "label": pa.array(win)})

        parts = packed.map_batches(round_map, batch_format="pyarrow")
        new = vals.copy()
        for b in parts.iter_batches(batch_format="pyarrow"):
            nn = b["node"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            ll = b["label"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            new[np.searchsorted(keys, nn)] = ll
        if np.array_equal(new, vals):
            import ray.data as rd
            return rd.from_arrow(pa.table({
                "node": pa.array(keys), "label": pa.array(vals)}))
        vals = new
    raise RuntimeError(
        f"label_propagation did not converge within max_rounds="
        f"{max_rounds}; raise the cap (the monotone clamp guarantees "
        "termination; the bound is the label-propagation chain "
        "length — O(10) on modular graphs, O(diameter) on paths)")


def _vote_fold(g: pd.DataFrame) -> pa.Table:
    if len(g) == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "label": pa.array([], pa.int64()),
                         "changed": pa.array([], pa.int64())})
    u = g["u"].to_numpy(np.int64)
    lab = g["lab"].to_numpy(np.int64)
    is_self = g["is_self"].to_numpy(np.int64)
    uu, inv = np.unique(u, return_inverse=True)
    win = _vote_per_segment(inv, lab, len(uu))
    old = np.zeros(len(uu), np.int64)
    sm = is_self == 1
    old[inv[sm]] = lab[sm]
    win = np.minimum(win, old)  # monotone clamp
    return pa.table({
        "node": pa.array(uu),
        "label": pa.array(win),
        "changed": pa.array((win != old).astype(np.int64))})


def _shuffle_loop(adj, n_edges: int, max_rounds: int):
    import ray.data

    def init_labels(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "label": pa.array([], pa.int64())})
        uu = np.unique(g["u"].to_numpy(np.int64))
        return pa.table({"node": pa.array(uu),
                         "label": pa.array(uu)})

    labels, n_nodes = J.solidify(
        bucketed_group_apply(adj, "u", init_labels))
    labels = labels.materialize()
    p_lab = max(1, min(J.cluster_parts(), n_nodes // 5000 + 1))
    p_adj = max(1, min(J.cluster_parts(), 2 * n_edges // 5000 + 1))

    for _ in range(max_rounds):
        el = labels.map_batches(
            lambda t: pa.table({"node": t["node"],
                                "nb_lab": t["label"]}),
            batch_format="pyarrow").materialize()
        with_lab = bucketed_attach_column(
            adj, "v", el, "node", "nb_lab").repartition(p_adj)
        nbr_rows = with_lab.map_batches(
            lambda t: pa.table({
                "u": t["u"],
                "lab": pa.compute.cast(t["nb_lab"], pa.int64()),
                "is_self": pa.array(
                    np.zeros(len(t), np.int64))})
            if len(t) and "u" in t.column_names
            else pa.table({"u": pa.array([], pa.int64()),
                           "lab": pa.array([], pa.int64()),
                           "is_self": pa.array([], pa.int64())}),
            batch_format="pyarrow")
        self_rows = labels.map_batches(
            lambda t: pa.table({
                "u": t["node"], "lab": t["label"],
                "is_self": pa.array(np.ones(len(t), np.int64))})
            if len(t) and "node" in t.column_names
            else pa.table({"u": pa.array([], pa.int64()),
                           "lab": pa.array([], pa.int64()),
                           "is_self": pa.array([], pa.int64())}),
            batch_format="pyarrow")
        votes = nbr_rows.union(self_rows)
        folded = bucketed_group_apply(votes, "u", _vote_fold) \
            .repartition(p_lab).materialize()
        agg = folded.aggregate(ray.data.aggregate.Sum(
            "changed", alias_name="c"))
        labels = folded.map_batches(
            lambda t: pa.table({"node": t["node"],
                                "label": t["label"]})
            if len(t) and "node" in t.column_names
            else pa.table({"node": pa.array([], pa.int64()),
                           "label": pa.array([], pa.int64())}),
            batch_format="pyarrow").materialize()
        if int(agg["c"] or 0) == 0:
            return labels
    raise RuntimeError(
        f"label_propagation did not converge within max_rounds="
        f"{max_rounds}; raise the cap (the monotone clamp guarantees "
        "termination; the bound is the label-propagation chain "
        "length — O(10) on modular graphs, O(diameter) on paths)")


def _both_directions(edges):
    def both(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "lo" not in t.column_names:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        lo = t["lo"].to_numpy(zero_copy_only=False)
        hi = t["hi"].to_numpy(zero_copy_only=False)
        return pa.table({
            "u": pa.array(np.concatenate([lo, hi])),
            "v": pa.array(np.concatenate([hi, lo]))})

    adj, _ = J.solidify(edges.map_batches(both,
                                          batch_format="pyarrow"))
    return adj.materialize()


def label_propagation(edges_ds, *, src_col: str = "src",
                      dst_col: str = "dst", max_rounds: int = 100,
                      engine: str = "auto",
                      max_driver_nodes: int = 50_000_000):
    """-> Dataset (node, label). Self-loops dropped, duplicate and
    reversed edges deduped (simple-graph semantics). engine:
    auto | broadcast | shuffle — auto picks broadcast while the
    per-node label vector (~16 B/node) fits the driver."""
    if engine not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"unknown engine {engine!r}")
    edges, n_edges = J.solidify(_canon_edges(edges_ds, src_col,
                                             dst_col))
    if n_edges == 0:
        return _empty_out()
    adj = _both_directions(edges)

    if engine == "shuffle":
        return _shuffle_loop(adj, n_edges, max_rounds)

    packed, n_nodes = _packed_adjacency(adj)
    if engine == "auto" and n_nodes > max_driver_nodes:
        return _shuffle_loop(adj, n_edges, max_rounds)
    return _broadcast_loop(packed, max_rounds)


def modularity(edges_ds, labels_ds, *, src_col: str = "src",
               dst_col: str = "dst", node_col: str = "node",
               label_col: str = "label",
               max_communities: int = 5_000_000) -> float:
    """Exact Newman modularity of the labeled partition:
    Q = Σ_c (e_c/m − (D_c/2m)²), e_c/D_c/m exact int64 counts,
    final float sum accumulated in sorted-label order (bit-det).
    Driver holds one (e_c, D_c) row per community; RAISES past
    `max_communities` (communities ≪ nodes on real graphs)."""
    edges, m = J.solidify(_canon_edges(edges_ds, src_col, dst_col))
    if m == 0:
        return 0.0
    lab = labels_ds.map_batches(
        lambda t: pa.table({
            "node": pa.compute.cast(t[node_col], pa.int64()),
            "lab": pa.compute.cast(t[label_col], pa.int64())})
        if len(t) and node_col in t.column_names
        else pa.table({"node": pa.array([], pa.int64()),
                       "lab": pa.array([], pa.int64())}),
        batch_format="pyarrow").materialize()

    # per-edge: attach both endpoint labels (two bucketed attaches)
    lab_a = lab.map_batches(
        lambda t: pa.table({"node": t["node"], "lab_lo": t["lab"]})
        if len(t) and "node" in t.column_names
        else pa.table({"node": pa.array([], pa.int64()),
                       "lab_lo": pa.array([], pa.int64())}),
        batch_format="pyarrow").materialize()
    lab_b = lab.map_batches(
        lambda t: pa.table({"node": t["node"], "lab_hi": t["lab"]})
        if len(t) and "node" in t.column_names
        else pa.table({"node": pa.array([], pa.int64()),
                       "lab_hi": pa.array([], pa.int64())}),
        batch_format="pyarrow").materialize()
    e2 = bucketed_attach_column(edges, "lo", lab_a, "node", "lab_lo")
    e2, _ = J.solidify(e2)
    e3 = bucketed_attach_column(e2, "hi", lab_b, "node", "lab_hi")

    # map-side partials: (lab, intra_cnt) on same-label edges
    def intra_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "lab_lo" not in t.column_names:
            return pa.table({"lab": pa.array([], pa.int64()),
                             "e": pa.array([], pa.int64()),
                             "d": pa.array([], pa.int64())})
        a = t["lab_lo"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = t["lab_hi"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        same = a == b
        # degree mass: each edge adds 1 to BOTH endpoint communities
        all_lab = np.concatenate([a, b])
        uu, cnt = np.unique(all_lab, return_counts=True)
        iu, icnt = np.unique(a[same], return_counts=True)
        e = np.zeros(len(uu), np.int64)
        e[np.searchsorted(uu, iu)] = icnt
        return pa.table({"lab": pa.array(uu), "e": pa.array(e),
                         "d": pa.array(cnt.astype(np.int64))})

    parts = e3.map_batches(intra_partial, batch_format="pyarrow")

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({"lab": pa.array([], pa.int64()),
                             "e": pa.array([], pa.int64()),
                             "d": pa.array([], pa.int64())})
        agg = g.groupby("lab", as_index=False).agg(
            e=("e", "sum"), d=("d", "sum"))
        return pa.table({
            "lab": pa.array(agg["lab"].to_numpy(np.int64)),
            "e": pa.array(agg["e"].to_numpy(np.int64)),
            "d": pa.array(agg["d"].to_numpy(np.int64))})

    per_c, n_c = J.solidify(bucketed_group_apply(parts, "lab", fold))
    if n_c > max_communities:
        raise RuntimeError(
            f"modularity: {n_c} communities exceeds max_communities="
            f"{max_communities}; raise the cap or coarsen labels")
    t = pa.concat_tables([pa.table(b) for b in per_c.iter_batches(
        batch_format="pyarrow")])
    if len(t) == 0:
        return 0.0
    e = t["e"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = t["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    lb = t["lab"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(lb)
    e, d = e[order], d[order]
    q = 0.0
    for ec, dc in zip(e.tolist(), d.tolist()):
        q += ec / m - (dc / (2.0 * m)) ** 2
    return q

"""Semi-supervised label spreading over an edge list.

The label-propagation step of graph-based semi-supervised learning
(Zhu & Ghahramani 2002, hard-clamp, FROZEN-frontier variant): seed
nodes carry known labels and NEVER change; each round, every
still-unlabeled node takes the majority label among its labeled
neighbors (ties -> smaller label id) and is then FROZEN — so the
labeling sweeps outward in BFS layers, terminates in <= diameter
rounds, and cannot oscillate. Compose with `knn_join` to label a
corpus from a small annotated subset through its similarity graph.

Distinct from `stages/community.py` (unsupervised, every node
floats) — here seeds are clamped and only the frontier moves.

100-TB shape (the scc/pagerank broadcast-partials family): the label
vector lives on the driver (bounded by `max_broadcast_nodes`,
RAISES); each round is ONE zero-shuffle pass over the edges emitting
per-block (node, label, votes) partials — bounded by block-unique
(dst, label) pairs, labels bounded by `max_labels` (RAISES) — merged
driver-side into the dense (n, k) vote matrix. Deterministic:
round-synchronous updates, (votes desc, label asc) winners.

Edges are treated as DIRECTED influence (src's label votes on dst);
pass both directions for an undirected graph. Pinned against a
pure-Python replay in tests/test_label_spread.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def label_spread(edges_ds, seeds_ds, *, src_col: str = "src",
                 dst_col: str = "dst", node_col: str = "node",
                 label_col: str = "label",
                 max_rounds: int = 64,
                 max_broadcast_nodes: int = 50_000_000,
                 max_labels: int = 1024):
    """-> Dataset (node, label, is_seed): every node reachable from
    a seed labeled; unreached nodes keep label -1."""
    import ray

    def uniq(t: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            t[src_col].to_numpy(zero_copy_only=False).astype(np.int64),
            t[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)]))
        return pa.table({"n": u})

    parts = [t["n"].to_numpy(zero_copy_only=False)
             for t in edges_ds.map_batches(
                 uniq, batch_format="pyarrow").iter_batches(
                     batch_size=None, batch_format="pyarrow")
             if t.num_rows]
    nodes = np.unique(np.concatenate(parts)) if parts \
        else np.zeros(0, np.int64)
    if len(nodes) > max_broadcast_nodes:
        raise ValueError(
            f"label_spread: {len(nodes)} nodes > max_broadcast_nodes="
            f"{max_broadcast_nodes}")
    n = len(nodes)

    seed_rows = seeds_ds.select_columns([node_col, label_col])\
        .take_all()
    seed_nodes = np.array([r[node_col] for r in seed_rows], np.int64)
    seed_labels = np.array([r[label_col] for r in seed_rows], np.int64)
    if len(seed_nodes) == 0:
        raise ValueError("label_spread: empty seed set")
    if len(np.unique(seed_nodes)) != len(seed_nodes):
        raise ValueError("label_spread: duplicate seed nodes")
    classes = np.unique(seed_labels)
    if len(classes) > max_labels:
        raise ValueError(
            f"label_spread: {len(classes)} labels > max_labels="
            f"{max_labels} — the vote matrix is n x k")
    k = len(classes)
    cls_of = np.searchsorted(classes, seed_labels)

    label = np.full(n, -1, np.int64)       # class INDEX, -1 unknown
    pos = np.searchsorted(nodes, seed_nodes)
    ok = (pos < n) & (nodes[np.minimum(pos, max(n - 1, 0))]
                      == seed_nodes) if n else np.zeros(0, bool)
    # seeds outside the edge universe are kept in the OUTPUT but
    # cannot influence anything (no edges touch them)
    label[pos[ok]] = cls_of[ok]
    is_seed = np.zeros(n, bool)
    is_seed[pos[ok]] = True

    edges_ds = edges_ds.materialize()
    nref = ray.put(nodes)

    for _ in range(max_rounds):
        lref = ray.put(label)

        def votes(t: pa.Table) -> pa.Table:
            nd = ray.get(nref)
            lab = ray.get(lref)
            su = np.searchsorted(
                nd, t[src_col].to_numpy(zero_copy_only=False)
                .astype(np.int64))
            dv = np.searchsorted(
                nd, t[dst_col].to_numpy(zero_copy_only=False)
                .astype(np.int64))
            sl = lab[su]
            sel = (sl >= 0) & (lab[dv] < 0)  # labeled -> unlabeled
            if not sel.any():
                return pa.table({"pos": pa.array([], pa.int64()),
                                 "cls": pa.array([], pa.int64()),
                                 "v": pa.array([], pa.int64())})
            key = dv[sel] * np.int64(k) + sl[sel]
            u, cnt = np.unique(key, return_counts=True)
            return pa.table({"pos": (u // k).astype(np.int64),
                             "cls": (u % k).astype(np.int64),
                             "v": cnt.astype(np.int64)})

        vm = np.zeros((n, k), np.int64)
        any_votes = False
        for t in edges_ds.map_batches(votes, batch_format="pyarrow")\
                .iter_batches(batch_size=None,
                              batch_format="pyarrow"):
            if t.num_rows:
                any_votes = True
                np.add.at(vm,
                          (t["pos"].to_numpy(zero_copy_only=False),
                           t["cls"].to_numpy(zero_copy_only=False)),
                          t["v"].to_numpy(zero_copy_only=False))
        if not any_votes:
            break
        tot = vm.sum(axis=1)
        # (votes desc, label asc) winner — argmax takes the first max
        winner = vm.argmax(axis=1)
        newly = (label < 0) & (tot > 0)
        if not newly.any():
            break
        label[newly] = winner[newly]

    # output: graph nodes + off-graph seeds
    off = seed_nodes[~ok] if n else seed_nodes
    off_cls = cls_of[~ok] if n else cls_of
    out_nodes = np.concatenate([nodes, off])
    out_label = np.concatenate(
        [np.where(label >= 0, classes[np.maximum(label, 0)], -1),
         classes[off_cls]])
    out_seed = np.concatenate([is_seed, np.ones(len(off), bool)])
    order = np.argsort(out_nodes, kind="stable")
    return ray.data.from_arrow(pa.table({
        "node": out_nodes[order],
        "label": out_label[order],
        "is_seed": out_seed[order]}))

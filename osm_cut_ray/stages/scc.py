"""Strongly connected components over a directed edge Dataset.

The missing sibling of `network.way_components` (weak components):
SCCs are the unit of link-graph analysis (a web-graph curation
pipeline contracts SCCs before rank propagation) and of turn-
restricted road reachability.

Engines (auto-selected like sssp's dual):

- driver: iterative Tarjan (explicit work stack, no recursion) on
  the collected edge list below `max_driver_edges` — exact, one
  pass.
- broadcast: the forward-max / backward-mark coloring fixpoint
  (Orzan-style FW-BW coloring) for graphs whose NODE VECTOR fits
  the driver while edges only stream: each round is ONE zero-shuffle
  map over the edge Dataset emitting per-block (dst, max-color)
  partials, merged driver-side with np.maximum.at — the
  pagerank-partials shape. Outer peeling rounds and inner
  propagation rounds are bounded by `max_rounds` and RAISE on
  exhaustion (descending-id chains peel one SCC per outer round —
  the documented worst case; Tarjan covers those below the edge
  cap).

Output: Dataset (node_id, scc_id) with scc_id = the MINIMUM node id
in the component — canonical, engine-independent, partition-
invariant. Pinned against networkx strongly_connected_components
and cross-engine bit-equality in tests/test_scc.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _tarjan(src: np.ndarray, dst: np.ndarray) -> dict[int, int]:
    """Iterative Tarjan -> {node: min-member scc id}."""
    nodes = np.unique(np.concatenate([src, dst]))
    n = len(nodes)
    s = np.searchsorted(nodes, src)
    d = np.searchsorted(nodes, dst)
    order = np.argsort(s, kind="stable")
    s_sorted, d_sorted = s[order], d[order]
    starts = np.searchsorted(s_sorted, np.arange(n))
    ends = np.searchsorted(s_sorted, np.arange(n) + 1)

    UNSET = -1
    idx = np.full(n, UNSET, np.int64)
    low = np.zeros(n, np.int64)
    on_stack = np.zeros(n, bool)
    stack: list[int] = []
    comp = np.full(n, UNSET, np.int64)
    counter = 0

    for root in range(n):
        if idx[root] != UNSET:
            continue
        work = [(root, int(starts[root]))]
        idx[root] = low[root] = counter
        counter += 1
        stack.append(root)
        on_stack[root] = True
        while work:
            v, pi = work[-1]
            advanced = False
            while pi < ends[v]:
                w = int(d_sorted[pi])
                pi += 1
                if idx[w] == UNSET:
                    work[-1] = (v, pi)
                    work.append((w, int(starts[w])))
                    idx[w] = low[w] = counter
                    counter += 1
                    stack.append(w)
                    on_stack[w] = True
                    advanced = True
                    break
                if on_stack[w]:
                    if idx[w] < low[v]:
                        low[v] = idx[w]
            if advanced:
                continue
            work.pop()
            if work:
                p = work[-1][0]
                if low[v] < low[p]:
                    low[p] = low[v]
            if low[v] == idx[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack[w] = False
                    members.append(w)
                    if w == v:
                        break
                root_id = int(nodes[min(members)])
                for m in members:
                    comp[m] = root_id
    return {int(nodes[i]): int(comp[i]) for i in range(n)}


def _edge_blocks(edges_ds, src_col: str, dst_col: str):
    for t in edges_ds.iter_batches(batch_size=None,
                                   batch_format="pyarrow"):
        if t.num_rows:
            yield (t[src_col].to_numpy(zero_copy_only=False)
                   .astype(np.int64),
                   t[dst_col].to_numpy(zero_copy_only=False)
                   .astype(np.int64))


def _scc_coloring(edges_ds, src_col: str, dst_col: str,
                  max_broadcast_nodes: int, max_rounds: int
                  ) -> pa.Table:
    """Broadcast FW-BW coloring. Node vector on the driver; every
    propagation round is one zero-shuffle pass over the edges with
    per-block maximum partials."""
    import ray

    # node universe via per-block unique partials
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
            f"scc: {len(nodes)} nodes > max_broadcast_nodes="
            f"{max_broadcast_nodes}; shard the graph or raise the cap")
    if len(nodes) == 0:
        return pa.table({"node_id": pa.array([], pa.int64()),
                         "scc_id": pa.array([], pa.int64())})
    n = len(nodes)
    edges_ds = edges_ds.materialize()
    nref = ray.put(nodes)
    SENT = np.int64(np.iinfo(np.int64).min)

    def fold_max(state: np.ndarray, active: np.ndarray,
                 direction: str) -> np.ndarray:
        """One propagation round, the kcore/pagerank broadcast shape:
        state + active vectors `ray.put` once per round, each edge
        block emits a SPARSE (pos, max) partial (bounded by its own
        unique targets), merged driver-side with np.maximum.at —
        zero shuffles."""
        sref, aref = ray.put(state), ray.put(active)

        def part(t: pa.Table) -> pa.Table:
            nd = ray.get(nref)
            st = ray.get(sref)
            act = ray.get(aref)
            su = t[src_col].to_numpy(zero_copy_only=False)\
                .astype(np.int64)
            dv = t[dst_col].to_numpy(zero_copy_only=False)\
                .astype(np.int64)
            ui = np.searchsorted(nd, su)
            vi = np.searchsorted(nd, dv)
            ok = act[ui] & act[vi]
            if direction == "fwd":
                tgt, val = vi[ok], st[ui[ok]]
            else:
                tgt, val = ui[ok], st[vi[ok]]
            if len(tgt) == 0:
                return pa.table({"pos": pa.array([], pa.int64()),
                                 "val": pa.array([], pa.int64())})
            o = np.argsort(tgt, kind="stable")
            tt, vv = tgt[o], val[o]
            starts = np.concatenate(
                ([0], np.flatnonzero(tt[1:] != tt[:-1]) + 1))
            return pa.table({
                "pos": tt[starts].astype(np.int64),
                "val": np.maximum.reduceat(vv, starts)})

        upd = np.full(n, SENT, np.int64)
        for t in edges_ds.map_batches(part, batch_format="pyarrow")\
                .iter_batches(batch_size=None,
                              batch_format="pyarrow"):
            if t.num_rows:
                np.maximum.at(
                    upd,
                    t["pos"].to_numpy(zero_copy_only=False),
                    t["val"].to_numpy(zero_copy_only=False))
        return upd

    assigned = np.full(n, np.int64(-1), np.int64)
    active = np.ones(n, bool)
    outer = 0
    while active.any():
        outer += 1
        if outer > max_rounds:
            raise RuntimeError(
                f"scc: outer peeling exceeded max_rounds={max_rounds} "
                "(descending-id SCC chains peel slowly) — raise the "
                "cap or use the driver engine")
        # forward max-color fixpoint
        color = np.where(active, nodes, np.int64(np.iinfo(np.int64).min))
        for r in range(max_rounds + 1):
            if r == max_rounds:
                raise RuntimeError(
                    f"scc: forward propagation exceeded max_rounds="
                    f"{max_rounds}; raise the cap")
            upd = fold_max(color, active, "fwd")
            new = np.maximum(color, upd)
            if (new == color).all():
                break
            color = new
        # backward mark within equal color, seeded at roots
        root_mask = active & (color == nodes)
        mark = root_mask.copy()
        for r in range(max_rounds + 1):
            if r == max_rounds:
                raise RuntimeError(
                    f"scc: backward propagation exceeded max_rounds="
                    f"{max_rounds}; raise the cap")
            m_int = np.where(mark, color,
                             np.int64(np.iinfo(np.int64).min))
            upd = fold_max(m_int, active, "bwd")
            new_mark = mark | (upd == color)
            if (new_mark == mark).all():
                break
            mark = new_mark
        done = active & mark
        assigned[done] = color[done]
        active &= ~done

    # canonicalize: scc_id = min node id per color class
    order = np.argsort(assigned, kind="stable")
    a_sorted = assigned[order]
    n_sorted = nodes[order]
    starts = np.concatenate(
        ([0], np.flatnonzero(a_sorted[1:] != a_sorted[:-1]) + 1))
    mins = np.minimum.reduceat(n_sorted, starts)
    lens = np.diff(np.concatenate((starts, [n])))
    scc_min = np.repeat(mins, lens)
    out = np.empty(n, np.int64)
    out[order] = scc_min
    return pa.table({"node_id": pa.array(nodes),
                     "scc_id": pa.array(out)})


def scc(edges_ds, *, src_col: str = "src", dst_col: str = "dst",
        engine: str = "auto", max_driver_edges: int = 5_000_000,
        max_broadcast_nodes: int = 50_000_000, max_rounds: int = 64):
    """-> Dataset (node_id, scc_id): every node labeled with the min
    node id of its strongly connected component."""
    import ray

    if engine not in ("auto", "driver", "coloring"):
        raise ValueError(f"unknown engine {engine!r}")
    if engine in ("auto", "driver"):
        n_edges = edges_ds.count()
        if n_edges <= max_driver_edges:
            srcs, dsts = [], []
            for su, dv in _edge_blocks(edges_ds, src_col, dst_col):
                srcs.append(su)
                dsts.append(dv)
            if not srcs:
                return ray.data.from_arrow(pa.table({
                    "node_id": pa.array([], pa.int64()),
                    "scc_id": pa.array([], pa.int64())}))
            comp = _tarjan(np.concatenate(srcs), np.concatenate(dsts))
            keys = np.array(sorted(comp), np.int64)
            return ray.data.from_arrow(pa.table({
                "node_id": pa.array(keys),
                "scc_id": pa.array(
                    np.array([comp[int(k)] for k in keys], np.int64))}))
        if engine == "driver":
            raise ValueError(
                f"scc: {n_edges} edges > max_driver_edges="
                f"{max_driver_edges} for engine='driver'")
    tbl = _scc_coloring(edges_ds, src_col, dst_col,
                        max_broadcast_nodes, max_rounds)
    return ray.data.from_arrow(tbl)


def condense(edges_ds, scc_ds, *, src_col: str = "src",
             dst_col: str = "dst", num_buckets: int = 64):
    """Contract each SCC to one node: -> Dataset (src, dst) of
    DISTINCT inter-component edges (the condensation DAG). Two
    bucketed attaches + one distinct — edges never touch the
    driver."""
    from .join import bucketed_attach_column, distinct

    lab_src = scc_ds.map_batches(
        lambda t: pa.table({"node_id": t["node_id"],
                            "s_lab": t["scc_id"]}),
        batch_format="pyarrow")
    lab_dst = scc_ds.map_batches(
        lambda t: pa.table({"node_id": t["node_id"],
                            "d_lab": t["scc_id"]}),
        batch_format="pyarrow")
    e = edges_ds.map_batches(
        lambda t: pa.table({
            "su": t[src_col].cast(pa.int64()),
            "dv": t[dst_col].cast(pa.int64())}),
        batch_format="pyarrow")
    e = bucketed_attach_column(e, "su", lab_src, "node_id", "s_lab",
                               num_buckets=num_buckets)
    e = bucketed_attach_column(e, "dv", lab_dst, "node_id", "d_lab",
                               num_buckets=num_buckets)
    def keep_cross(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mask = pc.not_equal(t["s_lab"], t["d_lab"])
        kept = t.filter(mask)
        return pa.table({"src": kept["s_lab"], "dst": kept["d_lab"]})

    cross = e.map_batches(keep_cross, batch_format="pyarrow")
    return distinct(cross, ["src", "dst"])

"""k-core decomposition (core number per node) via the distributed
H-index fixpoint (Lü, Chen, Ren, Zhang, Zhou, Stanley 2016: "The
H-index of a network node and its relation to degree and coreness").

c_0(v) = degree(v); c_{t+1}(v) = H({c_t(u) : u in N(v)}) — the
H-index of the neighbor estimates (the largest h such that at least h
neighbors have estimate >= h). The sequence is pointwise monotone
non-increasing and converges exactly to the core number.

Two engines, auto-selected like `pipelines/cut.py:cut_auto`:

- **broadcast** (default for node counts that fit the driver): the
  adjacency is packed ONCE into one list<int64> row per node (rows
  are atomic under Ray block splits, so a node's neighborhood can
  never straddle blocks), and each round is ONE shuffle-free
  map_batches over the packed rows with the est vector in the object
  store (`ray.put` per round, ~8 B/node) + an n_nodes-row driver
  merge. This is the repo's pagerank shape (map-side partials merged
  driver-side, bit-deterministic under any partitioning).
- **shuffle** (planet-scale fallback, > `max_driver_nodes`): each
  round is one bucketed attach (neighbor est onto the directed
  adjacency) + one bucketed per-node fold; every shuffled row is 2-3
  int64s. Monotonicity makes the sum aggregate an exact pointwise
  convergence test.

Both RAISE on `max_rounds` exhaustion (the repo cap contract: no
silent partial results). Real graphs converge in O(10)-O(30) rounds;
the bound is the graph's coreness chain length, not its diameter.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from . import join as J
from .graph_stats import _canon_edges
from .join import bucketed_group_apply


def _empty_out():
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "node": pa.array([], pa.int64()),
        "core": pa.array([], pa.int64())}))


def _h_per_segment(row_id: np.ndarray, cv: np.ndarray,
                   n_rows: int) -> np.ndarray:
    """H-index per row segment, all rows vectorized: sort
    (row, -cv); rank within each segment; H = count of cv >= rank
    (a prefix property under the descending sort)."""
    order = np.lexsort((-cv, row_id))
    r, c = row_id[order], cv[order]
    starts = np.concatenate(([0], np.flatnonzero(r[1:] != r[:-1]) + 1))
    seg = np.zeros(len(r), np.int64)
    seg[starts] = 1
    seg_id = np.cumsum(seg) - 1
    rank = np.arange(len(r), dtype=np.int64) - starts[seg_id] + 1
    ok = (c >= rank).astype(np.int64)
    h = np.add.reduceat(ok, starts)
    out = np.zeros(n_rows, np.int64)
    out[r[starts]] = h
    return out


def _packed_adjacency(adj):
    """One (node, nbrs list<int64>) row per node, built with one
    bucketed shuffle. List rows are atomic in Ray blocks."""
    def pack(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({
                "node": pa.array([], pa.int64()),
                "nbrs": pa.array([], pa.list_(pa.int64()))})
        u = g["u"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(u[1:] != u[:-1]) + 1))
        # int32 offsets: a single bucket task never holds 2^31 rows
        # (bucket widths are data-sized upstream)
        offs = np.concatenate((starts, [len(u)])).astype(np.int32)
        lst = pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                       pa.array(v))
        return pa.table({"node": pa.array(u[starts]), "nbrs": lst})

    packed, n = J.solidify(bucketed_group_apply(adj, "u", pack))
    return packed.materialize(), n


def _broadcast_loop(packed, n_nodes: int, max_rounds: int):
    """Zero-shuffle rounds: est vector in the object store, one map
    over the packed adjacency, n_nodes-row driver merge."""
    head = pa.concat_tables([
        pa.table(b) for b in packed.map_batches(
            lambda t: pa.table({
                "node": t["node"],
                "deg": pa.compute.list_value_length(t["nbrs"])
                .cast(pa.int64())}),
            batch_format="pyarrow").iter_batches(
                batch_format="pyarrow")])
    keys = head["node"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    vals = head["deg"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    order = np.argsort(keys)
    keys, vals = np.ascontiguousarray(keys[order]), \
        np.ascontiguousarray(vals[order])
    keys_ref = ray.put(keys)

    for _ in range(max_rounds):
        vals_ref = ray.put(vals)

        def round_map(t: pa.Table, _k=keys_ref, _v=vals_ref
                      ) -> pa.Table:
            if len(t) == 0 or "node" not in t.column_names:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "est": pa.array([], pa.int64())})
            k = ray.get(_k)
            vv = ray.get(_v)
            col = t["nbrs"].combine_chunks()
            if isinstance(col, pa.ChunkedArray):
                col = col.chunk(0)
            flat = col.flatten().to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            offs = col.offsets.to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            cv = vv[np.searchsorted(k, flat)]
            lens = np.diff(offs)
            row_id = np.repeat(
                np.arange(len(t), dtype=np.int64), lens)
            h = _h_per_segment(row_id, cv, len(t))
            return pa.table({"node": t["node"],
                             "est": pa.array(h)})

        parts = packed.map_batches(round_map, batch_format="pyarrow")
        new = vals.copy()
        for b in parts.iter_batches(batch_format="pyarrow"):
            nn = b["node"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            hh = b["est"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            new[np.searchsorted(keys, nn)] = hh
        if np.array_equal(new, vals):
            import ray.data as rd
            return rd.from_arrow(pa.table({
                "node": pa.array(keys), "core": pa.array(vals)}))
        vals = new
    raise RuntimeError(
        f"core_numbers did not converge within max_rounds="
        f"{max_rounds}; raise the cap (bound is the graph's "
        "coreness chain length, typically O(10) on real graphs)")


def _shuffle_loop(adj, n_edges: int, max_rounds: int):
    def deg_fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "est": pa.array([], pa.int64())})
        agg = g.groupby("u", as_index=False).size()
        return pa.table({
            "node": pa.array(agg["u"].to_numpy(np.int64)),
            "est": pa.array(agg["size"].to_numpy(np.int64))})

    est, _ = J.solidify(bucketed_group_apply(adj, "u", deg_fold))
    est = est.materialize()

    def h_fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "est": pa.array([], pa.int64())})
        u = g["u"].to_numpy(np.int64)
        cv = g["est"].to_numpy(np.int64)
        order = np.lexsort((-cv, u))
        u, cv = u[order], cv[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(u[1:] != u[:-1]) + 1))
        seg = np.zeros(len(u), np.int64)
        seg[starts] = 1
        seg_id = np.cumsum(seg) - 1
        rank = np.arange(len(u), dtype=np.int64) - starts[seg_id] + 1
        ok = (cv >= rank).astype(np.int64)
        h = np.add.reduceat(ok, starts)
        return pa.table({"node": pa.array(u[starts]),
                         "est": pa.array(h)})

    import ray.data

    def total(ds) -> int:
        agg = ds.aggregate(ray.data.aggregate.Sum(
            "est", alias_name="s"))
        return int(agg["s"] or 0)

    n_nodes = est.count()
    p_est = max(1, min(J.cluster_parts(), n_nodes // 5000 + 1))
    p_adj = max(1, min(J.cluster_parts(), 2 * n_edges // 5000 + 1))

    prev_sum = total(est)
    for _ in range(max_rounds):
        el = est.map_batches(
            lambda t: t.rename_columns(["node", "nb_est"]),
            batch_format="pyarrow").materialize()
        with_est = J.bucketed_attach_column(
            adj, "v", el, "node", "nb_est").repartition(p_adj)
        rows = with_est.map_batches(
            lambda t: pa.table({
                "u": t["u"],
                "est": pa.compute.cast(t["nb_est"], pa.int64())})
            if len(t) and "u" in t.column_names
            else pa.table({"u": pa.array([], pa.int64()),
                           "est": pa.array([], pa.int64())}),
            batch_format="pyarrow")
        est = bucketed_group_apply(rows, "u", h_fold) \
            .repartition(p_est).materialize()
        cur_sum = total(est)
        if cur_sum == prev_sum:
            return est.map_batches(
                lambda t: t.rename_columns(["node", "core"]),
                batch_format="pyarrow")
        prev_sum = cur_sum
    raise RuntimeError(
        f"core_numbers did not converge within max_rounds="
        f"{max_rounds}; raise the cap (bound is the graph's "
        "coreness chain length, typically O(10) on real graphs)")


def core_numbers(edges_ds, *, src_col: str = "src",
                 dst_col: str = "dst", max_rounds: int = 100,
                 engine: str = "auto",
                 max_driver_nodes: int = 50_000_000):
    """-> Dataset (node, core). Self-loops dropped, duplicate and
    reversed edges deduped before counting (simple-graph semantics,
    matching networkx.core_number). engine: auto | broadcast |
    shuffle — auto picks broadcast while the per-node est vector
    (~16 B/node) fits the driver, else the all-shuffle loop."""
    if engine not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"unknown engine {engine!r}")
    edges, n_edges = J.solidify(_canon_edges(edges_ds, src_col,
                                             dst_col))
    if n_edges == 0:
        return _empty_out()

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
    adj = adj.materialize()

    if engine == "shuffle":
        return _shuffle_loop(adj, n_edges, max_rounds)

    packed, n_nodes = _packed_adjacency(adj)
    if engine == "auto" and n_nodes > max_driver_nodes:
        return _shuffle_loop(adj, n_edges, max_rounds)
    return _broadcast_loop(packed, n_nodes, max_rounds)

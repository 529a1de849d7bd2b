"""Many-to-many shortest-path (OD cost) matrix over way edges.

`route.sssp` answers "distance to the NEAREST source" (min over
sources). An origin-destination matrix needs the distance from EVERY
source separately — the fleet-routing / accessibility-analysis shape.

Implementation: the product-graph reduction. With K sources, remap
node u to u*K + j for each source index j (K disjoint copies of the
graph, one per source, each holding exactly one source node), then
run the EXISTING `route.sssp` once over the expanded edges. Both of
sssp's engines — exact driver Dijkstra under `max_driver_edges` and
the bucket-local distributed fixpoint past it — and its
bit-determinism are inherited unchanged; components are disjoint so
the nearest-source min never mixes sources. The expansion is honest:
an OD matrix IS K independent relaxations, so the work is K*E edges
either way; K is bounded by `max_sources` (RAISES) because an
unbounded source set belongs in `sssp`'s nearest-source semantics.

Output: Dataset (source, node_id, dist) in exact int64 cm, long
format; pass `targets` to keep only those destinations (broadcast
filter, no shuffle). Cross-checked against networkx Dijkstra per
source in tests/test_dist_matrix.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def distance_matrix(edges_ds, sources: list[int],
                    targets: list[int] | None = None, *,
                    weight_col: str = "w",
                    max_sources: int = 1024,
                    max_driver_edges: int = 5_000_000,
                    buckets_ds=None, num_buckets: int | None = None,
                    max_rounds: int = 64):
    """-> Dataset (source, node_id, dist): exact shortest-path cost
    from every source to every reachable node (or only `targets`)."""
    from .join import broadcast_is_in
    from .route import sssp

    srcs = sorted({int(s) for s in sources})
    k = len(srcs)
    if k == 0:
        raise ValueError("distance_matrix: empty source set")
    if k > max_sources:
        raise ValueError(
            f"distance_matrix: {k} sources > max_sources="
            f"{max_sources} — the product graph is K*E edges; raise "
            "the cap deliberately or batch the sources")
    kk = np.int64(k)
    src_arr = np.array(srcs, np.int64)

    def expand(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64()),
                             weight_col: pa.array([], pa.int64())})
        u = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t[weight_col].to_numpy(zero_copy_only=False)\
            .astype(np.int64)
        hi = max(int(np.abs(u).max()), int(np.abs(v).max()))
        if hi >= (1 << 62) // k:
            raise ValueError(
                "distance_matrix: node id * n_sources overflows the "
                "packed product-graph id; renumber ids densely first")
        j = np.arange(k, dtype=np.int64)
        n = len(u)
        return pa.table({
            "src": (u[:, None] * kk + j[None, :]).ravel(),
            "dst": (v[:, None] * kk + j[None, :]).ravel(),
            weight_col: np.repeat(w, k)})

    aug = edges_ds.map_batches(expand, batch_format="pyarrow")
    aug_sources = [int(s) * k + j for j, s in enumerate(srcs)]
    res = sssp(aug, aug_sources, weight_col=weight_col,
               max_driver_edges=max_driver_edges,
               buckets_ds=buckets_ds, num_buckets=num_buckets,
               max_rounds=max_rounds)

    def decode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"source": pa.array([], pa.int64()),
                             "node_id": pa.array([], pa.int64()),
                             "dist": pa.array([], pa.int64())})
        nid = t["node_id"].to_numpy(zero_copy_only=False)\
            .astype(np.int64)
        # python floor-division semantics hold for negative ids too:
        # u*k + j with 0 <= j < k decodes uniquely
        return pa.table({
            "source": src_arr[(nid % kk).astype(np.int64)],
            "node_id": np.floor_divide(nid, kk),
            "dist": t["dist"].cast(pa.int64())})

    out = res.map_batches(decode, batch_format="pyarrow")
    if targets is not None:
        out = broadcast_is_in(
            out, "node_id",
            np.array(sorted({int(x) for x in targets}), np.int64),
            mode="semi")
    return out

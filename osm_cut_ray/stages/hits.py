"""HITS hubs & authorities (Kleinberg 1999) over a directed edge
list — the link-analysis companion to `stages/route.py:pagerank`,
for ranking reference graphs (wiki/citation/URL corpora feeding LLM
training data) by endorsement structure.

Same scale contract as pagerank: ZERO shuffles. Per iteration the
current score vector is broadcast once (`ray.put`), every edge batch
pulls it and emits unique-key int64 partial sums map-side, and the
driver merges the partials — integer adds commute, so the result is
BIT-deterministic under any partitioning. Scores live in int64 fixed
point (SCALE = 1e9 mass units); each half-step renormalizes total
mass to SCALE exactly: the raw inflow is first floor-divided by
d = sum//SCALE + 1 (keeping every product inside int64 — raw sums up
to ~9.2e18, i.e. in-degrees to ~9.2e9, before the int64 guard
RAISES), then scaled by SCALE//sum with the truncation residue
spread one unit at a time in node-id order (pagerank's house rule,
<= (n-1)/1e9 mass bias per half-step).

Kleinberg's formulation normalizes by total mass each half-step and
converges to the principal eigenvectors of AᵀA / AAᵀ; the integer
quantization perturbs scores by O(1/SCALE) per step, pinned ≈ the
float textbook iteration in tests (and bit-== a driver replay of the
same integer algorithm).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

_SCALE = 1_000_000_000  # 1e-9 mass units


def _renorm(raw: np.ndarray) -> np.ndarray:
    """Integer renormalization of a non-negative int64 vector to
    total mass _SCALE (pre-divide + node-id-order residue spread;
    every intermediate product stays inside int64)."""
    s = int(raw.sum())
    if s == 0:
        out = np.full(len(raw), _SCALE // len(raw), np.int64)
        out[: _SCALE % len(raw)] += 1
        return out
    if s > 2**62:
        raise RuntimeError(
            "hits: total raw inflow exceeds the int64 bound "
            "(super-node in-degree ~> 9.2e9) — salt the hot node or "
            "shard the graph by component first")
    d = s // _SCALE + 1
    red = raw // np.int64(d)
    rs = int(red.sum())
    if rs == 0:  # every entry rounded away: degenerate, restart flat
        out = np.full(len(raw), _SCALE // len(raw), np.int64)
        out[: _SCALE % len(raw)] += 1
        return out
    out = red * np.int64(_SCALE) // np.int64(rs)
    resid = _SCALE - int(out.sum())
    out[:resid] += 1
    return out


def hits(edges_ds, *, n_iter: int = 30, engine: str = "auto",
         max_broadcast_nodes: int = 50_000_000):
    """-> Dataset (node, authority, hub), float64, each score family
    summing to ~1. Directed edges (src endorses dst): authorities
    collect score from their in-neighbors' hub scores, hubs from
    their out-neighbors' authority scores, renormalized each
    half-step.

    engine: auto | broadcast | shuffle. Past `max_broadcast_nodes`,
    broadcast RAISES while auto falls to the all-shuffle loop
    (`stages/score_flow.py:hits_shuffle`), BIT-FOR-BIT equal; the
    auto driver collection is incrementally capped so it never holds
    more than the cap on the driver."""
    import ray.data

    if engine not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"unknown engine {engine!r}")
    if engine == "shuffle":
        from .score_flow import hits_shuffle
        return hits_shuffle(edges_ds, n_iter=n_iter, scale=_SCALE)
    edges_ds = edges_ds.materialize()

    def node_partial(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": pa.array(
            np.unique(np.concatenate([src, dst])))})

    from .score_flow import merge_partials_capped

    merged = merge_partials_capped(
        ((bt["node"].to_numpy(zero_copy_only=False),
          np.zeros(bt.num_rows, np.int64))
         for bt in edges_ds.map_batches(
             node_partial, batch_format="pyarrow").iter_batches(
             batch_size=None, batch_format="pyarrow")
         if bt.num_rows), max_broadcast_nodes)
    if merged is None:
        if engine == "broadcast":
            raise ValueError(
                f"node count exceeds max_broadcast_nodes="
                f"{max_broadcast_nodes} for the per-iteration score "
                "broadcast; use engine='auto'/'shuffle' or shard by "
                "component first")
        from .score_flow import hits_shuffle
        return hits_shuffle(edges_ds, n_iter=n_iter, scale=_SCALE)
    node_ids = merged[0]
    n = len(node_ids)
    if n == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "authority": pa.array([], pa.float64()),
            "hub": pa.array([], pa.float64())}))

    def pull(score_ref, from_col: str, to_col: str) -> np.ndarray:
        """One broadcast half-step: raw[to] = sum over edges of
        score[from], merged from map-side unique-key partials."""

        def contribs(t: pa.Table) -> pa.Table:
            ks, sc = ray.get(score_ref)
            f = t[from_col].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            g = t[to_col].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            c = sc[np.searchsorted(ks, f)]
            u, inv = np.unique(g, return_inverse=True)
            s = np.zeros(len(u), np.int64)
            np.add.at(s, inv, c)
            return pa.table({"k": pa.array(u), "c": pa.array(s)})

        raw = np.zeros(n, np.int64)
        for bt in edges_ds.map_batches(
                contribs, batch_format="pyarrow").iter_batches(
                batch_size=None, batch_format="pyarrow"):
            if bt.num_rows == 0:
                continue
            k = bt["k"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = bt["c"].to_numpy(zero_copy_only=False).astype(np.int64)
            np.add.at(raw, np.searchsorted(node_ids, k), v)
        return raw

    hub = np.full(n, _SCALE // n, np.int64)
    hub[: _SCALE % n] += 1
    auth = hub.copy()
    for _ in range(n_iter):
        ref = ray.put((node_ids, hub))
        auth = _renorm(pull(ref, "src", "dst"))
        ref = ray.put((node_ids, auth))
        hub = _renorm(pull(ref, "dst", "src"))

    return ray.data.from_arrow(pa.table({
        "node": pa.array(node_ids),
        "authority": pa.array(auth.astype(np.float64) / _SCALE),
        "hub": pa.array(hub.astype(np.float64) / _SCALE)}))

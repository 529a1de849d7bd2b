"""Betweenness centrality via Brandes' algorithm (Brandes 2001),
parallelized over sources: each source's BFS + dependency
accumulation is independent, so the pipeline is a map over a source
list with the CSR adjacency broadcast once (`ray.put`), followed by
one numpy reduction of per-source partial scores. With
`sources=None` every node is a source and the result is EXACT
(networkx-pinned); with `n_sources=k` the standard uniform source
sample (deterministic: splitmix64-smallest node ids) estimates
centrality scaled by n/k (Brandes & Pich 2007).

Scale shape: the adjacency broadcast is the same
`max_broadcast_edges` class as the repo's SegmentGrid family — RAISE
past the cap (per-source Brandes fundamentally needs the whole graph
reachable from the source; at planet scale cut the graph first or
sample sources within components). Each map task processes a CHUNK
of sources and returns one dense float64 partial vector; partials
are int64-quantized before the reduction so the sum is
bit-deterministic under any task order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from . import join as J
from .graph_stats import _canon_edges
from .wsample import uniform_hash

_Q = 1 << 32  # 2^-32 quantization of per-source dependency scores


def _csr(edges_tbl: pa.Table, n_max_nodes: int):
    lo = edges_tbl["lo"].to_numpy(zero_copy_only=False)
    hi = edges_tbl["hi"].to_numpy(zero_copy_only=False)
    nodes = np.unique(np.concatenate([lo, hi]))
    if len(nodes) > n_max_nodes:
        raise ValueError(
            f"{len(nodes)} nodes > max_broadcast_nodes="
            f"{n_max_nodes}; cut the graph or raise the cap")
    li = np.searchsorted(nodes, lo)
    hj = np.searchsorted(nodes, hi)
    u = np.concatenate([li, hj])
    v = np.concatenate([hj, li])
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    indptr = np.searchsorted(u, np.arange(len(nodes) + 1))
    return nodes, indptr.astype(np.int64), v.astype(np.int64)


def _brandes_chunk(indptr: np.ndarray, nbrs: np.ndarray,
                   srcs: np.ndarray, n: int) -> np.ndarray:
    """Quantized partial betweenness from the given sources."""
    acc = np.zeros(n, np.int64)
    for s in srcs:
        # BFS by levels, vectorized frontier expansion
        dist = np.full(n, -1, np.int64)
        sigma = np.zeros(n, np.float64)
        dist[s] = 0
        sigma[s] = 1.0
        frontier = np.array([s], np.int64)
        levels = [frontier]
        level = 0
        while len(frontier):
            # all edges out of the frontier
            counts = indptr[frontier + 1] - indptr[frontier]
            tgt = nbrs[np.repeat(indptr[frontier], counts)
                       + (np.arange(int(counts.sum()))
                          - np.repeat(np.cumsum(counts) - counts,
                                      counts))]
            src_rep = np.repeat(frontier, counts)
            nxt = np.unique(tgt[dist[tgt] == -1])
            dist[nxt] = level + 1
            onlevel = dist[tgt] == level + 1
            np.add.at(sigma, tgt[onlevel], sigma[src_rep[onlevel]])
            frontier = nxt
            level += 1
            if len(nxt):
                levels.append(nxt)
        # dependency accumulation, deepest level first
        delta = np.zeros(n, np.float64)
        for lvl in reversed(levels[1:]):
            counts = indptr[lvl + 1] - indptr[lvl]
            tgt = nbrs[np.repeat(indptr[lvl], counts)
                       + (np.arange(int(counts.sum()))
                          - np.repeat(np.cumsum(counts) - counts,
                                      counts))]
            src_rep = np.repeat(lvl, counts)
            pred = dist[tgt] == dist[src_rep] - 1
            contrib = np.zeros(len(tgt))
            contrib[pred] = sigma[tgt[pred]] / sigma[src_rep[pred]] \
                * (1.0 + delta[src_rep[pred]])
            np.add.at(delta, tgt, contrib)
        delta[s] = 0.0
        acc += np.round(delta * _Q).astype(np.int64)
    return acc


def betweenness(edges_ds, *, src_col: str = "src",
                dst_col: str = "dst", n_sources: int | None = None,
                seed: int = 0, chunk: int = 64,
                max_broadcast_nodes: int = 50_000_000):
    """-> Dataset (node, betweenness). Undirected, unweighted,
    unnormalized, each pair counted once (networkx convention:
    raw Brandes halved). Exact when n_sources is None; otherwise the
    Brandes-Pich estimate scaled by n/k from a deterministic
    splitmix64 source sample."""
    import ray.data as rd

    edges, n_e = J.solidify(_canon_edges(edges_ds, src_col,
                                         dst_col))
    if n_e == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "betweenness": pa.array([], pa.float64())}))
    tbl = pa.concat_tables(
        [pa.table(b) for b in edges.iter_batches(
            batch_format="pyarrow")])
    nodes, indptr, nbrs = _csr(tbl, max_broadcast_nodes)
    n = len(nodes)
    if n_sources is None or n_sources >= n:
        srcs = np.arange(n, dtype=np.int64)
        scale = 0.5   # undirected: each pair found from both ends
    else:
        order = np.argsort(uniform_hash(nodes, seed), kind="stable")
        srcs = np.sort(order[:n_sources]).astype(np.int64)
        scale = 0.5 * n / n_sources
    ref = ray.put((indptr, nbrs))

    chunks = [srcs[i:i + chunk] for i in range(0, len(srcs), chunk)]
    src_ds = rd.from_items(
        [{"chunk_id": i, "srcs": c.tolist()}
         for i, c in enumerate(chunks)])

    def work(t: pa.Table, _ref=ref) -> pa.Table:
        if len(t) == 0 or "srcs" not in t.column_names:
            return pa.table({"acc": pa.array([], pa.binary())})
        indptr, nbrs = ray.get(_ref)
        out = np.zeros(n, np.int64)
        for lst in t["srcs"].to_pylist():
            out += _brandes_chunk(indptr, nbrs,
                                  np.asarray(lst, np.int64), n)
        return pa.table({"acc": pa.array([out.tobytes()],
                                         pa.binary())})

    total = np.zeros(n, np.int64)
    for b in src_ds.map_batches(work, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for blob in b["acc"].to_pylist():
            total += np.frombuffer(blob, np.int64)
    bc = total.astype(np.float64) / _Q * scale
    return rd.from_arrow(pa.table({
        "node": pa.array(nodes.astype(np.int64)),
        "betweenness": pa.array(bc)}))

"""ALT point-to-point routing (A* + Landmarks + Triangle
inequality, Goldberg & Harrelson 2005).

The query-time sibling of `route.sssp`: after a one-off distributed
preparation (landmark selection + distance tables), point-to-point
shortest-path queries expand a fraction of Dijkstra's node count
using the landmark lower bound

    h(v) = max_L max( d(L, t) - d(L, v),  d(v, L) - d(t, L) )

which is admissible AND consistent, so plain A* stays exact.

Distributed preparation, driver queries:
- `select_landmarks`: farthest-point (Gonzalez) in ROAD metric —
  k passes of the existing `route.sssp` (each auto driver /
  bucket-fixpoint), picking the (max dist, min id) node each round:
  deterministic, partition-invariant.
- `alt_prepare`: forward and backward landmark tables via
  `dist_matrix.distance_matrix` (the product-graph sssp) on the
  graph and its reverse; tables land in driver arrays behind
  `max_broadcast_nodes` (RAISES) — k x n int64, the same budget as
  the pagerank score vector.
- `ALTIndex.query`: exact int64 A*; ties (f, node id) — results are
  bit-deterministic. `query(..., return_expanded=True)` surfaces
  the expanded-node count (the whole point of ALT; pinned < plain
  Dijkstra's count on the bench graph).

Pinned against `route._dijkstra` distances in tests/test_alt.py.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa


def _collect_table(ds, cols: list[str]) -> dict[str, np.ndarray]:
    out = {c: [] for c in cols}
    for t in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        if t.num_rows:
            for c in cols:
                out[c].append(t[c].to_numpy(zero_copy_only=False)
                              .astype(np.int64))
    return {c: (np.concatenate(v) if v else np.zeros(0, np.int64))
            for c, v in out.items()}


def _reverse(edges_ds, weight_col: str):
    def rev(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["dst"], "dst": t["src"],
                         weight_col: t[weight_col]})
    return edges_ds.map_batches(rev, batch_format="pyarrow")


def select_landmarks(edges_ds, k: int, *, weight_col: str = "w",
                     max_driver_edges: int = 5_000_000,
                     max_rounds: int = 64) -> list[int]:
    """Gonzalez farthest-point landmark selection in graph metric.
    Start at the minimum node id; each round adds the node
    maximizing min-distance to the chosen set ((max dist, min id)
    ties). Unreachable nodes are skipped (they can never bound a
    connected query)."""
    from .route import sssp

    ids = _collect_table(
        edges_ds.map_batches(
            lambda t: pa.table({"n": np.unique(np.concatenate([
                t["src"].to_numpy(zero_copy_only=False).astype(np.int64),
                t["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
            ]))}), batch_format="pyarrow"), ["n"])["n"]
    if len(ids) == 0:
        raise ValueError("select_landmarks: empty graph")
    lms = [int(ids.min())]
    for _ in range(k - 1):
        got = _collect_table(
            sssp(edges_ds, lms, weight_col=weight_col,
                 max_driver_edges=max_driver_edges,
                 max_rounds=max_rounds),
            ["node_id", "dist"])
        if len(got["node_id"]) == 0:
            break
        d, nid = got["dist"], got["node_id"]
        best = np.lexsort((nid, -d))[0]
        cand = int(nid[best])
        if cand in lms or d[best] <= 0:
            break
        lms.append(cand)
    return sorted(lms)


class ALTIndex:
    """Driver-resident ALT query engine (see module docstring)."""

    def __init__(self, nodes, indptr, nbrs, wts, landmarks,
                 d_fwd, d_bwd):
        self.nodes = nodes          # sorted node ids (n,)
        self.indptr = indptr        # CSR offsets (n+1,)
        self.nbrs = nbrs            # neighbor positions
        self.wts = wts              # edge weights
        self.landmarks = landmarks  # (k,) node ids
        self.d_fwd = d_fwd          # (k, n) dist landmark -> node
        self.d_bwd = d_bwd          # (k, n) dist node -> landmark

    INF = np.int64(1) << np.int64(60)

    def _pos(self, node: int) -> int:
        i = int(np.searchsorted(self.nodes, node))
        if i >= len(self.nodes) or self.nodes[i] != node:
            raise KeyError(f"node {node} not in graph")
        return i

    def _h(self, t_pos: int) -> np.ndarray:
        """Consistent lower bound h(v) for all v at once."""
        lo1 = self.d_fwd[:, t_pos][:, None] - self.d_fwd
        lo2 = self.d_bwd - self.d_bwd[:, t_pos][:, None]
        h = np.maximum(lo1, lo2).max(axis=0)
        # unreachable landmark legs (INF arithmetic) give garbage
        # bounds — clamp to admissible zero
        bad = (self.d_fwd >= self.INF).any(axis=0) \
            | (self.d_bwd >= self.INF).any(axis=0)
        h = np.where(bad, 0, np.maximum(h, 0))
        if (self.d_fwd[:, t_pos] >= self.INF).any() \
                or (self.d_bwd[:, t_pos] >= self.INF).any():
            h = np.zeros_like(h)
        return h.astype(np.int64)

    def query(self, s: int, t: int, *, return_expanded: bool = False):
        """-> exact distance (int64 cm) or None if unreachable;
        with return_expanded, -> (dist, n_expanded)."""
        sp, tp = self._pos(s), self._pos(t)
        h = self._h(tp)
        dist = {sp: 0}
        heap = [(int(h[sp]), sp, 0)]
        expanded = 0
        # NOTE: clamped landmark bounds are admissible but not
        # guaranteed consistent — A* must allow re-expansion (the
        # dist check below), under which the first pop of t is still
        # optimal for any admissible h
        while heap:
            f, v, dv = heapq.heappop(heap)
            if dv > dist.get(v, 1 << 62):
                continue
            expanded += 1
            if v == tp:
                return (dv, expanded) if return_expanded else dv
            for j in range(int(self.indptr[v]),
                           int(self.indptr[v + 1])):
                w = int(self.nbrs[j])
                nd = dv + int(self.wts[j])
                if nd < dist.get(w, 1 << 62):
                    dist[w] = nd
                    heapq.heappush(heap, (nd + int(h[w]), w, nd))
        return (None, expanded) if return_expanded else None


def alt_prepare(edges_ds, *, k_landmarks: int = 8,
                weight_col: str = "w",
                landmarks: list[int] | None = None,
                max_driver_edges: int = 5_000_000,
                max_broadcast_nodes: int = 50_000_000,
                max_rounds: int = 64) -> ALTIndex:
    """Build the ALT index: distributed landmark tables, driver CSR.
    -> ALTIndex."""
    from .dist_matrix import distance_matrix

    if landmarks is None:
        landmarks = select_landmarks(
            edges_ds, k_landmarks, weight_col=weight_col,
            max_driver_edges=max_driver_edges, max_rounds=max_rounds)
    lms = sorted({int(x) for x in landmarks})

    got = _collect_table(edges_ds, ["src", "dst", weight_col])
    src, dst, wts = got["src"], got["dst"], got[weight_col]
    nodes = np.unique(np.concatenate([src, dst]))
    if len(nodes) > max_broadcast_nodes:
        raise ValueError(
            f"alt_prepare: {len(nodes)} nodes > max_broadcast_nodes="
            f"{max_broadcast_nodes}")
    n = len(nodes)
    sp = np.searchsorted(nodes, src)
    dp = np.searchsorted(nodes, dst)
    order = np.argsort(sp, kind="stable")
    sp, dp, w_s = sp[order], dp[order], wts[order]
    indptr = np.searchsorted(sp, np.arange(n + 1))

    def table(ds) -> np.ndarray:
        got = _collect_table(ds, ["source", "node_id", "dist"])
        m = np.full((len(lms), n), ALTIndex.INF, np.int64)
        li = np.searchsorted(np.array(lms, np.int64), got["source"])
        ni = np.searchsorted(nodes, got["node_id"])
        m[li, ni] = got["dist"]
        return m

    d_fwd = table(distance_matrix(
        edges_ds, lms, weight_col=weight_col,
        max_driver_edges=max_driver_edges, max_rounds=max_rounds))
    d_bwd = table(distance_matrix(
        _reverse(edges_ds, weight_col), lms, weight_col=weight_col,
        max_driver_edges=max_driver_edges, max_rounds=max_rounds))
    return ALTIndex(nodes, indptr, dp, w_s, np.array(lms, np.int64),
                    d_fwd, d_bwd)

"""Sinkhorn optimal-transport distance between two embedding corpora
(Cuturi 2013, "Sinkhorn Distances: Lightspeed Computation of Optimal
Transport").

The corpus-drift / domain-matching measure a training-data pipeline
runs between snapshots or sources: how much probability mass must
move (and how far) to turn corpus A's embedding distribution into
corpus B's.

100-TB shape: the transport problem is solved over a SHARED bounded
codebook, never over raw rows — (1) deterministic sampled-Lloyd
centroids from the union of both corpora (`knn.deterministic_
centroids`, hash-sampled, driver Lloyd); (2) one zero-shuffle
assignment pass per corpus producing exact int64 cell histograms
(per-block bincount partials, driver merge — k * #blocks ints move);
(3) the k x k Sinkhorn iteration on the driver (fixed `n_iter`
double loop over two k-vectors — microseconds). Raw embeddings never
shuffle and never reach the driver.

Determinism: histograms are exact integer counts, centroids are the
deterministic k-means, and the driver iteration is a fixed-order
float64 computation — the result is bit-identical under any
partitioning. Pinned in tests/test_ot.py against an independent
replay AND the closed-form 1-D exact OT (CDF L1) limit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from .knn import _normalize, deterministic_centroids


def corpus_histogram(emb_ds, centroids: np.ndarray, *,
                     emb_col: str = "embedding") -> np.ndarray:
    """Exact int64 per-cell counts of nearest-centroid assignment —
    one map pass, per-block partials, driver merge."""
    k = len(centroids)
    cref = ray.put(centroids.T.copy())

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"counts": pa.array(
                [], pa.list_(pa.int64()))})
        vecs = _normalize(np.stack(t[emb_col].to_pylist())
                          .astype(np.float64))
        cell = (vecs @ ray.get(cref)).argmax(axis=1)
        return pa.table({"counts": pa.array(
            [np.bincount(cell, minlength=k).astype(np.int64)],
            pa.list_(pa.int64()))})

    out = np.zeros(k, np.int64)
    for t in emb_ds.map_batches(partial, batch_format="pyarrow")\
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        for row in t["counts"].to_pylist():
            out += np.asarray(row, np.int64)
    return out


def _sinkhorn(a: np.ndarray, b: np.ndarray, cost: np.ndarray,
              reg: float, n_iter: int) -> tuple[float, np.ndarray]:
    """Fixed-iteration Sinkhorn on the simplex. -> (transport cost,
    plan). Zero-mass cells are dropped before iterating; cost/reg
    ratios past float64's exp range RAISE (no silent log-domain
    fallback — rescale deliberately instead)."""
    ia, ib = np.flatnonzero(a > 0), np.flatnonzero(b > 0)
    aa = a[ia] / a[ia].sum()
    bb = b[ib] / b[ib].sum()
    c = cost[np.ix_(ia, ib)]
    if c.size and float(c.max()) / reg > 700.0:
        raise ValueError(
            f"sinkhorn: cost.max()/reg = {float(c.max()) / reg:.0f} "
            "underflows exp(-c/reg) in float64 (> 700) — raise reg "
            "or rescale the cost matrix")
    kmat = np.exp(-c / reg)
    u = np.ones(len(aa)) / len(aa)
    for _ in range(n_iter):
        v = bb / (kmat.T @ u)
        u = aa / (kmat @ v)
    plan_s = u[:, None] * kmat * v[None, :]
    dist = float((plan_s * c).sum())
    plan = np.zeros_like(cost)
    plan[np.ix_(ia, ib)] = plan_s
    return dist, plan


def sinkhorn_distance(a_ds, b_ds, *, n_centroids: int = 64,
                      reg: float = 0.05, n_iter: int = 200,
                      metric: str = "euclidean",
                      emb_col: str = "embedding",
                      centroids: np.ndarray | None = None) -> dict:
    """-> {distance, plan, hist_a, hist_b, centroids}: entropic-OT
    cost between the two corpora's cell histograms over a shared
    codebook. `metric`: 'euclidean' (centroid L2) or 'cosine'
    (1 - cos). Pass `centroids` to reuse a codebook across
    snapshots (distances stay comparable over time)."""
    if metric not in ("euclidean", "cosine"):
        raise ValueError(f"unknown metric {metric!r}")
    if reg <= 0:
        raise ValueError("reg must be positive")
    if centroids is None:
        union = a_ds.union(b_ds)
        centroids = deterministic_centroids(union, n_centroids)
    ha = corpus_histogram(a_ds, centroids, emb_col=emb_col)
    hb = corpus_histogram(b_ds, centroids, emb_col=emb_col)
    if ha.sum() == 0 or hb.sum() == 0:
        raise ValueError("sinkhorn_distance: empty corpus")
    if metric == "euclidean":
        d2 = ((centroids[:, None, :] - centroids[None, :, :]) ** 2
              ).sum(axis=2)
        cost = np.sqrt(d2)
    else:
        cost = 1.0 - centroids @ centroids.T
        np.fill_diagonal(cost, 0.0)
    dist, plan = _sinkhorn(ha.astype(np.float64),
                           hb.astype(np.float64), cost, reg, n_iter)
    return {"distance": dist, "plan": plan, "hist_a": ha,
            "hist_b": hb, "centroids": centroids}

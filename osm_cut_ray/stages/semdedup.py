"""SemDeDup — semantic deduplication over an embedding column
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication").

Algorithm (the paper's, with this repo's determinism rules pinned by
tests/test_semdedup.py against a driver brute force):

1. Spherical k-means centroids via the IVF trainer
   (`knn.deterministic_centroids` — hash-filtered sample, driver
   Lloyd, bit-deterministic under any partitioning).
2. Map-side cluster assignment: argmax cosine; `cent_sim` rounded to
   6 dp (the repo's float determinism rule) for the ordering key.
3. Per cluster, order points by the keep rule and flag point i as a
   duplicate iff ANY earlier point j has cos(i, j) > eps — the
   paper's strict-upper-triangle column max, NOT a re-iterated greedy
   (a point dropped because of an already-dropped point stays
   dropped). `keep="low"` (paper's best variant) orders by
   (cent_sim asc, id asc) so the survivor of each duplicate group is
   its LOWEST-centroid-similarity member; `keep="high"` flips the
   ordering.

Ray-Data shape: centroid training touches a bounded hash sample;
assignment is one map_batches (centroids `ray.put` once); the only
shuffle is ONE `bucketed_group_apply` on the cluster id (embeddings
must co-locate per cluster — the honest cost of pairwise similarity).
Cluster sizes are ~n/k by construction; a cluster exceeding
`max_cluster_size` RAISES with advice to raise `n_clusters` (an O(c²)
kernel on an unbounded cluster is the one way this op degrades).
Applying the flags is a distributed anti-join (`bucketed_semi_join`
mode="anti") against only the DUP ids — the small side at sane eps.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .join import bucketed_group_apply, bucketed_semi_join
from .knn import _normalize, deterministic_centroids

def _emb_matrix(col) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix without a Python
    loop over rows (Arrow flatten + reshape; RAISES on ragged rows)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0))
    widths = np.diff(col.offsets.to_numpy(zero_copy_only=False))
    d = int(widths[0])
    if not (widths == d).all():
        raise ValueError("ragged embedding column")
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.astype(np.float64, copy=False).reshape(n, d)


_FLAG_SCHEMA = pa.schema([
    ("vec_id", pa.int64()), ("cluster", pa.int64()),
    ("cent_sim", pa.float64()), ("is_dup", pa.bool_()),
    ("dup_of", pa.int64()), ("dup_sim", pa.float64())])


def _flag_cluster(ids: np.ndarray, cent_sim: np.ndarray,
                  vecs: np.ndarray, eps: float, keep: str):
    """-> (is_dup, dup_of, dup_sim) for one cluster; vecs normalized."""
    sign = 1.0 if keep == "low" else -1.0
    order = np.lexsort((ids, sign * cent_sim))
    x = vecs[order]
    n = len(x)
    s = x @ x.T
    # keep only the strict lower triangle: comparisons against
    # EARLIER-in-order points (the paper's column-max formulation)
    s = np.where(np.tril(np.ones((n, n), bool), -1), s, -np.inf)
    col_best = s.argmax(axis=1)  # per point: best EARLIER point
    best_sim = s[np.arange(len(x)), col_best]
    dup_ord = best_sim > eps
    is_dup = np.zeros(len(x), bool)
    dup_of = np.full(len(x), -1, np.int64)
    dup_sim = np.full(len(x), np.nan)
    is_dup[order] = dup_ord
    dup_of[order[dup_ord]] = ids[order][col_best[dup_ord]]
    dup_sim[order[dup_ord]] = np.round(best_sim[dup_ord], 6)
    return is_dup, dup_of, dup_sim


def semdedup_flags(emb_ds, *, eps: float = 0.95, n_clusters: int = 64,
                   keep: str = "low", id_col: str = "vec_id",
                   emb_col: str = "embedding",
                   max_cluster_size: int = 50_000,
                   centroids: np.ndarray | None = None):
    """-> Dataset (vec_id, cluster, cent_sim, is_dup, dup_of, dup_sim).
    `dup_of` = the earlier-in-order point with max similarity (-1 for
    survivors). Pass `centroids` to reuse a trained codebook."""
    if keep not in ("low", "high"):
        raise ValueError(f"keep must be low|high, got {keep!r}")
    if centroids is None:
        centroids = deterministic_centroids(emb_ds, n_clusters)
    cref = ray.put(np.ascontiguousarray(centroids.T))

    def assign(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "cluster": pa.array([], pa.int64()),
                "cent_sim": pa.array([], pa.float64()),
                emb_col: pa.array([], t.schema.field(emb_col).type)})
        ct = ray.get(cref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vecs = _normalize(_emb_matrix(t[emb_col]))
        sims = vecs @ ct
        cl = sims.argmax(axis=1).astype(np.int64)
        cs = np.round(sims[np.arange(len(cl)), cl], 6)
        return pa.table({id_col: pa.array(ids),
                         "cluster": pa.array(cl),
                         "cent_sim": pa.array(cs),
                         emb_col: t[emb_col]})

    assigned = emb_ds.map_batches(assign, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return _FLAG_SCHEMA.empty_table()
        out = []
        for cl, cg in g.groupby("cluster", sort=True):
            if len(cg) > max_cluster_size:
                raise ValueError(
                    f"cluster {cl} holds {len(cg)} vectors "
                    f"(> max_cluster_size={max_cluster_size}); raise "
                    "n_clusters so the O(c^2) kernel stays bounded")
            ids = cg[id_col].to_numpy(np.int64)
            cs = cg["cent_sim"].to_numpy(np.float64)
            vecs = _normalize(np.stack(cg[emb_col].to_numpy())
                              .astype(np.float64))
            is_dup, dup_of, dup_sim = _flag_cluster(
                ids, cs, vecs, eps, keep)
            out.append(pa.table({
                "vec_id": pa.array(ids), "cluster": pa.array(
                    np.full(len(ids), int(cl), np.int64)),
                "cent_sim": pa.array(cs), "is_dup": pa.array(is_dup),
                "dup_of": pa.array(dup_of),
                "dup_sim": pa.array(dup_sim)}))
        return pa.concat_tables(out)

    return bucketed_group_apply(assigned, "cluster", per_bucket)


def semdedup(emb_ds, *, eps: float = 0.95, n_clusters: int = 64,
             keep: str = "low", id_col: str = "vec_id",
             emb_col: str = "embedding",
             max_cluster_size: int = 50_000,
             centroids: np.ndarray | None = None):
    """-> (survivors Dataset with the INPUT schema, flags Dataset).
    Survivors are computed with a distributed anti-join against the
    dup ids (the small side), so neither side materializes."""
    flags = semdedup_flags(
        emb_ds, eps=eps, n_clusters=n_clusters, keep=keep,
        id_col=id_col, emb_col=emb_col,
        max_cluster_size=max_cluster_size, centroids=centroids)
    dup_ids = flags.filter(expr="is_dup").select_columns(["vec_id"])
    kept = bucketed_semi_join(emb_ds, id_col, dup_ids, "vec_id",
                              mode="anti")
    return kept, flags

"""Full-corpus distributed Lloyd k-means over an embedding column —
the clustering pass a 100-TB curation pipeline runs before per-cluster
sampling / SemDeDup-style pruning (Abbas et al. 2023 use exactly this:
cluster the corpus, then dedup/select within clusters).

Differs from `stages/knn.py:deterministic_centroids` (which fits on a
bounded SAMPLE for IVF routing): this stage assigns EVERY row each
round and folds exact partial sums, so the returned centroids are the
true Lloyd fixpoint trajectory of the whole corpus.

Determinism contract (the repo rule: bit-identical under any
partitioning):
- vectors are quantized once per batch to int64 at scale S = 2**
  scale_bits; ALL distance math is exact int64 (integer matmul —
  no BLAS float reassociation), so argmin ties are impossible to
  flip across partitionings; ties break to the LOWEST cluster index
  (numpy first-argmin).
- per-batch partial sums are exact int64 (commutative adds), merged
  by a shuffle-free tree fold; centroid update is exact integer
  round-half-up: cq = floor((2*sum + count) / (2*count)).
- init = the k rows with globally smallest splitmix64(id, seed)
  (stages/wsample.py:uniform_hash), tie-broken by id — partition-
  independent by construction.
- inertia (sum of quantized squared distances) is carried as
  decimal128(38,0) EXACT integers (per-row terms reach ~2^55; a
  corpus sum passes float64's 2^53 — same reasoning as
  stages/regression.py's decimal partials).

Ray-Data shape: centroids broadcast once per round via `ray.put`
(k*d*8 bytes, `max_broadcast_bytes` RAISES); one map_batches pass per
round emitting ONE partial row per block; partials tree-folded via
repartition+merge (never a groupby shuffle, never an unbounded
driver collect). Empty clusters keep their previous centroid.

Reference parity note: the reference engine has no clustering; this
is a graft-side operator (SURVEY.md training-data additions).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .wsample import uniform_hash

_DEC = pa.decimal128(38, 0)


def _quantize(mat: np.ndarray, scale: int) -> np.ndarray:
    mat = mat.astype(np.float64)
    amax = float(np.abs(mat).max(initial=0.0))
    if amax * scale >= float(1 << 62):
        raise ValueError(
            f"|v|*scale = {amax * scale:.3g} overflows int64 "
            "quantization; lower scale_bits or rescale the vectors")
    return np.round(mat * scale).astype(np.int64)


def _vec_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
        else col
    if isinstance(arr, pa.ChunkedArray):  # zero-chunk edge
        arr = pa.concat_arrays(arr.chunks) if arr.num_chunks else \
            pa.array([], pa.list_(pa.float32()))
    flat = arr.flatten().to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    n = len(arr)
    if n == 0:
        return flat.reshape(0, 0)
    return flat.reshape(n, len(flat) // n)


def _assign_int(xq: np.ndarray, cq: np.ndarray):
    """Exact-int64 squared-L2 argmin. RAISES if a squared distance
    could overflow int64 (d * (2*maxq)^2 >= 2^62): lower scale_bits
    or rescale the vectors."""
    maxq = max(int(np.abs(xq).max(initial=0)),
               int(np.abs(cq).max(initial=0)))
    if xq.shape[1] * (2 * maxq) ** 2 >= 1 << 62:
        raise ValueError(
            "quantized magnitude too large for exact int64 distance "
            f"(maxq={maxq}, d={xq.shape[1]}); lower scale_bits")
    c2 = np.einsum("kd,kd->k", cq, cq)          # exact: int64
    x2 = np.einsum("nd,nd->n", xq, xq)
    cross = xq @ cq.T                            # int64 matmul, exact
    d2 = x2[:, None] + c2[None, :] - 2 * cross
    assign = np.argmin(d2, axis=1)               # first-min tie rule
    return assign, d2[np.arange(len(xq)), assign]


def _tree_fold(parts_ds, merge_fn, target_rows: int = 64):
    """Fold a tiny-rows partial Dataset with repartition+merge rounds
    (shuffle-free reduce; each round is a metadata repartition plus a
    map-side merge) until <= target_rows, then return the collected
    Arrow table."""
    parts_ds = parts_ds.materialize()
    n = parts_ds.count()
    while n > target_rows:
        parts_ds = parts_ds.repartition(max(1, n // 32)).map_batches(
            merge_fn, batch_format="pyarrow",
            batch_size=None).materialize()
        n = parts_ds.count()
    tabs = [pa.table(b) for b in parts_ds.iter_batches(
        batch_size=None, batch_format="pyarrow") if b.num_rows]
    if not tabs:
        return None
    return pa.concat_tables(tabs)


def kmeans_fit(emb_ds, *, vec_col: str = "embedding",
               id_col: str = "vec_id", k: int = 8, n_iter: int = 10,
               seed: int = 0, scale_bits: int = 20,
               max_broadcast_bytes: int = 1 << 30) -> dict:
    """-> {"centroids": (k,d) float64, "counts": (k,) int64,
    "inertia": [exact int per round], "n": int}.

    Rows with a null/empty vector are ignored. RAISES if fewer than k
    non-empty rows exist, or if the centroid broadcast would exceed
    `max_broadcast_bytes`.
    """
    if k <= 0 or n_iter <= 0:
        raise ValueError("k and n_iter must be >= 1")
    scale = 1 << scale_bits
    emb_ds = emb_ds.materialize()

    # ---- init: k globally-smallest splitmix64(id, seed) rows ----
    def seed_partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"h": pa.array([], pa.uint64()),
                          "id": pa.array([], pa.int64()),
                          "vec": pa.array([], pa.list_(pa.float64()))})
        if t.num_rows == 0:
            return empty
        mat = _vec_matrix(t[vec_col])
        ids = t[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if mat.shape[1] == 0:
            return empty
        h = (uniform_hash(ids, seed) * (1 << 53)).astype(np.uint64)
        order = np.lexsort((ids, h))[:k]
        return pa.table({
            "h": pa.array(h[order]),
            "id": pa.array(ids[order]),
            "vec": pa.array(list(mat[order]),
                            pa.list_(pa.float64()))})

    def seed_merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"h": pa.array([], pa.uint64()),
                             "id": pa.array([], pa.int64()),
                             "vec": pa.array([],
                                             pa.list_(pa.float64()))})
        h = t["h"].to_numpy(zero_copy_only=False)
        ids = t["id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))[:k]
        return t.take(pa.array(order, pa.int64()))

    seeds = _tree_fold(emb_ds.map_batches(
        seed_partial, batch_format="pyarrow"), seed_merge)
    if seeds is None or seeds.num_rows < k:
        raise ValueError(
            f"need >= k={k} non-empty vectors to initialise")
    sh = seeds["h"].to_numpy(zero_copy_only=False)
    sid = seeds["id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((sid, sh))[:k]
    cent = _vec_matrix(seeds["vec"])[order]      # (k, d) float64
    d = cent.shape[1]
    if k * d * 8 > max_broadcast_bytes:
        raise ValueError(
            f"centroid broadcast {k * d * 8} B exceeds "
            f"max_broadcast_bytes={max_broadcast_bytes}; lower k or "
            "cluster a dimensionality-reduced projection")

    inertias: list[int] = []
    counts = np.zeros(k, np.int64)
    for _ in range(n_iter):
        cq = _quantize(cent, scale)
        ref = ray.put(cq)

        def partial(t: pa.Table, _ref=ref) -> pa.Table:
            cqb = ray.get(_ref)
            kk, dd = cqb.shape
            if t.num_rows == 0:
                mat = np.zeros((0, dd))
            else:
                mat = _vec_matrix(t[vec_col])
            if mat.shape[0] == 0 or mat.shape[1] == 0:
                sums = np.zeros(kk * dd, np.int64)
                cnt = np.zeros(kk, np.int64)
                inert = 0
            else:
                xq = _quantize(mat, scale)
                assign, dist2 = _assign_int(xq, cqb)
                sums = np.zeros((kk, dd), np.int64)
                np.add.at(sums, assign, xq)
                sums = sums.ravel()
                cnt = np.bincount(assign, minlength=kk) \
                    .astype(np.int64)
                inert = sum(int(v) for v in dist2)
            return pa.table({
                "sums": pa.array([sums.tolist()],
                                 pa.list_(pa.int64())),
                "counts": pa.array([cnt.tolist()],
                                   pa.list_(pa.int64())),
                "inertia": pa.array([inert], _DEC)})

        def merge(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({
                    "sums": pa.array([], pa.list_(pa.int64())),
                    "counts": pa.array([], pa.list_(pa.int64())),
                    "inertia": pa.array([], _DEC)})
            s = np.array(t["sums"].to_pylist(), np.int64).sum(axis=0)
            c = np.array(t["counts"].to_pylist(),
                         np.int64).sum(axis=0)
            ine = sum(int(v) for v in t["inertia"].to_pylist())
            return pa.table({
                "sums": pa.array([s.tolist()], pa.list_(pa.int64())),
                "counts": pa.array([c.tolist()],
                                   pa.list_(pa.int64())),
                "inertia": pa.array([ine], _DEC)})

        folded = _tree_fold(emb_ds.map_batches(
            partial, batch_format="pyarrow"), merge)
        sums = np.array(folded["sums"].to_pylist(),
                        np.int64).sum(axis=0).reshape(k, d)
        counts = np.array(folded["counts"].to_pylist(),
                          np.int64).sum(axis=0)
        inertias.append(sum(int(v)
                            for v in folded["inertia"].to_pylist()))
        # exact integer round-half-up; empty clusters keep position
        nz = counts > 0
        cq_next = cq.copy()
        cq_next[nz] = (2 * sums[nz] + counts[nz, None]) \
            // (2 * counts[nz, None])
        cent = cq_next.astype(np.float64) / scale

    return {"centroids": cent, "counts": counts,
            "inertia": inertias, "n": int(counts.sum())}


def kmeans_assign(emb_ds, centroids: np.ndarray, *,
                  vec_col: str = "embedding",
                  id_col: str = "vec_id", scale_bits: int = 20):
    """-> Dataset (id, cluster): exact-int argmin assignment against
    the given centroids (same quantization/tie rules as the fit)."""
    scale = 1 << scale_bits
    cq = _quantize(np.asarray(centroids, np.float64), scale)
    ref = ray.put(cq)

    def assign(t: pa.Table) -> pa.Table:
        empty = pa.table({"id": pa.array([], pa.int64()),
                          "cluster": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        mat = _vec_matrix(t[vec_col])
        if mat.shape[0] == 0 or mat.shape[1] == 0:
            return empty
        ids = t[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        a, _ = _assign_int(_quantize(mat, scale), ray.get(ref))
        return pa.table({"id": pa.array(ids),
                         "cluster": pa.array(a.astype(np.int64))})

    return emb_ds.map_batches(assign, batch_format="pyarrow")


def kmeans_fit_brute(ids: np.ndarray, mat: np.ndarray, *, k: int,
                     n_iter: int, seed: int = 0,
                     scale_bits: int = 20) -> dict:
    """Driver-side reference implementation of the SAME algorithm
    (identical init, quantization, update and tie rules) for pinning
    tests — not a different k-means, the exact specification."""
    scale = 1 << scale_bits
    h = (uniform_hash(ids.astype(np.int64), seed)
         * (1 << 53)).astype(np.uint64)
    order = np.lexsort((ids, h))[:k]
    cent = mat[order].astype(np.float64)
    inertias = []
    counts = np.zeros(k, np.int64)
    for _ in range(n_iter):
        cq = _quantize(cent, scale)
        xq = _quantize(mat, scale)
        assign, dist2 = _assign_int(xq, cq)
        sums = np.zeros((k, cent.shape[1]), np.int64)
        np.add.at(sums, assign, xq)
        counts = np.bincount(assign, minlength=k).astype(np.int64)
        inertias.append(sum(int(v) for v in dist2))
        nz = counts > 0
        cq_next = cq.copy()
        cq_next[nz] = (2 * sums[nz] + counts[nz, None]) \
            // (2 * counts[nz, None])
        cent = cq_next.astype(np.float64) / scale
    return {"centroids": cent, "counts": counts,
            "inertia": inertias, "n": int(counts.sum())}

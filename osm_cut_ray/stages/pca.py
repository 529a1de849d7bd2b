"""Distributed exact PCA over an embedding column — the
dimensionality-reduction pass a 100-TB curation pipeline runs before
clustering / ANN (SemDeDup-style pipelines project to 32-64 dims
first; IVF/PQ recall improves on decorrelated axes).

Determinism contract (repo rule: bit-identical under any
partitioning):
- vectors are int64-quantized at scale 2**scale_bits; the per-block
  partials (count, per-dim sums, upper-triangle Gram X^T X) are
  EXACT integers. Per-batch Gram math is int64 with an overflow
  guard; merged partials are carried as decimal128(38,0) and summed
  as Python ints, since a corpus Gram entry (n * maxq^2) passes
  int64 long before 10^12 rows (same reasoning as
  stages/regression.py's decimal partials).
- the covariance numerator n*G_ij - s_i*s_j is formed in exact
  Python ints; floats appear only at the final per-entry division,
  so the d x d covariance handed to the (single, driver-side)
  `numpy.linalg.eigh` call is identical for any partitioning.
- eigenvector sign is fixed deterministically: the entry of largest
  |value| (lowest index on ties) is made positive.

Ray-Data shape: one map_batches pass emits ONE partial row per block
(d + d(d+1)/2 decimals); partials are tree-folded via
repartition+merge (stages/kmeans.py:_tree_fold — zero shuffles, no
unbounded driver collect). `pca_transform` broadcasts (mean,
components) once via `ray.put` and projects map-side; payload rows
never shuffle.

Reference parity: the reference engine has no linear algebra; this is
a graft-side operator (SURVEY.md training-data additions).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .kmeans import _quantize, _tree_fold, _vec_matrix

_DEC = pa.decimal128(38, 0)


def _empty_partial(d: int) -> pa.Table:
    return pa.table({
        "n": pa.array([], pa.int64()),
        "s": pa.array([], pa.list_(_DEC)),
        "g": pa.array([], pa.list_(_DEC))})


def pca_fit(emb_ds, *, vec_col: str = "embedding",
            n_components: int = 2, scale_bits: int = 20,
            max_dim: int = 512) -> dict:
    """-> {"mean": (d,) float64, "components": (k, d) float64 rows,
    "explained_var": (k,) float64, "total_var": float, "n": int,
    "scale_bits": int}.

    Exact distributed covariance (see module docstring), driver-side
    eigh on the d x d matrix. Rows with null/empty vectors are
    ignored. RAISES on d > max_dim (the partial row carries
    d(d+1)/2 decimals — at d=512 that is ~131k values per block,
    the documented ceiling) and on n < 2.
    """
    if n_components <= 0:
        raise ValueError("n_components must be >= 1")
    scale = 1 << scale_bits

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_partial(0)
        mat = _vec_matrix(t[vec_col])
        n, d = mat.shape
        if n == 0 or d == 0:
            return _empty_partial(0)
        if d > max_dim:
            raise ValueError(
                f"vector dim {d} > max_dim={max_dim}; project or "
                "chunk dimensions before PCA")
        xq = _quantize(mat, scale)
        maxq = int(np.abs(xq).max(initial=0))
        if n * maxq * maxq >= 1 << 62:
            # exact per-batch int64 Gram would overflow: halve the
            # work per batch and recurse (deterministic split).
            half = t.num_rows // 2
            a = partial(t.slice(0, half))
            b = partial(t.slice(half))
            return pa.concat_tables([a, b])
        iu = np.triu_indices(d)
        gram = (xq.T @ xq)[iu]                  # exact int64
        sums = xq.sum(axis=0)                    # exact int64
        return pa.table({
            "n": pa.array([n], pa.int64()),
            "s": pa.array([[int(v) for v in sums]], pa.list_(_DEC)),
            "g": pa.array([[int(v) for v in gram]], pa.list_(_DEC))})

    def merge(t: pa.Table) -> pa.Table:
        rows = [(int(t["n"][i].as_py()),
                 t["s"][i].as_py(), t["g"][i].as_py())
                for i in range(t.num_rows)
                if int(t["n"][i].as_py()) > 0]
        if not rows:
            return _empty_partial(0)
        n = sum(r[0] for r in rows)
        s = [sum(int(r[1][j]) for r in rows)
             for j in range(len(rows[0][1]))]
        g = [sum(int(r[2][j]) for r in rows)
             for j in range(len(rows[0][2]))]
        return pa.table({
            "n": pa.array([n], pa.int64()),
            "s": pa.array([s], pa.list_(_DEC)),
            "g": pa.array([g], pa.list_(_DEC))})

    folded = _tree_fold(emb_ds.map_batches(
        partial, batch_format="pyarrow"), merge, target_rows=1)
    if folded is None or folded.num_rows == 0:
        raise ValueError("no non-empty vectors to fit PCA on")
    folded = merge(folded)
    n = int(folded["n"][0].as_py())
    if n < 2:
        raise ValueError(f"need >= 2 vectors, got {n}")
    s = [int(v) for v in folded["s"][0].as_py()]
    g = [int(v) for v in folded["g"][0].as_py()]
    d = len(s)
    k = min(n_components, d)

    # exact integer covariance numerator, one float division per cell
    denom = float(n) * float(n - 1) * float(scale) * float(scale)
    cov = np.empty((d, d), np.float64)
    iu = np.triu_indices(d)
    for idx, (i, j) in enumerate(zip(*iu)):
        num = n * g[idx] - s[i] * s[j]           # exact Python int
        cov[i, j] = cov[j, i] = float(num) / denom
    evals, evecs = np.linalg.eigh(cov)           # ascending
    order = np.argsort(-evals, kind="stable")[:k]
    comps = evecs[:, order].T                    # (k, d)
    # deterministic sign: largest-|entry| (first on tie) positive
    for r in range(k):
        lead = int(np.argmax(np.abs(comps[r])))
        if comps[r, lead] < 0:
            comps[r] = -comps[r]
    mean = np.array([float(v) / (n * scale) for v in s], np.float64)
    return {"mean": mean, "components": comps,
            "explained_var": np.maximum(evals[order], 0.0),
            "total_var": float(np.maximum(evals, 0.0).sum()),
            "n": n, "scale_bits": scale_bits}


def pca_transform(emb_ds, fit: dict, *, vec_col: str = "embedding",
                  id_col: str = "vec_id", out_col: str = "pc"):
    """-> Dataset (id, out_col: list<double>): center by the fit mean
    and project onto the fit components. Broadcast once via ray.put;
    pure map-side, rows with null/empty vectors are dropped."""
    mean = np.asarray(fit["mean"], np.float64)
    comps = np.asarray(fit["components"], np.float64)
    ref = ray.put((mean, comps))

    def project(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "id": pa.array([], pa.int64()),
            out_col: pa.array([], pa.list_(pa.float64()))})
        if t.num_rows == 0:
            return empty
        mat = _vec_matrix(t[vec_col])
        if mat.shape[0] == 0 or mat.shape[1] == 0:
            return empty
        m, w = ray.get(ref)
        ids = t[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        proj = (mat - m) @ w.T
        return pa.table({
            "id": pa.array(ids),
            out_col: pa.array(list(proj), pa.list_(pa.float64()))})

    return emb_ds.map_batches(project, batch_format="pyarrow")

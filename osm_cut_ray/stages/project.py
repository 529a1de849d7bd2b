"""Random projection (Johnson-Lindenstrauss) for embedding columns.

Achlioptas 2003 ("Database-friendly random projections"): entries of
the projection matrix are drawn from {+1, 0, -1} with probabilities
{1/6, 2/3, 1/6} and the result scaled by sqrt(3 / out_dim) — the JL
distance-preservation guarantee holds with integer matrix entries.

That integer structure is what makes the op BIT-deterministic here:
inputs are quantized to int64 (`scale_bits` fractional bits), the
projection runs as an exact int64 matmul (numpy integer matmul — no
BLAS float reassociation, so no batch-shape-dependent rounding), and
floats appear only in the final fixed scale division. Results are
identical under any partitioning/batch composition. Overflow is
guarded per batch (RAISES; d * max|x| * 2^scale_bits must stay
inside int64).

The matrix itself derives from splitmix64(seed, i, j) — no RNG
state, reproducible everywhere. One map pass, zero shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _sm64(z: np.ndarray) -> np.ndarray:
    z = (z + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def achlioptas_matrix(in_dim: int, out_dim: int,
                      seed: int = 0) -> np.ndarray:
    """Deterministic {-1, 0, +1} matrix, P(+-1) = 1/6 each."""
    i = np.arange(in_dim, dtype=np.uint64)[:, None]
    j = np.arange(out_dim, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        h = _sm64(i * np.uint64(0x100000001B3)
                  ^ _sm64(j + np.uint64(seed) * np.uint64(0x9E37)))
    u = h % np.uint64(6)
    return (np.where(u == 0, 1, np.where(u == 1, -1, 0))
            .astype(np.int64))


def project_embeddings(ds, out_dim: int, *, seed: int = 0,
                       emb_col: str = "embedding",
                       scale_bits: int = 20):
    """-> Dataset with `emb_col` replaced by the out_dim projection
    (float64 list), other columns untouched. Exact integer matmul;
    bit-identical under any partitioning."""
    if out_dim <= 0:
        raise ValueError("out_dim must be positive")
    q = np.int64(1) << np.int64(scale_bits)
    scale = float(np.sqrt(3.0 / out_dim)) / float(q)
    state: dict = {}

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            idx = t.schema.get_field_index(emb_col)
            return t.set_column(idx, emb_col,
                                pa.array([], pa.list_(pa.float64())))
        x = np.stack(t[emb_col].to_pylist()).astype(np.float64)
        r = state.get("r")
        if r is None or r.shape[0] != x.shape[1]:
            r = state["r"] = achlioptas_matrix(x.shape[1], out_dim,
                                               seed)
        # int64 overflow guard BEFORE the cast (a wrapped cast is
        # already corrupt): worst-case |row dot| <= d * max|x| * q
        bound = x.shape[1] * float(np.abs(x).max(initial=0.0)) \
            * float(q)
        if bound >= float(1 << 62):
            raise ValueError(
                "project_embeddings: d * max|x| * 2^scale_bits "
                "overflows int64 — lower scale_bits")
        xi = np.rint(x * q).astype(np.int64)
        y = (xi @ r).astype(np.float64) * scale
        idx = t.schema.get_field_index(emb_col)
        off = pa.array(np.arange(0, (len(y) + 1) * out_dim, out_dim,
                                 np.int32))
        arr = pa.ListArray.from_arrays(off, pa.array(y.ravel()))
        return t.set_column(idx, emb_col, arr)

    return ds.map_batches(fn, batch_format="pyarrow")

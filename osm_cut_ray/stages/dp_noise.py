"""Differentially-private releases of per-key aggregates — the
privacy-preserving census counterpart to `stages/anonymity.py`
(Dwork 2006): released count/sum per key gets Laplace noise of scale
sensitivity/epsilon via the inverse-CDF transform.

Determinism contract (repo rule): the noise is NOT an RNG stream —
u = splitmix64(key, seed) -> uniform(0,1) -> Laplace quantile, so a
release is a pure function of (key, seed, epsilon) and re-runs,
resumes, and any partitioning produce the identical release
(`stages/wsample.py:uniform_hash`, the dsir trick). A fresh seed per
release is the caller's privacy obligation (same seed = same noise =
no extra leakage; reusing a seed across DIFFERENT epsilons leaks —
documented, not enforceable here).

Ray-Data shape: exact per-key aggregates ride ONE slim bucketed fold
(map-side partial counts/sums, int64-quantized sums exact under any
partitioning); noise is applied map-side afterwards. Values are
clipped to `clip` BEFORE aggregation (bounded sensitivity — the
standard mechanism; clipping is part of the released definition).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .join import bucketed_group_apply
from .wsample import uniform_hash


def _laplace_from_uniform(u: np.ndarray, scale: float) -> np.ndarray:
    """Inverse-CDF Laplace(0, scale): u in (0,1) -> quantile."""
    return -scale * np.sign(u - 0.5) * np.log1p(-2.0 * np.abs(u - 0.5))


def dp_key_release(ds, *, key_col: str, value_col: str | None = None,
                   epsilon: float = 1.0, clip: float = 1.0,
                   seed: int = 0, quant_bits: int = 20,
                   num_buckets: int | None = None):
    """-> Dataset (key, n_true excluded!): (key, dp_count,
    dp_sum) — Laplace-noised per-key count and (if `value_col`)
    clipped sum. Count sensitivity 1 -> scale 1/eps; sum sensitivity
    `clip` -> scale clip/eps (each gets HALF the epsilon when both
    are released, the standard composition split).

    Exact aggregates are computed in int64 fixed point (2^quant_bits)
    so the pre-noise totals are bit-identical under any partitioning;
    the noise is a pure function of (key, seed) — the whole release
    is deterministic."""
    if epsilon <= 0 or clip <= 0:
        raise ValueError("epsilon and clip must be positive")
    S = np.float64(1 << quant_bits)
    eps_each = epsilon / 2.0 if value_col is not None else epsilon

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"key": pa.array([], pa.int64()),
                          "cnt": pa.array([], pa.int64()),
                          "qs": pa.array([], pa.int64())})
        if t.num_rows == 0 or key_col not in t.column_names:
            return empty
        keys = t[key_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        u, inv = np.unique(keys, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        if value_col is not None:
            v = t[value_col].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            qv = np.round(np.clip(v, -clip, clip) * S) \
                .astype(np.int64)
            qs = np.zeros(len(u), np.int64)
            np.add.at(qs, inv, qv)
        else:
            qs = np.zeros(len(u), np.int64)
        return pa.table({"key": pa.array(u), "cnt": pa.array(cnt),
                         "qs": pa.array(qs)})

    def fold(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby("key").agg(cnt=("cnt", "sum"),
                                   qs=("qs", "sum"))
        keys = agg.index.to_numpy(np.int64)
        # count noise: seed branch 1; sum noise: seed branch 2
        nc = _laplace_from_uniform(
            uniform_hash(keys, seed * 4 + 1), 1.0 / eps_each)
        dp_cnt = agg["cnt"].to_numpy(np.int64) + nc
        out = {"key": pa.array(keys),
               "dp_count": pa.array(dp_cnt)}
        if value_col is not None:
            ns = _laplace_from_uniform(
                uniform_hash(keys, seed * 4 + 2), clip / eps_each)
            out["dp_sum"] = pa.array(
                agg["qs"].to_numpy(np.int64) / S + ns)
        return pa.table(out)

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return bucketed_group_apply(parts, "key", fold,
                                num_buckets=num_buckets)


def dp_histogram(ds, *, key_col: str, epsilon: float = 1.0,
                 seed: int = 0, threshold: float | None = None,
                 num_buckets: int | None = None):
    """Noisy per-key histogram (counts only); with `threshold`,
    keys whose NOISED count falls below it are suppressed — the
    standard stability-based release for unbounded key domains
    (publishing which keys exist leaks; thresholding bounds it)."""
    rel = dp_key_release(ds, key_col=key_col, value_col=None,
                         epsilon=epsilon, seed=seed,
                         num_buckets=num_buckets)
    if threshold is None:
        return rel

    def gate(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        keep = t["dp_count"].to_numpy(zero_copy_only=False) \
            >= threshold
        return t.filter(pa.array(keep))

    return rel.map_batches(gate, batch_format="pyarrow")

"""Per-key changepoint detection — exact penalized segmentation of
each key's time series into mean-constant segments, via PELT
(Killick, Fearnhead, Eckley 2012: "Optimal detection of changepoints
with a linear computational cost"). The objective is the classic
  min over segmentations:  sum_seg SSE(seg) + beta * (#changepoints)
and PELT's pruning is EXACT (SSE is superadditive, so a pruned
candidate can never return — results equal the O(n^2) DP, which the
tests pin). Ties take the smallest candidate index (first argmin),
making the segmentation fully deterministic.

penalty: a float beta, or "bic" — 2 * sigma^2 * log(n) per key with
sigma estimated robustly from the median absolute lag-1 difference
(MAD / (sqrt(2) * 0.6745); a mean SHIFT inflates a naive std but not
the lag-1 MAD).

Ray-Data shape: slim (key, ts, value) projection, ONE bucketed
shuffle on the key, per-key PELT with numpy candidate-set bodies.
`max_key_rows` RAISES on corpus-scale keys (the repo cap contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import join as J
from .join import bucketed_group_apply


def pelt_mean(x: np.ndarray, beta: float) -> list[int]:
    """Changepoint indices (segment starts, excluding 0) minimizing
    sum of segment SSEs + beta per changepoint. Exact."""
    n = len(x)
    if n == 0:
        return []
    cs = np.concatenate(([0.0], np.cumsum(x)))
    ss = np.concatenate(([0.0], np.cumsum(x * x)))
    F = np.empty(n + 1)
    F[0] = -beta
    prev = np.zeros(n + 1, np.int64)
    cand = np.array([0], np.int64)
    for e in range(1, n + 1):
        d = e - cand
        seg = ss[e] - ss[cand] - (cs[e] - cs[cand]) ** 2 / d
        tot = F[cand] + seg + beta
        i = int(np.argmin(tot))
        F[e] = tot[i]
        prev[e] = cand[i]
        keep = F[cand] + seg <= F[e]
        cand = np.concatenate((cand[keep], [e]))
    cps = []
    e = n
    while e > 0:
        s = int(prev[e])
        if s > 0:
            cps.append(s)
        e = s
    return cps[::-1]


def _bic_beta(x: np.ndarray) -> float:
    n = len(x)
    if n < 3:
        return 1.0
    d = np.abs(np.diff(x))
    sigma = float(np.median(d)) / (np.sqrt(2.0) * 0.6745)
    sigma = max(sigma, 1e-12)
    return 2.0 * sigma * sigma * np.log(n)


def changepoints(ds, *, key_col: str, ts_col: str, val_col: str,
                 penalty: float | str = "bic",
                 max_key_rows: int = 1_000_000):
    """-> Dataset (key, cp_index, cp_ts): one row per detected
    changepoint — cp_index is the 0-based position within the key's
    ts-sorted series where a new segment starts, cp_ts its
    timestamp. Keys with no changepoint emit nothing."""
    if not (penalty == "bic" or isinstance(penalty, (int, float))):
        raise ValueError("penalty must be a float or 'bic'")
    import ray.data as rd

    empty = pa.table({
        "key": pa.array([], pa.int64()),
        "cp_index": pa.array([], pa.int64()),
        "cp_ts": pa.array([], pa.float64())})

    def slim(t: pa.Table) -> pa.Table:
        if len(t) == 0 or key_col not in t.column_names:
            return pa.table({"key": pa.array([], pa.int64()),
                             "ts": pa.array([], pa.float64()),
                             "value": pa.array([], pa.float64())})
        return pa.table({
            "key": pa.compute.cast(t[key_col], pa.int64()),
            "ts": pa.compute.cast(t[ts_col], pa.float64()),
            "value": pa.compute.cast(t[val_col], pa.float64())})

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return empty
        g = g.sort_values(["key", "ts", "value"], kind="mergesort")
        key = g["key"].to_numpy(np.int64)
        ts = g["ts"].to_numpy(np.float64)
        val = g["value"].to_numpy(np.float64)
        starts = np.concatenate(
            ([0], np.flatnonzero(key[1:] != key[:-1]) + 1,
             [len(key)]))
        out_k, out_i, out_t = [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            x = val[s:e]
            beta = _bic_beta(x) if penalty == "bic" \
                else float(penalty)
            for cp in pelt_mean(x, beta):
                out_k.append(key[s])
                out_i.append(cp)
                out_t.append(ts[s + cp])
        if not out_k:
            return empty
        return pa.table({
            "key": pa.array(np.asarray(out_k, np.int64)),
            "cp_index": pa.array(np.asarray(out_i, np.int64)),
            "cp_ts": pa.array(np.asarray(out_t, np.float64))})

    out, n = J.solidify(bucketed_group_apply(
        ds.map_batches(slim, batch_format="pyarrow"), "key", fold,
        max_key_rows=max_key_rows))
    if n == 0:
        return rd.from_arrow(empty)
    return out

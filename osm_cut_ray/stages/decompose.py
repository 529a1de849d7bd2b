"""Classical additive seasonal decomposition per key (the textbook
"classical decomposition", Hyndman & Athanasopoulos FPP ch. 3 — the
same formulation statsmodels' seasonal_decompose implements):

  trend_t    = centered moving average of window m
               (even m uses the 2 x m-MA: half-weight endpoints)
  seasonal_j = mean over detrended values at phase j (t mod m),
               re-centered so the m indexes sum to zero
  resid_t    = x_t - trend_t - seasonal_t

Edges where the centered window does not fit are NaN (trend and
resid), exactly as in the textbook; keys with fewer than 2*m
observations get all-NaN components (not enough data for a seasonal
estimate — surfaced, never guessed).

Ray-Data shape (same contract as stages/kalman.py): slim (key, ts,
value) rows, ONE key-bucket shuffle, per-key vectorized numpy
(convolution MA + bincount phase means) inside the bucket fold.
Each key's float recursion runs in its own ts-order, so results are
partition-invariant bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .join import bucketed_group_apply


def decompose_series(x: np.ndarray, period: int
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One ts-ordered series -> (trend, seasonal, resid), each
    len(x), NaN where undefined."""
    n = len(x)
    x = np.asarray(x, np.float64)
    trend = np.full(n, np.nan)
    seasonal = np.full(n, np.nan)
    if n < 2 * period:
        return trend, seasonal, np.full(n, np.nan)
    m = period
    if m % 2 == 1:
        w = np.full(m, 1.0 / m)
        h = (m - 1) // 2
    else:
        w = np.full(m + 1, 1.0 / m)
        w[0] = w[-1] = 0.5 / m
        h = m // 2
    if n >= len(w):
        trend[h:n - h] = np.convolve(x, w, mode="valid")
    detr = x - trend
    phase = np.arange(n) % m
    ok = ~np.isnan(detr)
    cnt = np.bincount(phase[ok], minlength=m)
    ssum = np.bincount(phase[ok], weights=detr[ok], minlength=m)
    idx = np.where(cnt > 0, ssum / np.maximum(cnt, 1), 0.0)
    idx = idx - idx.mean()
    seasonal = idx[phase]
    return trend, seasonal, x - trend - seasonal


def decompose_per_key(ds, *, period: int, key_col: str = "key",
                      ts_col: str = "ts", value_col: str = "value"):
    """-> Dataset (key, ts, value, trend, seasonal, resid): classical
    additive decomposition of each key's ts-ordered series."""
    if period < 2:
        raise ValueError("period must be >= 2")

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({
            "key": pa.array([], pa.int64()),
            "ts": pa.array([], pa.float64()),
            "value": pa.array([], pa.float64()),
            "trend": pa.array([], pa.float64()),
            "seasonal": pa.array([], pa.float64()),
            "resid": pa.array([], pa.float64())})
        if len(g) == 0:
            return empty
        g = g.sort_values([key_col, ts_col], kind="stable") \
            .reset_index(drop=True)
        key = g[key_col].to_numpy(np.int64)
        ts = g[ts_col].to_numpy(np.float64)
        val = g[value_col].to_numpy(np.float64)
        starts = np.concatenate(
            ([0], np.flatnonzero(key[1:] != key[:-1]) + 1, [len(key)]))
        tr = np.empty(len(key))
        se = np.empty(len(key))
        re = np.empty(len(key))
        for k in range(len(starts) - 1):
            s, e = int(starts[k]), int(starts[k + 1])
            tr[s:e], se[s:e], re[s:e] = decompose_series(
                val[s:e], period)
        return pa.table({
            "key": pa.array(key), "ts": pa.array(ts),
            "value": pa.array(val), "trend": pa.array(tr),
            "seasonal": pa.array(se), "resid": pa.array(re)})

    return bucketed_group_apply(ds, key_col, per_bucket)

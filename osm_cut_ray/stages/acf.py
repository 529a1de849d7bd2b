"""Per-key autocorrelation function — the seasonality/lag-structure
probe a telemetry or sensor pipeline runs per device/user before
picking forecast features (pairs with stages/forecast.py's
Holt-Winters and stages/changepoint.py).

Estimator: the standard biased ACF (statsmodels default),
    r_l = sum_{t<n-l} (x_t - xbar)(x_{t+l} - xbar)
          / sum_t (x_t - xbar)^2
over the key's series ordered by (ts, id). Emits lags 0..max_lag
(lag 0 == 1.0), only where lag < n; constant series (zero variance)
emit null acf for lags >= 1.

Ray-Data shape: slim (key, id, ts, value) projection, ONE bucketed
shuffle (stages/join.py:bucketed_group_apply), per-key O(n*max_lag)
vectorized dot products inside the bucket fold (loop over keys, not
rows). Each key's float math happens in exactly one task over the
sorted series, so results are bit-deterministic under any input
partitioning. `max_key_rows` RAISES on corpus-scale keys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import join as J
from .join import bucketed_group_apply

_EMPTY = pa.table({
    "key": pa.array([], pa.int64()),
    "lag": pa.array([], pa.int64()),
    "acf": pa.array([], pa.float64()),
    "n": pa.array([], pa.int64())})


def acf_series(x: np.ndarray, max_lag: int):
    """ACF of one ordered series -> (lags, values) with NaN where
    undefined (zero variance). The single-series kernel, shared with
    the brute pin."""
    n = len(x)
    x = x.astype(np.float64)
    d = x - x.mean()
    denom = float(np.dot(d, d))
    lags = np.arange(0, min(max_lag, n - 1) + 1, dtype=np.int64)
    out = np.empty(len(lags), np.float64)
    out[0] = 1.0
    for i, lag in enumerate(lags[1:], start=1):
        num = float(np.dot(d[:-lag], d[lag:]))
        out[i] = num / denom if denom > 0.0 else np.nan
    return lags, out


def acf_per_key(ds, *, key_col: str, id_col: str, ts_col: str,
                val_col: str, max_lag: int,
                max_key_rows: int | None = None):
    """-> Dataset (key, lag, acf, n)."""
    if max_lag < 1:
        raise ValueError("max_lag must be >= 1")
    import ray.data as rd

    def slim(t: pa.Table) -> pa.Table:
        if len(t) == 0 or key_col not in t.column_names:
            return pa.table({"key": pa.array([], pa.int64()),
                             "id": pa.array([], pa.int64()),
                             "ts": pa.array([], pa.int64()),
                             "value": pa.array([], pa.float64())})
        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pa.compute.cast(ts, pa.int64())
        else:
            ts = pa.compute.cast(ts, pa.int64())
        return pa.table({
            "key": pa.compute.cast(t[key_col], pa.int64()),
            "id": pa.compute.cast(t[id_col], pa.int64()),
            "ts": ts,
            "value": pa.compute.cast(t[val_col], pa.float64())})

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return _EMPTY
        key = g["key"].to_numpy(np.int64)
        rid = g["id"].to_numpy(np.int64)
        ts = g["ts"].to_numpy(np.int64)
        val = g["value"].to_numpy(np.float64)
        order = np.lexsort((rid, ts, key))
        key, val = key[order], val[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(key[1:] != key[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(key)]))
        ks, ls, vs, ns = [], [], [], []
        for s, e in zip(starts, ends):
            lags, acf = acf_series(val[s:e], max_lag)
            ks.append(np.full(len(lags), key[s], np.int64))
            ls.append(lags)
            vs.append(acf)
            ns.append(np.full(len(lags), e - s, np.int64))
        return pa.table({
            "key": pa.array(np.concatenate(ks)),
            "lag": pa.array(np.concatenate(ls)),
            "acf": pa.array(np.concatenate(vs)),
            "n": pa.array(np.concatenate(ns))})

    out, n = J.solidify(bucketed_group_apply(
        ds.map_batches(slim, batch_format="pyarrow"), "key", fold,
        max_key_rows=max_key_rows))
    if n == 0:
        return rd.from_arrow(_EMPTY)
    return out

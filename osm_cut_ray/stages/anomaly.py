"""Per-key rolling-window anomaly detection: robust z-score against
the trailing window's median/MAD (Leys et al. 2013 — the standard
robust outlier rule; 1.4826 makes MAD a consistent sigma estimator
for normal data).

For each key's time-ordered series, every point is scored against the
W points strictly BEFORE it: z = |x - med| / (1.4826 * MAD). Points
with fewer than `window` predecessors get z = NaN / flag 0 (not
enough history — never guessed). A zero MAD (constant window) scores
z = inf for any deviation, 0 for an exact match.

Ray-Data shape: ONE bucketed shuffle on the key (each key's rows
co-located), per-key numpy sliding-window kernel (vectorized
median/MAD over a 2-D stride view — no Python loop over rows).
`max_key_rows` RAISES on corpus-scale keys (the repo cap contract);
rolling state only needs W of history, so giant keys can be
chunk-split with a W-row overlap upstream if needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import join as J
from .join import bucketed_group_apply

MAD_K = 1.4826


def rolling_anomalies(ds, *, key_col: str, ts_col: str,
                      val_col: str, window: int = 20,
                      z_thresh: float = 3.5,
                      max_key_rows: int = 5_000_000):
    """-> Dataset (key, ts, value, med, mad, z, is_anomaly). Ties in
    ts are ordered by value then input order within the key (the
    sort is stable on (ts, value))."""
    if window < 2:
        raise ValueError("window must be >= 2")
    import ray.data as rd

    empty = pa.table({
        "key": pa.array([], pa.int64()),
        "ts": pa.array([], pa.float64()),
        "value": pa.array([], pa.float64()),
        "med": pa.array([], pa.float64()),
        "mad": pa.array([], pa.float64()),
        "z": pa.array([], pa.float64()),
        "is_anomaly": pa.array([], pa.int8())})

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
        med = np.full(len(key), np.nan)
        mad = np.full(len(key), np.nan)
        for s, e in zip(starts[:-1], starts[1:]):
            n = e - s
            if n <= window:
                continue
            v = val[s:e]
            # windows of the W values preceding each point
            win = np.lib.stride_tricks.sliding_window_view(
                v[:-1], window)          # (n - window, window)
            m = np.median(win, axis=1)
            d = np.median(np.abs(win - m[:, None]), axis=1)
            med[s + window:e] = m
            mad[s + window:e] = d
        dev = np.abs(val - med)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = dev / (MAD_K * mad)
        # constant history: exact match -> 0, any deviation -> inf
        zero_mad = np.isfinite(med) & (mad == 0)
        z[zero_mad & (dev == 0)] = 0.0
        z[zero_mad & (dev > 0)] = np.inf
        flag = (np.nan_to_num(z, nan=0.0, posinf=np.inf)
                > z_thresh).astype(np.int8)
        return pa.table({
            "key": pa.array(key), "ts": pa.array(ts),
            "value": pa.array(val), "med": pa.array(med),
            "mad": pa.array(mad), "z": pa.array(z),
            "is_anomaly": pa.array(flag)})

    out, n = J.solidify(bucketed_group_apply(
        ds.map_batches(slim, batch_format="pyarrow"), "key", fold,
        max_key_rows=max_key_rows))
    if n == 0:
        import ray.data as rd
        return rd.from_arrow(empty)
    return out

"""Per-key time-series resampling with gap fill.

The regularization step every windowed model needs before a
decompose / forecast / changepoint pass: bucket each key's
irregular (ts, value) points onto a fixed `freq` grid with an
aggregate (mean/sum/min/max/count), then MATERIALIZE the empty
bins between each key's first and last observation and fill them
(`null`, `zero`, or `ffill` — carry the last aggregated value).

Ray-Data shape: slim (key, bin, value) projection, ONE bucketed
shuffle, per-key vectorized binning + reduceat aggregation + gap
expansion inside the bucket task; `max_bins_per_key` RAISES on
runaway spans (a key spanning years at 1-second freq is a data bug,
not a workload). Deterministic: float aggregates run in (bin, ts,
value) sorted order; the binned aggregate (pre-fill) is
DuckDB-pinned in tests/test_resample.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_AGGS = ("mean", "sum", "min", "max", "count")
_FILLS = ("null", "zero", "ffill")


def resample_series(ds, *, freq: float, key_col: str = "key",
                    ts_col: str = "ts", value_col: str = "value",
                    how: str = "mean", fill: str = "null",
                    origin: float = 0.0,
                    max_bins_per_key: int = 1_000_000,
                    num_buckets: int | None = None):
    """-> Dataset (key, bin_ts, value, n): one row per `freq` bin
    from each key's first to last observed bin; `n` = observations
    in the bin (0 for filled gaps)."""
    from .join import bucketed_group_apply

    if how not in _AGGS:
        raise ValueError(f"how must be one of {_AGGS}")
    if fill not in _FILLS:
        raise ValueError(f"fill must be one of {_FILLS}")
    if freq <= 0:
        raise ValueError("freq must be positive")

    def slim(t: pa.Table) -> pa.Table:
        ts = t[ts_col].to_numpy(zero_copy_only=False)\
            .astype(np.float64)
        return pa.table({
            "key": t[key_col].cast(pa.int64()),
            "bin": np.floor((ts - origin) / freq).astype(np.int64),
            "ts": ts,
            "val": t[value_col].cast(pa.float64())})

    rows = ds.map_batches(slim, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"key": pa.array([], pa.int64()),
                          "bin_ts": pa.array([], pa.float64()),
                          "value": pa.array([], pa.float64()),
                          "n": pa.array([], pa.int64())})
        if len(g) == 0:
            return empty
        key = g["key"].to_numpy(np.int64)
        binv = g["bin"].to_numpy(np.int64)
        ts = g["ts"].to_numpy(np.float64)
        val = g["val"].to_numpy(np.float64)
        order = np.lexsort((val, ts, binv, key))
        key, binv, val = key[order], binv[order], val[order]
        kb_new = np.concatenate(
            ([True], (key[1:] != key[:-1]) | (binv[1:] != binv[:-1])))
        starts = np.flatnonzero(kb_new)
        grp_key = key[starts]
        grp_bin = binv[starts]
        cnt = np.diff(np.concatenate((starts, [len(key)])))
        valz = np.concatenate((val, [0.0]))
        sums = np.add.reduceat(valz, starts)
        if how == "mean":
            agg = sums / cnt
        elif how == "sum":
            agg = sums
        elif how == "count":
            agg = cnt.astype(np.float64)
        elif how == "min":
            agg = np.minimum.reduceat(valz, starts)
        else:
            agg = np.maximum.reduceat(
                np.concatenate((val, [-np.inf])), starts)

        out_k, out_b, out_v, out_n = [], [], [], []
        knew = np.concatenate(([True], grp_key[1:] != grp_key[:-1]))
        kstarts = np.flatnonzero(knew)
        kends = np.append(kstarts[1:], len(grp_key))
        for s, e in zip(kstarts, kends):
            b0, b1 = int(grp_bin[s]), int(grp_bin[e - 1])
            span = b1 - b0 + 1
            if span > max_bins_per_key:
                raise ValueError(
                    f"resample_series: key {int(grp_key[s])} spans "
                    f"{span} bins > max_bins_per_key="
                    f"{max_bins_per_key}; coarsen freq or split")
            full_v = np.full(span, np.nan)
            full_n = np.zeros(span, np.int64)
            pos = (grp_bin[s:e] - b0).astype(np.int64)
            full_v[pos] = agg[s:e]
            full_n[pos] = cnt[s:e]
            if fill == "zero":
                full_v = np.where(full_n == 0, 0.0, full_v)
            elif fill == "ffill":
                idx = np.maximum.accumulate(
                    np.where(full_n > 0, np.arange(span), 0))
                full_v = full_v[idx]
            out_k.append(np.full(span, grp_key[s], np.int64))
            out_b.append((b0 + np.arange(span)) * freq + origin)
            out_v.append(full_v)
            out_n.append(full_n)
        return pa.table({"key": np.concatenate(out_k),
                         "bin_ts": np.concatenate(out_b),
                         "value": np.concatenate(out_v),
                         "n": np.concatenate(out_n)})

    return bucketed_group_apply(rows, "key", per_bucket,
                                num_buckets=num_buckets)

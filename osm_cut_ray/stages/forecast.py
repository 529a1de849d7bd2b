"""Per-cell demand forecasting: Holt linear / Holt-Winters additive
exponential smoothing over the complete event-count series of every
hex cell — the forecasting sibling of `emerging_hotspots` (same
binning, predictive instead of trend-testing).

Model (the public textbook recursions):
  level  l_t = alpha * x_t + (1-alpha) * (l_{t-1} + b_{t-1})
  trend  b_t = beta * (l_t - l_{t-1}) + (1-beta) * b_{t-1}
  + additive seasonality s_t (period m) when season_len is given:
  l_t uses (x_t - s_{t-m}); s_t = gamma*(x_t - l_t) + (1-gamma)s_{t-m}
Init: l_0 = x_0, b_0 = x_1 - x_0 (Holt); seasonal: l_0 = mean of the
first season, b_0 = (mean season2 - mean season1)/m, s_j = x_j - l_0.
Forecast h steps ahead: l_T + h*b_T (+ s_{T+h-m} cyclically).

Ray-Data shape: per-batch (cell, tbin) count combine -> ONE
cell-bucket shuffle -> per-bucket dense (cells x bins) matrix and the
recursions run VECTORIZED ACROSS CELLS (t-loop of elementwise ops).
Zeros are real observations (complete series over [t0, t1)), so
output is bit-deterministic under any partitioning.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geometry.cells import hex_cell
from .join import bucketed_group_apply


def holt_forecast_matrix(mat: np.ndarray, *, alpha: float,
                         beta: float, horizon: int,
                         gamma: float | None = None,
                         season_len: int | None = None):
    """(n_series, n_bins) float matrix -> (level, trend, sse,
    fc (n_series, horizon)). Vectorized across series."""
    X = mat.astype(np.float64)
    n, B = X.shape
    if season_len is not None:
        m = int(season_len)
        if not (gamma is not None and 0 < gamma < 1):
            raise ValueError("seasonal model needs gamma in (0,1)")
        if B < 2 * m:
            raise ValueError("need >= 2 full seasons of bins")
        l = X[:, :m].mean(axis=1)
        b = (X[:, m:2 * m].mean(axis=1) - l) / m
        S = X[:, :m] - l[:, None]   # s_0..s_{m-1}
        sse = np.zeros(n)
        for t in range(m, B):
            si = S[:, t % m]
            f = l + b + si
            sse += (X[:, t] - f) ** 2
            l_new = alpha * (X[:, t] - si) + (1 - alpha) * (l + b)
            b = beta * (l_new - l) + (1 - beta) * b
            S[:, t % m] = gamma * (X[:, t] - l_new) + (1 - gamma) * si
            l = l_new
        h = np.arange(1, horizon + 1)
        fc = l[:, None] + h[None, :] * b[:, None] \
            + S[:, (B + h - 1) % m]
        return l, b, sse, fc
    l = X[:, 0].copy()
    b = X[:, 1] - X[:, 0]
    sse = np.zeros(n)
    for t in range(1, B):
        f = l + b
        sse += (X[:, t] - f) ** 2
        l_new = alpha * X[:, t] + (1 - alpha) * (l + b)
        b = beta * (l_new - l) + (1 - beta) * b
        l = l_new
    h = np.arange(1, horizon + 1)
    fc = l[:, None] + h[None, :] * b[:, None]
    return l, b, sse, fc


def cell_forecast(points_ds, *, t0: float, t1: float,
                  interval: float, horizon: int = 3,
                  alpha: float = 0.5, beta: float = 0.1,
                  gamma: float | None = None,
                  season_len: int | None = None, res: int = 7,
                  x_col: str = "lon", y_col: str = "lat",
                  ts_col: str = "ts"):
    """-> Dataset (cell, n_events, level, trend, sse, fc list<double>
    of `horizon` steps) per non-empty hex cell."""
    if not (0 < alpha < 1 and 0 < beta < 1):
        raise ValueError("alpha, beta must be in (0, 1)")
    if horizon < 1:
        raise ValueError("horizon must be >= 1")
    n_bins = int(np.ceil((t1 - t0) / interval))
    if n_bins < 2:
        raise ValueError("need >= 2 time bins")
    if season_len is not None and n_bins < 2 * season_len:
        raise ValueError("need >= 2 full seasons of bins")

    def slim(t: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.int64()),
                          "tbin": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ts = t[ts_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        ok = (ts >= t0) & (ts < t1)
        if not ok.any():
            return empty
        c = hex_cell(x[ok], y[ok], res)
        b = ((ts[ok] - t0) / interval).astype(np.int64)
        key = c * np.int64(n_bins) + b
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"cell": pa.array(uk // n_bins),
                         "tbin": pa.array(uk % n_bins),
                         "n": pa.array(cnt.astype(np.int64))})

    def per_bucket(g) -> pa.Table:
        empty = pa.table({
            "cell": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "level": pa.array([], pa.float64()),
            "trend": pa.array([], pa.float64()),
            "sse": pa.array([], pa.float64()),
            "fc": pa.array([], pa.list_(pa.float64()))})
        if len(g) == 0:
            return empty
        agg = g.groupby(["cell", "tbin"], as_index=False)["n"].sum()
        cl = agg["cell"].to_numpy(np.int64)
        tb = agg["tbin"].to_numpy(np.int64)
        nn = agg["n"].to_numpy(np.int64)
        cells, inv = np.unique(cl, return_inverse=True)
        mat = np.zeros((len(cells), n_bins), np.float64)
        mat[inv, tb] = nn
        l, b, sse, fc = holt_forecast_matrix(
            mat, alpha=alpha, beta=beta, horizon=horizon,
            gamma=gamma, season_len=season_len)
        offs = pa.array(np.arange(len(cells) + 1) * horizon,
                        pa.int32())
        return pa.table({
            "cell": pa.array(cells),
            "n_events": pa.array(mat.sum(axis=1).astype(np.int64)),
            "level": pa.array(l), "trend": pa.array(b),
            "sse": pa.array(sse),
            "fc": pa.ListArray.from_arrays(
                offs, pa.array(fc.ravel()))})

    rows = points_ds.map_batches(slim, batch_format="pyarrow")
    return bucketed_group_apply(rows, "cell", per_bucket)

"""Holt / Holt-Winters per-cell forecasting vs per-series scalar
recursions (stages/forecast.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from osm_cut_ray.geometry.cells import hex_cell
from osm_cut_ray.stages.forecast import (cell_forecast,
                                         holt_forecast_matrix)

A, B_, G = 0.5, 0.1, 0.3


def brute_holt(x, alpha=A, beta=B_, horizon=3):
    l, b = x[0], x[1] - x[0]
    sse = 0.0
    for t in range(1, len(x)):
        f = l + b
        sse += (x[t] - f) ** 2
        ln = alpha * x[t] + (1 - alpha) * (l + b)
        b = beta * (ln - l) + (1 - beta) * b
        l = ln
    return l, b, sse, [l + h * b for h in range(1, horizon + 1)]


def brute_hw(x, m, alpha=A, beta=B_, gamma=G, horizon=3):
    l = float(np.mean(x[:m]))
    b = (float(np.mean(x[m:2 * m])) - l) / m
    s = [x[j] - l for j in range(m)]
    sse = 0.0
    for t in range(m, len(x)):
        si = s[t % m]
        f = l + b + si
        sse += (x[t] - f) ** 2
        ln = alpha * (x[t] - si) + (1 - alpha) * (l + b)
        b = beta * (ln - l) + (1 - beta) * b
        s[t % m] = gamma * (x[t] - ln) + (1 - gamma) * si
        l = ln
    B = len(x)
    fc = [l + h * b + s[(B + h - 1) % m]
          for h in range(1, horizon + 1)]
    return l, b, sse, fc


def test_matrix_matches_scalar_brute():
    rng = np.random.default_rng(7)
    X = rng.integers(0, 30, size=(40, 24)).astype(float)
    l, b, sse, fc = holt_forecast_matrix(X, alpha=A, beta=B_,
                                         horizon=3)
    for i in range(len(X)):
        wl, wb, wsse, wfc = brute_holt(X[i])
        assert np.isclose(l[i], wl) and np.isclose(b[i], wb)
        assert np.isclose(sse[i], wsse)
        assert np.allclose(fc[i], wfc)
    l, b, sse, fc = holt_forecast_matrix(X, alpha=A, beta=B_,
                                         gamma=G, season_len=8,
                                         horizon=3)
    for i in range(len(X)):
        wl, wb, wsse, wfc = brute_hw(X[i], 8)
        assert np.isclose(l[i], wl) and np.isclose(b[i], wb)
        assert np.isclose(sse[i], wsse)
        assert np.allclose(fc[i], wfc)


def test_forecast_tracks_a_trend():
    # deterministic ramp: forecast continues the slope
    x = np.arange(30, dtype=float) * 2.0 + 5.0
    l, b, sse, fc = holt_forecast_matrix(x[None, :], alpha=A,
                                         beta=B_, horizon=4)
    assert abs(b[0] - 2.0) < 0.2
    assert np.allclose(fc[0], l[0] + np.arange(1, 5) * b[0])
    assert sse[0] < 1.0


def test_cell_forecast_matches_driver():
    rng = np.random.default_rng(11)
    n = 40_000
    lon = rng.choice([0.0, 0.4, 0.8, 1.2], n) \
        + rng.normal(0, 0.01, n)
    lat = 45.0 + rng.choice([0.0, 0.5], n) + rng.normal(0, 0.01, n)
    # per-point time with a cell-dependent rate ramp
    ts = rng.uniform(0, 1200.0, n)
    ds = rd.from_arrow(pa.table({"lon": pa.array(lon),
                                 "lat": pa.array(lat),
                                 "ts": pa.array(ts)}))
    out = cell_forecast(ds.repartition(7), t0=0.0, t1=1200.0,
                        interval=100.0, horizon=2, alpha=A,
                        beta=B_).take_all()
    # driver recompute
    cells = hex_cell(lon, lat, 7)
    tb = (ts / 100.0).astype(np.int64)
    df = pd.DataFrame({"cell": cells, "tb": tb})
    got = {r["cell"]: r for r in out}
    series = df.groupby(["cell", "tb"]).size()
    for cell in np.unique(cells):
        x = np.zeros(12)
        sub = series.loc[cell]
        x[sub.index.to_numpy()] = sub.to_numpy()
        wl, wb, wsse, wfc = brute_holt(x, horizon=2)
        r = got[cell]
        assert np.isclose(r["level"], wl)
        assert np.isclose(r["sse"], wsse)
        assert np.allclose(r["fc"], wfc)
        assert r["n_events"] == int(x.sum())
    assert len(got) == len(np.unique(cells))


def test_forecast_validation():
    ds = rd.from_arrow(pa.table({"lon": pa.array([0.0]),
                                 "lat": pa.array([0.0]),
                                 "ts": pa.array([0.0])}))
    with pytest.raises(ValueError):
        cell_forecast(ds, t0=0, t1=100, interval=100, alpha=A,
                      beta=B_)  # 1 bin
    with pytest.raises(ValueError):
        cell_forecast(ds, t0=0, t1=1000, interval=100, alpha=1.5,
                      beta=B_)
    with pytest.raises(ValueError):
        cell_forecast(ds, t0=0, t1=1000, interval=100, alpha=A,
                      beta=B_, season_len=8)  # < 2 seasons
    with pytest.raises(ValueError):
        holt_forecast_matrix(np.zeros((1, 20)), alpha=A, beta=B_,
                             horizon=1, season_len=5)  # no gamma

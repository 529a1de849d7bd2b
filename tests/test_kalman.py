"""Kalman/RTS trajectory smoothing vs an independent per-trajectory
matrix implementation (stages/kalman.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from osm_cut_ray.stages.kalman import kalman_smooth

Q, R, V0 = 1e-5, 0.02, 1e-2


def brute_rts(ts, zs, q=Q, r=R, v0=V0):
    """Textbook CV Kalman filter + RTS smoother, one axis, matrix
    form with np.linalg.inv."""
    r2 = r ** 2
    n = len(ts)

    def F(dt):
        return np.array([[1.0, dt], [0.0, 1.0]])

    def Qm(dt):
        return q * np.array([[dt ** 3 / 3, dt ** 2 / 2],
                             [dt ** 2 / 2, dt]])

    m = np.array([zs[0], 0.0])
    P = np.array([[r2, 0.0], [0.0, v0]])
    fm, fP, pm, pP = [m], [P], [m], [P]
    for t in range(1, n):
        dt = ts[t] - ts[t - 1]
        mp = F(dt) @ m
        Pp = F(dt) @ P @ F(dt).T + Qm(dt)
        pm.append(mp)
        pP.append(Pp)
        S = Pp[0, 0] + r2
        K = Pp[:, 0] / S
        m = mp + K * (zs[t] - mp[0])
        P = Pp - np.outer(K, Pp[0])
        fm.append(m)
        fP.append(P)
    sm = [None] * n
    sm[-1] = fm[-1]
    for t in range(n - 2, -1, -1):
        dt = ts[t + 1] - ts[t]
        G = fP[t] @ F(dt).T @ np.linalg.inv(pP[t + 1])
        sm[t] = fm[t] + G @ (sm[t + 1] - pm[t + 1])
    return np.array(sm)


def make_tracks(rng, n_traj=12, min_len=1, max_len=60):
    rows = []
    for tid in range(n_traj):
        L = int(rng.integers(min_len, max_len))
        ts = np.cumsum(rng.uniform(0.5, 30.0, L)) + tid * 1e4
        x = np.cumsum(rng.normal(0, 0.01, L)) + tid
        y = np.cumsum(rng.normal(0, 0.01, L)) + 40.0
        for i in range(L):
            rows.append((tid * 7 + 3, ts[i], x[i], y[i]))
    df = pd.DataFrame(rows, columns=["traj_id", "ts", "lon", "lat"])
    # distinct traj ids
    df["traj_id"] = df["traj_id"].astype(np.int64) \
        + np.int64(0)  # already unique per tid
    return df


def df_to_ds(df):
    return rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
        .replace_schema_metadata(None))


def run(ds, **kw):
    out = kalman_smooth(ds, q=Q, r=R, init_vel_var=V0, **kw) \
        .to_pandas().sort_values(["traj_id", "ts"]) \
        .reset_index(drop=True)
    return out


def test_kalman_matches_brute():
    rng = np.random.default_rng(19)
    df = make_tracks(rng)
    out = run(df_to_ds(df).repartition(5))
    assert len(out) == len(df)
    for tid, g in df.sort_values(["traj_id", "ts"]) \
            .groupby("traj_id"):
        o = out[out.traj_id == tid]
        wx = brute_rts(g.ts.to_numpy(), g.lon.to_numpy())
        wy = brute_rts(g.ts.to_numpy(), g.lat.to_numpy())
        np.testing.assert_allclose(o.x.to_numpy(), wx[:, 0],
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(o.vx.to_numpy(), wx[:, 1],
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(o.y.to_numpy(), wy[:, 0],
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(o.vy.to_numpy(), wy[:, 1],
                                   rtol=1e-7, atol=1e-9)


def test_kalman_bit_deterministic_across_padding():
    """A trajectory's result must be BIT-identical whether it shares
    a bucket with longer trajectories (more padding) or runs alone."""
    rng = np.random.default_rng(23)
    df = make_tracks(rng, n_traj=9, max_len=40)
    long_extra = make_tracks(np.random.default_rng(5), n_traj=3,
                             min_len=300, max_len=400)
    long_extra["traj_id"] += 100000
    full = pd.concat([df, long_extra], ignore_index=True)
    a = run(df_to_ds(df))
    b = run(df_to_ds(full).repartition(11))
    b = b[b.traj_id < 100000].reset_index(drop=True)
    for c in ("x", "y", "vx", "vy"):
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c


def test_kalman_denoises_a_line():
    rng = np.random.default_rng(31)
    L = 200
    ts = np.arange(L) * 5.0
    true_x = 10.0 + 0.001 * ts
    true_y = 45.0 - 0.0005 * ts
    zx = true_x + rng.normal(0, 0.02, L)
    zy = true_y + rng.normal(0, 0.02, L)
    df = pd.DataFrame({"traj_id": np.zeros(L, np.int64), "ts": ts,
                       "lon": zx, "lat": zy})
    out = kalman_smooth(df_to_ds(df), q=1e-9, r=0.02,
                        init_vel_var=V0).to_pandas() \
        .sort_values("ts").reset_index(drop=True)
    raw_rmse = np.sqrt(np.mean((zx - true_x) ** 2
                               + (zy - true_y) ** 2))
    sm_rmse = np.sqrt(np.mean((out.x - true_x) ** 2
                              + (out.y - true_y) ** 2))
    assert sm_rmse < 0.5 * raw_rmse
    # velocities converge to the true slope mid-track
    mid = out.iloc[50:150]
    assert np.abs(mid.vx - 0.001).mean() < 5e-4
    assert np.abs(mid.vy + 0.0005).mean() < 5e-4


def test_kalman_custom_columns_and_caps():
    df = pd.DataFrame({"vid": [1, 1, 1], "t": [0.0, 1.0, 2.0],
                       "px": [0.0, 1.0, 2.0], "py": [0.0, 0.0, 0.0]})
    out = kalman_smooth(df_to_ds(df), traj_col="vid", ts_col="t",
                        x_col="px", y_col="py").to_pandas()
    assert list(out.columns) == ["traj_id", "ts", "x", "y", "vx",
                                 "vy"]
    assert len(out) == 3
    with pytest.raises(ValueError):
        kalman_smooth(df_to_ds(df), traj_col="vid", ts_col="t",
                      x_col="px", y_col="py", q=0.0)
    big = pd.DataFrame({
        "traj_id": np.zeros(100, np.int64),
        "ts": np.arange(100.0),
        "lon": np.zeros(100), "lat": np.zeros(100)})
    with pytest.raises(Exception):
        kalman_smooth(df_to_ds(big), max_key_rows=10).materialize()

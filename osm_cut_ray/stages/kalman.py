"""Kalman smoothing of GPS trajectories — the public
constant-velocity Kalman filter + Rauch-Tung-Striebel backward
smoother (the standard GPS-denoising preprocessor feeding map
matching, speed profiles and stay-point detection).

Model (per axis; x and y decouple under the CV model): state
[pos, vel], F(dt) = [[1, dt], [0, 1]], white-noise-acceleration
process noise Q(dt) = q * [[dt^3/3, dt^2/2], [dt^2/2, dt]], position
measurement H = [1, 0], R = r^2. Both axes share R, so the covariance
recursion (P, gain K, RTS gain G) is measurement-independent and is
computed ONCE per fix, applied to both axes.

Ray-Data shape: ONE trajectory-bucket shuffle
(`bucketed_group_apply`); inside a bucket, trajectories are padded to
the bucket's max length and the recursions run VECTORIZED ACROSS
TRAJECTORIES (t-loop of elementwise 2x2 algebra — no per-trajectory
Python loop). All per-step ops are per-column independent, so results
are bit-deterministic under any partitioning (pinned).

Coordinates are smoothed in their input units (degrees in, degrees
out); velocities are units/second. Pre-project to meters for
metric-correct dynamics at high latitudes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .join import bucketed_group_apply

_OUT_SCHEMA = pa.schema([
    ("traj_id", pa.int64()), ("ts", pa.float64()),
    ("x", pa.float64()), ("y", pa.float64()),
    ("vx", pa.float64()), ("vy", pa.float64())])


def _smooth_stack(ts, zx, zy, lens, q, r2, v0):
    """Vectorized filter+RTS over a (T, N) padded stack.

    ts/zx/zy: (T, N) padded with the last valid row repeated (padding
    rows are discarded on output; repeating the last fix keeps dt >= 0
    and every op finite). lens: (N,) valid lengths. Returns smoothed
    (T, N) pos/vel per axis."""
    T, N = ts.shape
    # filtered/predicted storage: means per axis, sym covariances
    fmx = np.empty((T, N, 2))
    fmy = np.empty((T, N, 2))
    fP = np.empty((T, N, 3))     # p00, p01, p11 (filtered)
    pmx = np.empty((T, N, 2))    # predicted means / covs (t from t-1)
    pmy = np.empty((T, N, 2))
    pP = np.empty((T, N, 3))

    mx = np.stack([zx[0], np.zeros(N)], axis=1)
    my = np.stack([zy[0], np.zeros(N)], axis=1)
    P = np.stack([np.full(N, r2), np.zeros(N), np.full(N, v0)],
                 axis=1)
    fmx[0], fmy[0], fP[0] = mx, my, P
    pmx[0], pmy[0], pP[0] = mx, my, P  # unused (no t=-1)

    for t in range(1, T):
        dt = ts[t] - ts[t - 1]
        # predict: m- = F m, P- = F P F^T + Q
        ax = mx[:, 0] + dt * mx[:, 1]
        ay = my[:, 0] + dt * my[:, 1]
        p00 = P[:, 0] + dt * (2.0 * P[:, 1] + dt * P[:, 2]) \
            + q * dt ** 3 / 3.0
        p01 = P[:, 1] + dt * P[:, 2] + q * dt ** 2 / 2.0
        p11 = P[:, 2] + q * dt
        pmx[t] = np.stack([ax, mx[:, 1]], axis=1)
        pmy[t] = np.stack([ay, my[:, 1]], axis=1)
        pP[t] = np.stack([p00, p01, p11], axis=1)
        # update with z_t: S = p00 + r2, K = (p00, p01)/S — MASKED
        # beyond each trajectory's length so padded steps are exact
        # no-ops (dt = 0 predict + no update => the RTS increment is
        # exactly 0.0 there; results are bit-identical for any bucket
        # composition / pad length)
        valid = t < lens
        S = p00 + r2
        k0 = np.where(valid, p00 / S, 0.0)
        k1 = np.where(valid, p01 / S, 0.0)
        rx = zx[t] - ax
        ry = zy[t] - ay
        mx = np.stack([ax + k0 * rx, mx[:, 1] + k1 * rx], axis=1)
        my = np.stack([ay + k0 * ry, my[:, 1] + k1 * ry], axis=1)
        P = np.stack([p00 - k0 * p00, p01 - k0 * p01,
                      p11 - k1 * p01], axis=1)
        fmx[t], fmy[t], fP[t] = mx, my, P

    # RTS backward: G = P_f F^T (P-)^{-1}; smoothed = filtered + G*(..)
    smx = np.empty_like(fmx)
    smy = np.empty_like(fmy)
    smx[T - 1], smy[T - 1] = fmx[T - 1], fmy[T - 1]
    sP = fP[T - 1].copy()
    for t in range(T - 2, -1, -1):
        dt = ts[t + 1] - ts[t]
        # A = P_f(t) F^T  (2x2, sym P_f): rows of P_f times F^T
        a00 = fP[t, :, 0] + dt * fP[t, :, 1]
        a01 = fP[t, :, 1]
        a10 = fP[t, :, 1] + dt * fP[t, :, 2]
        a11 = fP[t, :, 2]
        q00, q01, q11 = pP[t + 1, :, 0], pP[t + 1, :, 1], \
            pP[t + 1, :, 2]
        det = q00 * q11 - q01 * q01
        det = np.where(det <= 0, 1e-300, det)
        i00, i01, i11 = q11 / det, -q01 / det, q00 / det
        g00 = a00 * i00 + a01 * i01
        g01 = a00 * i01 + a01 * i11
        g10 = a10 * i00 + a11 * i01
        g11 = a10 * i01 + a11 * i11
        dx0 = smx[t + 1, :, 0] - pmx[t + 1, :, 0]
        dx1 = smx[t + 1, :, 1] - pmx[t + 1, :, 1]
        dy0 = smy[t + 1, :, 0] - pmy[t + 1, :, 0]
        dy1 = smy[t + 1, :, 1] - pmy[t + 1, :, 1]
        smx[t, :, 0] = fmx[t, :, 0] + g00 * dx0 + g01 * dx1
        smx[t, :, 1] = fmx[t, :, 1] + g10 * dx0 + g11 * dx1
        smy[t, :, 0] = fmy[t, :, 0] + g00 * dy0 + g01 * dy1
        smy[t, :, 1] = fmy[t, :, 1] + g10 * dy0 + g11 * dy1
        # smoothed covariance (not emitted, kept for parity w/ texts):
        # P_s = P_f + G (P_s(t+1) - P-) G^T — skipped (unused)
    return smx, smy


def kalman_smooth(points_ds, *, q: float = 1e-6, r: float = 1e-4,
                  init_vel_var: float = 1e-4,
                  traj_col: str = "traj_id", ts_col: str = "ts",
                  x_col: str = "lon", y_col: str = "lat",
                  max_key_rows: int | None = 2_000_000):
    """-> Dataset (traj_id, ts, x, y, vx, vy): RTS-smoothed position
    and velocity per fix (row count preserved; ties on ts keep input
    order within a trajectory via the stable bucket sort)."""
    if q <= 0 or r <= 0 or init_vel_var <= 0:
        raise ValueError("q, r, init_vel_var must be > 0")
    r2 = float(r) ** 2

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return _OUT_SCHEMA.empty_table()
        g = g.sort_values([traj_col, ts_col], kind="mergesort")
        tid = g[traj_col].to_numpy(np.int64)
        ts = g[ts_col].to_numpy(np.float64)
        zx = g[x_col].to_numpy(np.float64)
        zy = g[y_col].to_numpy(np.float64)
        starts = np.concatenate(
            ([0], np.flatnonzero(tid[1:] != tid[:-1]) + 1, [len(tid)]))
        lens = np.diff(starts)
        N = len(lens)
        T = int(lens.max())
        # pad by repeating each trajectory's LAST fix
        tpad = np.empty((T, N))
        xpad = np.empty((T, N))
        ypad = np.empty((T, N))
        for j in range(N):
            s, e = int(starts[j]), int(starts[j + 1])
            L = e - s
            tpad[:L, j] = ts[s:e]
            xpad[:L, j] = zx[s:e]
            ypad[:L, j] = zy[s:e]
            if L < T:
                tpad[L:, j] = ts[e - 1]
                xpad[L:, j] = zx[e - 1]
                ypad[L:, j] = zy[e - 1]
        smx, smy = _smooth_stack(tpad, xpad, ypad, lens,
                                 float(q), r2, float(init_vel_var))
        out_tid = tid
        ox = np.empty(len(tid))
        oy = np.empty(len(tid))
        ovx = np.empty(len(tid))
        ovy = np.empty(len(tid))
        for j in range(N):
            s, e = int(starts[j]), int(starts[j + 1])
            L = e - s
            ox[s:e] = smx[:L, j, 0]
            ovx[s:e] = smx[:L, j, 1]
            oy[s:e] = smy[:L, j, 0]
            ovy[s:e] = smy[:L, j, 1]
        return pa.table({"traj_id": pa.array(out_tid),
                         "ts": pa.array(ts),
                         "x": pa.array(ox), "y": pa.array(oy),
                         "vx": pa.array(ovx), "vy": pa.array(ovy)})

    cols = [traj_col, ts_col, x_col, y_col]
    slim = points_ds.select_columns(cols)
    if traj_col != "traj_id":
        slim = slim.rename_columns(
            ["traj_id" if c == traj_col else c for c in cols])

        def pb(g):
            return per_bucket(g.rename(columns={"traj_id": traj_col}))
        return bucketed_group_apply(slim, "traj_id", pb,
                                    max_key_rows=max_key_rows)
    return bucketed_group_apply(slim, traj_col, per_bucket,
                                max_key_rows=max_key_rows)

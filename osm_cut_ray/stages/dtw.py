"""Dynamic-time-warping trajectory similarity — the sum-cost
complement to the max-cost discrete Frechet in `stages/traj_dedup.py`.
DTW tolerates local speed variation (a slow re-drive of the same
route warps onto the fast one at near-zero cost), so it is the right
verifier when fleets replay routes at different speeds, while Frechet
is the right one for worst-case deviation.

Ray-Data shape: reuses `traj_dedup._lsh_verified_pairs` unchanged —
ONE bucketed shuffle for cell-shingle MinHash band rows, capped
candidate pairs with sentinel surfacing, two bucketed polyline
attaches, then the exact DTW kernel per candidate inside
`map_batches`. Only the metric changes; the scale contract (slim
shuffles, payload polylines attached once, O(n*m) only on LSH-pruned
pairs) is shared.

`dtw_distance` follows the classic Sakoe-Chiba formulation
(Sakoe & Chiba 1978): cost = sum of Euclidean point distances along
the optimal monotone warping path, optional band constraint
|i - j*(n-1)/(m-1)| <= band in the slope-normalized index space
(cells outside the band are unreachable; if the band disconnects the
grid the distance is +inf, matching the textbook masked DP). With
`threshold`, early-abandons exactly like `discrete_frechet`: the
endpoint lower bound (both endpoint pairs lie on every path and costs
are non-negative), then whole-DP-row minima (every monotone path
crosses each row).
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa


def dtw_distance(xa: np.ndarray, ya: np.ndarray,
                 xb: np.ndarray, yb: np.ndarray, *,
                 band: float | None = None,
                 threshold: float | None = None) -> float:
    """Exact DTW distance (sum of Euclidean costs over the optimal
    warping path). O(n*m) time, O(m) memory. `band` masks cells with
    |i - j*(n-1)/(m-1)| > band to +inf (Sakoe-Chiba). `threshold`
    enables exact early abandon: any +inf return means the distance
    is PROVABLY > threshold; any finite return is exact."""
    n, m = len(xa), len(xb)
    if n == 0 or m == 0:
        return np.inf
    if threshold is not None:
        lb = float(np.hypot(xa[0] - xb[0], ya[0] - yb[0]))
        if n > 1 or m > 1:  # distinct endpoint cell on every path
            lb += float(np.hypot(xa[-1] - xb[-1], ya[-1] - yb[-1]))
        if lb > threshold:
            return np.inf
    d = np.hypot(xa[:, None] - xb[None, :], ya[:, None] - yb[None, :])
    if band is not None:
        centers = (np.arange(m) * (n - 1) / (m - 1) if m > 1
                   else np.zeros(m))
        mask = np.abs(np.arange(n)[:, None] - centers[None, :]) > band
        d[mask] = np.inf
    prev = np.cumsum(d[0])
    if threshold is not None and prev.min() > threshold:
        return np.inf
    for i in range(1, n):
        # min(ca[i-1, j], ca[i-1, j-1]) vectorized; the ca[i, j-1]
        # term forces the sequential scan (same shape as the Frechet
        # kernel, with + instead of max)
        pm = np.minimum(prev, np.concatenate(([np.inf], prev[:-1])))
        row = d[i]
        cur = np.empty(m)
        left = np.inf
        for j in range(m):
            left = row[j] + min(pm[j], left)
            cur[j] = left
        if threshold is not None and cur.min() > threshold:
            return np.inf
        prev = cur
    return float(prev[-1])


def _dtw_metric(xa, ya, xb, yb, threshold, *, band):
    return dtw_distance(xa, ya, xb, yb, band=band, threshold=threshold)


def trajectory_dtw_pairs(points_ds, *, dtw_threshold: float,
                         band: float | None = None, res: int = 9,
                         shingle_k: int = 3, n_perm: int = 64,
                         n_bands: int = 16, seed: int = 42,
                         max_df: int = 256, traj_col: str = "traj_id",
                         ts_col: str = "ts", x_col: str = "lon",
                         y_col: str = "lat") -> pa.Table:
    """-> pa.Table (a_id, b_id, dtw), a_id < b_id, sorted: verified
    DTW near-duplicate trajectory pairs (DTW <= `dtw_threshold`,
    planar degrees; note DTW SUMS per-point costs, so thresholds
    scale with trace length — normalize upstream or size the
    threshold to the resampled point count, e.g. via
    `stages/traj.py:resample_trajectories`). Candidate recall and the
    cap/sentinel contract are identical to `trajectory_dup_pairs`
    (shared scaffold); every RETURNED pair is exact."""
    from .traj_dedup import _lsh_verified_pairs

    return _lsh_verified_pairs(
        points_ds, threshold=dtw_threshold,
        metric=functools.partial(_dtw_metric, band=band),
        out_col="dtw", report_name="trajectory_dtw_pairs", res=res,
        shingle_k=shingle_k, n_perm=n_perm, n_bands=n_bands, seed=seed,
        max_df=max_df, traj_col=traj_col, ts_col=ts_col, x_col=x_col,
        y_col=y_col)

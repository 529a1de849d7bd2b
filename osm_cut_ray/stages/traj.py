"""Trajectory analytics over GPS traces: stay-point detection, trip
segmentation at time gaps, and origin-destination (OD) matrices — the
standard fleet/mobility post-processing steps downstream of per-point
snapping (stages/snap.py) and HMM matching (stages/match.py).

Ray-Data shape: every op pays exactly ONE `bucketed_group_apply`
shuffle to co-locate each trajectory's slim (traj, ts, lon, lat) rows
(Ray group overhead per bucket, not per trajectory); the per-bucket
kernels are vectorized across all trajectories in the bucket except
the stay-point anchor scan, which is the classic sequential
two-pointer (amortized O(points) per trajectory, numpy inner scan).
The OD matrix adds one tiny global (o_cell, d_cell) aggregate over
bucket-partial counts — per-trip endpoint rows, never fixes, transit
that second exchange.

Distances are planar degrees (hypot on lon/lat), consistent with the
snap/match stages; timestamps are float seconds, unique per
trajectory (GPS trace contract shared with stages/match.py).

Reference: graft surface (no analog in the reference cut engine);
stay-point semantics follow the published GeoLife formulation
(anchor window: maximal run where every fix stays within
`dist_thresh` of the FIRST fix and the run spans >= `time_thresh`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geometry.cells import hex_cell
from .join import bucketed_group_apply

_TRIP_SCHEMA = {
    "traj_id": np.int64, "ts": np.float64, "lon": np.float64,
    "lat": np.float64, "trip_id": np.int64, "trip_ord": np.int64,
}
_STAY_SCHEMA = {
    "traj_id": np.int64, "stay_ord": np.int64, "lon": np.float64,
    "lat": np.float64, "t_start": np.float64, "t_end": np.float64,
    "n_pts": np.int64,
}


def _sorted_traj(g: pd.DataFrame, traj_col: str, ts_col: str,
                 x_col: str, y_col: str):
    g = g.sort_values([traj_col, ts_col], kind="mergesort")
    return (g[traj_col].to_numpy(np.int64),
            g[ts_col].to_numpy(np.float64),
            g[x_col].to_numpy(np.float64),
            g[y_col].to_numpy(np.float64))


def _trip_bounds(tid: np.ndarray, ts: np.ndarray,
                 gap_thresh: float | None):
    """new-trip flags + global trip ids + within-traj ordinals for
    (traj, ts)-sorted arrays. gap_thresh=None -> one trip per traj."""
    new_traj = np.concatenate(([True], tid[1:] != tid[:-1]))
    if gap_thresh is None:
        new = new_traj
    else:
        dt = np.concatenate(([0.0], ts[1:] - ts[:-1]))
        new = new_traj | (dt > gap_thresh)
    trip_gid = np.cumsum(new) - 1
    base = np.zeros(len(tid), np.int64)
    base[new_traj] = trip_gid[new_traj]
    trip_ord = trip_gid - np.maximum.accumulate(base)
    return new, trip_gid, trip_ord


def segment_trips(points_ds, *, gap_thresh: float,
                  traj_col: str = "traj_id", ts_col: str = "ts",
                  x_col: str = "lon", y_col: str = "lat"):
    """Split each trajectory into trips at time gaps > `gap_thresh`
    seconds. -> Dataset (traj_id, ts, lon, lat, trip_id, trip_ord):
    one row per input fix; `trip_ord` is the 0-based trip ordinal
    within its trajectory, `trip_id` = traj_id * 2^20 + trip_ord (a
    globally unique int64 for <= 2^20 trips per trace, raising if
    exceeded). Fully vectorized per bucket."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in _TRIP_SCHEMA.items()})
        tid, ts, x, y = _sorted_traj(g, traj_col, ts_col, x_col, y_col)
        _, _, trip_ord = _trip_bounds(tid, ts, gap_thresh)
        if trip_ord.max(initial=0) >= (1 << 20):
            raise ValueError("more than 2^20 trips in one trajectory; "
                             "raise the gap_thresh or re-key")
        return pd.DataFrame({
            "traj_id": tid, "ts": ts, "lon": x, "lat": y,
            "trip_id": tid * (1 << 20) + trip_ord,
            "trip_ord": trip_ord})

    return bucketed_group_apply(points_ds, traj_col, per_bucket)


def detect_stay_points(points_ds, *, dist_thresh: float,
                       time_thresh: float,
                       traj_col: str = "traj_id", ts_col: str = "ts",
                       x_col: str = "lon", y_col: str = "lat"):
    """GeoLife stay points: maximal anchor windows where every fix is
    within `dist_thresh` (degrees) of the window's FIRST fix and the
    window spans >= `time_thresh` seconds. -> Dataset (traj_id,
    stay_ord, lon, lat, t_start, t_end, n_pts), centroid per stay,
    `stay_ord` 0-based within the trajectory, ordered by t_start."""

    def one_traj(ts, x, y, out):
        n = len(ts)
        i = 0
        ord_ = 0
        while i < n:
            # first fix past i that leaves the anchor disk (numpy scan)
            far = np.flatnonzero(
                np.hypot(x[i + 1:] - x[i], y[i + 1:] - y[i])
                > dist_thresh)
            j = (i + 1 + int(far[0])) if len(far) else n
            if ts[j - 1] - ts[i] >= time_thresh:
                out.append((ord_, float(x[i:j].mean()),
                            float(y[i:j].mean()), float(ts[i]),
                            float(ts[j - 1]), j - i))
                ord_ += 1
                i = j
            else:
                i += 1

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({k: pd.Series(dtype=v)
                              for k, v in _STAY_SCHEMA.items()})
        if len(g) == 0:
            return empty
        tid, ts, x, y = _sorted_traj(g, traj_col, ts_col, x_col, y_col)
        starts = np.concatenate(
            ([0], np.flatnonzero(tid[1:] != tid[:-1]) + 1, [len(tid)]))
        rows_tid: list[np.int64] = []
        rows: list[tuple] = []
        for k in range(len(starts) - 1):
            s, e = int(starts[k]), int(starts[k + 1])
            out: list[tuple] = []
            one_traj(ts[s:e], x[s:e], y[s:e], out)
            rows_tid.extend([tid[s]] * len(out))
            rows.extend(out)
        if not rows:
            return empty
        arr = np.array(rows, np.float64)
        return pd.DataFrame({
            "traj_id": np.asarray(rows_tid, np.int64),
            "stay_ord": arr[:, 0].astype(np.int64),
            "lon": arr[:, 1], "lat": arr[:, 2],
            "t_start": arr[:, 3], "t_end": arr[:, 4],
            "n_pts": arr[:, 5].astype(np.int64)})

    return bucketed_group_apply(points_ds, traj_col, per_bucket)


def trip_stats(points_ds, *, gap_thresh: float | None = None,
               traj_col: str = "traj_id", ts_col: str = "ts",
               x_col: str = "lon", y_col: str = "lat"):
    """Per-trip summary: -> Dataset (traj_id, trip_ord, n_fixes,
    t_start, t_end, length_deg, avg_speed) where length_deg is the
    polyline length (planar degrees, consecutive-fix hypot within the
    trip) and avg_speed = length / (t_end - t_start) (0.0 for
    single-fix or zero-duration trips). One bucketed shuffle; fully
    vectorized per bucket (segment lengths via shifted arrays, per-trip
    sums via reduceat)."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        schema = {"traj_id": np.int64, "trip_ord": np.int64,
                  "n_fixes": np.int64, "t_start": np.float64,
                  "t_end": np.float64, "length_deg": np.float64,
                  "avg_speed": np.float64}
        if len(g) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in schema.items()})
        tid, ts, x, y = _sorted_traj(g, traj_col, ts_col, x_col, y_col)
        new, _, trip_ord = _trip_bounds(tid, ts, gap_thresh)
        seg = np.hypot(np.diff(x), np.diff(y))
        seg = np.concatenate(([0.0], seg))
        seg[new] = 0.0  # no segment across a trip boundary
        first = np.flatnonzero(new)
        last = np.concatenate((first[1:] - 1, [len(tid) - 1]))
        length = np.add.reduceat(seg, first)
        dur = ts[last] - ts[first]
        with np.errstate(divide="ignore", invalid="ignore"):
            speed = np.where(dur > 0, length / dur, 0.0)
        return pd.DataFrame({
            "traj_id": tid[first], "trip_ord": trip_ord[first],
            "n_fixes": (last - first + 1).astype(np.int64),
            "t_start": ts[first], "t_end": ts[last],
            "length_deg": length, "avg_speed": speed})

    return bucketed_group_apply(points_ds, traj_col, per_bucket)


def resample_trajectories(points_ds, *, interval: float,
                          gap_thresh: float | None = None,
                          traj_col: str = "traj_id", ts_col: str = "ts",
                          x_col: str = "lon", y_col: str = "lat"):
    """Fixed-interval resampling: per trip, emit fixes at t_start,
    t_start + interval, ... (every tick <= t_end) with linearly
    interpolated positions — the normalization step before
    fixed-rate models or cross-trace comparison. -> Dataset (traj_id,
    trip_ord, ts, lon, lat). Gaps > `gap_thresh` split trips first
    (None = one trip per trace); single-fix trips emit their one
    fix. One bucketed shuffle; np.interp per trip."""
    if interval <= 0:
        raise ValueError("interval must be > 0")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        schema = {"traj_id": np.int64, "trip_ord": np.int64,
                  "ts": np.float64, "lon": np.float64,
                  "lat": np.float64}
        if len(g) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in schema.items()})
        tid, ts, x, y = _sorted_traj(g, traj_col, ts_col, x_col, y_col)
        new, _, trip_ord = _trip_bounds(tid, ts, gap_thresh)
        first = np.flatnonzero(new)
        last = np.concatenate((first[1:] - 1, [len(tid) - 1]))
        n_out = ((ts[last] - ts[first]) / interval).astype(np.int64) + 1
        out_t, out_x, out_y, out_tid, out_ord = [], [], [], [], []
        for i in range(len(first)):
            s, e = int(first[i]), int(last[i]) + 1
            tt = ts[s] + interval * np.arange(int(n_out[i]))
            out_t.append(tt)
            out_x.append(np.interp(tt, ts[s:e], x[s:e]))
            out_y.append(np.interp(tt, ts[s:e], y[s:e]))
            out_tid.append(np.full(len(tt), tid[s], np.int64))
            out_ord.append(np.full(len(tt), trip_ord[s], np.int64))
        return pd.DataFrame({
            "traj_id": np.concatenate(out_tid),
            "trip_ord": np.concatenate(out_ord),
            "ts": np.concatenate(out_t),
            "lon": np.concatenate(out_x),
            "lat": np.concatenate(out_y)})

    return bucketed_group_apply(points_ds, traj_col, per_bucket)


def od_matrix(points_ds, *, res: int = 6, gap_thresh: float | None = None,
              traj_col: str = "traj_id", ts_col: str = "ts",
              x_col: str = "lon", y_col: str = "lat"):
    """Origin-destination matrix: each trip (trajectory, or gap-split
    trip when `gap_thresh` is set) contributes one (origin hex cell,
    destination hex cell) edge at resolution `res`; -> Dataset
    (o_cell, d_cell, n_trips) over a bucket-partial + tiny global
    aggregate. Single-fix trips count (o == d)."""
    import ray.data

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        # Arrow out: pandas blocks poison the sort-shuffle feeding the
        # final (o, d) aggregate (~20x per task; see queries.py:464)
        if len(g) == 0:
            return pa.table({"o_cell": pa.array([], pa.int64()),
                             "d_cell": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        tid, ts, x, y = _sorted_traj(g, traj_col, ts_col, x_col, y_col)
        new, _, _ = _trip_bounds(tid, ts, gap_thresh)
        first = np.flatnonzero(new)
        last = np.concatenate((first[1:] - 1, [len(tid) - 1]))
        o = hex_cell(x[first], y[first], res)
        d = hex_cell(x[last], y[last], res)
        out = (pd.DataFrame({"o_cell": o, "d_cell": d})
               .groupby(["o_cell", "d_cell"], as_index=False)
               .size().rename(columns={"size": "n"}))
        # drop the pandas schema-metadata dict: it is unhashable and
        # defeats Ray's schema dedup on every shuffled block
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    partial = bucketed_group_apply(points_ds, traj_col, per_bucket)
    return partial.groupby(["o_cell", "d_cell"]).aggregate(
        ray.data.aggregate.Sum("n", alias_name="n_trips"))

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


_PARTIAL_SCHEMA = {
    "traj_id": np.int64, "t_start": np.float64, "t_end": np.float64,
    "n_fixes": np.int64, "length_deg": np.float64,
    "xf": np.float64, "yf": np.float64,
    "xl": np.float64, "yl": np.float64,
}


def _trip_partials(points_ds, gap_thresh: float | None, window: float,
                   traj_col: str, ts_col: str, x_col: str, y_col: str):
    """Phase 1 of the giant-key split (VERDICT r3 item #5): bucket by
    the COMPOSITE (traj, floor(ts/window)) key — bounded per-task rows
    no matter how long one trajectory runs — and emit one slim partial
    row per LOCAL trip (gap-split within the window). Phase 2
    (`_merged_trips`) stitches window-boundary trips per trajectory
    over these summaries, orders below the fix count."""
    if window <= 0:
        raise ValueError("window must be > 0 seconds")

    def keyed(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column("__chunk", pa.array([], pa.int64())) \
                .append_column("__wkey", pa.array([], pa.int64()))
        ts = t[ts_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        tid = t[traj_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        chunk = np.floor(ts / window).astype(np.int64)
        mix = (tid.view(np.uint64)
               * np.uint64(0x9E3779B97F4A7C15)) \
            ^ chunk.view(np.uint64)
        return t.append_column("__chunk", pa.array(chunk)) \
            .append_column("__wkey", pa.array(mix.view(np.int64)))

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        # Arrow out (metadata stripped): these rows feed the phase-2
        # traj-key shuffle, and pandas schema metadata poisons Ray's
        # block-schema dedup there (the repo-wide r3 fix)
        if len(g) == 0:
            return pa.table({
                k: pa.array([], pa.from_numpy_dtype(v))
                for k, v in _PARTIAL_SCHEMA.items()})
        g = g.sort_values([traj_col, ts_col], kind="mergesort")
        tid = g[traj_col].to_numpy(np.int64)
        ts = g[ts_col].to_numpy(np.float64)
        x = g[x_col].to_numpy(np.float64)
        y = g[y_col].to_numpy(np.float64)
        chunk = g["__chunk"].to_numpy(np.int64)
        new_traj = np.concatenate(([True], tid[1:] != tid[:-1]))
        new = new_traj | np.concatenate(([True],
                                         chunk[1:] != chunk[:-1]))
        if gap_thresh is not None:
            dt = np.concatenate(([0.0], ts[1:] - ts[:-1]))
            new |= dt > gap_thresh
        seg = np.concatenate(([0.0], np.hypot(np.diff(x),
                                              np.diff(y))))
        seg[new] = 0.0
        first = np.flatnonzero(new)
        last = np.concatenate((first[1:] - 1, [len(tid) - 1]))
        return pa.table({
            "traj_id": pa.array(tid[first]),
            "t_start": pa.array(ts[first]),
            "t_end": pa.array(ts[last]),
            "n_fixes": pa.array((last - first + 1).astype(np.int64)),
            "length_deg": pa.array(np.add.reduceat(seg, first)),
            "xf": pa.array(x[first]), "yf": pa.array(y[first]),
            "xl": pa.array(x[last]), "yl": pa.array(y[last])})

    rows = points_ds.map_batches(keyed, batch_format="pyarrow")
    out = bucketed_group_apply(rows, "__wkey", per_bucket)
    if "traj_id" != traj_col:
        out = out.map_batches(
            lambda t: t.rename_columns(
                [traj_col if c == "traj_id" else c
                 for c in t.column_names]),
            batch_format="pyarrow")
    return out


def _merged_trips(g: pd.DataFrame, gap_thresh: float | None,
                  traj_col: str):
    """Stitch per-window trip partials of the trajectories in one
    bucket: merge boundary-adjacent partials whose inter-fix time gap
    is <= gap_thresh (always, when None). -> dict of merged-trip
    arrays (tid, trip_ord, n_fixes, t_start, t_end, length, xf, yf,
    xl, yl), or None for an empty bucket."""
    if len(g) == 0:
        return None
    g = g.sort_values([traj_col, "t_start"], kind="mergesort")
    tid = g[traj_col].to_numpy(np.int64)
    t0 = g["t_start"].to_numpy(np.float64)
    t1 = g["t_end"].to_numpy(np.float64)
    n = g["n_fixes"].to_numpy(np.int64)
    ln = g["length_deg"].to_numpy(np.float64)
    xf = g["xf"].to_numpy(np.float64)
    yf = g["yf"].to_numpy(np.float64)
    xl = g["xl"].to_numpy(np.float64)
    yl = g["yl"].to_numpy(np.float64)
    new_traj = np.concatenate(([True], tid[1:] != tid[:-1]))
    if gap_thresh is None:
        new = new_traj
    else:
        dt = np.concatenate(([np.inf], t0[1:] - t1[:-1]))
        new = new_traj | (dt > gap_thresh)
    grp = np.cumsum(new) - 1
    first = np.flatnonzero(new)
    last = np.concatenate((first[1:] - 1, [len(tid) - 1]))
    bridge = np.concatenate(
        ([0.0], np.hypot(xf[1:] - xl[:-1], yf[1:] - yl[:-1])))
    bridge[new] = 0.0
    length = np.bincount(grp, weights=ln, minlength=len(first)) \
        + np.bincount(grp, weights=bridge, minlength=len(first))
    # trip_ord: 0-based per trajectory over merged trips
    gt = tid[first]
    gnew = np.concatenate(([True], gt[1:] != gt[:-1]))
    idx = np.arange(len(gt), dtype=np.int64)
    base = np.zeros(len(gt), np.int64)
    base[gnew] = idx[gnew]
    ord_ = idx - np.maximum.accumulate(base)
    return {"tid": gt, "trip_ord": ord_,
            "n_fixes": np.bincount(grp, weights=n,
                                   minlength=len(first))
            .astype(np.int64),
            "t_start": t0[first], "t_end": t1[last],
            "length": length,
            "xf": xf[first], "yf": yf[first],
            "xl": xl[last], "yl": yl[last]}


def segment_trips(points_ds, *, gap_thresh: float,
                  traj_col: str = "traj_id", ts_col: str = "ts",
                  x_col: str = "lon", y_col: str = "lat",
                  max_key_rows: int | None = None):
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

    return bucketed_group_apply(points_ds, traj_col, per_bucket,
                                max_key_rows=max_key_rows)


def detect_stay_points(points_ds, *, dist_thresh: float,
                       time_thresh: float,
                       traj_col: str = "traj_id", ts_col: str = "ts",
                       x_col: str = "lon", y_col: str = "lat",
                       max_key_rows: int | None = None):
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

    return bucketed_group_apply(points_ds, traj_col, per_bucket,
                                max_key_rows=max_key_rows)


def trip_stats(points_ds, *, gap_thresh: float | None = None,
               traj_col: str = "traj_id", ts_col: str = "ts",
               x_col: str = "lon", y_col: str = "lat",
               window: float | None = None,
               max_key_rows: int | None = None):
    """Per-trip summary: -> Dataset (traj_id, trip_ord, n_fixes,
    t_start, t_end, length_deg, avg_speed) where length_deg is the
    polyline length (planar degrees, consecutive-fix hypot within the
    trip) and avg_speed = length / (t_end - t_start) (0.0 for
    single-fix or zero-duration trips). One bucketed shuffle; fully
    vectorized per bucket (segment lengths via shifted arrays, per-trip
    sums via reduceat).

    A corpus-scale trajectory (one fleet vehicle, years of fixes)
    would land its whole history in ONE bucket task: set `window`
    (seconds) to split the shuffle key into (traj, time-window) —
    bounded per-task rows — and stitch per-trip partials in a tiny
    per-traj summary pass (equal to the unsplit path up to float
    summation order). `max_key_rows` surfaces the hazard instead
    (RAISES on a giant key)."""
    schema = {"traj_id": np.int64, "trip_ord": np.int64,
              "n_fixes": np.int64, "t_start": np.float64,
              "t_end": np.float64, "length_deg": np.float64,
              "avg_speed": np.float64}

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({k: pd.Series(dtype=v)
                             for k, v in schema.items()})

    if window is not None:
        partials = _trip_partials(points_ds, gap_thresh, window,
                                  traj_col, ts_col, x_col, y_col)

        def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
            m = _merged_trips(g, gap_thresh, traj_col)
            if m is None:
                return _empty()
            dur = m["t_end"] - m["t_start"]
            with np.errstate(divide="ignore", invalid="ignore"):
                speed = np.where(dur > 0, m["length"] / dur, 0.0)
            return pd.DataFrame({
                "traj_id": m["tid"], "trip_ord": m["trip_ord"],
                "n_fixes": m["n_fixes"], "t_start": m["t_start"],
                "t_end": m["t_end"], "length_deg": m["length"],
                "avg_speed": speed})

        return bucketed_group_apply(partials, traj_col, merge_bucket)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return _empty()
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

    return bucketed_group_apply(points_ds, traj_col, per_bucket,
                                max_key_rows=max_key_rows)


def resample_trajectories(points_ds, *, interval: float,
                          gap_thresh: float | None = None,
                          traj_col: str = "traj_id", ts_col: str = "ts",
                          x_col: str = "lon", y_col: str = "lat",
                          max_key_rows: int | None = None):
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

    return bucketed_group_apply(points_ds, traj_col, per_bucket,
                                max_key_rows=max_key_rows)


def od_matrix(points_ds, *, res: int = 6, gap_thresh: float | None = None,
              traj_col: str = "traj_id", ts_col: str = "ts",
              x_col: str = "lon", y_col: str = "lat",
              window: float | None = None,
              max_key_rows: int | None = None):
    """Origin-destination matrix: each trip (trajectory, or gap-split
    trip when `gap_thresh` is set) contributes one (origin hex cell,
    destination hex cell) edge at resolution `res`; -> Dataset
    (o_cell, d_cell, n_trips) over a bucket-partial + tiny global
    aggregate. Single-fix trips count (o == d). `window` /
    `max_key_rows`: giant-trajectory split / surfaced cap, exactly as
    in `trip_stats` (endpoints stitch exactly — no float drift)."""
    import ray.data

    if window is not None:
        partials = _trip_partials(points_ds, gap_thresh, window,
                                  traj_col, ts_col, x_col, y_col)

        def merge_bucket(g: pd.DataFrame) -> pa.Table:
            empty = pa.table({"o_cell": pa.array([], pa.int64()),
                              "d_cell": pa.array([], pa.int64()),
                              "n": pa.array([], pa.int64())})
            m = _merged_trips(g, gap_thresh, traj_col)
            if m is None:
                return empty
            o = hex_cell(m["xf"], m["yf"], res)
            d = hex_cell(m["xl"], m["yl"], res)
            out = (pd.DataFrame({"o_cell": o, "d_cell": d})
                   .groupby(["o_cell", "d_cell"], as_index=False)
                   .size().rename(columns={"size": "n"}))
            return pa.Table.from_pandas(out, preserve_index=False) \
                .replace_schema_metadata(None)

        partial = bucketed_group_apply(partials, traj_col,
                                       merge_bucket)
        return partial.groupby(["o_cell", "d_cell"]).aggregate(
            ray.data.aggregate.Sum("n", alias_name="n_trips"))

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

"""HMM trajectory map matching: snap a SEQUENCE of GPS points to a
coherent path of ways, not each point independently — the classic
production step past per-point snapping (stages/snap.py). A noisy
point that momentarily lies nearer a parallel road stays matched to
the road the rest of the trace follows (Newson & Krummel-style
Viterbi decoding over way candidates; emission = snap distance,
transition = a flat way-switch penalty).

Ray-Data shape: candidates come from the broadcast `SegmentGrid`
(`query_topk`, best segment per way, <= k ways per point) in a pure
map-side pass emitting one slim row per (point, candidate); ONE
`bucketed_group_apply` shuffle co-locates each trajectory (Ray group
overhead per bucket, not per trajectory), where the Viterbi DP runs
per trajectory with (k_prev x k_cur) numpy steps. Coordinates and
payloads never transit the shuffle — only (traj, ts, way, seg, dist,
along) candidate rows, bounded by k x points.

Semantics pinned by tests/test_match.py:
- timestamps must be unique within a trajectory (GPS trace contract);
  candidate order and all tie-breaks are (dist, way_id, seg).
- a point with no candidate within `radius` emits way_id = -1 and
  RESETS the chain (the trace left the mapped network; the DP
  restarts fresh after the gap).
- `switch_penalty = 0` degenerates to independent per-point snapping
  (equals stages/snap.py choices on shared points).

Reference: the cut engine's PIP/membership semantics live in
pipelines/cut.py; this stage is graft surface (no reference analog).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .join import bucketed_group_apply
from .snap import SegmentGrid, TiledSegmentGrid, get_grid

_OUT_SCHEMA = {
    "traj_id": np.int64, "ts": np.float64, "way_id": np.int64,
    "seg": np.int64, "snap_dist": np.float64, "along_deg": np.float64,
}


def _viterbi_traj(ts: np.ndarray, cand_off: np.ndarray,
                  w: np.ndarray, s: np.ndarray, d: np.ndarray,
                  a: np.ndarray, penalty: float
                  ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                             np.ndarray]:
    """One trajectory's DP. cand_off is the CSR over its points (in ts
    order); candidate arrays are ordered (dist, way, seg) per point.
    -> (way, seg, dist, along) per point (-1/-1/inf/nan = off-network).
    """
    n_pts = len(cand_off) - 1
    out_w = np.full(n_pts, -1, np.int64)
    out_s = np.full(n_pts, -1, np.int64)
    out_d = np.full(n_pts, np.inf, np.float64)
    out_a = np.full(n_pts, np.nan, np.float64)
    # segment the trajectory at no-candidate gaps; Viterbi per run
    run_start = None
    chain: list[tuple[slice, np.ndarray, np.ndarray]] = []

    def flush(end: int):
        # backtrace the completed run [run_start, end)
        if not chain:
            return
        sl, cost, _ = chain[-1]
        best = int(np.argmin(cost))  # first min: candidates are in
        # (dist, way, seg) order, so ties resolve deterministically
        for i in range(len(chain) - 1, -1, -1):
            sl, _, bp = chain[i]
            gi = sl.start + best
            out_w[run_start + i] = w[gi]
            out_s[run_start + i] = s[gi]
            out_d[run_start + i] = d[gi]
            out_a[run_start + i] = a[gi]
            best = int(bp[best])
        chain.clear()

    for p in range(n_pts):
        sl = slice(int(cand_off[p]), int(cand_off[p + 1]))
        if sl.stop == sl.start:
            flush(p)
            run_start = None
            continue
        dc = d[sl]
        if run_start is None or not chain:
            run_start = p
            chain.append((sl, dc.copy(),
                          np.zeros(sl.stop - sl.start, np.int64)))
            continue
        psl, pcost, _ = chain[-1]
        trans = np.where(w[sl][:, None] == w[psl][None, :],
                         0.0, penalty)
        tot = pcost[None, :] + trans
        bp = np.argmin(tot, axis=1)  # first min = lowest-(dist,way,
        # seg) predecessor, deterministic
        cost = dc + tot[np.arange(len(dc)), bp]
        chain.append((sl, cost, bp))
    flush(n_pts)
    return out_w, out_s, out_d, out_a


def match_trajectories(points_ds,
                       grid: SegmentGrid | TiledSegmentGrid, *,
                       radius: float,
                       k_cands: int = 8,
                       switch_penalty: float | None = None,
                       traj_col: str = "traj_id", ts_col: str = "ts",
                       x_col: str = "lon", y_col: str = "lat"):
    """-> Dataset (traj_id, ts, way_id, seg, snap_dist, along_deg),
    one row per input point, the Viterbi-decoded way assignment.

    `switch_penalty` defaults to 2 x radius (switching roads must buy
    at least that much emission cost). Timestamps must be unique per
    trajectory."""
    if switch_penalty is None:
        switch_penalty = 2.0 * radius
    ref = ray.put(grid)
    pen = float(switch_penalty)

    def cands(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "traj_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.float64()),
            "way_id": pa.array([], pa.int64()),
            "seg": pa.array([], pa.int64()),
            "dist": pa.array([], pa.float64()),
            "along": pa.array([], pa.float64())})
        if len(t) == 0:
            return empty
        g = get_grid(ref)  # zero-copy plasma rehydrate, memoized
        px = t[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        py = t[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        tid = t[traj_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = t[ts_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        off, w, s, d, a = g.query_topk(px, py, radius, k_cands)
        counts = np.diff(off)
        # no-candidate points still emit ONE sentinel row so the
        # point (and its chain-breaking gap) survives the shuffle
        n_rows = counts + (counts == 0)
        pt_of = np.repeat(np.arange(len(t), dtype=np.int64), n_rows)
        is_sent = np.zeros(int(n_rows.sum()), bool)
        is_sent[np.cumsum(n_rows) - 1] = \
            np.repeat(counts == 0, n_rows)[np.cumsum(n_rows) - 1]
        ow = np.full(len(pt_of), -1, np.int64)
        os_ = np.full(len(pt_of), -1, np.int64)
        od = np.full(len(pt_of), np.inf, np.float64)
        oa = np.full(len(pt_of), np.nan, np.float64)
        ow[~is_sent] = w
        os_[~is_sent] = s
        od[~is_sent] = d
        oa[~is_sent] = a
        return pa.table({
            "traj_id": pa.array(tid[pt_of]),
            "ts": pa.array(ts[pt_of]),
            "way_id": pa.array(ow), "seg": pa.array(os_),
            "dist": pa.array(od), "along": pa.array(oa)})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {k: pd.Series(dtype=v) for k, v in _OUT_SCHEMA.items()})
        if len(g) == 0:
            return empty
        # sort so candidates sit in (traj, ts, dist, way, seg) order;
        # sentinel rows (way=-1, dist=inf) exist only for
        # zero-candidate points
        g = g.sort_values(["traj_id", "ts", "dist", "way_id", "seg"],
                          kind="mergesort")
        tid = g["traj_id"].to_numpy(np.int64)
        ts = g["ts"].to_numpy(np.float64)
        w = g["way_id"].to_numpy(np.int64)
        s = g["seg"].to_numpy(np.int64)
        d = g["dist"].to_numpy(np.float64)
        a = g["along"].to_numpy(np.float64)
        # vectorized point enumeration: rows -> point ordinals, then a
        # global CSR of REAL candidate rows per point (no per-point
        # Python — the loop below is per trajectory only)
        new_pt = np.concatenate(
            ([True], (tid[1:] != tid[:-1]) | (ts[1:] != ts[:-1])))
        pt_id = np.cumsum(new_pt) - 1
        n_pts_total = int(pt_id[-1]) + 1
        real = w >= 0
        cnt = np.bincount(pt_id[real], minlength=n_pts_total)
        off_all = np.concatenate(([0], np.cumsum(cnt)))
        ridx = np.flatnonzero(real)  # real rows, already point-ordered
        w_r, s_r, d_r, a_r = w[ridx], s[ridx], d[ridx], a[ridx]
        first_row = np.flatnonzero(new_pt)
        pt_tid = tid[first_row]
        pt_ts = ts[first_row]
        traj_starts = np.concatenate(
            ([0], np.flatnonzero(pt_tid[1:] != pt_tid[:-1]) + 1,
             [n_pts_total]))
        o_w = np.empty(n_pts_total, np.int64)
        o_s = np.empty(n_pts_total, np.int64)
        o_d = np.empty(n_pts_total, np.float64)
        o_a = np.empty(n_pts_total, np.float64)
        for j in range(len(traj_starts) - 1):
            p0, p1 = int(traj_starts[j]), int(traj_starts[j + 1])
            off = off_all[p0:p1 + 1] - off_all[p0]
            sl = slice(int(off_all[p0]), int(off_all[p1]))
            (o_w[p0:p1], o_s[p0:p1], o_d[p0:p1],
             o_a[p0:p1]) = _viterbi_traj(
                pt_ts[p0:p1], off, w_r[sl], s_r[sl], d_r[sl],
                a_r[sl], pen)
        return pd.DataFrame({
            "traj_id": pt_tid, "ts": pt_ts, "way_id": o_w,
            "seg": o_s, "snap_dist": o_d, "along_deg": o_a})

    slim = points_ds.map_batches(cands, batch_format="pyarrow")
    return bucketed_group_apply(slim, "traj_id", per_bucket)


def snapped_positions(matched_ds,
                      grid: SegmentGrid | TiledSegmentGrid):
    """Reconstruct the on-road coordinates of matched fixes from the
    grid: along_deg locates each fix on its (way, seg) segment exactly
    (linear referencing is invertible — `SegmentGrid.locate`; the
    tiled grid probes its stripes). Off-network rows (way_id = -1)
    are dropped. -> Dataset (traj_id, ts, way_id, lon, lat);
    map-side, zero shuffles — feeds density tiles for road-usage
    heatmaps (pipelines/route_heat.py)."""
    ref = ray.put(grid)

    def fn(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "traj_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.float64()),
            "way_id": pa.array([], pa.int64()),
            "lon": pa.array([], pa.float64()),
            "lat": pa.array([], pa.float64())})
        if len(t) == 0:
            return empty
        g = get_grid(ref)
        way = t["way_id"].to_numpy(zero_copy_only=False)
        ok = way >= 0
        if not ok.any():
            return empty
        seg = t["seg"].to_numpy(zero_copy_only=False)[ok]
        along = t["along_deg"].to_numpy(zero_copy_only=False)[ok]
        w = way[ok]
        found, lon, lat = g.locate(w, seg, along)
        if not found.all():
            raise ValueError("matched rows reference (way, seg) "
                             "pairs absent from the grid")
        return pa.table({
            "traj_id": t["traj_id"].filter(pa.array(ok)),
            "ts": t["ts"].filter(pa.array(ok)),
            "way_id": pa.array(w),
            "lon": pa.array(lon), "lat": pa.array(lat)})

    return matched_ds.map_batches(fn, batch_format="pyarrow")

"""Trajectory near-duplicate detection: MinHash-LSH over hex-cell
sequences for candidates, exact discrete-Frechet verification — the
route-level analog of the document MinHash dedup (stages/dedup.py),
for fleets where the same route is uploaded many times with GPS
jitter.

Ray-Data shape (mirrors the text pipeline's scale contract):
- ONE `bucketed_group_apply` shuffle co-locates each trajectory's
  slim (traj, ts, lon, lat) rows; per bucket, fixes become collapsed
  hex-cell sequences -> k-gram shingles -> MinHash signatures -> LSH
  band rows, all vectorized except a per-trajectory signature loop
  (`MinHasher.signature` is vectorized over shingles).
- `pairs_from_key_rows` turns (band key, traj) rows into candidate
  pairs with the shared df cap + sentinel surfacing (never silent).
- Verification attaches each side's polyline via TWO bucketed Arrow
  joins (`bucketed_attach_column`) and computes the exact discrete
  Frechet distance per pair inside `map_batches`; only verified pairs
  (tiny) reach the driver. Frechet DP is O(len_a * len_b) per pair —
  bound trace lengths upstream (e.g. `segment_trips`) for pathological
  inputs.

Frechet (not Hausdorff) because near-dup routes must agree on
ORDER: a reversed route is not the same trip. `discrete_frechet`
follows the published Eiter-Mannila coupling DP.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..geometry.cells import hex_cell
from .dedup import (CAP_SENTINEL_ID, MinHasher, _combine_shingles,
                    _STAGE_CACHE)
from .join import bucketed_attach_column, bucketed_group_apply
from .traj import _sorted_traj

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _frechet_lower_bound(xa: np.ndarray, ya: np.ndarray,
                         xb: np.ndarray, yb: np.ndarray) -> float:
    """O(n+m) lower bound on the discrete Frechet distance: any
    coupling matches first-with-first and last-with-last (endpoint
    distances), and every point of one curve must couple to SOME
    point of the other, so its distance to the other's bbox bounds
    from below."""
    lb = max(float(np.hypot(xa[0] - xb[0], ya[0] - yb[0])),
             float(np.hypot(xa[-1] - xb[-1], ya[-1] - yb[-1])))

    def to_bbox(x, y, ox, oy):
        dx = np.maximum(np.maximum(ox.min() - x, x - ox.max()), 0.0)
        dy = np.maximum(np.maximum(oy.min() - y, y - oy.max()), 0.0)
        return float(np.hypot(dx, dy).max())

    return max(lb, to_bbox(xa, ya, xb, yb), to_bbox(xb, yb, xa, ya))


def discrete_frechet(xa: np.ndarray, ya: np.ndarray,
                     xb: np.ndarray, yb: np.ndarray,
                     threshold: float | None = None) -> float:
    """Exact discrete Frechet distance (Eiter-Mannila coupling DP),
    planar degrees. O(n*m); rows are numpy, the left-to-right scan is
    the inherently sequential part of the recurrence.

    With `threshold`, early-abandons (VERDICT r3 item #6): returns
    +inf as soon as the distance is PROVABLY > threshold — first via
    the O(n+m) endpoint/bbox lower bound, then whenever a whole DP
    row exceeds it (every monotone coupling crosses each row, so the
    row minimum bounds the answer from below). The <= threshold
    decision — and any returned finite value — is exact."""
    if threshold is not None \
            and _frechet_lower_bound(xa, ya, xb, yb) > threshold:
        return np.inf
    d = np.hypot(xa[:, None] - xb[None, :], ya[:, None] - yb[None, :])
    n, m = d.shape
    prev = np.maximum.accumulate(d[0])
    for i in range(1, n):
        # min(ca[i-1, j], ca[i-1, j-1]) vectorized; the ca[i, j-1]
        # term forces the sequential scan
        pm = np.minimum(prev, np.concatenate(([np.inf], prev[:-1])))
        row = d[i]
        cur = np.empty(m)
        left = np.inf
        for j in range(m):
            left = max(row[j], min(pm[j], left))
            cur[j] = left
        if threshold is not None and cur.min() > threshold:
            return np.inf
        prev = cur
    return float(prev[-1])


def trajectory_polylines(points_ds, *, traj_col: str = "traj_id",
                         ts_col: str = "ts", x_col: str = "lon",
                         y_col: str = "lat"):
    """-> Dataset (traj_id, xy): ts-ordered polyline per trajectory,
    xy = lons ++ lats as one list<double> (even length, first half x).
    One bucketed shuffle."""

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({"traj_id": pa.array([], pa.int64()),
                             "xy": pa.array([], pa.list_(pa.float64()))})
        tid, ts, x, y = _sorted_traj(g, traj_col, ts_col, x_col, y_col)
        starts = np.concatenate(
            ([0], np.flatnonzero(tid[1:] != tid[:-1]) + 1, [len(tid)]))
        ids, xys = [], []
        for k in range(len(starts) - 1):
            s, e = int(starts[k]), int(starts[k + 1])
            ids.append(tid[s])
            xys.append(np.concatenate((x[s:e], y[s:e])))
        return pa.table({"traj_id": pa.array(np.asarray(ids, np.int64)),
                         "xy": pa.array(xys, pa.list_(pa.float64()))})

    return bucketed_group_apply(points_ds, traj_col, per_bucket)


def _band_rows_from_points(points_ds, *, res: int, shingle_k: int,
                           n_perm: int, n_bands: int, seed: int,
                           traj_col: str, ts_col: str, x_col: str,
                           y_col: str):
    """points -> (bkey, doc_id) LSH band rows, one per (traj, band)."""
    rows_per_band = n_perm // n_bands

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"bkey": pa.array([], pa.int64()),
                          "doc_id": pa.array([], pa.int64())})
        if len(g) == 0:
            return empty
        key = ("mh", n_perm, seed, shingle_k)
        mh = _STAGE_CACHE.get(key)
        if mh is None:
            mh = _STAGE_CACHE[key] = MinHasher(n_perm, seed, shingle_k)
        tid, ts, x, y = _sorted_traj(g, traj_col, ts_col, x_col, y_col)
        cells = hex_cell(x, y, res).view(np.uint64)
        new_traj = np.concatenate(([True], tid[1:] != tid[:-1]))
        # collapse consecutive repeats within a trajectory: the cell
        # SEQUENCE, not the dwell time, identifies the route
        keep = new_traj | np.concatenate(([True], cells[1:] != cells[:-1]))
        cells_k = cells[keep] * _MIX
        tid_k = tid[keep]
        starts = np.concatenate(
            ([0], np.flatnonzero(tid_k[1:] != tid_k[:-1]) + 1,
             [len(tid_k)]))
        sigs = np.empty((len(starts) - 1, n_perm), np.uint64)
        ids = np.empty(len(starts) - 1, np.int64)
        for k in range(len(starts) - 1):
            s, e = int(starts[k]), int(starts[k + 1])
            sh = _combine_shingles(cells_k[s:e], shingle_k)
            sigs[k] = mh.signature(sh)
            ids[k] = tid_k[s]
        out_key, out_doc = [], []
        for bnd in range(n_bands):
            seg = sigs[:, bnd * rows_per_band:(bnd + 1) * rows_per_band]
            h = np.bitwise_xor.reduce(seg * _MIX + np.uint64(bnd), axis=1)
            out_key.append(h.view(np.int64))
            out_doc.append(ids)
        return pa.table({"bkey": pa.array(np.concatenate(out_key)),
                         "doc_id": pa.array(np.concatenate(out_doc))})

    return bucketed_group_apply(points_ds, traj_col, per_bucket)


def trajectory_dup_pairs(points_ds, *, frechet_threshold: float,
                         res: int = 9, shingle_k: int = 3,
                         n_perm: int = 64, n_bands: int = 16,
                         seed: int = 42, max_df: int = 256,
                         traj_col: str = "traj_id", ts_col: str = "ts",
                         x_col: str = "lon", y_col: str = "lat"
                         ) -> pa.Table:
    """-> pa.Table (a_id, b_id, frechet), a_id < b_id, sorted: verified
    near-duplicate trajectory pairs (discrete Frechet <=
    `frechet_threshold` degrees). Candidates are LSH-recalled (a
    within-threshold pair whose cell shingles never collide in any
    band can be missed — standard MinHash recall); every RETURNED pair
    is exact. Capped band buckets are surfaced via a printed drop
    report (CAP_SENTINEL_ID rows from `pairs_from_key_rows`)."""
    return _lsh_verified_pairs(
        points_ds, threshold=frechet_threshold, metric=discrete_frechet,
        out_col="frechet", report_name="trajectory_dup_pairs", res=res,
        shingle_k=shingle_k, n_perm=n_perm, n_bands=n_bands, seed=seed,
        max_df=max_df, traj_col=traj_col, ts_col=ts_col, x_col=x_col,
        y_col=y_col)


def _lsh_verified_pairs(points_ds, *, threshold: float, metric,
                        out_col: str, report_name: str, res: int,
                        shingle_k: int, n_perm: int, n_bands: int,
                        seed: int, max_df: int, traj_col: str,
                        ts_col: str, x_col: str, y_col: str
                        ) -> pa.Table:
    """Shared LSH-candidates + exact-verify scaffold: cell-shingle
    MinHash banding for candidate pairs, then `metric(xa, ya, xb, yb,
    threshold) -> float` per pair (early-abandon allowed: any return
    > threshold is treated as a reject). Used by the Frechet
    (`trajectory_dup_pairs`) and DTW (`stages/dtw.py`) verifiers."""
    from .dedup import pairs_from_key_rows

    rows = _band_rows_from_points(
        points_ds, res=res, shingle_k=shingle_k, n_perm=n_perm,
        n_bands=n_bands, seed=seed, traj_col=traj_col, ts_col=ts_col,
        x_col=x_col, y_col=y_col)
    cand = pairs_from_key_rows(rows, key_col="bkey",
                               max_df=max_df).materialize()
    empty = pa.table({"a_id": pa.array([], pa.int64()),
                      "b_id": pa.array([], pa.int64()),
                      out_col: pa.array([], pa.float64())})
    if cand.count() == 0:
        return empty
    n_capped = 0

    def drop_sent(t: pa.Table) -> pa.Table:
        nonlocal n_capped
        is_cap = pc.equal(t["a_id"], CAP_SENTINEL_ID)
        n_capped += int(pc.sum(pc.cast(is_cap, pa.int64())).as_py() or 0)
        return t.filter(pc.invert(is_cap))

    cand = cand.map_batches(drop_sent, batch_format="pyarrow") \
        .materialize()
    if n_capped:
        print(f"{report_name}: {n_capped} band buckets over "
              f"max_df={max_df} dropped (raise max_df to include)")
    if cand.count() == 0:
        return empty
    # cross-bucket dedup BEFORE the Frechet verify: a true pair
    # collides in up to n_bands band keys (different buckets), and
    # each duplicate costs an O(n*m) DP — one small shuffle removes
    # the n_bands-x verify amplification
    from .join import distinct
    cand = distinct(cand, ["a_id", "b_id"]).materialize()
    polys = trajectory_polylines(points_ds, traj_col=traj_col,
                                 ts_col=ts_col, x_col=x_col,
                                 y_col=y_col).materialize()

    def _ren(col):
        # lazy rename over the MATERIALIZED polys: the attach's schema
        # peek re-executes only this map, not the polyline shuffle
        return polys.map_batches(
            lambda t, c=col: pa.table({"traj_id": t["traj_id"],
                                       c: t["xy"]}),
            batch_format="pyarrow")

    cand = bucketed_attach_column(cand, "a_id", _ren("a_xy"),
                                  "traj_id", "a_xy").materialize()
    cand = bucketed_attach_column(cand, "b_id", _ren("b_xy"),
                                  "traj_id", "b_xy")

    def verify(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        a = t["a_id"].to_numpy(zero_copy_only=False)
        b = t["b_id"].to_numpy(zero_copy_only=False)
        keep_a, keep_b, keep_f = [], [], []
        axy = t["a_xy"].to_pylist()
        bxy = t["b_xy"].to_pylist()
        for i in range(len(t)):
            pa_ = np.asarray(axy[i], np.float64)
            pb_ = np.asarray(bxy[i], np.float64)
            na, nb = len(pa_) // 2, len(pb_) // 2
            f = metric(pa_[:na], pa_[na:], pb_[:nb], pb_[nb:],
                       threshold)
            if f <= threshold:
                keep_a.append(int(a[i]))
                keep_b.append(int(b[i]))
                keep_f.append(f)
        return pa.table({"a_id": pa.array(keep_a, pa.int64()),
                         "b_id": pa.array(keep_b, pa.int64()),
                         out_col: pa.array(keep_f, pa.float64())})

    verified = cand.map_batches(verify, batch_format="pyarrow")
    parts = [p for p in verified.iter_batches(batch_size=None,
                                              batch_format="pyarrow")
             if p.num_rows]
    if not parts:
        return empty
    df = pa.concat_tables(parts).to_pandas() \
        .drop_duplicates(["a_id", "b_id"]).sort_values(["a_id", "b_id"])
    return pa.table({"a_id": df["a_id"].astype(np.int64),
                     "b_id": df["b_id"].astype(np.int64),
                     out_col: df[out_col].astype(np.float64)})

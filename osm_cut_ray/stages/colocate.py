"""Spatiotemporal co-location join (contact detection): pairs of
users whose fixes were within ``eps`` distance AND ``tau`` seconds of
each other — proximity analytics, contact tracing, convoy/meet-up
detection over GPS corpora.

Grid strategy extends the eps-grid of stages/spatial_join.py with a
THIRD key axis, the time bin floor(ts / tau): any qualifying fix pair
is within one cell step in x, y AND one bin step in t. The A role is
emitted to its home (cx, cy, tb) only; the B role replicates to the
3x3 spatially-pruned neighborhood x 3 time bins, so every unordered
fix pair (p, q) with uid_p < uid_q is examined EXACTLY ONCE — in p's
home bucket (the a<b filter kills the mirrored occurrence in q's).

ONE slim bucket shuffle (uid, ts, x, y per row) pairs fixes with the
same-size-cell stacked kernel; a second tiny bucket pass folds fix
pairs into per-user-pair contact stats. Over-cap cells surface
sentinel rows (a_id = -1) — the dedup-family cap contract.

Contact timestamp = (ts_a + ts_b) / 2.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .cluster import _size_groups
from .join import bucketed_group_apply

CAP_SENTINEL_ID = np.int64(-1)
_B21 = np.int64(1) << np.int64(20)


def _key3(cx: np.ndarray, cy: np.ndarray, tb: np.ndarray) -> np.ndarray:
    if (np.abs(cx) >= _B21).any() or (np.abs(cy) >= _B21).any() \
            or (np.abs(tb) >= _B21).any():
        raise ValueError("cell/bin indices exceed +-2^20; use a "
                         "coarser eps/tau")
    return (((cx + _B21) << np.int64(42))
            | ((cy + _B21) << np.int64(21)) | (tb + _B21))


def colocation_pairs(fixes_ds, *, eps: float, tau: float,
                     max_cell_pairs: int = 1_000_000,
                     id_col: str = "user_id", ts_col: str = "ts",
                     x_col: str = "lon", y_col: str = "lat"):
    """-> Dataset (a_id, b_id, n_contacts, t_first, t_last): per user
    pair (a_id < b_id), the number of qualifying fix pairs and the
    first/last contact midpoint time. Same-user fix pairs are never
    contacts. Sentinel rows (a_id = -1, b_id = dropped fix pairs,
    n_contacts = 0) surface over-cap cells."""
    if eps <= 0 or tau <= 0:
        raise ValueError("eps and tau must be > 0")

    def norm(side: int):
        def fn(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "ckey": pa.array([], pa.int64()),
                "uid": pa.array([], pa.int64()),
                "ts": pa.array([], pa.float64()),
                "x": pa.array([], pa.float64()),
                "y": pa.array([], pa.float64()),
                "side": pa.array([], pa.int8())})
            if len(t) == 0:
                return empty
            x = t[x_col].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            y = t[y_col].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            ts = t[ts_col].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            uid = t[id_col].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            ix = np.floor(x / eps).astype(np.int64)
            iy = np.floor(y / eps).astype(np.int64)
            tb = np.floor(ts / tau).astype(np.int64)
            if side == 0:
                return pa.table({
                    "ckey": pa.array(_key3(ix, iy, tb)),
                    "uid": pa.array(uid), "ts": pa.array(ts),
                    "x": pa.array(x), "y": pa.array(y),
                    "side": pa.array(np.zeros(len(x), np.int8))})
            keys, idxs = [], []
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    if dx == 0 and dy == 0:
                        m = np.arange(len(x), dtype=np.int64)
                    else:
                        cx0 = (ix + dx) * eps
                        cy0 = (iy + dy) * eps
                        ddx = np.maximum(
                            np.maximum(cx0 - x, x - (cx0 + eps)), 0.0)
                        ddy = np.maximum(
                            np.maximum(cy0 - y, y - (cy0 + eps)), 0.0)
                        m = np.flatnonzero(np.hypot(ddx, ddy) <= eps)
                        if not len(m):
                            continue
                    for dt in (-1, 0, 1):
                        keys.append(_key3(ix[m] + dx, iy[m] + dy,
                                          tb[m] + dt))
                        idxs.append(m)
            key = np.concatenate(keys)
            idx = np.concatenate(idxs)
            return pa.table({
                "ckey": pa.array(key), "uid": pa.array(uid[idx]),
                "ts": pa.array(ts[idx]), "x": pa.array(x[idx]),
                "y": pa.array(y[idx]),
                "side": pa.array(np.ones(len(idx), np.int8))})

        return fixes_ds.map_batches(fn, batch_format="pyarrow")

    rows = norm(0).union(norm(1))

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"a_id": pa.array([], pa.int64()),
                          "b_id": pa.array([], pa.int64()),
                          "tmid": pa.array([], pa.float64())})
        if len(g) == 0:
            return empty
        g = g.sort_values("ckey", kind="mergesort")
        ck = g["ckey"].to_numpy(np.int64)
        x = g["x"].to_numpy(np.float64)
        y = g["y"].to_numpy(np.float64)
        ts = g["ts"].to_numpy(np.float64)
        uid = g["uid"].to_numpy(np.int64)
        side = g["side"].to_numpy(np.int8)
        starts = np.concatenate(
            ([0], np.flatnonzero(ck[1:] != ck[:-1]) + 1, [len(ck)]))
        out_a, out_b, out_t, n_cap = [], [], [], []
        for cells, s in _size_groups(starts):
            idx = starts[cells][:, None] + np.arange(s)
            X, Y, T = x[idx], y[idx], ts[idx]
            U = uid[idx]
            am = side[idx] == 0
            bm = ~am
            D = np.hypot(X[:, :, None] - X[:, None, :],
                         Y[:, :, None] - Y[:, None, :])
            DT = np.abs(T[:, :, None] - T[:, None, :])
            hit = ((D <= eps) & (DT <= tau)
                   & (U[:, :, None] < U[:, None, :])
                   & am[:, :, None] & bm[:, None, :])
            per_cell = hit.sum(axis=(1, 2))
            over = per_cell > max_cell_pairs
            if over.any():
                n_cap.extend(per_cell[over].tolist())
                hit[over] = False
            mi, ai, bi = np.nonzero(hit)
            if len(mi) == 0:
                continue
            out_a.append(U[mi, ai])
            out_b.append(U[mi, bi])
            out_t.append(0.5 * (T[mi, ai] + T[mi, bi]))
        if not out_a and not n_cap:
            return empty
        if out_a:
            a_arr = np.concatenate(out_a)
            b_arr = np.concatenate(out_b)
            t_arr = np.concatenate(out_t)
        else:
            a_arr = b_arr = np.array([], np.int64)
            t_arr = np.array([], np.float64)
        if n_cap:
            a_arr = np.concatenate(
                [a_arr, np.full(len(n_cap), CAP_SENTINEL_ID)])
            b_arr = np.concatenate(
                [b_arr, np.asarray(n_cap, np.int64)])
            t_arr = np.concatenate(
                [t_arr, np.full(len(n_cap), np.nan)])
        return pa.table({"a_id": pa.array(a_arr.astype(np.int64)),
                         "b_id": pa.array(b_arr.astype(np.int64)),
                         "tmid": pa.array(t_arr)})

    contacts = bucketed_group_apply(rows, "ckey", per_bucket)

    def tag_pk(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"a_id": pa.array([], pa.int64()),
                             "b_id": pa.array([], pa.int64()),
                             "tmid": pa.array([], pa.float64()),
                             "pk": pa.array([], pa.int64())})
        a = t["a_id"].to_numpy(zero_copy_only=False)
        b = t["b_id"].to_numpy(zero_copy_only=False)
        pk = ((a.view(np.uint64)
               * np.uint64(0xBF58476D1CE4E5B9))
              ^ (b.view(np.uint64)
                 * np.uint64(0x9E3779B97F4A7C15))).view(np.int64)
        return t.append_column("pk", pa.array(pk))

    def fold(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"a_id": pa.array([], pa.int64()),
                          "b_id": pa.array([], pa.int64()),
                          "n_contacts": pa.array([], pa.int64()),
                          "t_first": pa.array([], pa.float64()),
                          "t_last": pa.array([], pa.float64())})
        if len(g) == 0:
            return empty
        sent = g[g["a_id"] == CAP_SENTINEL_ID]
        g = g[g["a_id"] != CAP_SENTINEL_ID]
        parts = []
        if len(g):
            agg = g.groupby(["a_id", "b_id"], as_index=False) \
                .agg(n_contacts=("tmid", "size"),
                     t_first=("tmid", "min"),
                     t_last=("tmid", "max"))
            parts.append(pa.table({
                "a_id": pa.array(agg["a_id"].to_numpy(np.int64)),
                "b_id": pa.array(agg["b_id"].to_numpy(np.int64)),
                "n_contacts": pa.array(
                    agg["n_contacts"].to_numpy(np.int64)),
                "t_first": pa.array(
                    agg["t_first"].to_numpy(np.float64)),
                "t_last": pa.array(
                    agg["t_last"].to_numpy(np.float64))}))
        if len(sent):
            parts.append(pa.table({
                "a_id": pa.array(np.full(len(sent), CAP_SENTINEL_ID)),
                "b_id": pa.array(sent["b_id"].to_numpy(np.int64)),
                "n_contacts": pa.array(np.zeros(len(sent), np.int64)),
                "t_first": pa.array(np.full(len(sent), np.nan)),
                "t_last": pa.array(np.full(len(sent), np.nan))}))
        return parts[0] if len(parts) == 1 \
            else pa.concat_tables(parts)

    return bucketed_group_apply(
        contacts.map_batches(tag_pk, batch_format="pyarrow"),
        "pk", fold)

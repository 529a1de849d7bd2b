"""Spatial joins between two point datasets: eps distance join and
k-nearest-within-eps join — the two-table siblings of the broadcast
kNN (stages/knn.py, probes fit in the object store) for when BOTH
sides are corpus-sized.

Grid strategy: cell size = eps, so every match for an A point lies in
the 3x3 neighborhood of its home cell. A points are emitted to their
home cell only; B points replicate to home + the (pruned) 8 neighbor
cells whose rectangle lies within eps. ONE bucketed shuffle
co-locates each cell's A homes with every B point that can match
them; per-cell distance work runs on same-size stacks (the
per-shape-group pattern shared with stages/cluster.py) — no Python
loop per cell, payloads never transit (slim id/x/y rows only).

Result volume is data-dependent (dense data quadratic): cells whose
pair count exceeds `max_cell_pairs` emit NO pairs plus one sentinel
row (a_id = -1, b_id = that pair count) so drops are
machine-detectable, never silent — the dedup family's cap contract.

Determinism: pairs are exact; knn ties break by (dist, b_id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .cluster import _size_groups
from .join import bucketed_group_apply
from .snap import _cell_key

CAP_SENTINEL_ID = np.int64(-1)


def _norm(ds, id_col, x_col, y_col, side: int, eps: float):
    def fn(t: pa.Table) -> pa.Table:
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        pid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ix = np.floor(x / eps).astype(np.int64)
        iy = np.floor(y / eps).astype(np.int64)
        if side == 0:  # A: home cell only
            return pa.table({
                "ckey": pa.array(_cell_key(ix, iy)),
                "id": pa.array(pid), "x": pa.array(x),
                "y": pa.array(y),
                "side": pa.array(np.zeros(len(x), np.int8))})
        keys, idxs = [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    keys.append(_cell_key(ix, iy))
                    idxs.append(np.arange(len(x), dtype=np.int64))
                    continue
                cx0 = (ix + dx) * eps
                cy0 = (iy + dy) * eps
                ddx = np.maximum(
                    np.maximum(cx0 - x, x - (cx0 + eps)), 0.0)
                ddy = np.maximum(
                    np.maximum(cy0 - y, y - (cy0 + eps)), 0.0)
                m = np.flatnonzero(np.hypot(ddx, ddy) <= eps)
                if len(m):
                    keys.append(_cell_key(ix[m] + dx, iy[m] + dy))
                    idxs.append(m)
        key = np.concatenate(keys)
        idx = np.concatenate(idxs)
        return pa.table({
            "ckey": pa.array(key), "id": pa.array(pid[idx]),
            "x": pa.array(x[idx]), "y": pa.array(y[idx]),
            "side": pa.array(np.ones(len(idx), np.int8))})

    return ds.map_batches(fn, batch_format="pyarrow")


def distance_join(a_ds, b_ds, *, eps: float, k: int | None = None,
                  max_cell_pairs: int = 1_000_000,
                  a_id: str = "id", a_x: str = "lon", a_y: str = "lat",
                  b_id: str = "id", b_x: str = "lon", b_y: str = "lat"):
    """All (a, b) pairs with planar distance <= eps -> Dataset (a_id,
    b_id, dist); with `k`, only each A point's k nearest B points
    within eps (ties by (dist, b_id)). Ids must be int64; the two
    tables' id spaces are independent. Over-cap cells surface
    sentinel rows (module docstring)."""
    rows = _norm(a_ds, a_id, a_x, a_y, 0, eps) \
        .union(_norm(b_ds, b_id, b_x, b_y, 1, eps))

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"a_id": pa.array([], pa.int64()),
                          "b_id": pa.array([], pa.int64()),
                          "dist": pa.array([], pa.float64())})
        if len(g) == 0:
            return empty
        g = g.sort_values("ckey", kind="mergesort")
        ck = g["ckey"].to_numpy(np.int64)
        x = g["x"].to_numpy(np.float64)
        y = g["y"].to_numpy(np.float64)
        pid = g["id"].to_numpy(np.int64)
        side = g["side"].to_numpy(np.int8)
        starts = np.concatenate(
            ([0], np.flatnonzero(ck[1:] != ck[:-1]) + 1, [len(ck)]))
        out_a, out_b, out_d = [], [], []
        n_cap = []
        for cells, s in _size_groups(starts):
            idx = starts[cells][:, None] + np.arange(s)
            X, Y = x[idx], y[idx]
            D = np.hypot(X[:, :, None] - X[:, None, :],
                         Y[:, :, None] - Y[:, None, :])
            am = side[idx] == 0
            bm = ~am
            hit = (D <= eps) & am[:, :, None] & bm[:, None, :]
            per_cell = hit.sum(axis=(1, 2))
            over = per_cell > max_cell_pairs
            if over.any():
                n_cap.extend(per_cell[over].tolist())
                hit[over] = False
            mi, ai, bi = np.nonzero(hit)
            if len(mi) == 0:
                continue
            out_a.append(pid[idx][mi, ai])
            out_b.append(pid[idx][mi, bi])
            out_d.append(D[mi, ai, bi])
        if not out_a and not n_cap:
            return empty
        if out_a:
            a_arr = np.concatenate(out_a)
            b_arr = np.concatenate(out_b)
            d_arr = np.concatenate(out_d)
        else:
            a_arr = b_arr = np.array([], np.int64)
            d_arr = np.array([], np.float64)
        if k is not None and len(a_arr):
            # all of an A point's matches live in this bucket (its
            # home cell is here and B replicated in) -> local top-k
            # is global top-k
            o = np.lexsort((b_arr, d_arr, a_arr))
            a_arr, b_arr, d_arr = a_arr[o], b_arr[o], d_arr[o]
            firsts = np.concatenate(([True], a_arr[1:] != a_arr[:-1]))
            ordinal = np.arange(len(a_arr))
            base = np.zeros(len(a_arr), np.int64)
            base[firsts] = ordinal[firsts]
            rank = ordinal - np.maximum.accumulate(base)
            keep = rank < k
            a_arr, b_arr, d_arr = a_arr[keep], b_arr[keep], d_arr[keep]
        if n_cap:
            a_arr = np.concatenate(
                [a_arr, np.full(len(n_cap), CAP_SENTINEL_ID)])
            b_arr = np.concatenate([b_arr,
                                    np.asarray(n_cap, np.int64)])
            d_arr = np.concatenate(
                [d_arr, np.full(len(n_cap), np.inf)])
        return pa.table({"a_id": pa.array(a_arr.astype(np.int64)),
                         "b_id": pa.array(b_arr.astype(np.int64)),
                         "dist": pa.array(d_arr)})

    return bucketed_group_apply(rows, "ckey", per_bucket)

"""Iso-contour extraction (marching squares) over a distributed
sparse grid — density contours, IDW-surface isolines, heatmap vector
overlays. Composes with `rasterize_points` below, `interpolate.py`
surfaces snapped to a grid, or any (ix, iy, value) cell table.

Algorithm: the public marching-squares case table over 2x2 cell
squares, linear edge interpolation, with the standard center-average
rule disambiguating the two saddle cases (5 and 10). "Inside" is
``value >= level`` (pinned by tests/test_contour.py against an
independent scalar implementation).

Ray-Data shape: squares are keyed by their lower-left corner cell and
partitioned into ``tile`` x ``tile`` square tiles. Each input cell
participates in the 4 squares whose lower-left corners are
(ix-{0,1}, iy-{0,1}); it is emitted once per DISTINCT tile owning any
of those squares (amortized ~1x, worst-case 4x on tile boundaries —
the halo exchange). ONE slim bucket shuffle later, each tile scatters
its cells into a dense (tile+1)^2 local array (absent cells =
``default``) and runs the fully vectorized kernel per level. Segment
coordinates are pure functions of corner values, so output is
bit-deterministic under any partitioning.

Output coordinates are GRID coordinates: vertex x is a fractional ix
(cell-center units). Map to world with ``grid_to_world``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .join import bucketed_group_apply

_TKEY_MUL = np.int64(1) << np.int64(32)
_MAX_IDX = np.int64(1) << np.int64(30)
_BIAS = np.int64(1) << np.int64(30)


def _pack(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a, b) int64 pairs in (-2^30, 2^30) -> one non-negative int64
    key (bias keeps both components non-negative so decode is exact
    for negative indices)."""
    return (a + _BIAS) * _TKEY_MUL + (b + _BIAS)


def _unpack(k: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    a = (k >> np.int64(32)) - _BIAS
    b = (k & np.int64(0xFFFFFFFF)) - _BIAS
    return a, b

# case -> list of (edge_a, edge_b) segments; edges 0=bottom 1=right
# 2=top 3=left. Saddles (5, 10) are handled separately below.
_CASES = {
    1: [(3, 0)], 2: [(0, 1)], 3: [(3, 1)], 4: [(1, 2)],
    6: [(0, 2)], 7: [(3, 2)], 8: [(3, 2)], 9: [(0, 2)],
    11: [(1, 2)], 12: [(3, 1)], 13: [(0, 1)], 14: [(3, 0)],
}
# saddle pairings: (center inside, center outside)
_SADDLE = {
    5: ([(3, 2), (0, 1)], [(3, 0), (1, 2)]),
    10: ([(3, 0), (1, 2)], [(3, 2), (0, 1)]),
}

_SEG_SCHEMA = pa.schema([("level", pa.float64()),
                         ("x1", pa.float64()), ("y1", pa.float64()),
                         ("x2", pa.float64()), ("y2", pa.float64())])


def _empty_segments() -> pa.Table:
    return _SEG_SCHEMA.empty_table()


def _edge_points(V: np.ndarray, level: float):
    """Per-square interpolated crossing point on each of the 4 edges
    (NaN where the edge is not crossed / flat). V is indexed [x, y]
    with side (W+1, H+1); squares are (W, H)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        ll, lr = V[:-1, :-1], V[1:, :-1]
        ul, ur = V[:-1, 1:], V[1:, 1:]
        tb = (level - ll) / (lr - ll)      # bottom: ll -> lr, along x
        tr = (level - lr) / (ur - lr)      # right:  lr -> ur, along y
        tt = (level - ul) / (ur - ul)      # top:    ul -> ur, along x
        tl = (level - ll) / (ul - ll)      # left:   ll -> ul, along y
    W, H = ll.shape
    gx = np.arange(W, dtype=np.float64)[:, None]
    gy = np.arange(H, dtype=np.float64)[None, :]
    # (x, y) of the crossing on each edge, in local square coords
    return (
        (gx + tb, np.broadcast_to(gy, tb.shape)),           # bottom
        (np.broadcast_to(gx + 1.0, tr.shape), gy + tr),     # right
        (gx + tt, np.broadcast_to(gy + 1.0, tt.shape)),     # top
        (np.broadcast_to(gx, tl.shape), gy + tl),           # left
    )


def _tile_segments(V: np.ndarray, levels, ox: float, oy: float):
    """Dense (tile+1)^2 value array -> segment rows for all levels,
    offset to global grid coordinates by (ox, oy)."""
    out_lv, out = [], []
    for level in levels:
        level = float(level)
        inside = (V >= level).astype(np.int8)
        case = (inside[:-1, :-1] + (inside[1:, :-1] << 1)
                + (inside[1:, 1:] << 2) + (inside[:-1, 1:] << 3))
        if not ((case > 0) & (case < 15)).any():
            continue
        edges = _edge_points(V, level)
        center_in = (V[:-1, :-1] + V[1:, :-1]
                     + V[:-1, 1:] + V[1:, 1:]) / 4.0 >= level

        def emit(mask, ea, eb):
            if not mask.any():
                return
            ax, ay = edges[ea][0][mask], edges[ea][1][mask]
            bx, by = edges[eb][0][mask], edges[eb][1][mask]
            out_lv.append(np.full(len(ax), level))
            out.append((ax + ox, ay + oy, bx + ox, by + oy))

        for c, segs in _CASES.items():
            m = case == c
            for ea, eb in segs:
                emit(m, ea, eb)
        for c, (segs_in, segs_out) in _SADDLE.items():
            m = case == c
            for ea, eb in segs_in:
                emit(m & center_in, ea, eb)
            for ea, eb in segs_out:
                emit(m & ~center_in, ea, eb)
    if not out:
        return _empty_segments()
    return pa.table({
        "level": pa.array(np.concatenate(out_lv)),
        "x1": pa.array(np.concatenate([o[0] for o in out])),
        "y1": pa.array(np.concatenate([o[1] for o in out])),
        "x2": pa.array(np.concatenate([o[2] for o in out])),
        "y2": pa.array(np.concatenate([o[3] for o in out]))})


def contour_segments(cells_ds, levels, *, tile: int = 64,
                     default: float = 0.0,
                     ix_col: str = "ix", iy_col: str = "iy",
                     value_col: str = "value"):
    """(ix, iy, value) sparse grid -> Dataset (level, x1, y1, x2, y2)
    of iso-contour segments in grid coordinates, for every level in
    ``levels``. Cells absent from the input have value ``default``;
    squares whose 4 corners are all absent are not evaluated (their
    case is uniform — no segments — EXCEPT when ``default >= level``
    could flip them to uniform-inside, which also emits nothing, so
    skipping is exact)."""
    if tile < 2:
        raise ValueError("tile must be >= 2")
    levels = [float(lv) for lv in levels]
    if not levels:
        raise ValueError("levels must be non-empty")

    def halo(t: pa.Table) -> pa.Table:
        empty = pa.table({"tkey": pa.array([], pa.int64()),
                          "ix": pa.array([], pa.int64()),
                          "iy": pa.array([], pa.int64()),
                          "value": pa.array([], pa.float64())})
        if len(t) == 0:
            return empty
        ix = t[ix_col].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = t[iy_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        if (np.abs(ix) >= _MAX_IDX).any() or \
                (np.abs(iy) >= _MAX_IDX).any():
            raise ValueError("grid indices must be in (-2^30, 2^30)")
        ks = []
        for dx in (0, -1):
            for dy in (0, -1):
                tx = np.floor_divide(ix + dx, tile)
                ty = np.floor_divide(iy + dy, tile)
                ks.append(_pack(tx, ty))
        k0, k1, k2, k3 = ks
        # drop duplicate (tile, cell) emissions map-side: interior
        # cells compute the same tile up to 4x (vectorized 4-way
        # comparison, no lexsort)
        keep = [np.ones(len(ix), bool),
                k1 != k0,
                (k2 != k0) & (k2 != k1),
                (k3 != k0) & (k3 != k1) & (k3 != k2)]
        k = np.concatenate([ki[m] for ki, m in zip(ks, keep)])
        x = np.concatenate([ix[m] for m in keep])
        y = np.concatenate([iy[m] for m in keep])
        val = np.concatenate([v[m] for m in keep])
        return pa.table({"tkey": pa.array(k), "ix": pa.array(x),
                         "iy": pa.array(y), "value": pa.array(val)})

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return _empty_segments()
        g = g.sort_values("tkey", kind="mergesort")
        tk = g["tkey"].to_numpy(np.int64)
        ix = g["ix"].to_numpy(np.int64)
        iy = g["iy"].to_numpy(np.int64)
        v = g["value"].to_numpy(np.float64)
        starts = np.concatenate(
            ([0], np.flatnonzero(tk[1:] != tk[:-1]) + 1, [len(tk)]))
        parts = []
        for s, e in zip(starts[:-1], starts[1:]):
            txa, tya = _unpack(tk[s:s + 1])
            tx, ty = int(txa[0]), int(tya[0])
            V = np.full((tile + 1, tile + 1), default, np.float64)
            lx = ix[s:e] - tx * tile
            ly = iy[s:e] - ty * tile
            V[lx, ly] = v[s:e]
            seg = _tile_segments(V, levels, float(tx * tile),
                                 float(ty * tile))
            if len(seg):
                parts.append(seg)
        if not parts:
            return _empty_segments()
        return pa.concat_tables(parts)

    rows = cells_ds.map_batches(halo, batch_format="pyarrow")
    return bucketed_group_apply(rows, "tkey", per_bucket)


def rasterize_points(points_ds, *, cell: float,
                     x_col: str = "lon", y_col: str = "lat",
                     x0: float = -180.0, y0: float = -90.0):
    """points -> Dataset (ix, iy, value) counts on a square grid with
    origin (x0, y0) and pitch ``cell`` (value = point count, float64
    so it feeds `contour_segments` directly). Per-batch np.unique
    combine first; the shuffle carries only distinct touched cells."""
    if cell <= 0:
        raise ValueError("cell must be > 0")

    def combine(t: pa.Table) -> pa.Table:
        empty = pa.table({"key": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ix = np.floor((x - x0) / cell).astype(np.int64)
        iy = np.floor((y - y0) / cell).astype(np.int64)
        if (np.abs(ix) >= _MAX_IDX).any() or \
                (np.abs(iy) >= _MAX_IDX).any():
            raise ValueError("grid indices must be in (-2^30, 2^30)")
        key = _pack(ix, iy)
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"key": pa.array(uk),
                         "n": pa.array(cnt.astype(np.int64))})

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({"ix": pa.array([], pa.int64()),
                             "iy": pa.array([], pa.int64()),
                             "value": pa.array([], pa.float64())})
        agg = g.groupby("key", as_index=False)["n"].sum()
        ix, iy = _unpack(agg["key"].to_numpy(np.int64))
        return pa.table({"ix": pa.array(ix), "iy": pa.array(iy),
                         "value": pa.array(
                             agg["n"].to_numpy(np.float64))})

    partial = points_ds.map_batches(combine, batch_format="pyarrow")
    return bucketed_group_apply(partial, "key", per_bucket)


def grid_to_world(gx, gy, *, cell: float,
                  x0: float = -180.0, y0: float = -90.0):
    """Fractional grid vertex coords (cell CENTERS at integer ix) ->
    world coordinates."""
    gx = np.asarray(gx, np.float64)
    gy = np.asarray(gy, np.float64)
    return x0 + (gx + 0.5) * cell, y0 + (gy + 0.5) * cell

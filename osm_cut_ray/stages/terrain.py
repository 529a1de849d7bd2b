"""Terrain derivatives over a distributed elevation grid: slope,
aspect and hillshade by Horn's 3x3 method (the public formulation
used by gdaldem) — DEM analytics, solar/visibility preprocessing,
relief rendering behind the density-tile pipeline.

Horn (1981), window  a b c        dz/dx = ((c+2f+i) - (a+2d+g)) / 8w
                     d e f        dz/dy = ((g+2h+i) - (a+2b+c)) / 8w
                     g h i
slope = atan(z_factor * hypot(dz/dx, dz/dy)); aspect = atan2(dz/dy,
-dz/dx) mapped to compass degrees; hillshade = the standard
sun-elevation/azimuth cosine form scaled to 0..255 (floored).
Cells missing from the sparse input take the CENTER cell's value
(gdaldem's edge behavior for nodata borders; pinned).

Ray-Data shape: same tile-halo exchange as stages/contour.py — each
cell is emitted to the (<= 4 distinct) tiles whose 3x3 windows can
touch it, ONE slim bucket shuffle, per-tile vectorized stencil over a
dense (tile+2)^2 local array. Pure per-tile function of cell values:
bit-deterministic under any partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .contour import _BIAS, _MAX_IDX, _pack, _unpack
from .join import bucketed_group_apply

_OUT = pa.schema([("ix", pa.int64()), ("iy", pa.int64()),
                  ("slope_deg", pa.float64()),
                  ("aspect_deg", pa.float64()),
                  ("hillshade", pa.int32())])


def horn_derivatives(V: np.ndarray, P: np.ndarray, *,
                     cell_size: float, z_factor: float,
                     sun_az_deg: float, sun_alt_deg: float):
    """Dense stencil: V (H+2, W+2) values with a 1-cell apron,
    P same-shape presence mask. Returns (slope_deg, aspect_deg,
    hillshade) for the interior cells; absent neighbors take the
    center value."""
    C = V[1:-1, 1:-1]

    def nb(dx, dy):
        sl = V[1 + dx:V.shape[0] - 1 + dx,
               1 + dy:V.shape[1] - 1 + dy]
        pm = P[1 + dx:P.shape[0] - 1 + dx,
               1 + dy:P.shape[1] - 1 + dy]
        return np.where(pm, sl, C)

    # indexing [x, y]: a=(-1,+1) b=(0,+1) c=(+1,+1) / d=(-1,0)
    # f=(+1,0) / g=(-1,-1) h=(0,-1) i=(+1,-1)
    a, b, c = nb(-1, 1), nb(0, 1), nb(1, 1)
    d, f = nb(-1, 0), nb(1, 0)
    g, h, i = nb(-1, -1), nb(0, -1), nb(1, -1)
    dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / (8.0 * cell_size)
    dzdy = ((g + 2 * h + i) - (a + 2 * b + c)) / (8.0 * cell_size)
    slope = np.arctan(z_factor * np.hypot(dzdx, dzdy))
    # published Esri hillshade: zenith = 90 - altitude, math azimuth
    # = (360 - az + 90) mod 360, aspect = atan2(dz/dy, -dz/dx)
    zen = np.radians(90.0 - sun_alt_deg)
    azm = np.radians((360.0 - sun_az_deg + 90.0) % 360.0)
    aspect = np.arctan2(dzdy, -dzdx)
    shade = (np.cos(zen) * np.cos(slope)
             + np.sin(zen) * np.sin(slope) * np.cos(azm - aspect))
    hs = np.floor(255.0 * np.clip(shade, 0.0, 1.0)).astype(np.int32)
    # compass aspect: 0 = north, clockwise; flat cells -> -1
    asp = np.mod(90.0 - np.degrees(aspect), 360.0)
    flat = (dzdx == 0) & (dzdy == 0)
    asp = np.where(flat, -1.0, asp)
    return np.degrees(slope), asp, hs


def terrain_attributes(cells_ds, *, cell_size: float = 1.0,
                       z_factor: float = 1.0,
                       sun_az_deg: float = 315.0,
                       sun_alt_deg: float = 45.0, tile: int = 64,
                       ix_col: str = "ix", iy_col: str = "iy",
                       value_col: str = "value"):
    """(ix, iy, value) elevation cells -> Dataset (ix, iy, slope_deg,
    aspect_deg, hillshade) for every INPUT cell."""
    if tile < 2:
        raise ValueError("tile must be >= 2")
    if cell_size <= 0:
        raise ValueError("cell_size must be > 0")

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
        for dx in (-1, 1):
            for dy in (-1, 1):
                tx = np.floor_divide(ix + dx, tile)
                ty = np.floor_divide(iy + dy, tile)
                ks.append(_pack(tx, ty))
        k0, k1, k2, k3 = ks
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
            return _OUT.empty_table()
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
            V = np.zeros((tile + 2, tile + 2), np.float64)
            P = np.zeros((tile + 2, tile + 2), bool)
            lx = ix[s:e] - tx * tile + 1
            ly = iy[s:e] - ty * tile + 1
            ok = (lx >= 0) & (lx < tile + 2) & (ly >= 0) \
                & (ly < tile + 2)
            V[lx[ok], ly[ok]] = v[s:e][ok]
            P[lx[ok], ly[ok]] = True
            slope, asp, hs = horn_derivatives(
                V, P, cell_size=cell_size, z_factor=z_factor,
                sun_az_deg=sun_az_deg, sun_alt_deg=sun_alt_deg)
            own = P[1:-1, 1:-1]
            gx, gy = np.nonzero(own)
            if not len(gx):
                continue
            parts.append(pa.table({
                "ix": pa.array(gx + tx * tile),
                "iy": pa.array(gy + ty * tile),
                "slope_deg": pa.array(slope[gx, gy]),
                "aspect_deg": pa.array(asp[gx, gy]),
                "hillshade": pa.array(hs[gx, gy])}))
        if not parts:
            return _OUT.empty_table()
        return pa.concat_tables(parts)

    rows = cells_ds.map_batches(halo, batch_format="pyarrow")
    return bucketed_group_apply(rows, "tkey", per_bucket)

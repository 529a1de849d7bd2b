"""Density-tile rendering: bin a point corpus into a web-map tile
level and emit one grayscale IMAGE per non-empty tile — the geo x
image composition (heatmap basemaps, coverage QA, dataset debias
inspection) whose output rows feed every downstream image stage
(resize, patches, quality, WebDataset export).

Projection is equirectangular on the repo's planar-degree convention:
u = (lon + 180) / 360, v = (90 - lat) / 180, tile = floor(u * 2^z)
(right/bottom edges clamp into the last tile/pixel). Ray-Data shape:
one slim map pass emits (tile key, pixel ordinal) int64 rows — the
only thing that shuffles — then ONE `bucketed_group_apply` renders
each tile with a single np.bincount + deterministic tone map and
encodes it with the shared container codec.

Tone map (pinned by tests): c=0 -> 0; else
  log:    1 + floor(254 * log1p(c) / log1p(cmax))
  linear: 1 + floor(254 * c / cmax)
so any non-empty pixel is visible and the hottest pixel is 255.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources.images import encode_image
from .join import bucketed_group_apply

_TILE_MUL = np.int64(1 << 26)


def _project(lon: np.ndarray, lat: np.ndarray, zoom: int,
             tile_px: int):
    n = np.int64(1) << zoom
    u = np.clip((lon + 180.0) / 360.0, 0.0, np.nextafter(1.0, 0.0))
    v = np.clip((90.0 - lat) / 180.0, 0.0, np.nextafter(1.0, 0.0))
    gx = np.floor(u * float(int(n) * tile_px)).astype(np.int64)
    gy = np.floor(v * float(int(n) * tile_px)).astype(np.int64)
    lim = np.int64(int(n) * tile_px - 1)
    gx = np.minimum(gx, lim)
    gy = np.minimum(gy, lim)
    tx, px = gx // tile_px, gx % tile_px
    ty, py = gy // tile_px, gy % tile_px
    return tx, ty, py * tile_px + px


def tone_map(counts: np.ndarray, log_scale: bool) -> np.ndarray:
    """int64 counts -> uint8 (0 empty, 1..255 increasing, max -> 255)."""
    out = np.zeros(len(counts), np.uint8)
    nz = counts > 0
    if not nz.any():
        return out
    cmax = counts.max()
    if log_scale:
        scaled = np.log1p(counts[nz]) / np.log1p(cmax)
    else:
        scaled = counts[nz] / cmax
    out[nz] = (1 + np.floor(254.0 * scaled)).astype(np.uint8)
    return out


def render_density_tiles(points_ds, *, zoom: int, tile_px: int = 256,
                         x_col: str = "lon", y_col: str = "lat",
                         log_scale: bool = True, fmt: str = "fpng"):
    """-> Dataset (tz, tx, ty, n_pts, bytes, w, h, fmt): one rendered
    grayscale tile per non-empty (tx, ty) at `zoom`."""
    if not (0 <= zoom <= 24):
        raise ValueError("zoom must be in [0, 24]")

    def slim(t: pa.Table) -> pa.Table:
        lon = t[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lat = t[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        tx, ty, pix = _project(lon, lat, zoom, tile_px)
        return pa.table({"tkey": pa.array(tx * _TILE_MUL + ty),
                         "pix": pa.array(pix)})

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({
            "tz": pa.array([], pa.int32()),
            "tx": pa.array([], pa.int64()),
            "ty": pa.array([], pa.int64()),
            "n_pts": pa.array([], pa.int64()),
            "bytes": pa.array([], pa.binary()),
            "w": pa.array([], pa.int32()),
            "h": pa.array([], pa.int32()),
            "fmt": pa.array([], pa.string())})
        if len(g) == 0:
            return empty
        tk = g["tkey"].to_numpy(np.int64)
        pix = g["pix"].to_numpy(np.int64)
        order = np.argsort(tk, kind="stable")
        tk, pix = tk[order], pix[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(tk[1:] != tk[:-1]) + 1, [len(tk)]))
        rows = {k: [] for k in ("tx", "ty", "n", "buf")}
        for k in range(len(starts) - 1):
            s, e = int(starts[k]), int(starts[k + 1])
            counts = np.bincount(pix[s:e], minlength=tile_px * tile_px)
            img = tone_map(counts, log_scale) \
                .reshape(tile_px, tile_px)
            rows["tx"].append(tk[s] // _TILE_MUL)
            rows["ty"].append(tk[s] % _TILE_MUL)
            rows["n"].append(e - s)
            rows["buf"].append(encode_image(img, fmt))
        m = len(rows["tx"])
        return pa.table({
            "tz": pa.array(np.full(m, zoom, np.int32)),
            "tx": pa.array(np.asarray(rows["tx"], np.int64)),
            "ty": pa.array(np.asarray(rows["ty"], np.int64)),
            "n_pts": pa.array(np.asarray(rows["n"], np.int64)),
            "bytes": pa.array(rows["buf"], pa.binary()),
            "w": pa.array(np.full(m, tile_px, np.int32)),
            "h": pa.array(np.full(m, tile_px, np.int32)),
            "fmt": pa.array([fmt] * m)})

    rows = points_ds.map_batches(slim, batch_format="pyarrow")
    return bucketed_group_apply(rows, "tkey", per_bucket)

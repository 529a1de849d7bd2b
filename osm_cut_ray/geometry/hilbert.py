"""Hilbert space-filling curve keys — the spatial-locality sort key
for writer-side compaction. Sorting a point corpus by Hilbert key
makes every output block (and so every parquet row group) spatially
compact, which is what turns `stages/pip.py:read_points_pruned`'s
row-group bbox pruning from "prunes nothing on insertion-ordered
data" into near-perfect pruning: downstream cuts, tile builds and
spatial joins then read only the blocks their query window touches.
Hilbert (not Z-order/geohash-int) because consecutive keys are
always grid-ADJACENT — no Z-order seam jumps — so contiguous key
ranges are compact rectangles-ish regions.

`_xy2d`/`_d2xy` implement the published iterative bit algorithm
(Wikipedia "Hilbert curve", convention d=0..3 -> (0,0),(0,1),(1,1),
(1,0) at order 1), vectorized over numpy arrays; keys fit int64 for
order <= 31.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _xy2d(order: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Grid (x, y) in [0, 2^order) -> Hilbert distance d (int64),
    vectorized."""
    x = np.asarray(x, np.int64).copy()
    y = np.asarray(y, np.int64).copy()
    d = np.zeros(len(x), np.int64)
    n = np.int64(1) << order
    s = n >> np.int64(1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate the quadrant so the sub-curve orientation matches
        # (the published xy2d reflects over the FULL grid, n-1-x)
        flip = (ry == 0) & (rx == 1)
        x_f, y_f = x, y
        x = np.where(flip, n - 1 - x_f, x_f)
        y = np.where(flip, n - 1 - y_f, y_f)
        swap = ry == 0
        x, y = np.where(swap, y, x), np.where(swap, x, y)
        s >>= np.int64(1)
    return d


def _d2xy(order: int, d: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Hilbert distance -> grid (x, y); exact inverse of `_xy2d`."""
    t = np.asarray(d, np.int64).copy()
    x = np.zeros(len(t), np.int64)
    y = np.zeros(len(t), np.int64)
    s = np.int64(1)
    n = np.int64(1) << order
    while s < n:
        rx = np.int64(1) & (t >> np.int64(1))
        ry = np.int64(1) & (t ^ rx)
        flip = (ry == 0) & (rx == 1)
        x_f, y_f = x, y
        x = np.where(flip, s - 1 - x_f, x_f)
        y = np.where(flip, s - 1 - y_f, y_f)
        swap = ry == 0
        x, y = np.where(swap, y, x), np.where(swap, x, y)
        x += s * rx
        y += s * ry
        t >>= np.int64(2)
        s <<= np.int64(1)
    return x, y


def hilbert_keys(lon: np.ndarray, lat: np.ndarray, *, order: int = 16,
                 bbox: tuple[float, float, float, float] = (
                     -180.0, -90.0, 180.0, 90.0)) -> np.ndarray:
    """Quantize (lon, lat) onto the 2^order grid over `bbox`
    (x0, y0, x1, y1) and return int64 Hilbert keys. Points outside
    the bbox clamp to the edge cells."""
    if not 1 <= order <= 31:
        raise ValueError("order must be in [1, 31]")
    x0, y0, x1, y1 = bbox
    n = np.int64(1) << order
    fx = (np.asarray(lon, np.float64) - x0) / (x1 - x0)
    fy = (np.asarray(lat, np.float64) - y0) / (y1 - y0)
    gx = np.clip((fx * float(n)).astype(np.int64), 0, n - 1)
    gy = np.clip((fy * float(n)).astype(np.int64), 0, n - 1)
    return _xy2d(order, gx, gy)


def hilbert_sort(ds, *, x_col: str = "lon", y_col: str = "lat",
                 order: int = 16,
                 bbox: tuple[float, float, float, float] | None = None,
                 key_col: str = "hilbert_key", keep_key: bool = False):
    """Sort a point dataset into Hilbert-curve order (ONE sort
    shuffle). With bbox=None the corpus bbox is measured first (one
    cheap aggregate over the two columns). The key column is dropped
    unless `keep_key` — downstream writers then emit spatially-
    compact blocks in curve order."""
    import ray.data

    if bbox is None:
        agg = ds.aggregate(
            ray.data.aggregate.Min(on=x_col),
            ray.data.aggregate.Max(on=x_col),
            ray.data.aggregate.Min(on=y_col),
            ray.data.aggregate.Max(on=y_col))
        eps = 1e-9  # half-open quantization: keep the max inside
        bbox = (float(agg[f"min({x_col})"]),
                float(agg[f"min({y_col})"]),
                float(agg[f"max({x_col})"]) + eps,
                float(agg[f"max({y_col})"]) + eps)

    def key(t: pa.Table) -> pa.Table:
        k = hilbert_keys(
            t[x_col].to_numpy(zero_copy_only=False),
            t[y_col].to_numpy(zero_copy_only=False),
            order=order, bbox=bbox)
        return t.append_column(key_col, pa.array(k))

    out = ds.map_batches(key, batch_format="pyarrow").sort(key_col)
    if not keep_key:
        out = out.map_batches(lambda t: t.drop_columns([key_col]),
                              batch_format="pyarrow")
    return out

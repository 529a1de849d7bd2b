"""Spatially-blocked train/validation splits with buffer-zone
exclusion — the leakage guard for geospatial ML (Roberts et al. 2018
"blocked cross-validation": random splits leak because nearby points
are correlated; block by cell, hold out whole cells, and EXCLUDE
training points within a buffer of any other fold's territory).

Semantics:
- cell = (floor(lon/cell_deg), floor(lat/cell_deg)); fold(cell) =
  splitmix64(cell_key, seed) % n_folds — a pure hash, so fold
  assignment needs NO lookup table, no shuffle, no broadcast.
- a point is `excluded` iff some cell whose planar rectangle lies
  within `buffer` degrees of the point hashes to a DIFFERENT fold.
  Guarantee (tested): for any two points in different folds less
  than `buffer` apart, BOTH are excluded — so training on
  (fold==f & ~excluded) can never see data within `buffer` of
  another fold's kept points.

Ray-Data shape: one map_batches pass, fully vectorized — the
(2r+1)^2 neighbor-cell loop (r = ceil(buffer/cell_deg), a small
constant) runs over offsets, not rows; per-offset work is numpy
rect-distance + the splitmix64 finalizer. Zero shuffles, zero state;
bit-deterministic trivially. Planar coordinates (no antimeridian
wrap — same contract as stages/cluster.py grid DBSCAN).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SM1 = np.uint64(0xBF58476D1CE4E5B9)
_SM2 = np.uint64(0x94D049BB133111EB)
_GOLD = np.uint64(0x9E3779B97F4A7C15)
_MIX = np.uint64(0x2545F4914F6CDD1D)

_EMPTY = pa.table({
    "id": pa.array([], pa.int64()),
    "cx": pa.array([], pa.int64()),
    "cy": pa.array([], pa.int64()),
    "fold": pa.array([], pa.int64()),
    "excluded": pa.array([], pa.bool_())})


def _cell_fold(cx: np.ndarray, cy: np.ndarray, n_folds: int,
               seed: int) -> np.ndarray:
    """splitmix64 of the packed cell key -> fold in [0, n_folds)."""
    with np.errstate(over="ignore"):
        z = (cx.astype(np.uint64) * _GOLD
             + cy.astype(np.uint64) * _MIX
             + np.uint64(seed) * _SM1)
        z = (z ^ (z >> np.uint64(30))) * _SM1
        z = (z ^ (z >> np.uint64(27))) * _SM2
        z = z ^ (z >> np.uint64(31))
    return (z % np.uint64(n_folds)).astype(np.int64)


def spatial_split(ds, *, id_col: str, lon_col: str, lat_col: str,
                  cell_deg: float, n_folds: int = 5,
                  buffer: float = 0.0, seed: int = 0,
                  max_rings: int = 8):
    """-> Dataset (id, cx, cy, fold, excluded). Train set for fold f
    = rows with fold == f and not excluded; eval set = fold == f
    (buffer exclusion applies to training only, the published
    formulation). RAISES if buffer needs more than `max_rings`
    neighbor rings (raise cell_deg instead of paying (2r+1)^2)."""
    if n_folds < 2:
        raise ValueError("n_folds must be >= 2")
    if cell_deg <= 0 or buffer < 0:
        raise ValueError("cell_deg must be > 0 and buffer >= 0")
    r = int(np.ceil(buffer / cell_deg)) if buffer > 0 else 0
    if r > max_rings:
        raise ValueError(
            f"buffer={buffer} needs {r} rings at cell_deg="
            f"{cell_deg} (> max_rings={max_rings}); use a larger "
            "cell_deg")

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or lon_col not in t.column_names:
            return _EMPTY
        lon = t[lon_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        lat = t[lat_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        cx = np.floor(lon / cell_deg).astype(np.int64)
        cy = np.floor(lat / cell_deg).astype(np.int64)
        fold = _cell_fold(cx, cy, n_folds, seed)
        excluded = np.zeros(len(lon), bool)
        for dx in range(-r, r + 1):
            for dy in range(-r, r + 1):
                if dx == 0 and dy == 0:
                    continue
                nx, ny = cx + dx, cy + dy
                # planar distance from the point to the neighbor
                # cell's rectangle [nx, nx+1) x [ny, ny+1) (degrees)
                gx = np.maximum(
                    np.maximum(nx * cell_deg - lon,
                               lon - (nx + 1) * cell_deg), 0.0)
                gy = np.maximum(
                    np.maximum(ny * cell_deg - lat,
                               lat - (ny + 1) * cell_deg), 0.0)
                near = gx * gx + gy * gy < buffer * buffer
                if not near.any():
                    continue
                nf = _cell_fold(nx[near], ny[near], n_folds, seed)
                excluded[near] |= nf != fold[near]
        return pa.table({
            "id": pc.cast(t[id_col], pa.int64()),
            "cx": pa.array(cx),
            "cy": pa.array(cy),
            "fold": pa.array(fold),
            "excluded": pa.array(excluded)})

    return ds.map_batches(assign, batch_format="pyarrow")


def spatial_split_brute(ids, lon, lat, *, cell_deg: float,
                        n_folds: int, buffer: float,
                        seed: int = 0) -> dict:
    """Driver-side spec: exhaustively checks EVERY cell rectangle
    within buffer of each point (no ring shortcut) — the independent
    formulation for pinning tests."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    cx = np.floor(lon / cell_deg).astype(np.int64)
    cy = np.floor(lat / cell_deg).astype(np.int64)
    fold = _cell_fold(cx, cy, n_folds, seed)
    excluded = np.zeros(len(lon), bool)
    rr = int(np.ceil(buffer / cell_deg)) + 2   # deliberately wider
    for i in range(len(lon)):
        for nx in range(cx[i] - rr, cx[i] + rr + 1):
            for ny in range(cy[i] - rr, cy[i] + rr + 1):
                if nx == cx[i] and ny == cy[i]:
                    continue
                gx = max(nx * cell_deg - lon[i],
                         lon[i] - (nx + 1) * cell_deg, 0.0)
                gy = max(ny * cell_deg - lat[i],
                         lat[i] - (ny + 1) * cell_deg, 0.0)
                if gx * gx + gy * gy < buffer * buffer and \
                        _cell_fold(np.array([nx]), np.array([ny]),
                                   n_folds, seed)[0] != fold[i]:
                    excluded[i] = True
                    break
            if excluded[i]:
                break
    return {"id": np.asarray(ids, np.int64), "cx": cx, "cy": cy,
            "fold": fold, "excluded": excluded}

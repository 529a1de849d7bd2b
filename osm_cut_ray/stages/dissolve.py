"""Dissolve a set of hex cells into its boundary polyline — the
cell-set analog of polygon dissolve / cascaded union. Feed it kept
cells from `isochrone_cells`, DBSCAN clusters, geofence interiors or
any cell predicate and get the merged region OUTLINE (shared interior
edges cancel), ready for rendering or vector export.

Rule: an undirected cell-adjacency edge {c, n} lies on the boundary
iff EXACTLY ONE of its two cells is in the kept set. With unique input
cells each edge is emitted by every kept incident cell, so boundary ==
group count 1 — a pure counting argument, no geometry in the shuffle.

Ray-Data shape: distinct(cells) -> map-side 6-row edge emission keyed
(lo, hi) = sorted incident pair -> ONE bucket-hash group pass keeps
count==1 rows (slim: two int64 ids + dir) -> map-side corner
reconstruction (pure int->float function of the owner cell's axial
coordinates; bit-deterministic under any partitioning).

Corner geometry matches `geometry/cells.py:hex_center`'s snapped
axial basis exactly: corner k of cell (q, r) sits at axial offsets
(±2/3, ∓1/3) etc., mapped by x = (q + r/2) * 360/period,
y = 1.5 * size * r. x is reported in [0, 360) like hex_center; edges
crossing the modular seam are normalized so |x1 - x2| < 180 (x2 may
leave [0, 360) by design there). Consumers stitching edges into loops
across the seam must match vertices mod 360.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geometry.cells import (_HEX_DIRS, _HEX_PERIODS, hex_cell_decode,
                              hex_edge_deg, hex_neighbors)

# corner k in axial (q, r) offsets from the cell center; corner pairs
# per _HEX_DIRS direction index (see module docstring derivation)
_CORNERS = np.array([(2 / 3, -1 / 3), (1 / 3, 1 / 3), (-1 / 3, 2 / 3),
                     (-2 / 3, 1 / 3), (-1 / 3, -1 / 3), (1 / 3, -2 / 3)])
_DIR_CORNERS = np.array([(0, 1), (5, 0), (4, 5),
                         (3, 4), (2, 3), (1, 2)], np.int64)


def edge_segment(cell: np.ndarray, direction: np.ndarray):
    """(owner cell ids, direction indices 0..5) -> (x1, y1, x2, y2)
    of the shared edge, in the snapped axial basis of hex_cell."""
    res, q, r = hex_cell_decode(cell)
    size = np.array([hex_edge_deg(int(v)) for v in np.atleast_1d(res)])
    period = _HEX_PERIODS[np.atleast_1d(res)].astype(np.float64)
    ca = _CORNERS[_DIR_CORNERS[direction, 0]]
    cb = _CORNERS[_DIR_CORNERS[direction, 1]]
    qf = q.astype(np.float64)
    rf = r.astype(np.float64)
    sx = 360.0 / period

    def corner(off):
        cq, cr = qf + off[:, 0], rf + off[:, 1]
        x = np.mod(cq + cr / 2.0, period) * sx
        y = 1.5 * size * cr
        return x, y

    x1, y1 = corner(ca)
    x2, y2 = corner(cb)
    # keep the segment connected across the antimeridian wrap
    x2 = np.where(x2 - x1 > 180.0, x2 - 360.0, x2)
    x2 = np.where(x1 - x2 > 180.0, x2 + 360.0, x2)
    return x1, y1, x2, y2


_EMPTY_EDGES = pa.table({"lo": pa.array([], pa.int64()),
                         "hi": pa.array([], pa.int64()),
                         "cell": pa.array([], pa.int64()),
                         "dir": pa.array([], pa.int64())})

_EMPTY_OUT = pa.table({"cell": pa.array([], pa.int64()),
                       "nbr": pa.array([], pa.int64()),
                       "x1": pa.array([], pa.float64()),
                       "y1": pa.array([], pa.float64()),
                       "x2": pa.array([], pa.float64()),
                       "y2": pa.array([], pa.float64())})


def dissolve_cells(cells_ds, *, cell_col: str = "cell"):
    """Kept-cell Dataset (any multiplicity) -> boundary Dataset
    (cell, nbr, x1, y1, x2, y2): one row per boundary edge, owned by
    the kept cell (`nbr` is the outside cell)."""
    from .join import bucketed_group_apply, distinct

    uniq = distinct(cells_ds, [cell_col])

    def emit(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _EMPTY_EDGES
        c = t[cell_col].to_numpy(zero_copy_only=False).astype(np.int64)
        nbr = hex_neighbors(c)                          # (m, 6)
        own = np.repeat(c, 6)
        nb = nbr.ravel()
        d = np.tile(np.arange(6, dtype=np.int64), len(c))
        lo = np.minimum(own, nb)
        hi = np.maximum(own, nb)
        return pa.table({"lo": pa.array(lo), "hi": pa.array(hi),
                         "cell": pa.array(own), "dir": pa.array(d)})

    def per_bucket(g) -> pa.Table:
        if len(g) == 0:
            return _EMPTY_EDGES
        sz = g.groupby(["lo", "hi"])["cell"].transform("size")
        b = g[sz == 1]
        return pa.Table.from_pandas(b, preserve_index=False)\
            .replace_schema_metadata(None)

    edges = bucketed_group_apply(
        uniq.map_batches(emit, batch_format="pyarrow"),
        "lo", per_bucket)

    def to_segments(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _EMPTY_OUT
        c = t["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dir"].to_numpy(zero_copy_only=False).astype(np.int64)
        nbr = hex_neighbors(c)[np.arange(len(c)), d]
        x1, y1, x2, y2 = edge_segment(c, d)
        return pa.table({"cell": pa.array(c), "nbr": pa.array(nbr),
                         "x1": pa.array(x1), "y1": pa.array(y1),
                         "x2": pa.array(x2), "y2": pa.array(y2)})

    return edges.map_batches(to_segments, batch_format="pyarrow")

"""Cell-indexed geofencing: which of MANY polygons contains each
point. `stages/zonal.py:tag_zones` runs a bbox-masked PIP pass per
polygon — linear in K, right for tens of zones; this index makes the
per-point cost independent of K (city-scale geofence sets, admin
hierarchies, delivery zones).

Build (driver, once): every polygon is rasterized onto a uniform
square grid — candidate cells are (rect-corner-inside cells) union
(edge-bbox cells), a SOUND over-cover of every cell the polygon
intersects; cells whose four corners are inside with NO boundary edge
nearby are marked FULL (containment decided without the exact
kernel). The index is sorted-key CSR arrays (`ray.put` once,
zero-copy rehydrate per task, the SegmentGrid pattern).

Query (map-side, zero shuffles): point -> cell via floor-div ->
searchsorted -> candidate polygon ids; FULL hits answer immediately,
partial hits run the exact `PolygonIndex.contains` kernel once per
candidate polygon present in the batch (vectorized over its points).
Overlaps resolve to the LOWEST polygon index and no-hit points get
-1, exactly the `tag_zones` contract (pinned equal by tests).

Scale: index size is O(sum of per-polygon covered cells), bounded by
`max_cells` (RAISES, never truncates — the repo cap contract); pick
`cell` near the typical polygon feature size. Points never shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray

from ..geometry.polygon import PolygonIndex
from .snap import _cell_key


@dataclass
class GeofenceIndex:
    cell: float
    cell_keys: np.ndarray    # sorted unique int64 cell keys
    start: np.ndarray        # CSR offsets into poly_ids / full
    poly_ids: np.ndarray     # int32 polygon ordinals (ascending per cell)
    full: np.ndarray         # bool: cell rect entirely inside polygon
    polys: list = field(default_factory=list)

    def candidates(self, x: np.ndarray, y: np.ndarray):
        """-> (offsets, poly_ids, full) CSR over the query points."""
        key = _cell_key(np.floor(x / self.cell).astype(np.int64),
                        np.floor(y / self.cell).astype(np.int64))
        pos = np.searchsorted(self.cell_keys, key)
        pos = np.clip(pos, 0, max(len(self.cell_keys) - 1, 0))
        hit = np.zeros(len(x), bool)
        if len(self.cell_keys):
            hit = self.cell_keys[pos] == key
        s = np.where(hit, self.start[pos], 0)
        e = np.where(hit, self.start[np.minimum(
            pos + 1, len(self.start) - 1)], 0)
        counts = e - s
        off = np.concatenate(([0], np.cumsum(counts)))
        idx = np.repeat(s, counts) + (
            np.arange(int(counts.sum())) - np.repeat(off[:-1], counts))
        return off, self.poly_ids[idx], self.full[idx]


def build_geofence_index(zone_specs, *, cell: float,
                         max_cells: int = 5_000_000) -> GeofenceIndex:
    """zone_specs: list of ring lists (`parse_poly_file` format, the
    `compile_zones` input). Driver-side build, broadcast the result."""
    polys = [PolygonIndex.compile(rings) for rings in zone_specs]
    all_keys, all_pids, all_full = [], [], []
    total = 0
    for pi, poly in enumerate(polys):
        bx0, by0, bx1, by1 = poly.bbox
        ix0 = int(np.floor(bx0 / cell))
        ix1 = int(np.floor(bx1 / cell))
        iy0 = int(np.floor(by0 / cell))
        iy1 = int(np.floor(by1 / cell))
        nx, ny = ix1 - ix0 + 1, iy1 - iy0 + 1
        total += nx * ny
        if total > max_cells:
            raise ValueError(
                f"geofence index would exceed max_cells={max_cells} "
                f"(polygon {pi} alone spans {nx * ny} cells); raise "
                f"`cell` or max_cells")
        gx = (ix0 + np.arange(nx))[:, None]
        gy = (iy0 + np.arange(ny))[None, :]
        cx0 = (gx * cell).repeat(ny, 1).ravel()
        cy0 = (gy * cell).repeat(nx, 0).ravel()
        # (a) any rect corner inside the polygon (exclude-aware)
        corner_in = np.zeros(nx * ny, bool)
        n_corner_in = np.zeros(nx * ny, np.int8)
        for dx in (0.0, cell):
            for dy in (0.0, cell):
                c_in = poly.contains(cx0 + dx, cy0 + dy)
                corner_in |= c_in
                n_corner_in += c_in
        # (b) cells overlapped by any boundary edge's bbox (include
        # AND exclude rings — an exclude edge also flips containment
        # inside a cell)
        edge_cover = np.zeros((nx, ny), bool)
        for ring in list(poly.include) + list(poly.exclude):
            ex0, ex1 = ring.exmin, ring.exmax  # per-edge closed bboxes
            ey0, ey1 = ring.eymin, ring.eymax
            jx0 = np.clip(np.floor(ex0 / cell).astype(np.int64) - ix0,
                          0, nx - 1)
            jx1 = np.clip(np.floor(ex1 / cell).astype(np.int64) - ix0,
                          0, nx - 1)
            jy0 = np.clip(np.floor(ey0 / cell).astype(np.int64) - iy0,
                          0, ny - 1)
            jy1 = np.clip(np.floor(ey1 / cell).astype(np.int64) - iy0,
                          0, ny - 1)
            for a0, a1, b0, b1 in zip(jx0.tolist(), jx1.tolist(),
                                      jy0.tolist(), jy1.tolist()):
                edge_cover[a0:a1 + 1, b0:b1 + 1] = True
        edge_flat = edge_cover.ravel()
        cand = corner_in | edge_flat
        if not cand.any():
            continue
        is_full = (n_corner_in == 4) & ~edge_flat
        ks = _cell_key(gx.repeat(ny, 1).ravel()[cand],
                       np.broadcast_to(gy, (nx, ny)).ravel()[cand])
        all_keys.append(ks)
        all_pids.append(np.full(len(ks), pi, np.int32))
        all_full.append(is_full[cand])
    if not all_keys:
        return GeofenceIndex(cell, np.array([], np.int64),
                             np.array([0], np.int64),
                             np.array([], np.int32),
                             np.array([], bool), polys)
    keys = np.concatenate(all_keys)
    pids = np.concatenate(all_pids)
    fulls = np.concatenate(all_full)
    order = np.lexsort((pids, keys))  # ascending poly id per cell
    keys, pids, fulls = keys[order], pids[order], fulls[order]
    uk, starts = np.unique(keys, return_index=True)
    return GeofenceIndex(
        cell, uk, np.concatenate((starts, [len(keys)])).astype(np.int64),
        pids, fulls, polys)


def geofence_points(points_ds, index: GeofenceIndex, *,
                    x_col: str = "lon", y_col: str = "lat"):
    """Attach a `zone` column (lowest containing polygon ordinal, -1 =
    none) — result-identical to `zonal.tag_zones` on the same specs,
    with per-point cost independent of the polygon count."""
    ref = ray.put(index)

    def fn(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column("zone", pa.array([], pa.int64()))
        g: GeofenceIndex = ray.get(ref)
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        off, pids, full = g.candidates(x, y)
        counts = np.diff(off)
        pt_of = np.repeat(np.arange(len(x), dtype=np.int64), counts)
        zone = np.full(len(x), -1, np.int64)
        # FULL hits decide immediately; candidates arrive ascending
        # per point, so the first full hit per point is the min —
        # but a smaller-ordinal PARTIAL candidate may still win, so
        # resolve exact hits first, then take the per-point min.
        exact = ~full
        win_pid = np.where(full, pids.astype(np.int64), np.int64(-1))
        if exact.any():
            hits = np.full(int(exact.sum()), -1, np.int64)
            epids = pids[exact]
            ex_rows = np.flatnonzero(exact)
            for p in np.unique(epids):
                m = epids == p
                rows = pt_of[ex_rows[m]]
                ok = g.polys[p].contains(x[rows], y[rows])
                hits[np.flatnonzero(m)[ok]] = p
            win_pid[ex_rows] = hits
        valid = win_pid >= 0
        if valid.any():
            tmp = np.full(len(x), np.iinfo(np.int64).max, np.int64)
            np.minimum.at(tmp, pt_of[valid], win_pid[valid])
            zone = np.where(tmp < np.iinfo(np.int64).max, tmp, zone)
        return t.append_column("zone", pa.array(zone))

    return points_ds.map_batches(fn, batch_format="pyarrow")

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
`max_cells` (the plain builder RAISES, never truncates — the repo cap
contract); pick `cell` near the typical polygon feature size. Past
the cap, `build_geofence_index_auto` degrades to `TiledGeofenceIndex`
ix-stripe tiles (distributed rasterize, no halo needed — probes touch
only the point's own cell), bit-identical to broadcast. Points never
shuffle in either mode.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray

from ..geometry.polygon import PolygonIndex
from .snap import _cell_key, get_grid


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


def _bbox_cells(poly: PolygonIndex, cell: float
                ) -> tuple[int, int, int, int]:
    bx0, by0, bx1, by1 = poly.bbox
    return (int(np.floor(bx0 / cell)), int(np.floor(bx1 / cell)),
            int(np.floor(by0 / cell)), int(np.floor(by1 / cell)))


def _raster_one(poly: PolygonIndex, cell: float):
    """Rasterize ONE compiled polygon onto the uniform grid (module
    docstring): -> (ix, keys, is_full) over candidate cells, or None
    when the polygon covers no cell."""
    ix0, ix1, iy0, iy1 = _bbox_cells(poly, cell)
    nx, ny = ix1 - ix0 + 1, iy1 - iy0 + 1
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
        return None
    is_full = (n_corner_in == 4) & ~edge_flat
    gix = gx.repeat(ny, 1).ravel()[cand]
    ks = _cell_key(gix, np.broadcast_to(gy, (nx, ny)).ravel()[cand])
    return gix, ks, is_full[cand]


def _csr_index(cell: float, keys: np.ndarray, pids: np.ndarray,
               fulls: np.ndarray, polys) -> GeofenceIndex:
    order = np.lexsort((pids, keys))  # ascending poly id per cell
    keys, pids, fulls = keys[order], pids[order], fulls[order]
    uk, starts = np.unique(keys, return_index=True)
    return GeofenceIndex(
        cell, uk, np.concatenate((starts, [len(keys)])).astype(np.int64),
        pids, fulls, polys)


def build_geofence_index(zone_specs, *, cell: float,
                         max_cells: int = 5_000_000) -> GeofenceIndex:
    """zone_specs: list of ring lists (`parse_poly_file` format, the
    `compile_zones` input). Driver-side build, broadcast the result;
    use `build_geofence_index_auto` to degrade to ix-stripe tiles
    past `max_cells` instead of raising."""
    polys = [PolygonIndex.compile(rings) for rings in zone_specs]
    all_keys, all_pids, all_full = [], [], []
    total = 0
    for pi, poly in enumerate(polys):
        ix0, ix1, iy0, iy1 = _bbox_cells(poly, cell)
        nx, ny = ix1 - ix0 + 1, iy1 - iy0 + 1
        total += nx * ny
        if total > max_cells:
            raise ValueError(
                f"geofence index would exceed max_cells={max_cells} "
                f"(polygon {pi} alone spans {nx * ny} cells); raise "
                f"`cell` or max_cells, or use "
                f"build_geofence_index_auto to tile the zone grid")
        r = _raster_one(poly, cell)
        if r is None:
            continue
        _, ks, is_full = r
        all_keys.append(ks)
        all_pids.append(np.full(len(ks), pi, np.int32))
        all_full.append(is_full)
    if not all_keys:
        return GeofenceIndex(cell, np.array([], np.int64),
                             np.array([0], np.int64),
                             np.array([], np.int32),
                             np.array([], bool), polys)
    return _csr_index(cell, np.concatenate(all_keys),
                      np.concatenate(all_pids),
                      np.concatenate(all_full), polys)


class TiledGeofenceIndex:
    """K ix-stripe GeofenceIndexes behind ObjectRefs — the tiled
    fallback past `max_cells` (the TiledSegmentGrid pattern,
    stages/snap.py). The geofence probe touches only the point's OWN
    cell, so stripes need NO halo; each tile holds its stripe's CSR
    rows plus compiled polygons for the partial cells it owns (full
    cells answer without the exact kernel). Routing is per batch per
    unique stripe; results are bit-identical to the broadcast index
    (pinned by tests/test_geofence.py)."""

    def __init__(self, bounds: np.ndarray, refs: list, cell: float):
        self.bounds = np.asarray(bounds, np.int64)  # len K+1
        self.refs = list(refs)                       # K ObjectRefs
        self.cell = float(cell)

    @property
    def n_tiles(self) -> int:
        return len(self.refs)

    def _tile(self, k: int) -> GeofenceIndex:
        return get_grid(self.refs[k])

    def stripe_of(self, x: np.ndarray) -> np.ndarray:
        ix = np.floor(np.asarray(x, np.float64)
                      / self.cell).astype(np.int64)
        return np.clip(np.searchsorted(self.bounds, ix, "right") - 1,
                       0, len(self.refs) - 1)


def build_geofence_index_auto(zone_specs, *, cell: float,
                              max_cells: int = 5_000_000,
                              tile_fill: float = 0.7
                              ) -> GeofenceIndex | TiledGeofenceIndex:
    """Count-based strategy selection (the cut_auto /
    build_segment_grid_auto pattern): one broadcast GeofenceIndex
    while the bbox-span cell estimate fits `max_cells`, else
    ix-stripe tiles sized to `tile_fill` x the cap.

    Past the cap, rasterization runs DISTRIBUTED (map_batches over
    polygon ordinals against the ray.put spec list) into a
    materialized (ix, key, pid, full) entry Dataset — the driver
    never holds more than one stripe's entries. Stripe bounds come
    from a per-ix-column entry histogram (driver fold, bounded by
    distinct columns); a single column denser than `max_cells`
    RAISES (coarsen `cell` or raise the cap)."""
    polys = [PolygonIndex.compile(rings) for rings in zone_specs]
    est = 0
    for poly in polys:
        ix0, ix1, iy0, iy1 = _bbox_cells(poly, cell)
        est += (ix1 - ix0 + 1) * (iy1 - iy0 + 1)
    if est <= max_cells:
        return build_geofence_index(zone_specs, cell=cell,
                                    max_cells=max_cells)

    import ray.data as rd
    specs_ref = ray.put(list(zone_specs))

    def raster(t: pa.Table) -> pa.Table:
        empty = pa.table({"ix": pa.array([], pa.int64()),
                          "key": pa.array([], pa.int64()),
                          "pid": pa.array([], pa.int32()),
                          "full": pa.array([], pa.bool_())})
        if len(t) == 0:
            return empty
        specs = get_grid(specs_ref)
        parts = []
        for pid in t["id"].to_numpy(zero_copy_only=False).tolist():
            r = _raster_one(PolygonIndex.compile(specs[pid]), cell)
            if r is None:
                continue
            gix, ks, is_full = r
            parts.append(pa.table({
                "ix": pa.array(gix), "key": pa.array(ks),
                "pid": pa.array(
                    np.full(len(ks), pid, np.int32)),
                "full": pa.array(is_full)}))
        return pa.concat_tables(parts) if parts else empty

    entries = rd.range(len(polys),
                       override_num_blocks=min(len(polys), 256)) \
        .map_batches(raster, batch_format="pyarrow").materialize()

    acc: dict[int, int] = {}
    for b in entries.select_columns(["ix"]).iter_batches(
            batch_size=None, batch_format="pyarrow"):
        u, c = np.unique(b["ix"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        for ixv, nv in zip(u.tolist(), c.tolist()):
            acc[ixv] = acc.get(ixv, 0) + nv
    cols = np.array(sorted(acc), np.int64)
    cnts = np.array([acc[int(c_)] for c_ in cols], np.int64)
    if int(cnts.max(initial=0)) > max_cells:
        raise ValueError(
            f"one ix column holds {int(cnts.max())} geofence cells "
            f"(> max_cells={max_cells}); coarsen `cell` or raise "
            "the cap")
    target = max(1, int(max_cells * tile_fill))
    NEG, POS = -(1 << 62), (1 << 62)
    bounds = [np.int64(NEG)]
    run = 0
    for col, cnt in zip(cols.tolist(), cnts.tolist()):
        if run > 0 and run + cnt > target:
            bounds.append(np.int64(col))
            run = 0
        run += cnt
    bounds.append(np.int64(POS))
    bounds = np.array(bounds, np.int64)

    refs = []
    for k in range(len(bounds) - 1):
        lo, hi = int(bounds[k]), int(bounds[k + 1])

        def in_stripe(t: pa.Table, lo=lo, hi=hi) -> pa.Table:
            ix = t["ix"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array((ix >= lo) & (ix < hi)))

        ks, ps, fs = [], [], []
        for b in entries.map_batches(
                in_stripe, batch_format="pyarrow").iter_batches(
                batch_size=None, batch_format="pyarrow"):
            if b.num_rows:
                ks.append(b["key"].to_numpy(zero_copy_only=False))
                ps.append(b["pid"].to_numpy(zero_copy_only=False))
                fs.append(b["full"].to_numpy(zero_copy_only=False))
        if not ks:
            tile = GeofenceIndex(cell, np.array([], np.int64),
                                 np.array([0], np.int64),
                                 np.array([], np.int32),
                                 np.array([], bool), {})
        else:
            keys = np.concatenate(ks)
            pids = np.concatenate(ps).astype(np.int32)
            fulls = np.concatenate(fs)
            # only partial cells consult the exact kernel: ship just
            # those polygons (dict keyed by GLOBAL ordinal)
            need = {int(p): polys[int(p)]
                    for p in np.unique(pids[~fulls])}
            tile = _csr_index(cell, keys, pids, fulls, need)
        refs.append(ray.put(tile))
    return TiledGeofenceIndex(bounds, refs, cell)


def _resolve_zone(g: GeofenceIndex, x: np.ndarray, y: np.ndarray
                  ) -> np.ndarray:
    """Lowest containing polygon ordinal per point (-1 = none)
    against ONE index."""
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
    return zone


def geofence_points(points_ds,
                    index: GeofenceIndex | TiledGeofenceIndex, *,
                    x_col: str = "lon", y_col: str = "lat"):
    """Attach a `zone` column (lowest containing polygon ordinal, -1 =
    none) — result-identical to `zonal.tag_zones` on the same specs,
    with per-point cost independent of the polygon count. Accepts
    either index flavor (broadcast or tiled) transparently."""
    ref = ray.put(index)

    def fn(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column("zone", pa.array([], pa.int64()))
        g = get_grid(ref)
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        if isinstance(g, TiledGeofenceIndex):
            st = g.stripe_of(x)
            zone = np.full(len(x), -1, np.int64)
            for k in np.unique(st):
                m = st == k
                zone[m] = _resolve_zone(g._tile(int(k)), x[m], y[m])
        else:
            zone = _resolve_zone(g, x, y)
        return t.append_column("zone", pa.array(zone))

    return points_ds.map_batches(fn, batch_format="pyarrow")

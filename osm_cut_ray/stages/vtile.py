"""Vector-tile cut: way segments -> per-XYZ-tile clipped segments in
integer tile coordinates (the Mapbox-Vector-Tile data model: a tile is
a bag of features in a local `extent` x `extent` integer grid; we emit
line segments, the MVT geometry that matters for a road corpus).

Projection matches `stages/tiles.py` (equirectangular u/v — NOT web
mercator; the synthetic corpus is planar) — one continuous grid
coordinate X = u * 2^zoom so tile (tx, ty) covers [tx, tx+1)^2.

Ray-Data shape: pure MAP-SIDE flat emission over the shared
`stages/snap.py:way_segments` table — each segment computes the tile
bbox range it spans (usually 1-2 tiles), expands to candidate
(segment, tile) pairs with the vectorized run-expansion trick, clips
every pair with a vectorized Liang-Barsky pass, quantizes survivors
to the tile-local integer grid, and emits. ZERO shuffles; tile
assembly (if a consumer wants per-tile files) is one optional
tile-keyed groupby over slim rows.

Edge rules (pinned by tests/test_vtile.py):
- clipping is INCLUSIVE: a segment touching/running along a shared
  tile border is emitted for every tile whose closed square it
  intersects (t-interval non-empty);
- quantization is np.rint (round-half-even) of local * extent,
  clamped to [0, extent];
- pieces that quantize to a single point are dropped when
  `drop_degenerate` (the MVT convention), kept otherwise.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _to_grid(lon: np.ndarray, lat: np.ndarray, zoom: int):
    n = float(1 << zoom)
    return ((lon + 180.0) / 360.0 * n,
            (90.0 - lat) / 180.0 * n)


_EMPTY = pa.table({"tile_x": pa.array([], pa.int64()),
                   "tile_y": pa.array([], pa.int64()),
                   "way_id": pa.array([], pa.int64()),
                   "seg": pa.array([], pa.int64()),
                   "ix1": pa.array([], pa.int64()),
                   "iy1": pa.array([], pa.int64()),
                   "ix2": pa.array([], pa.int64()),
                   "iy2": pa.array([], pa.int64())})


def clip_quantize_batch(wid, seg, x1, y1, x2, y2, *, zoom: int,
                        extent: int, drop_degenerate: bool):
    """Vectorized (segment -> candidate tiles -> Liang-Barsky clip ->
    integer quantize) kernel. Coordinates are lon/lat; returns the
    eight output columns as numpy arrays."""
    gx1, gy1 = _to_grid(x1, y1, zoom)
    gx2, gy2 = _to_grid(x2, y2, zoom)
    lim = (1 << zoom) - 1
    txa = np.clip(np.floor(np.minimum(gx1, gx2)), 0, lim).astype(np.int64)
    txb = np.clip(np.floor(np.maximum(gx1, gx2)), 0, lim).astype(np.int64)
    tya = np.clip(np.floor(np.minimum(gy1, gy2)), 0, lim).astype(np.int64)
    tyb = np.clip(np.floor(np.maximum(gy1, gy2)), 0, lim).astype(np.int64)
    nx = txb - txa + 1
    ny = tyb - tya + 1
    cnt = nx * ny
    # run expansion: candidate (segment, tile) pairs
    sidx = np.repeat(np.arange(len(wid), dtype=np.int64), cnt)
    offs = np.concatenate(([0], np.cumsum(cnt)))[:-1]
    k = np.arange(len(sidx), dtype=np.int64) - offs[sidx]
    tx = txa[sidx] + k // ny[sidx]
    ty = tya[sidx] + k % ny[sidx]

    ax, ay = gx1[sidx], gy1[sidx]
    dx = gx2[sidx] - ax
    dy = gy2[sidx] - ay
    t0 = np.zeros(len(sidx))
    t1 = np.ones(len(sidx))
    ok = np.ones(len(sidx), bool)
    for p, q in ((-dx, ax - tx), (dx, tx + 1.0 - ax),
                 (-dy, ay - ty), (dy, ty + 1.0 - ay)):
        par = p == 0.0
        ok &= ~(par & (q < 0.0))
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(par, 0.0, q / np.where(p == 0.0, 1.0, p))
        t0 = np.where(~par & (p < 0), np.maximum(t0, t), t0)
        t1 = np.where(~par & (p > 0), np.minimum(t1, t), t1)
    ok &= t0 <= t1

    sidx, tx, ty = sidx[ok], tx[ok], ty[ok]
    ax, ay, dx, dy = ax[ok], ay[ok], dx[ok], dy[ok]
    t0, t1 = t0[ok], t1[ok]
    lx1 = (ax + t0 * dx - tx) * extent
    ly1 = (ay + t0 * dy - ty) * extent
    lx2 = (ax + t1 * dx - tx) * extent
    ly2 = (ay + t1 * dy - ty) * extent
    q = [np.clip(np.rint(v), 0, extent).astype(np.int64)
         for v in (lx1, ly1, lx2, ly2)]
    if drop_degenerate:
        keep = (q[0] != q[2]) | (q[1] != q[3])
        sidx, tx, ty = sidx[keep], tx[keep], ty[keep]
        q = [v[keep] for v in q]
    return (tx, ty, wid[sidx], seg[sidx], q[0], q[1], q[2], q[3])


def vector_tile_segments(segments_ds, *, zoom: int, extent: int = 4096,
                         drop_degenerate: bool = True):
    """way_segments-shaped Dataset -> (tile_x, tile_y, way_id, seg,
    ix1, iy1, ix2, iy2). Pure map-side; one output row per
    (segment, intersected tile)."""
    if zoom < 0 or zoom > 30:
        raise ValueError(f"zoom {zoom} out of range 0..30")

    def fn(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _EMPTY
        cols = clip_quantize_batch(
            t["way_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["seg"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["x1"].to_numpy(zero_copy_only=False).astype(np.float64),
            t["y1"].to_numpy(zero_copy_only=False).astype(np.float64),
            t["x2"].to_numpy(zero_copy_only=False).astype(np.float64),
            t["y2"].to_numpy(zero_copy_only=False).astype(np.float64),
            zoom=zoom, extent=extent, drop_degenerate=drop_degenerate)
        return pa.table({n: pa.array(c) for n, c in
                         zip(_EMPTY.column_names, cols)})

    return segments_ds.map_batches(fn, batch_format="pyarrow")


def vector_tile_summary(vt_ds):
    """Per-tile feature counts (tile_x, tile_y, n_segs, n_ways) — the
    slim manifest a tile server pages through. One bucket-hash pass;
    n_ways counts distinct ways exactly (per-batch (tile, way) dedup
    happens inside the bucket group, not before it)."""
    from .join import bucketed_group_apply

    def slim(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"tkey": pa.array([], pa.int64()),
                             "way_id": pa.array([], pa.int64())})
        tk = (t["tile_x"].to_numpy(zero_copy_only=False)
              .astype(np.int64) << np.int64(32)) \
            | t["tile_y"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"tkey": pa.array(tk), "way_id": t["way_id"]})

    def per_bucket(g) -> pa.Table:
        if len(g) == 0:
            return pa.table({"tile_x": pa.array([], pa.int64()),
                             "tile_y": pa.array([], pa.int64()),
                             "n_segs": pa.array([], pa.int64()),
                             "n_ways": pa.array([], pa.int64())})
        agg = g.groupby("tkey").agg(
            n_segs=("way_id", "size"), n_ways=("way_id", "nunique"))
        tk = agg.index.to_numpy(np.int64)
        return pa.table({
            "tile_x": pa.array(tk >> np.int64(32)),
            "tile_y": pa.array(tk & np.int64(0xFFFFFFFF)),
            "n_segs": pa.array(agg["n_segs"].to_numpy(np.int64)),
            "n_ways": pa.array(agg["n_ways"].to_numpy(np.int64))})

    return bucketed_group_apply(
        vt_ds.map_batches(slim, batch_format="pyarrow"),
        "tkey", per_bucket)

"""Vector-tile cut pinned against a scalar Liang-Barsky brute force,
plus length-coverage and summary-count properties."""

import numpy as np
import pyarrow as pa
import pytest

from osm_cut_ray.stages.vtile import (vector_tile_segments,
                                      vector_tile_summary)


def _seg_ds(rows, parts=3):
    import ray
    t = pa.table({
        "way_id": pa.array([r[0] for r in rows], pa.int64()),
        "seg": pa.array([r[1] for r in rows], pa.int64()),
        "x1": pa.array([r[2] for r in rows], pa.float64()),
        "y1": pa.array([r[3] for r in rows], pa.float64()),
        "x2": pa.array([r[4] for r in rows], pa.float64()),
        "y2": pa.array([r[5] for r in rows], pa.float64())})
    return ray.data.from_arrow(t).repartition(parts)


def _grid(lon, lat, zoom):
    n = 1 << zoom
    return (lon + 180.0) / 360.0 * n, (90.0 - lat) / 180.0 * n


def _brute(rows, zoom, extent, drop_degenerate=True):
    """Independent scalar clip: floor-bbox candidates, per-boundary
    Liang-Barsky, rint quantization."""
    out = set()
    lim = (1 << zoom) - 1
    for wid, seg, x1, y1, x2, y2 in rows:
        gx1, gy1 = _grid(x1, y1, zoom)
        gx2, gy2 = _grid(x2, y2, zoom)
        txa = int(np.clip(np.floor(min(gx1, gx2)), 0, lim))
        txb = int(np.clip(np.floor(max(gx1, gx2)), 0, lim))
        tya = int(np.clip(np.floor(min(gy1, gy2)), 0, lim))
        tyb = int(np.clip(np.floor(max(gy1, gy2)), 0, lim))
        for tx in range(txa, txb + 1):
            for ty in range(tya, tyb + 1):
                dx, dy = gx2 - gx1, gy2 - gy1
                t0, t1, ok = 0.0, 1.0, True
                for p, q in ((-dx, gx1 - tx), (dx, tx + 1 - gx1),
                             (-dy, gy1 - ty), (dy, ty + 1 - gy1)):
                    if p == 0.0:
                        if q < 0.0:
                            ok = False
                    elif p < 0.0:
                        t0 = max(t0, q / p)
                    else:
                        t1 = min(t1, q / p)
                if not ok or t0 > t1:
                    continue
                pts = []
                for tt in (t0, t1):
                    lx = (gx1 + tt * dx - tx) * extent
                    ly = (gy1 + tt * dy - ty) * extent
                    pts.append((int(np.clip(np.rint(lx), 0, extent)),
                                int(np.clip(np.rint(ly), 0, extent))))
                if drop_degenerate and pts[0] == pts[1]:
                    continue
                out.add((tx, ty, wid, seg,
                         pts[0][0], pts[0][1], pts[1][0], pts[1][1]))
    return out


def _rand_rows(n, seed, span=3.0):
    rng = np.random.default_rng(seed)
    a = rng.uniform([-10, -10], [10, 10], (n, 2))
    d = rng.uniform(-span, span, (n, 2))
    return [(i, 0, a[i, 0], a[i, 1], a[i, 0] + d[i, 0],
             a[i, 1] + d[i, 1]) for i in range(n)]


def test_vtile_matches_brute(ray_session):
    rows = _rand_rows(300, seed=3)
    zoom, extent = 6, 256
    got = vector_tile_segments(_seg_ds(rows), zoom=zoom,
                               extent=extent).to_pandas()
    want = _brute(rows, zoom, extent)
    gset = set(map(tuple, got.to_numpy().tolist()))
    assert gset == want
    assert len(got) == len(want)
    # some segments genuinely span multiple tiles
    assert got.groupby(["way_id", "seg"]).size().max() >= 2
    # partitioning invariance
    got2 = vector_tile_segments(_seg_ds(rows, 11), zoom=zoom,
                                extent=extent).to_pandas()
    assert set(map(tuple, got2.to_numpy().tolist())) == want


def test_vtile_length_coverage(ray_session):
    # with a huge extent, per-tile clipped lengths (in grid units)
    # reconstruct each original segment's length
    rows = _rand_rows(120, seed=9, span=2.0)
    zoom, extent = 5, 1 << 20
    got = vector_tile_segments(_seg_ds(rows), zoom=zoom, extent=extent,
                               drop_degenerate=False).to_pandas()
    ln = np.hypot((got.ix2 - got.ix1) / extent,
                  (got.iy2 - got.iy1) / extent)
    got = got.assign(ln=ln)
    per_seg = got.groupby("way_id").ln.sum()
    for wid, seg, x1, y1, x2, y2 in rows:
        gx1, gy1 = _grid(x1, y1, zoom)
        gx2, gy2 = _grid(x2, y2, zoom)
        want = float(np.hypot(gx2 - gx1, gy2 - gy1))
        assert abs(per_seg[wid] - want) < 1e-3, wid


def test_vtile_degenerate_and_edge_rules(ray_session):
    zoom, extent = 3, 16
    n = 1 << zoom
    # a tiny segment well inside one tile that quantizes to a point
    cx = -180 + (0.5 / n) * 360.0
    cy = 90 - (0.5 / n) * 180.0
    eps = 1e-9
    rows = [(1, 0, cx, cy, cx + eps, cy + eps)]
    kept = vector_tile_segments(_seg_ds(rows, 1), zoom=zoom,
                                extent=extent).to_pandas()
    assert len(kept) == 0
    raw = vector_tile_segments(_seg_ds(rows, 1), zoom=zoom,
                               extent=extent,
                               drop_degenerate=False).to_pandas()
    assert len(raw) == 1 and raw.ix1[0] == raw.ix2[0]
    with pytest.raises(ValueError, match="zoom"):
        vector_tile_segments(_seg_ds(rows, 1), zoom=31)


def test_vtile_summary_counts(ray_session):
    rows = _rand_rows(200, seed=5)
    # two segs per way so n_ways < n_segs somewhere
    rows += [(r[0], 1, r[2] + 0.3, r[3] + 0.2, r[4], r[5])
             for r in rows[:100]]
    vt = vector_tile_segments(_seg_ds(rows), zoom=5, extent=512)
    vt = vt.materialize()
    got = vector_tile_summary(vt).to_pandas()\
        .sort_values(["tile_x", "tile_y"]).reset_index(drop=True)
    df = vt.to_pandas()
    want = df.groupby(["tile_x", "tile_y"]).agg(
        n_segs=("way_id", "size"), n_ways=("way_id", "nunique"))\
        .reset_index()
    assert got.equals(want)

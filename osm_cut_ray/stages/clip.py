"""Way clipping at the polygon boundary: split each way's polyline at
its crossings of the cut polygon and keep the inside portions, with
interpolated boundary points — the osmium-extract-style geometric
refinement of the reference's membership-only cut (osm-cut keeps or
drops whole elements; renderers and routers want geometry that stops
AT the border).

Kernel (per way, all inner math vectorized numpy):

1. Vertex classification — ONE `PolygonIndex.contains` call over the
   whole batch's flattened coordinates (the shared banded PIP kernel,
   geometry/polygon.py:220).
2. Candidate segments — a segment can cross the boundary only if its
   bbox intersects an edge's bbox; the (segments x edges) overlap
   mask is evaluated in bounded chunks.
3. Crossings — segment x candidate-edge parametric intersection
   (cross-product form) on the RAW ring vertices; intersection
   parameters t in (0, 1) split the segment.
4. Interval classification — sub-segment midpoints -> one `contains`
   call per way; kept intervals chain into pieces (an interval ending
   at t=1 joins the next segment's interval starting at t=0).

Output: one row per piece — (way_id, piece, lons list<double>,
lats list<double>, n_pts). Exactly-on-boundary vertices follow the
PIP kernel's pinned tie rules; parallel/collinear overlaps contribute
no crossing (the interval midpoint test still classifies them
correctly up to float epsilon).

Scale shape: same broadcast-coordinate strategy as
`stages/simplify.py` (the polygon spec and the node table ship via
`ray.put` once; ways stream map-side; zero shuffles). Past the node
broadcast cap, attach coordinates with the exploded bucketed joins —
the kernel is per-way and does not change.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..geometry.polygon import PolygonIndex
from .list_ops import _flatten
from .simplify import _CoordLookup

_EPS = 1e-12


class _EdgeTable:
    """Flat raw segments of every ring (include and exclude — the
    boundary of the composed region is a subset of their union)."""

    def __init__(self, rings):
        p1, p2 = [], []
        for _kind, pts in rings:
            a = np.asarray(pts, np.float64)
            if a.ndim != 2 or len(a) < 3:
                raise ValueError("ring needs >= 3 points")
            if (a[0] != a[-1]).any():
                a = np.vstack([a, a[:1]])
            p1.append(a[:-1])
            p2.append(a[1:])
        e1 = np.vstack(p1)
        e2 = np.vstack(p2)
        self.x1, self.y1 = e1[:, 0], e1[:, 1]
        self.x2, self.y2 = e2[:, 0], e2[:, 1]
        self.fx = self.x2 - self.x1
        self.fy = self.y2 - self.y1
        self.xmin = np.minimum(self.x1, self.x2)
        self.xmax = np.maximum(self.x1, self.x2)
        self.ymin = np.minimum(self.y1, self.y2)
        self.ymax = np.maximum(self.y1, self.y2)


def _segment_crossings(x: np.ndarray, y: np.ndarray, et: _EdgeTable,
                       chunk: int = 1 << 22):
    """Per-segment sorted interior crossing parameters for one
    polyline. Returns (list of float arrays, one per segment)."""
    ns = len(x) - 1
    out: list[np.ndarray] = [np.array([], np.float64)] * ns
    if ns <= 0 or len(et.x1) == 0:
        return out
    px, py = x[:-1], y[:-1]
    dx, dy = x[1:] - px, y[1:] - py
    sxmin, sxmax = np.minimum(px, x[1:]), np.maximum(px, x[1:])
    symin, symax = np.minimum(py, y[1:]), np.maximum(py, y[1:])
    ne = len(et.x1)
    rows_per = max(1, chunk // max(ne, 1))
    for s0 in range(0, ns, rows_per):
        s1 = min(ns, s0 + rows_per)
        cand = ((sxmin[s0:s1, None] <= et.xmax[None, :])
                & (sxmax[s0:s1, None] >= et.xmin[None, :])
                & (symin[s0:s1, None] <= et.ymax[None, :])
                & (symax[s0:s1, None] >= et.ymin[None, :]))
        si, ei = np.nonzero(cand)
        if len(si) == 0:
            continue
        si = si + s0
        wx = et.x1[ei] - px[si]
        wy = et.y1[ei] - py[si]
        denom = dx[si] * et.fy[ei] - dy[si] * et.fx[ei]
        ok = np.abs(denom) > _EPS
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (wx * et.fy[ei] - wy * et.fx[ei]) / denom
            u = (wx * dy[si] - wy * dx[si]) / denom
        ok &= (t > _EPS) & (t < 1.0 - _EPS) & (u >= -_EPS) & (u <= 1 + _EPS)
        if not ok.any():
            continue
        si, t = si[ok], t[ok]
        order = np.lexsort((t, si))
        si, t = si[order], t[order]
        starts = np.concatenate(([0], np.flatnonzero(si[1:] != si[:-1]) + 1,
                                 [len(si)]))
        for j in range(len(starts) - 1):
            seg = int(si[starts[j]])
            ts = np.unique(t[starts[j]:starts[j + 1]])
            out[seg] = np.concatenate([out[seg], ts]) \
                if len(out[seg]) else ts
    return out


def clip_polyline(x: np.ndarray, y: np.ndarray, poly: PolygonIndex,
                  et: _EdgeTable,
                  inside: np.ndarray | None = None
                  ) -> list[tuple[np.ndarray, np.ndarray]]:
    """One way -> list of kept (xs, ys) pieces."""
    n = len(x)
    if n == 0:
        return []
    if inside is None:
        inside = poly.contains(x, y)
    if n == 1:
        return [(x.copy(), y.copy())] if inside[0] else []
    # fast path: bbox disjoint from the polygon -> nothing survives
    bx0, by0, bx1, by1 = poly.bbox
    if x.max() < bx0 or x.min() > bx1 or y.max() < by0 or y.min() > by1:
        return []
    cross = _segment_crossings(x, y, et)
    if all(len(c) == 0 for c in cross):
        # no boundary contact: the way is wholly in or wholly out
        return [(x.copy(), y.copy())] if inside[0] else []
    # midpoints of every sub-interval, classified in one call
    mx, my, seg_of, ta_l, tb_l = [], [], [], [], []
    for s in range(n - 1):
        ts = np.concatenate(([0.0], cross[s], [1.0]))
        ta, tb = ts[:-1], ts[1:]
        tm = (ta + tb) * 0.5
        mx.append(x[s] + (x[s + 1] - x[s]) * tm)
        my.append(y[s] + (y[s + 1] - y[s]) * tm)
        seg_of.append(np.full(len(tm), s, np.int64))
        ta_l.append(ta)
        tb_l.append(tb)
    keep = poly.contains(np.concatenate(mx), np.concatenate(my))
    seg_of = np.concatenate(seg_of)
    ta = np.concatenate(ta_l)
    tb = np.concatenate(tb_l)
    pieces: list[tuple[np.ndarray, np.ndarray]] = []
    cur_x: list[float] = []
    cur_y: list[float] = []
    prev_end: tuple[int, float] | None = None
    for i in range(len(keep)):
        if not keep[i]:
            if cur_x:
                pieces.append((np.asarray(cur_x), np.asarray(cur_y)))
                cur_x, cur_y = [], []
            prev_end = None
            continue
        s = int(seg_of[i])
        ax = x[s] + (x[s + 1] - x[s]) * ta[i]
        ay = y[s] + (y[s + 1] - y[s]) * ta[i]
        bxp = x[s] + (x[s + 1] - x[s]) * tb[i]
        byp = y[s] + (y[s + 1] - y[s]) * tb[i]
        chained = prev_end is not None and (
            (prev_end == (s, ta[i]))
            or (ta[i] == 0.0 and prev_end == (s - 1, 1.0)))
        if not chained:
            if cur_x:
                pieces.append((np.asarray(cur_x), np.asarray(cur_y)))
            cur_x, cur_y = [ax], [ay]
        cur_x.append(bxp)
        cur_y.append(byp)
        prev_end = (s, float(tb[i]))
    if cur_x:
        pieces.append((np.asarray(cur_x), np.asarray(cur_y)))
    return pieces


def clip_ways(ways_ds, nodes_ds, rings, *, refs_col: str = "refs",
              id_col: str = "id",
              max_broadcast_nodes: int = 50_000_000):
    """Clip every way against the polygon spec `rings` (the
    `parse_poly_file` format). Returns a Dataset with one row per
    kept piece: (way_id, piece, lons, lats, n_pts)."""
    n_nodes = nodes_ds.count()
    if n_nodes > max_broadcast_nodes:
        raise ValueError(
            f"{n_nodes} nodes exceed max_broadcast_nodes="
            f"{max_broadcast_nodes}; attach coordinates via "
            "stages/join.py:bucketed_attach_column past broadcast size")
    cols = [[], [], []]
    for b in nodes_ds.select_columns(["id", "lon", "lat"]).iter_batches(
            batch_size=None, batch_format="pyarrow"):
        if b.num_rows:
            cols[0].append(b["id"].to_numpy(zero_copy_only=False))
            cols[1].append(b["lon"].to_numpy(zero_copy_only=False))
            cols[2].append(b["lat"].to_numpy(zero_copy_only=False))
    ids = np.concatenate(cols[0]).astype(np.int64) if cols[0] \
        else np.array([], np.int64)
    lon = np.concatenate(cols[1]).astype(np.float64) if cols[0] \
        else np.array([], np.float64)
    lat = np.concatenate(cols[2]).astype(np.float64) if cols[0] \
        else np.array([], np.float64)
    ref = ray.put((_CoordLookup(ids, lon, lat),
                   PolygonIndex.compile(rings), _EdgeTable(rings)))

    def fn(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "way_id": pa.array([], pa.int64()),
            "piece": pa.array([], pa.int64()),
            "lons": pa.array([], pa.list_(pa.float64())),
            "lats": pa.array([], pa.list_(pa.float64())),
            "n_pts": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        if refs_col not in t.column_names:
            raise KeyError(f"clip_ways: no {refs_col!r} column in "
                           f"{t.column_names}")
        lookup, poly, et = ray.get(ref)
        wid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out_id, out_piece, out_lon, out_lat = [], [], [], []
        # classify the whole batch's vertices in one banded-PIP call
        lens, values = _flatten(t, refs_col)
        all_refs = values.to_numpy(zero_copy_only=False).astype(np.int64)
        ax, ay = lookup(all_refs)
        good = ~(np.isnan(ax) | np.isnan(ay))
        ins_all = np.zeros(len(all_refs), bool)
        if good.any():
            ins_all[good] = poly.contains(ax[good], ay[good])
        offs = np.concatenate(([0], np.cumsum(lens)))
        for i in range(len(t)):
            sl = slice(offs[i], offs[i + 1])
            g = good[sl]
            xs, ys = ax[sl][g], ay[sl][g]
            ins = ins_all[sl][g]
            for p, (pxs, pys) in enumerate(
                    clip_polyline(xs, ys, poly, et, inside=ins)):
                out_id.append(int(wid[i]))
                out_piece.append(p)
                out_lon.append(pxs)
                out_lat.append(pys)
        if not out_id:
            return empty
        return pa.table({
            "way_id": pa.array(out_id, pa.int64()),
            "piece": pa.array(out_piece, pa.int64()),
            "lons": pa.array([v.tolist() for v in out_lon],
                             pa.list_(pa.float64())),
            "lats": pa.array([v.tolist() for v in out_lat],
                             pa.list_(pa.float64())),
            "n_pts": pa.array([len(v) for v in out_lon], pa.int64())})

    return ways_ds.map_batches(fn, batch_format="pyarrow")

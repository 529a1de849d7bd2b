"""Snap points to the nearest way segment — the map-matching
primitive (GPS trace cleanup, address geocoding, POI conflation) that
sits one step past PIP in every production OSM stack.

Ray-Data shape: the way geometry is compiled ONCE into a uniform-grid
segment index (`SegmentGrid`: flat segment endpoint arrays + a
cell -> segment CSR over bbox-overlapped cells), `ray.put` once, and
probed map-side — zero shuffles, the point corpus streams. Candidate
gathering is per UNIQUE cell in the batch (points sharing a cell share
one vectorized (n_pts x n_cand) distance matrix), never per point.

Geometry is planar in degree space (the engine's equirectangular
convention, geometry/cells.py); distances returned are euclidean
degrees. Ties break deterministically on (dist, way_id, seg ordinal).

At 100 TB of points: the broadcast side is 40 B/segment + the CSR;
past `max_broadcast_segments` the AUTO builder
(`build_segment_grid_auto`) shards the corpus into ix-stripe tiles
(`TiledSegmentGrid`, each tile its own broadcast-sized SegmentGrid
behind an ObjectRef, with a one-cell halo so every 3x3 probe stays
tile-local) — the cut engine's broadcast/shuffle dual
(pipelines/cut.py:cut_auto) applied to the matching family. Points
never leave their mappers in either mode; the plain builder still
RAISES so callers that sized for broadcast fail loudly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .list_ops import _flatten
from .simplify import _CoordLookup

_GRID_MUL = np.int64(1 << 32)

# per-worker-process rehydration memo: ray.get re-deserializes per
# call (numpy buffers stay zero-copy, but wrapper objects — and any
# lazily-built instance memo like SegmentGrid._loc_idx or
# TiledSegmentGrid._tile_cache — would be rebuilt every batch)
_GRID_CACHE: dict = {}


def get_grid(ref):
    """ray.get(ref) memoized per worker; `ref` is an ObjectRef."""
    g = _GRID_CACHE.get(ref.hex())
    if g is None:
        g = _GRID_CACHE[ref.hex()] = ray.get(ref)
    return g


def _cell_key(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    return ix.astype(np.int64) * _GRID_MUL + iy.astype(np.int64)


class SegmentGrid:
    """Uniform-grid index over way segments (broadcastable)."""

    def __init__(self, way_ids: np.ndarray, seg_ord: np.ndarray,
                 x1: np.ndarray, y1: np.ndarray,
                 x2: np.ndarray, y2: np.ndarray, cell_deg: float,
                 along0: np.ndarray | None = None):
        self.way_ids = way_ids.astype(np.int64)
        self.seg_ord = seg_ord.astype(np.int64)
        self.x1, self.y1 = x1, y1
        self.x2, self.y2 = x2, y2
        self.cell_deg = float(cell_deg)
        # linear referencing: each segment's start offset along its
        # way (planar degrees). `way_segments` precomputes it per
        # complete way (the `along0` column) — REQUIRED for a
        # TiledSegmentGrid tile, which holds only a stripe's subset
        # of each way's segments; computed here (vectorized per-way
        # prefix sums) only when absent.
        seg_len = np.hypot(x2 - x1, y2 - y1)
        if len(x1) == 0:  # empty corpus: all-empty index
            self.along0 = np.array([], np.float64)
            self.seg_len = seg_len
            self.cell_keys = np.array([], np.int64)
            self.cell_start = np.array([0], np.int64)
            self.cell_segs = np.array([], np.int64)
            return
        if along0 is not None:
            self.along0 = np.asarray(along0, np.float64)
        else:
            order = np.lexsort((self.seg_ord, self.way_ids))
            cs = np.cumsum(seg_len[order]) - seg_len[order]
            wid_s = self.way_ids[order]
            start = np.concatenate(([True], wid_s[1:] != wid_s[:-1]))
            base = np.zeros(len(order), np.float64)
            base[start] = cs[start]
            base = np.maximum.accumulate(base)
            self.along0 = np.empty(len(order), np.float64)
            self.along0[order] = cs - base
        self.seg_len = seg_len
        # assign each segment to every cell its bbox touches
        ix0 = np.floor(np.minimum(x1, x2) / cell_deg).astype(np.int64)
        ix1 = np.floor(np.maximum(x1, x2) / cell_deg).astype(np.int64)
        iy0 = np.floor(np.minimum(y1, y2) / cell_deg).astype(np.int64)
        iy1 = np.floor(np.maximum(y1, y2) / cell_deg).astype(np.int64)
        nx = (ix1 - ix0 + 1)
        ny = (iy1 - iy0 + 1)
        reps = (nx * ny).astype(np.int64)
        seg_idx = np.repeat(np.arange(len(x1), dtype=np.int64), reps)
        # per-seg local cell enumeration (vectorized ragged grid walk)
        cum = np.concatenate(([0], np.cumsum(reps)))
        local = np.arange(int(cum[-1]), dtype=np.int64) - cum[:-1][seg_idx]
        lx = local // ny[seg_idx]
        ly = local % ny[seg_idx]
        keys = _cell_key(ix0[seg_idx] + lx, iy0[seg_idx] + ly)
        order = np.argsort(keys, kind="stable")
        keys, seg_idx = keys[order], seg_idx[order]
        uk, starts = np.unique(keys, return_index=True)
        self.cell_keys = uk
        self.cell_start = np.concatenate((starts, [len(keys)]))
        self.cell_segs = seg_idx

    def _cands(self, ix: int, iy: int) -> np.ndarray:
        """Segment ids in the 3x3 cell neighborhood."""
        out = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                k = _cell_key(np.array([ix + dx]), np.array([iy + dy]))[0]
                p = np.searchsorted(self.cell_keys, k)
                if p < len(self.cell_keys) and self.cell_keys[p] == k:
                    out.append(
                        self.cell_segs[self.cell_start[p]:
                                       self.cell_start[p + 1]])
        return np.unique(np.concatenate(out)) if out \
            else np.array([], np.int64)

    def query(self, px: np.ndarray, py: np.ndarray, radius: float
              ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                         np.ndarray]:
        """-> (way_id or -1, seg ordinal or -1, dist or inf,
        along-way offset in planar degrees or nan) per point.

        Correct for radius <= cell_deg (the 3x3 neighborhood then
        covers every segment within range)."""
        if radius > self.cell_deg:
            raise ValueError("radius must be <= cell_deg for the 3x3 "
                             "neighborhood to be exhaustive")
        n = len(px)
        out_w = np.full(n, -1, np.int64)
        out_s = np.full(n, -1, np.int64)
        out_d = np.full(n, np.inf, np.float64)
        out_a = np.full(n, np.nan, np.float64)
        if n == 0 or len(self.x1) == 0:
            return out_w, out_s, out_d, out_a
        ix = np.floor(px / self.cell_deg).astype(np.int64)
        iy = np.floor(py / self.cell_deg).astype(np.int64)
        keys = _cell_key(ix, iy)
        order = np.argsort(keys, kind="stable")
        starts = np.concatenate(
            ([0], np.flatnonzero(keys[order][1:] != keys[order][:-1]) + 1,
             [n]))
        for j in range(len(starts) - 1):
            pts = order[starts[j]:starts[j + 1]]
            cand = self._cands(int(ix[pts[0]]), int(iy[pts[0]]))
            if len(cand) == 0:
                continue
            ax, ay = self.x1[cand], self.y1[cand]
            dx, dy = self.x2[cand] - ax, self.y2[cand] - ay
            L2 = dx * dx + dy * dy
            wx = px[pts][:, None] - ax[None, :]
            wy = py[pts][:, None] - ay[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                t = np.clip(np.where(L2 > 0,
                                     (wx * dx + wy * dy) / L2, 0.0),
                            0.0, 1.0)
            ddx = wx - t * dx[None, :]
            ddy = wy - t * dy[None, :]
            d = np.hypot(ddx, ddy)
            # deterministic per-row min under (dist, way_id, seg):
            # lexsort with row as the primary key, take each row's
            # first entry
            m = len(cand)
            flat_rows = np.repeat(np.arange(len(pts), dtype=np.int64), m)
            flat_cand = np.tile(np.arange(m, dtype=np.int64), len(pts))
            ordk = np.lexsort((self.seg_ord[cand][flat_cand],
                               self.way_ids[cand][flat_cand],
                               d.ravel(), flat_rows))
            srows = flat_rows[ordk]
            firstpos = np.concatenate(
                ([0], np.flatnonzero(srows[1:] != srows[:-1]) + 1))
            best = flat_cand[ordk[firstpos]]
            bd = d[np.arange(len(pts)), best]
            ok = bd <= radius
            bi = cand[best[ok]]
            out_w[pts[ok]] = self.way_ids[bi]
            out_s[pts[ok]] = self.seg_ord[bi]
            out_d[pts[ok]] = bd[ok]
            # linear reference: along = segment start offset + t*len
            tb = t[np.arange(len(pts)), best][ok]
            out_a[pts[ok]] = self.along0[bi] + tb * self.seg_len[bi]
        return out_w, out_s, out_d, out_a


    def query_topk(self, px: np.ndarray, py: np.ndarray,
                   radius: float, k: int
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                              np.ndarray, np.ndarray]:
        """Up to `k` candidate WAYS per point (each way represented by
        its nearest segment), ordered by (dist, way_id, seg) — the
        candidate generator for HMM map matching (stages/match.py).

        -> (offsets, way_id, seg, dist, along): CSR over points —
        point i's candidates are slice(offsets[i], offsets[i+1]) of
        the flat arrays. Points with nothing in `radius` get an empty
        slice. Same 3x3-exhaustiveness bound as `query`
        (radius <= cell_deg)."""
        if radius > self.cell_deg:
            raise ValueError("radius must be <= cell_deg for the 3x3 "
                             "neighborhood to be exhaustive")
        n = len(px)
        counts = np.zeros(n, np.int64)
        acc: list[tuple[np.ndarray, ...]] = []
        if n == 0 or len(self.x1) == 0:
            return (np.zeros(n + 1, np.int64), np.array([], np.int64),
                    np.array([], np.int64), np.array([], np.float64),
                    np.array([], np.float64))
        ix = np.floor(px / self.cell_deg).astype(np.int64)
        iy = np.floor(py / self.cell_deg).astype(np.int64)
        keys = _cell_key(ix, iy)
        order = np.argsort(keys, kind="stable")
        starts = np.concatenate(
            ([0], np.flatnonzero(keys[order][1:] != keys[order][:-1]) + 1,
             [n]))
        for j in range(len(starts) - 1):
            pts = order[starts[j]:starts[j + 1]]
            cand = self._cands(int(ix[pts[0]]), int(iy[pts[0]]))
            if len(cand) == 0:
                continue
            ax, ay = self.x1[cand], self.y1[cand]
            dx, dy = self.x2[cand] - ax, self.y2[cand] - ay
            L2 = dx * dx + dy * dy
            wx = px[pts][:, None] - ax[None, :]
            wy = py[pts][:, None] - ay[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                t = np.clip(np.where(L2 > 0,
                                     (wx * dx + wy * dy) / L2, 0.0),
                            0.0, 1.0)
            d = np.hypot(wx - t * dx[None, :], wy - t * dy[None, :])
            m = len(cand)
            rows = np.repeat(np.arange(len(pts), dtype=np.int64), m)
            cols = np.tile(np.arange(m, dtype=np.int64), len(pts))
            df, tf = d.ravel(), t.ravel()
            ok = df <= radius
            if not ok.any():
                continue
            rows, cols, df, tf = rows[ok], cols[ok], df[ok], tf[ok]
            gi = cand[cols]
            wf = self.way_ids[gi]
            sf = self.seg_ord[gi]
            # best segment per (point, way): first after lexsort by
            # (row, way, dist, seg)
            o1 = np.lexsort((sf, df, wf, rows))
            rows, df, tf, gi, wf, sf = (rows[o1], df[o1], tf[o1],
                                        gi[o1], wf[o1], sf[o1])
            rep = np.concatenate(
                ([True], (rows[1:] != rows[:-1]) | (wf[1:] != wf[:-1])))
            rows, df, tf, gi, wf, sf = (rows[rep], df[rep], tf[rep],
                                        gi[rep], wf[rep], sf[rep])
            # rank ways per point by (dist, way, seg), keep < k
            o2 = np.lexsort((sf, wf, df, rows))
            rows, df, tf, gi, wf, sf = (rows[o2], df[o2], tf[o2],
                                        gi[o2], wf[o2], sf[o2])
            first = np.concatenate(([True], rows[1:] != rows[:-1]))
            idx = np.arange(len(rows), dtype=np.int64)
            base = np.zeros(len(rows), np.int64)
            base[first] = idx[first]
            rank = idx - np.maximum.accumulate(base)
            keep = rank < k
            rows, df, tf, gi, wf, sf = (rows[keep], df[keep], tf[keep],
                                        gi[keep], wf[keep], sf[keep])
            np.add.at(counts, pts[rows], 1)
            along = self.along0[gi] + tf * self.seg_len[gi]
            acc.append((pts[rows], rank[keep], wf, sf, df, along))
        if not acc:
            return (np.zeros(n + 1, np.int64), np.array([], np.int64),
                    np.array([], np.int64), np.array([], np.float64),
                    np.array([], np.float64))
        g_pt = np.concatenate([a[0] for a in acc])
        g_rk = np.concatenate([a[1] for a in acc])
        o = np.lexsort((g_rk, g_pt))
        offsets = np.concatenate(([0], np.cumsum(counts)))
        return (offsets,
                np.concatenate([a[2] for a in acc])[o],
                np.concatenate([a[3] for a in acc])[o],
                np.concatenate([a[4] for a in acc])[o],
                np.concatenate([a[5] for a in acc])[o])

    def locate(self, way: np.ndarray, seg: np.ndarray,
               along: np.ndarray
               ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Invert linear referencing: (way, seg, along) -> (found,
        lon, lat). Rows whose (way, seg) is absent from this grid get
        found=False (a tile of a TiledSegmentGrid holds only its
        stripe's segments). Seg ordinals < 2^20 (trip_id convention).
        The (way, seg) lexsort is memoized on the instance — one per
        worker process per rehydrated grid."""
        idx = getattr(self, "_loc_idx", None)
        if idx is None:
            order = np.lexsort((self.seg_ord, self.way_ids))
            idx = self._loc_idx = (
                self.way_ids[order] * np.int64(1 << 20)
                + self.seg_ord[order], order)
        keys_sorted, order = idx
        n = len(way)
        found = np.zeros(n, bool)
        lon = np.full(n, np.nan, np.float64)
        lat = np.full(n, np.nan, np.float64)
        if n == 0 or len(keys_sorted) == 0:
            return found, lon, lat
        k = np.asarray(way, np.int64) * np.int64(1 << 20) \
            + np.asarray(seg, np.int64)
        pos = np.searchsorted(keys_sorted, k)
        pos = np.clip(pos, 0, len(keys_sorted) - 1)
        found = keys_sorted[pos] == k
        gi = order[pos[found]]
        al = np.asarray(along, np.float64)[found]
        with np.errstate(invalid="ignore", divide="ignore"):
            tpar = np.where(self.seg_len[gi] > 0,
                            (al - self.along0[gi]) / self.seg_len[gi],
                            0.0)
        tpar = np.clip(tpar, 0.0, 1.0)
        lon[found] = self.x1[gi] + tpar * (self.x2[gi] - self.x1[gi])
        lat[found] = self.y1[gi] + tpar * (self.y2[gi] - self.y1[gi])
        return found, lon, lat


class TiledSegmentGrid:
    """K ix-stripe SegmentGrids behind ObjectRefs — the shuffle-free
    tiled fallback past `max_broadcast_segments`.

    Stripe k owns grid cells with ix in [bounds[k], bounds[k+1]); its
    tile contains every segment whose bbox-cell range intersects the
    owned range EXPANDED BY ONE CELL, so any 3x3 probe of an owned
    cell is complete inside the tile and `query`/`query_topk` are
    BIT-IDENTICAL to the single broadcast grid (pinned by
    tests/test_snap_tiled.py). `ray.put` of this object ships only
    the refs; workers rehydrate each tile zero-copy from plasma on
    first touch (node-local after the first task)."""

    def __init__(self, bounds: np.ndarray, refs: list,
                 cell_deg: float, n_segments: int):
        self.bounds = np.asarray(bounds, np.int64)  # len K+1
        self.refs = list(refs)                       # K ObjectRefs
        self.cell_deg = float(cell_deg)
        self.n_segments = int(n_segments)

    @property
    def n_tiles(self) -> int:
        return len(self.refs)

    def _tile(self, k: int) -> SegmentGrid:
        return get_grid(self.refs[k])

    def _stripe_of(self, px: np.ndarray) -> np.ndarray:
        ix = np.floor(np.asarray(px, np.float64)
                      / self.cell_deg).astype(np.int64)
        return np.clip(np.searchsorted(self.bounds, ix, "right") - 1,
                       0, len(self.refs) - 1)

    def query(self, px: np.ndarray, py: np.ndarray, radius: float
              ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                         np.ndarray]:
        n = len(px)
        out_w = np.full(n, -1, np.int64)
        out_s = np.full(n, -1, np.int64)
        out_d = np.full(n, np.inf, np.float64)
        out_a = np.full(n, np.nan, np.float64)
        if n == 0:
            return out_w, out_s, out_d, out_a
        st = self._stripe_of(px)
        for k in np.unique(st):
            m = st == k
            w, s, d, a = self._tile(int(k)).query(px[m], py[m], radius)
            out_w[m], out_s[m], out_d[m], out_a[m] = w, s, d, a
        return out_w, out_s, out_d, out_a

    def query_topk(self, px: np.ndarray, py: np.ndarray,
                   radius: float, k: int
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                              np.ndarray, np.ndarray]:
        n = len(px)
        if n == 0:
            return (np.zeros(1, np.int64), np.array([], np.int64),
                    np.array([], np.int64), np.array([], np.float64),
                    np.array([], np.float64))
        st = self._stripe_of(px)
        counts = np.zeros(n, np.int64)
        per: list[tuple] = []
        for t in np.unique(st):
            pts = np.flatnonzero(st == t)
            res = self._tile(int(t)).query_topk(px[pts], py[pts],
                                                radius, k)
            counts[pts] = np.diff(res[0])
            per.append((pts, res))
        offsets = np.concatenate(([0], np.cumsum(counts)))
        total = int(offsets[-1])
        g_w = np.empty(total, np.int64)
        g_s = np.empty(total, np.int64)
        g_d = np.empty(total, np.float64)
        g_a = np.empty(total, np.float64)
        for pts, (off, w, s, d, a) in per:
            cnt = np.diff(off)
            # flat slot: global offset of the point + local rank
            rank = np.arange(len(w), dtype=np.int64) \
                - np.repeat(off[:-1], cnt)
            dest = np.repeat(offsets[pts], cnt) + rank
            g_w[dest], g_s[dest], g_d[dest], g_a[dest] = w, s, d, a
        return offsets, g_w, g_s, g_d, g_a

    def locate(self, way: np.ndarray, seg: np.ndarray,
               along: np.ndarray
               ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Probe tiles in order, filling still-unfound rows (a way's
        halo replica gives identical coordinates, so first hit wins)."""
        n = len(way)
        found = np.zeros(n, bool)
        lon = np.full(n, np.nan, np.float64)
        lat = np.full(n, np.nan, np.float64)
        for t in range(len(self.refs)):
            todo = np.flatnonzero(~found)
            if len(todo) == 0:
                break
            f, lo, la = self._tile(t).locate(
                np.asarray(way)[todo], np.asarray(seg)[todo],
                np.asarray(along)[todo])
            hit = todo[f]
            found[hit] = True
            lon[hit], lat[hit] = lo[f], la[f]
        return found, lon, lat


def way_segments(ways_ds, nodes_ds, *, refs_col: str = "refs",
                 id_col: str = "id",
                 max_broadcast_nodes: int = 50_000_000):
    """Distributed way -> segment extraction: one slim pass over ways
    with the broadcast coordinate lookup. -> Dataset (way_id, seg,
    x1, y1, x2, y2). Shared by the SegmentGrid build and the overlay
    (segment intersection) stage."""
    n_nodes = nodes_ds.count()
    if n_nodes > max_broadcast_nodes:
        raise ValueError(f"{n_nodes} nodes exceed broadcast cap")
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
    lk_ref = ray.put(_CoordLookup(ids, lon, lat))

    def segs(t: pa.Table) -> pa.Table:
        empty = pa.table({"way_id": pa.array([], pa.int64()),
                          "seg": pa.array([], pa.int64()),
                          "x1": pa.array([], pa.float64()),
                          "y1": pa.array([], pa.float64()),
                          "x2": pa.array([], pa.float64()),
                          "y2": pa.array([], pa.float64()),
                          "along0": pa.array([], pa.float64())})
        if len(t) == 0:
            return empty
        lookup = ray.get(lk_ref)
        lens, values = _flatten(t, refs_col)
        refs = values.to_numpy(zero_copy_only=False).astype(np.int64)
        x, y = lookup(refs)
        wid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # drop NaN-coord refs, then pair flat-consecutive points that
        # share a way — fully vectorized, no per-way Python
        didx = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        good = ~(np.isnan(x) | np.isnan(y))
        xs, ys, didx = x[good], y[good], didx[good]
        if len(xs) < 2:
            return empty
        # per-way ordinal of each point: index minus the way's start
        idx = np.arange(len(xs), dtype=np.int64)
        start = np.concatenate(([True], didx[1:] != didx[:-1]))
        base = np.zeros(len(xs), np.int64)
        base[start] = idx[start]
        base = np.maximum.accumulate(base)
        ordinal = idx - base
        pair = didx[1:] == didx[:-1]
        if not pair.any():
            return empty
        # along0: each segment's start offset along its way. The way
        # is COMPLETE within this batch, so the per-way prefix sum is
        # exact regardless of later tiling (a TiledSegmentGrid tile
        # keeps only a stripe's subset of the way's segments and
        # could not recompute this).
        seg_len = np.where(pair,
                           np.hypot(xs[1:] - xs[:-1],
                                    ys[1:] - ys[:-1]), 0.0)
        prefix = np.cumsum(seg_len) - seg_len
        wfirst = start[:-1]
        fbase = np.zeros(len(prefix), np.float64)
        fbase[wfirst] = prefix[wfirst]
        fbase = np.maximum.accumulate(fbase)
        along0 = prefix - fbase
        return pa.table({
            "way_id": wid[didx[:-1][pair]],
            "seg": ordinal[:-1][pair],
            "x1": xs[:-1][pair], "y1": ys[:-1][pair],
            "x2": xs[1:][pair], "y2": ys[1:][pair],
            "along0": along0[pair]})

    return ways_ds.map_batches(segs, batch_format="pyarrow")


_SEG_NAMES = ("way_id", "seg", "x1", "y1", "x2", "y2", "along0")


def _pull_grid(seg_ds, cell_deg: float, cap: int,
               what: str = "max_broadcast_segments") -> SegmentGrid:
    """Stream a (way_id, seg, x1, y1, x2, y2) Dataset into one
    SegmentGrid; RAISES past `cap` rows (40 B/segment)."""
    parts: list[list[np.ndarray]] = [[] for _ in _SEG_NAMES]
    total = 0
    for b in seg_ds \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        if b.num_rows:
            total += b.num_rows
            if total > cap:
                raise ValueError(
                    f"segment count exceeds {what}={cap}; use "
                    f"build_segment_grid_auto to tile the way corpus")
            for i, nm in enumerate(_SEG_NAMES):
                parts[i].append(b[nm].to_numpy(zero_copy_only=False))
    if not parts[0]:
        z = np.array([], np.float64)
        return SegmentGrid(np.array([], np.int64),
                           np.array([], np.int64), z, z, z, z, cell_deg)
    arrs = [np.concatenate(p) for p in parts]
    return SegmentGrid(arrs[0], arrs[1], arrs[2], arrs[3], arrs[4],
                       arrs[5], cell_deg, along0=arrs[6])


def build_segment_grid(ways_ds, nodes_ds, *, cell_deg: float = 0.5,
                       refs_col: str = "refs", id_col: str = "id",
                       max_broadcast_nodes: int = 50_000_000,
                       max_broadcast_segments: int = 100_000_000
                       ) -> SegmentGrid:
    """Compile way geometry into a broadcastable SegmentGrid.

    Segments are extracted distributed (`way_segments`) and pulled as
    flat arrays — 40 B/segment; `max_broadcast_segments` RAISES past
    the cap (use `build_segment_grid_auto` to degrade to tiles)."""
    seg_ds = way_segments(ways_ds, nodes_ds, refs_col=refs_col,
                          id_col=id_col,
                          max_broadcast_nodes=max_broadcast_nodes)
    return _pull_grid(seg_ds, cell_deg, max_broadcast_segments)


def build_segment_grid_auto(ways_ds, nodes_ds, *,
                            cell_deg: float = 0.5,
                            refs_col: str = "refs",
                            id_col: str = "id",
                            max_broadcast_nodes: int = 50_000_000,
                            max_broadcast_segments: int = 100_000_000,
                            tile_fill: float = 0.7
                            ) -> SegmentGrid | TiledSegmentGrid:
    """Count-based strategy selection, the cut_auto pattern
    (pipelines/cut.py:323): one broadcast SegmentGrid while the
    segment count fits `max_broadcast_segments`, else a
    `TiledSegmentGrid` of ix-stripe tiles sized to `tile_fill` x the
    cap (the remainder absorbs the one-cell halo replication).

    Stripe boundaries come from two tiny per-ix-column histograms
    (segment counts by bbox START column ix0 and by END column ix1 —
    a driver fold over <= a few thousand distinct columns at
    geographic cell sizes). The number of segments a stripe [lo, hi)
    pulls INCLUDING its one-cell halo is then EXACT:
    |{ix0 <= hi}| - |{ix1 <= lo-2}| (ix1 >= ix0 makes the two
    cumulatives inclusion-exclusion-free), so greedy cuts extend each
    stripe to `tile_fill` x the cap and never over the cap itself. A
    single ix column whose halo'd pull exceeds the cap cannot be
    split on this axis — that RAISES with advice to shrink `cell_deg`
    (which refines the stripe axis)."""
    seg_ds = way_segments(ways_ds, nodes_ds, refs_col=refs_col,
                          id_col=id_col,
                          max_broadcast_nodes=max_broadcast_nodes
                          ).materialize()
    n = seg_ds.count()
    if n <= max_broadcast_segments:
        return _pull_grid(seg_ds, cell_deg, max_broadcast_segments)

    def hist(t: pa.Table) -> pa.Table:
        x1 = t["x1"].to_numpy(zero_copy_only=False)
        x2 = t["x2"].to_numpy(zero_copy_only=False)
        ix0 = np.floor(np.minimum(x1, x2) / cell_deg).astype(np.int64)
        ix1 = np.floor(np.maximum(x1, x2) / cell_deg).astype(np.int64)
        u0, c0 = np.unique(ix0, return_counts=True)
        u1, c1 = np.unique(ix1, return_counts=True)
        u = np.union1d(u0, u1)
        n0 = np.zeros(len(u), np.int64)
        n1 = np.zeros(len(u), np.int64)
        n0[np.searchsorted(u, u0)] = c0
        n1[np.searchsorted(u, u1)] = c1
        return pa.table({"ix": pa.array(u), "n0": pa.array(n0),
                         "n1": pa.array(n1)})

    acc0: dict[int, int] = {}
    acc1: dict[int, int] = {}
    for b in seg_ds.map_batches(hist, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        for ixv, v0, v1 in zip(
                b["ix"].to_numpy(zero_copy_only=False),
                b["n0"].to_numpy(zero_copy_only=False),
                b["n1"].to_numpy(zero_copy_only=False)):
            acc0[int(ixv)] = acc0.get(int(ixv), 0) + int(v0)
            acc1[int(ixv)] = acc1.get(int(ixv), 0) + int(v1)
    cols = np.array(sorted(set(acc0) | set(acc1)), np.int64)
    cum0 = np.cumsum([acc0.get(int(c_), 0) for c_ in cols])
    cum1 = np.cumsum([acc1.get(int(c_), 0) for c_ in cols])

    def _le(cum: np.ndarray, x: int) -> int:
        """# segments with hist value <= x (cumulative lookup)."""
        p = int(np.searchsorted(cols, x, "right"))
        return int(cum[p - 1]) if p else 0

    def _pulled(lo: int, hi: int) -> int:
        """EXACT segments a stripe owning [lo, hi) pulls with its
        one-cell halo: bbox ix range intersects [lo-1, hi]."""
        return _le(cum0, hi) - _le(cum1, lo - 2)

    target = max(1, int(max_broadcast_segments * tile_fill))
    NEG, POS = -(1 << 62), (1 << 62)
    bounds = [np.int64(NEG)]
    i = 0
    while i < len(cols):
        lo = NEG if len(bounds) == 1 else int(bounds[-1])
        j = i
        # extend the stripe's owned occupied columns while its exact
        # halo'd pull stays under target; the boundary sits right
        # after the last owned occupied column (tightest halo)
        while j + 1 < len(cols) \
                and _pulled(lo, int(cols[j + 1]) + 1) <= target:
            j += 1
        hi = POS if j + 1 == len(cols) else int(cols[j]) + 1
        if _pulled(lo, hi) > max_broadcast_segments:
            raise ValueError(
                f"one ix-column stripe pulls {_pulled(lo, hi)} "
                f"segments with its halo (> max_broadcast_segments="
                f"{max_broadcast_segments}); shrink cell_deg to "
                "refine the stripe axis")
        if j + 1 < len(cols):
            bounds.append(np.int64(hi))
        i = j + 1
    bounds.append(np.int64(POS))
    bounds = np.array(bounds, np.int64)
    refs = []
    for k in range(len(bounds) - 1):
        lo, hi = int(bounds[k]), int(bounds[k + 1])

        def in_stripe(t: pa.Table, lo=lo, hi=hi) -> pa.Table:
            x1 = t["x1"].to_numpy(zero_copy_only=False)
            x2 = t["x2"].to_numpy(zero_copy_only=False)
            ix0 = np.floor(np.minimum(x1, x2) / cell_deg) \
                .astype(np.int64)
            ix1 = np.floor(np.maximum(x1, x2) / cell_deg) \
                .astype(np.int64)
            # owned cells are [lo, hi); probes reach one cell beyond
            keep = (ix1 >= lo - 1) & (ix0 <= hi)
            return t.filter(pa.array(keep))

        tile = _pull_grid(
            seg_ds.map_batches(in_stripe, batch_format="pyarrow"),
            cell_deg, max_broadcast_segments,
            what="max_broadcast_segments (single tile + halo)")
        refs.append(ray.put(tile))
    return TiledSegmentGrid(bounds, refs, cell_deg, n)


def snap_points(points_ds, grid: "SegmentGrid | TiledSegmentGrid", *,
                radius: float, x_col: str = "lon", y_col: str = "lat",
                id_col: str = "id"):
    """-> points with (way_id, seg, snap_dist, along_deg) attached
    (way_id=-1 / nan where nothing lies within `radius`). along_deg is
    the linear-referencing offset along the matched way. Map-side;
    accepts either grid flavor (broadcast or tiled) transparently."""
    ref = ray.put(grid)

    def fn(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column(
                "way_id", pa.array([], pa.int64())).append_column(
                "seg", pa.array([], pa.int64())).append_column(
                "snap_dist", pa.array([], pa.float64())).append_column(
                "along_deg", pa.array([], pa.float64()))
        g = get_grid(ref)  # zero-copy plasma rehydrate, memoized
        px = t[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        py = t[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        w, s, d, a = g.query(px, py, radius)
        return t.append_column("way_id", pa.array(w)) \
            .append_column("seg", pa.array(s)) \
            .append_column("snap_dist", pa.array(d)) \
            .append_column("along_deg", pa.array(a))

    return points_ds.map_batches(fn, batch_format="pyarrow")

"""Vector overlay: segment-level intersections between two way
corpora (road x river crossings, boundary x network audits) — the
two-table line overlay sibling of the PIP flagship.

Ray-Data shape: side A compiles into a `SegmentGrid` (stages/snap.py
— its constructor already replicates each segment to EVERY grid cell
its bbox touches) or, past the broadcast cap, a `TiledSegmentGrid`
(ix-stripe tiles; each enumerated B cell is routed to the ONE stripe
owning it, so coverage is complete and stripe-local). Side B streams
as a slim segment table (`way_segments`, the shared distributed
extractor). A batch of B segments enumerates its own bbox cells (the
same ragged walk the grid build uses), gathers A candidates per cell
via one searchsorted, dedupes (a_way, a_seg, b_row) candidate pairs
inside the batch — correct globally because a B segment lives in
exactly one batch — and runs the orientation-product intersection
kernel vectorized over all pairs. Zero shuffles on the B side;
payloads never move.

Adversarial density (two corpora traced along the same curve piles
candidate pairs into few cells — quadratic): cells whose candidate
pair count exceeds `max_cell_pairs` within a batch contribute NO
pairs and surface ONE sentinel row (a_way = b_way = -1, a_seg = the
cell key, b_seg = the dropped pair count, x = y = nan) — the
spatial_join.py cap contract, machine-detectable, never silent. A
crossing reachable through another, uncapped shared cell is still
emitted.

Semantics (pinned by tests/test_overlay.py):
- PROPER crossings only (strict sign change on both orientation
  pairs). OSM ways routinely share endpoints (junction nodes) and
  per-way consecutive segments always touch — reporting touches
  would drown real crossings; document and test.
- one row per crossing pair: (a_way, a_seg, b_way, b_seg, x, y) with
  the intersection point; deterministic order after any sort.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .snap import (SegmentGrid, TiledSegmentGrid, _cell_key, get_grid,
                   way_segments)

CAP_SENTINEL_ID = np.int64(-1)


def _empty() -> pa.Table:
    f = pa.array([], pa.float64())
    i = pa.array([], pa.int64())
    return pa.table({"a_way": i, "a_seg": i, "b_way": i, "b_seg": i,
                     "x": f, "y": f})


def _gather(g: SegmentGrid, brow: np.ndarray, keys: np.ndarray,
            max_cell_pairs: int | None):
    """Candidate (B row, A segment) pairs for enumerated cells against
    one grid. -> (prow, a_way, a_seg, q1x, q1y, q2x, q2y,
    capped_keys, capped_counts)."""
    zero = (np.array([], np.int64),) * 3 \
        + (np.array([], np.float64),) * 4 \
        + (np.array([], np.int64), np.array([], np.int64))
    if len(g.x1) == 0 or len(keys) == 0:
        return zero
    pos = np.searchsorted(g.cell_keys, keys)
    pos = np.clip(pos, 0, max(len(g.cell_keys) - 1, 0))
    hit = g.cell_keys[pos] == keys
    brow, pos, keys = brow[hit], pos[hit], keys[hit]
    counts = g.cell_start[pos + 1] - g.cell_start[pos]
    cap_keys = np.array([], np.int64)
    cap_counts = np.array([], np.int64)
    if max_cell_pairs is not None and len(keys):
        # per-cell pair volume within this batch: sum of A-candidate
        # counts over the B rows touching the cell
        order = np.argsort(keys, kind="stable")
        ks, cs = keys[order], counts[order]
        first = np.concatenate(([True], ks[1:] != ks[:-1]))
        per_cell = np.add.reduceat(cs, np.flatnonzero(first))
        over = per_cell > max_cell_pairs
        if over.any():
            cap_keys = ks[first][over]
            cap_counts = per_cell[over]
            drop = np.isin(keys, cap_keys)
            brow, pos, counts = (brow[~drop], pos[~drop],
                                 counts[~drop])
    if counts.sum() == 0:
        return zero[:7] + (cap_keys, cap_counts)
    prow = np.repeat(brow, counts)
    coff = np.concatenate(([0], np.cumsum(counts)))
    aidx = g.cell_segs[
        np.repeat(g.cell_start[pos], counts)
        + (np.arange(int(counts.sum())) - np.repeat(coff[:-1],
                                                    counts))]
    return (prow, g.way_ids[aidx], g.seg_ord[aidx],
            g.x1[aidx], g.y1[aidx], g.x2[aidx], g.y2[aidx],
            cap_keys, cap_counts)


def segment_intersections(grid: SegmentGrid | TiledSegmentGrid,
                          b_segs_ds, *,
                          max_cell_pairs: int | None = 4_000_000):
    """B segment rows (way_id, seg, x1, y1, x2, y2) x A grid (either
    flavor) -> Dataset of proper crossings plus cap sentinel rows
    (module docstring)."""
    ref = ray.put(grid)

    def per_batch(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _empty()
        g = get_grid(ref)
        bx1 = t["x1"].to_numpy(zero_copy_only=False)
        by1 = t["y1"].to_numpy(zero_copy_only=False)
        bx2 = t["x2"].to_numpy(zero_copy_only=False)
        by2 = t["y2"].to_numpy(zero_copy_only=False)
        bw = t["way_id"].to_numpy(zero_copy_only=False)
        bs = t["seg"].to_numpy(zero_copy_only=False)
        c = g.cell_deg
        ix0 = np.floor(np.minimum(bx1, bx2) / c).astype(np.int64)
        ix1 = np.floor(np.maximum(bx1, bx2) / c).astype(np.int64)
        iy0 = np.floor(np.minimum(by1, by2) / c).astype(np.int64)
        iy1 = np.floor(np.maximum(by1, by2) / c).astype(np.int64)
        nx, ny = ix1 - ix0 + 1, iy1 - iy0 + 1
        reps = (nx * ny).astype(np.int64)
        brow = np.repeat(np.arange(len(t), dtype=np.int64), reps)
        cum = np.concatenate(([0], np.cumsum(reps)))
        local = np.arange(int(cum[-1]), dtype=np.int64) \
            - cum[:-1][brow]
        cix = ix0[brow] + local // ny[brow]
        keys = _cell_key(cix, iy0[brow] + local % ny[brow])
        if isinstance(g, TiledSegmentGrid):
            # each cell is OWNED by exactly one stripe: route there
            st = np.clip(np.searchsorted(g.bounds, cix, "right") - 1,
                         0, len(g.refs) - 1)
            parts = []
            for k in np.unique(st):
                m = st == k
                parts.append(_gather(g._tile(int(k)), brow[m],
                                     keys[m], max_cell_pairs))
        else:
            parts = [_gather(g, brow, keys, max_cell_pairs)]
        prow = np.concatenate([p[0] for p in parts])
        away = np.concatenate([p[1] for p in parts])
        aseg = np.concatenate([p[2] for p in parts])
        q1x = np.concatenate([p[3] for p in parts])
        q1y = np.concatenate([p[4] for p in parts])
        q2x = np.concatenate([p[5] for p in parts])
        q2y = np.concatenate([p[6] for p in parts])
        cap_keys = np.concatenate([p[7] for p in parts])
        cap_counts = np.concatenate([p[8] for p in parts])

        def with_sentinels(tbl: pa.Table) -> pa.Table:
            if len(cap_keys) == 0:
                return tbl
            sent = pa.table({
                "a_way": pa.array(
                    np.full(len(cap_keys), CAP_SENTINEL_ID)),
                "a_seg": pa.array(cap_keys),
                "b_way": pa.array(
                    np.full(len(cap_keys), CAP_SENTINEL_ID)),
                "b_seg": pa.array(cap_counts),
                "x": pa.array(np.full(len(cap_keys), np.nan)),
                "y": pa.array(np.full(len(cap_keys), np.nan))})
            return pa.concat_tables([tbl, sent])

        if len(prow) == 0:
            return with_sentinels(_empty())
        # dedupe candidate pairs on GLOBAL identity (a segment pair
        # can share cells — and, tiled, a cell per stripe)
        o = np.lexsort((aseg, away, prow))
        prow, away, aseg = prow[o], away[o], aseg[o]
        q1x, q1y, q2x, q2y = q1x[o], q1y[o], q2x[o], q2y[o]
        uniq = np.concatenate(
            ([True], (prow[1:] != prow[:-1]) | (away[1:] != away[:-1])
             | (aseg[1:] != aseg[:-1])))
        prow, away, aseg = prow[uniq], away[uniq], aseg[uniq]
        q1x, q1y, q2x, q2y = q1x[uniq], q1y[uniq], q2x[uniq], q2y[uniq]
        # orientation-product proper-crossing kernel
        p1x, p1y = bx1[prow], by1[prow]
        p2x, p2y = bx2[prow], by2[prow]
        rqx, rqy = q2x - q1x, q2y - q1y
        rpx, rpy = p2x - p1x, p2y - p1y
        d1 = rqx * (p1y - q1y) - rqy * (p1x - q1x)
        d2 = rqx * (p2y - q1y) - rqy * (p2x - q1x)
        d3 = rpx * (q1y - p1y) - rpy * (q1x - p1x)
        d4 = rpx * (q2y - p1y) - rpy * (q2x - p1x)
        cross = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) \
            & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))
        if not cross.any():
            return with_sentinels(_empty())
        prow2, away2, aseg2 = prow[cross], away[cross], aseg[cross]
        tpar = d1[cross] / (d1[cross] - d2[cross])
        return with_sentinels(pa.table({
            "a_way": pa.array(away2),
            "a_seg": pa.array(aseg2),
            "b_way": pa.array(bw[prow2].astype(np.int64)),
            "b_seg": pa.array(bs[prow2].astype(np.int64)),
            "x": pa.array(bx1[prow2]
                          + tpar * (bx2[prow2] - bx1[prow2])),
            "y": pa.array(by1[prow2]
                          + tpar * (by2[prow2] - by1[prow2]))}))

    return b_segs_ds.map_batches(per_batch, batch_format="pyarrow")


def way_intersections(a_ways, a_nodes, b_ways, b_nodes=None, *,
                      cell_deg: float = 0.5, refs_col: str = "refs",
                      id_col: str = "id",
                      max_broadcast_segments: int = 100_000_000,
                      max_cell_pairs: int | None = 4_000_000):
    """Proper crossings between two way corpora sharing (or not) a
    node table. -> Dataset (a_way, a_seg, b_way, b_seg, x, y). Side A
    auto-selects broadcast vs tiled past `max_broadcast_segments`
    (`build_segment_grid_auto`); over-dense cells surface cap
    sentinels (module docstring)."""
    from .snap import build_segment_grid_auto
    grid = build_segment_grid_auto(
        a_ways, a_nodes, cell_deg=cell_deg, refs_col=refs_col,
        id_col=id_col, max_broadcast_segments=max_broadcast_segments)
    b_segs = way_segments(b_ways,
                          a_nodes if b_nodes is None else b_nodes,
                          refs_col=refs_col, id_col=id_col)
    return segment_intersections(grid, b_segs,
                                 max_cell_pairs=max_cell_pairs)

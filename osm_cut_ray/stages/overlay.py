"""Vector overlay: segment-level intersections between two way
corpora (road x river crossings, boundary x network audits) — the
two-table line overlay sibling of the PIP flagship.

Ray-Data shape: side A compiles into the broadcast `SegmentGrid`
(stages/snap.py — its constructor already replicates each segment to
EVERY grid cell its bbox touches), side B streams as a slim segment
table (`way_segments`, the shared distributed extractor). A batch of
B segments enumerates its own bbox cells (the same ragged walk the
grid build uses), gathers A candidates per cell via one searchsorted,
dedupes (a_seg, b_seg) candidate pairs inside the batch — correct
globally because a B segment lives in exactly one batch — and runs
the orientation-product intersection kernel vectorized over all
pairs. Zero shuffles on the B side; payloads never move.

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

from .snap import SegmentGrid, _cell_key, way_segments


def _empty() -> pa.Table:
    f = pa.array([], pa.float64())
    i = pa.array([], pa.int64())
    return pa.table({"a_way": i, "a_seg": i, "b_way": i, "b_seg": i,
                     "x": f, "y": f})


def segment_intersections(grid: SegmentGrid, b_segs_ds):
    """B segment rows (way_id, seg, x1, y1, x2, y2) x broadcast A grid
    -> Dataset of proper crossings (module docstring)."""
    ref = ray.put(grid)

    def per_batch(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _empty()
        g: SegmentGrid = ray.get(ref)
        if len(g.x1) == 0:
            return _empty()
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
        keys = _cell_key(ix0[brow] + local // ny[brow],
                         iy0[brow] + local % ny[brow])
        pos = np.searchsorted(g.cell_keys, keys)
        pos = np.clip(pos, 0, max(len(g.cell_keys) - 1, 0))
        hit = g.cell_keys[pos] == keys
        brow, pos = brow[hit], pos[hit]
        counts = g.cell_start[pos + 1] - g.cell_start[pos]
        if counts.sum() == 0:
            return _empty()
        prow = np.repeat(brow, counts)
        coff = np.concatenate(([0], np.cumsum(counts)))
        aidx = g.cell_segs[
            np.repeat(g.cell_start[pos], counts)
            + (np.arange(int(counts.sum())) - np.repeat(coff[:-1],
                                                        counts))]
        # dedupe candidate pairs (a segment pair can share cells)
        pair_key = prow * np.int64(len(g.x1)) + aidx
        _, uniq = np.unique(pair_key, return_index=True)
        prow, aidx = prow[uniq], aidx[uniq]
        # orientation-product proper-crossing kernel
        p1x, p1y = bx1[prow], by1[prow]
        p2x, p2y = bx2[prow], by2[prow]
        q1x, q1y = g.x1[aidx], g.y1[aidx]
        q2x, q2y = g.x2[aidx], g.y2[aidx]
        rqx, rqy = q2x - q1x, q2y - q1y
        rpx, rpy = p2x - p1x, p2y - p1y
        d1 = rqx * (p1y - q1y) - rqy * (p1x - q1x)
        d2 = rqx * (p2y - q1y) - rqy * (p2x - q1x)
        d3 = rpx * (q1y - p1y) - rpy * (q1x - p1x)
        d4 = rpx * (q2y - p1y) - rpy * (q2x - p1x)
        cross = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) \
            & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))
        if not cross.any():
            return _empty()
        prow, aidx = prow[cross], aidx[cross]
        tpar = d1[cross] / (d1[cross] - d2[cross])
        return pa.table({
            "a_way": pa.array(g.way_ids[aidx]),
            "a_seg": pa.array(g.seg_ord[aidx]),
            "b_way": pa.array(bw[prow].astype(np.int64)),
            "b_seg": pa.array(bs[prow].astype(np.int64)),
            "x": pa.array(bx1[prow] + tpar * (bx2[prow] - bx1[prow])),
            "y": pa.array(by1[prow] + tpar * (by2[prow] - by1[prow]))})

    return b_segs_ds.map_batches(per_batch, batch_format="pyarrow")


def way_intersections(a_ways, a_nodes, b_ways, b_nodes=None, *,
                      cell_deg: float = 0.5, refs_col: str = "refs",
                      id_col: str = "id"):
    """Proper crossings between two way corpora sharing (or not) a
    node table. -> Dataset (a_way, a_seg, b_way, b_seg, x, y)."""
    from .snap import build_segment_grid
    grid = build_segment_grid(a_ways, a_nodes, cell_deg=cell_deg,
                              refs_col=refs_col, id_col=id_col)
    b_segs = way_segments(b_ways,
                          a_nodes if b_nodes is None else b_nodes,
                          refs_col=refs_col, id_col=id_col)
    return segment_intersections(grid, b_segs)

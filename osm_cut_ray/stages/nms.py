"""Distributed non-maximum suppression over detection boxes — the
detection-corpus dedup step (tile-inferred object detections on
imagery/maps produce duplicate boxes wherever tiles overlap or the
model fires twice).

Two shapes, matching how detections arrive at scale:

- `nms_per_image`: the common corpus shape (billions of images, each
  with a bounded box set). ONE bucketed shuffle co-locates each
  image's boxes; the exact greedy kernel runs vectorized per image.
- `nms_canvas`: every box lives on ONE huge canvas (a stitched
  aerial mosaic / planet map), where greedy NMS is a global
  sequential order. Exact distributed evaluation via the
  priority-MIS fixpoint: greedy NMS keeps box b iff every
  higher-priority box overlapping it (IoU > thr) is suppressed — a
  lexicographic maximal-independent-set, decidable locally in
  rounds (round k decides suppression chains of depth k). Boxes
  only interact within IoU > 0, so with cell_size >= the largest
  box side each box's conflicts lie in its 3x3 center-cell
  neighborhood: per round, boxes replicate to 9 cells (slim rows),
  one bucketed shuffle decides home boxes, suppressed boxes leave
  the stream (absence == suppressed for the rule above). RAISES on
  round exhaustion (repo cap contract, never a partial result).

Priority is (score DESC, box_id ASC) — deterministic under score
ties. Suppression is IoU STRICTLY greater than `iou_threshold`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .join import bucketed_group_apply, solidify

_KEEP, _SUPP = np.int8(1), np.int8(2)  # 0 = undecided


def greedy_nms(x0, y0, x1, y1, score, ids,
               iou_threshold: float) -> np.ndarray:
    """Exact greedy NMS -> bool keep mask (input order). Boxes are
    (x0, y0, x1, y1) with x1 > x0, y1 > y0; priority score DESC with
    id-ASC tie-break; a box is suppressed when its IoU with an
    already-kept higher-priority box exceeds `iou_threshold`."""
    n = len(x0)
    keep = np.zeros(n, bool)
    if n == 0:
        return keep
    x0 = np.asarray(x0, np.float64)
    y0 = np.asarray(y0, np.float64)
    x1 = np.asarray(x1, np.float64)
    y1 = np.asarray(y1, np.float64)
    if (x1 <= x0).any() or (y1 <= y0).any():
        # a zero-area box makes IoU 0/0 = NaN, and NaN comparisons
        # then suppress unrelated boxes (ADVICE r4) — validate the
        # documented precondition instead of silently corrupting.
        raise ValueError("greedy_nms: degenerate box (x1<=x0 or "
                         "y1<=y0) — boxes must have positive area")
    ids = np.asarray(ids, np.int64)
    order = np.lexsort((ids, -np.asarray(score, np.float64)))
    area = (x1 - x0) * (y1 - y0)
    alive = np.ones(n, bool)
    for oi in order:
        if not alive[oi]:
            continue
        keep[oi] = True
        iw = np.maximum(
            np.minimum(x1, x1[oi]) - np.maximum(x0, x0[oi]), 0.0)
        ih = np.maximum(
            np.minimum(y1, y1[oi]) - np.maximum(y0, y0[oi]), 0.0)
        inter = iw * ih
        iou = inter / (area + area[oi] - inter)
        alive &= iou <= iou_threshold
    return keep


def nms_per_image(boxes_ds, *, iou_threshold: float,
                  group_col: str = "image_id",
                  score_col: str = "score", id_col: str = "box_id",
                  x0_col: str = "x0", y0_col: str = "y0",
                  x1_col: str = "x1", y1_col: str = "y1"):
    """-> Dataset: the input rows (full schema) filtered to the boxes
    greedy NMS keeps WITHIN each `group_col` group. One bucketed
    shuffle; the per-image kernel is the exact `greedy_nms`."""

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        out = pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)
        if len(g) == 0:
            return out
        g = g.sort_values([group_col, id_col], kind="stable") \
            .reset_index(drop=True)
        gid = g[group_col].to_numpy()
        starts = np.concatenate(
            ([0], np.flatnonzero(gid[1:] != gid[:-1]) + 1, [len(gid)]))
        x0 = g[x0_col].to_numpy(np.float64)
        y0 = g[y0_col].to_numpy(np.float64)
        x1 = g[x1_col].to_numpy(np.float64)
        y1 = g[y1_col].to_numpy(np.float64)
        sc = g[score_col].to_numpy(np.float64)
        ids = g[id_col].to_numpy(np.int64)
        keep = np.zeros(len(g), bool)
        for k in range(len(starts) - 1):
            s, e = int(starts[k]), int(starts[k + 1])
            keep[s:e] = greedy_nms(x0[s:e], y0[s:e], x1[s:e], y1[s:e],
                                   sc[s:e], ids[s:e], iou_threshold)
        return pa.Table.from_pandas(g[keep], preserve_index=False) \
            .replace_schema_metadata(None)

    return bucketed_group_apply(boxes_ds, group_col, per_bucket)


def _pack_cell(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    return (cx.astype(np.int64) << np.int64(32)) | \
        (cy.astype(np.int64) & np.int64(0xFFFFFFFF))


def nms_canvas(boxes_ds, *, iou_threshold: float, cell_size: float,
               score_col: str = "score", id_col: str = "box_id",
               x0_col: str = "x0", y0_col: str = "y0",
               x1_col: str = "x1", y1_col: str = "y1",
               max_rounds: int = 64):
    """Exact greedy NMS over ONE shared canvas -> Dataset (box_id,
    x0, y0, x1, y1, score) of kept boxes (slim projection — attach
    payloads downstream by box_id). `cell_size` must be >= the
    largest box side (validated; RAISES otherwise) so conflicts are
    confined to the 3x3 cell neighborhood. Rounds = the deepest
    suppression chain; RAISES past `max_rounds` rather than
    returning a partial result."""
    import ray.data

    def _slim(t: pa.Table) -> pa.Table:
        bx0 = t[x0_col].to_numpy(zero_copy_only=False)
        bx1 = t[x1_col].to_numpy(zero_copy_only=False)
        by0 = t[y0_col].to_numpy(zero_copy_only=False)
        by1 = t[y1_col].to_numpy(zero_copy_only=False)
        if (bx1 <= bx0).any() or (by1 <= by0).any():
            raise ValueError(
                "nms_canvas: degenerate box (x1<=x0 or y1<=y0) — "
                "IoU would be NaN and suppress unrelated boxes")
        return pa.table({
            "box_id": pa.array(
                t[id_col].to_numpy(zero_copy_only=False)
                .astype(np.int64)),
            "x0": pa.array(t[x0_col].to_numpy(zero_copy_only=False)
                           .astype(np.float64)),
            "y0": pa.array(t[y0_col].to_numpy(zero_copy_only=False)
                           .astype(np.float64)),
            "x1": pa.array(t[x1_col].to_numpy(zero_copy_only=False)
                           .astype(np.float64)),
            "y1": pa.array(t[y1_col].to_numpy(zero_copy_only=False)
                           .astype(np.float64)),
            "score": pa.array(t[score_col]
                              .to_numpy(zero_copy_only=False)
                              .astype(np.float64)),
            "state": pa.array(
                np.zeros(len(t), np.int8))})

    slim = boxes_ds.map_batches(_slim, batch_format="pyarrow")
    slim, n = solidify(slim)
    empty = pa.table({"box_id": pa.array([], pa.int64()),
                      "x0": pa.array([], pa.float64()),
                      "y0": pa.array([], pa.float64()),
                      "x1": pa.array([], pa.float64()),
                      "y1": pa.array([], pa.float64()),
                      "score": pa.array([], pa.float64())})
    if n == 0:
        return ray.data.from_arrow(empty)
    wmax = slim.aggregate(
        ray.data.aggregate.Max(on="x1"), ray.data.aggregate.Min(on="x0"),
        ray.data.aggregate.Max(on="y1"), ray.data.aggregate.Min(on="y0"))
    side = slim.map_batches(
        lambda t: pa.table({
            "s": pa.array(np.maximum(
                t["x1"].to_numpy(zero_copy_only=False)
                - t["x0"].to_numpy(zero_copy_only=False),
                t["y1"].to_numpy(zero_copy_only=False)
                - t["y0"].to_numpy(zero_copy_only=False)))}),
        batch_format="pyarrow").aggregate(ray.data.aggregate.Max(on="s"))
    max_side = float(side["max(s)"])
    if max_side > cell_size:
        raise RuntimeError(
            f"nms_canvas: largest box side {max_side:.6g} exceeds "
            f"cell_size={cell_size:.6g}; conflicts would escape the "
            f"3x3 neighborhood — raise cell_size")
    span = max(abs(float(wmax["max(x1)"])), abs(float(wmax["min(x0)"])),
               abs(float(wmax["max(y1)"])), abs(float(wmax["min(y0)"])))
    if span / cell_size > 2**30:
        raise RuntimeError("nms_canvas: canvas/cell_size exceeds the "
                           "int32 cell-coordinate range")

    def replicate(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column(
                "cell", pa.array([], pa.int64())).append_column(
                "home", pa.array([], pa.bool_()))
        x0 = t["x0"].to_numpy(zero_copy_only=False)
        y0 = t["y0"].to_numpy(zero_copy_only=False)
        x1 = t["x1"].to_numpy(zero_copy_only=False)
        y1 = t["y1"].to_numpy(zero_copy_only=False)
        cx = np.floor((x0 + x1) * 0.5 / cell_size).astype(np.int64)
        cy = np.floor((y0 + y1) * 0.5 / cell_size).astype(np.int64)
        idx, cells, homes = [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                idx.append(np.arange(len(t)))
                cells.append(_pack_cell(cx + dx, cy + dy))
                homes.append(np.full(len(t), dx == 0 and dy == 0))
        rep = t.take(pa.array(np.concatenate(idx)))
        return rep.append_column(
            "cell", pa.array(np.concatenate(cells))).append_column(
            "home", pa.array(np.concatenate(homes)))

    def decide(g: pd.DataFrame) -> pa.Table:
        cols = ["box_id", "x0", "y0", "x1", "y1", "score", "state"]
        if len(g) == 0:
            return pa.table({
                "box_id": pa.array([], pa.int64()),
                "x0": pa.array([], pa.float64()),
                "y0": pa.array([], pa.float64()),
                "x1": pa.array([], pa.float64()),
                "y1": pa.array([], pa.float64()),
                "score": pa.array([], pa.float64()),
                "state": pa.array([], pa.int8())})
        g = g.sort_values(["cell", "box_id"], kind="stable") \
            .reset_index(drop=True)
        cell = g["cell"].to_numpy()
        starts = np.concatenate(
            ([0], np.flatnonzero(cell[1:] != cell[:-1]) + 1,
             [len(cell)]))
        x0 = g["x0"].to_numpy(np.float64)
        y0 = g["y0"].to_numpy(np.float64)
        x1 = g["x1"].to_numpy(np.float64)
        y1 = g["y1"].to_numpy(np.float64)
        sc = g["score"].to_numpy(np.float64)
        ids = g["box_id"].to_numpy(np.int64)
        st = g["state"].to_numpy(np.int8).copy()
        home = g["home"].to_numpy(bool)
        area = (x1 - x0) * (y1 - y0)
        for k in range(len(starts) - 1):
            s, e = int(starts[k]), int(starts[k + 1])
            hsel = np.flatnonzero(home[s:e] & (st[s:e] == 0)) + s
            if len(hsel) == 0:
                continue
            for i in hsel:
                iw = np.maximum(np.minimum(x1[s:e], x1[i])
                                - np.maximum(x0[s:e], x0[i]), 0.0)
                ih = np.maximum(np.minimum(y1[s:e], y1[i])
                                - np.maximum(y0[s:e], y0[i]), 0.0)
                inter = iw * ih
                iou = inter / (area[s:e] + area[i] - inter)
                pri = (sc[s:e] > sc[i]) | \
                    ((sc[s:e] == sc[i]) & (ids[s:e] < ids[i]))
                conf = (iou > iou_threshold) & pri
                nst = st[s:e][conf]
                if np.any(nst == _KEEP):
                    st[i] = _SUPP
                elif not np.any(nst == 0):
                    st[i] = _KEEP
        out = home & (st != _SUPP)  # suppressed boxes leave the stream
        return pa.Table.from_pandas(
            g.loc[out, cols].assign(state=st[out]),
            preserve_index=False).replace_schema_metadata(None)

    cur = slim
    for _ in range(max_rounds):
        rep = cur.map_batches(replicate, batch_format="pyarrow")
        cur = bucketed_group_apply(rep, "cell", decide)
        cur, n = solidify(cur)
        if n == 0:
            return ray.data.from_arrow(empty)
        undec = cur.map_batches(
            lambda t: pa.table({"u": pa.array(
                [int((t["state"].to_numpy(zero_copy_only=False) == 0)
                     .sum())], pa.int64())}),
            batch_format="pyarrow").aggregate(
            ray.data.aggregate.Sum(on="u"))
        if int(undec["sum(u)"] or 0) == 0:
            return cur.map_batches(
                lambda t: t.drop_columns(["state"]),
                batch_format="pyarrow")
    raise RuntimeError(
        f"nms_canvas: {max_rounds} rounds exhausted with undecided "
        f"boxes (suppression chain deeper than max_rounds) — raise "
        f"max_rounds")

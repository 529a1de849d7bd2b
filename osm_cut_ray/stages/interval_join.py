"""Generic interval-overlap join: A(id, start, end) x B(id, start,
end) -> every pair of closed intervals with a.start <= b.end AND
b.start <= a.end, plus the overlap length.

The 1-D analog of the repo's spatial grid joins (spatial_join.py,
colocate.py): quantize the line into cells of `cell_width`, replicate
each interval to every cell it touches, ONE bucketed shuffle on the
cell id, and a vectorized within-cell A x B overlap kernel. A pair
straddling several shared cells is emitted EXACTLY once — only by the
cell containing max(a.start, b.start) (the left edge of the overlap,
which both intervals provably cover; the colocate.py exactly-once
rule in one dimension).

`cell_width=None` auto-sizes to 2x the larger mean interval length,
computed with int64-quantized exact sums (bit-deterministic, no
sampling). Caps (the repo contract — RAISE, never silently drop):
`max_span_cells` bounds per-interval replication (split giant
intervals or widen cells), `max_cell_side` bounds the within-cell
A x B kernel (degenerate piles of identical intervals).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import join as J
from .join import bucketed_group_apply

_Q = 1_000_000  # 1e-6 quantization for exact mean-length sums


def _mean_len(ds, start_col: str, end_col: str) -> float:
    import ray.data as rd

    def part(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"s": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        s = t[start_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        e = t[end_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        q = np.round((e - s) * _Q).astype(np.int64)
        return pa.table({"s": pa.array([int(q.sum())]),
                         "n": pa.array([len(q)])})

    agg = ds.map_batches(part, batch_format="pyarrow").aggregate(
        rd.aggregate.Sum("s", alias_name="s"),
        rd.aggregate.Sum("n", alias_name="n"))
    n = int(agg["n"] or 0)
    if n == 0:
        return 0.0
    return (int(agg["s"] or 0) / _Q) / n


def interval_join(a_ds, b_ds, *, id_col: str = "id",
                  start_col: str = "start", end_col: str = "end",
                  cell_width: float | None = None,
                  max_span_cells: int = 10_000,
                  max_cell_side: int = 100_000):
    """-> Dataset (a_id, b_id, overlap) for every overlapping closed
    pair; touching intervals (a.end == b.start) count with
    overlap 0.0."""
    import ray.data as rd

    empty_out = rd.from_arrow(pa.table({
        "a_id": pa.array([], pa.int64()),
        "b_id": pa.array([], pa.int64()),
        "overlap": pa.array([], pa.float64())}))

    if cell_width is None:
        w = 2.0 * max(_mean_len(a_ds, start_col, end_col),
                      _mean_len(b_ds, start_col, end_col))
        cell_width = w if w > 0 else 1.0

    cw = float(cell_width)

    def replicate(side: int):
        def f(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "cell": pa.array([], pa.int64()),
                "side": pa.array([], pa.int8()),
                "iid": pa.array([], pa.int64()),
                "s": pa.array([], pa.float64()),
                "e": pa.array([], pa.float64())})
            if len(t) == 0 or id_col not in t.column_names:
                return empty
            iid = t[id_col].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            s = t[start_col].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            e = t[end_col].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            c0 = np.floor(s / cw).astype(np.int64)
            c1 = np.floor(e / cw).astype(np.int64)
            span = c1 - c0 + 1
            if span.max(initial=0) > max_span_cells:
                k = int(iid[int(np.argmax(span))])
                raise ValueError(
                    f"interval {k} spans {int(span.max())} cells > "
                    f"max_span_cells={max_span_cells}; widen "
                    "cell_width or split giant intervals")
            row = np.repeat(np.arange(len(iid), dtype=np.int64),
                            span)
            # cell offset within each interval's span
            off = (np.arange(len(row), dtype=np.int64)
                   - np.repeat(np.cumsum(span) - span, span))
            return pa.table({
                "cell": pa.array(c0[row] + off),
                "side": pa.array(np.full(len(row), side, np.int8)),
                "iid": pa.array(iid[row]),
                "s": pa.array(s[row]),
                "e": pa.array(e[row])})
        return f

    rows = a_ds.map_batches(replicate(0), batch_format="pyarrow") \
        .union(b_ds.map_batches(replicate(1),
                                batch_format="pyarrow"))

    def cell_kernel(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({
            "a_id": pa.array([], pa.int64()),
            "b_id": pa.array([], pa.int64()),
            "overlap": pa.array([], pa.float64())})
        if len(g) == 0:
            return empty
        out_a, out_b, out_o = [], [], []
        for cell, gc in g.groupby("cell", sort=False):
            side = gc["side"].to_numpy(np.int8)
            na = int((side == 0).sum())
            nb = len(gc) - na
            if na == 0 or nb == 0:
                continue
            if max(na, nb) > max_cell_side:
                raise ValueError(
                    f"cell {cell} holds {max(na, nb)} intervals on "
                    f"one side > max_cell_side={max_cell_side}; "
                    "widen cell_width or pre-split the pile")
            ai = side == 0
            a_id = gc["iid"].to_numpy(np.int64)[ai]
            a_s = gc["s"].to_numpy(np.float64)[ai]
            a_e = gc["e"].to_numpy(np.float64)[ai]
            b_id = gc["iid"].to_numpy(np.int64)[~ai]
            b_s = gc["s"].to_numpy(np.float64)[~ai]
            b_e = gc["e"].to_numpy(np.float64)[~ai]
            lo = np.maximum(a_s[:, None], b_s[None, :])
            hi = np.minimum(a_e[:, None], b_e[None, :])
            ok = lo <= hi
            # exactly-once: emit only from the cell holding the
            # overlap's left edge
            own = np.floor(lo / cw).astype(np.int64) == cell
            ok &= own
            ia, ib = np.nonzero(ok)
            if len(ia) == 0:
                continue
            out_a.append(a_id[ia])
            out_b.append(b_id[ib])
            out_o.append((hi - lo)[ia, ib])
        if not out_a:
            return empty
        return pa.table({
            "a_id": pa.array(np.concatenate(out_a)),
            "b_id": pa.array(np.concatenate(out_b)),
            "overlap": pa.array(np.concatenate(out_o))})

    out, n = J.solidify(bucketed_group_apply(rows, "cell",
                                             cell_kernel))
    if n == 0:
        return empty_out
    return out

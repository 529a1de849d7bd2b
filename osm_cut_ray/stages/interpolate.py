"""Inverse-distance-weighted (IDW) spatial interpolation: estimate a
value at each query point from the samples within `eps` — sensor
gridding, elevation fill, coverage smoothing.

Composes the two-table spatial join (stages/spatial_join.py): ONE
eps-grid shuffle yields (query, sample, dist) candidate rows, sample
values attach through a bucketed Arrow join, and one query-bucket
shuffle folds the weighted mean. Queries with no sample within eps
are ABSENT from the output (pinned; callers outer-join if they need
NaN rows).

Determinism contract (pinned by tests/test_interpolate.py):
- weights w = dist^-power, folded in (dist, sample_id) order so float
  sums are bit-reproducible across partitionings;
- an exact hit (dist == 0) short-circuits the singularity: the result
  is that sample's value (min sample id if several are co-located).
- `k` restricts to each query's k nearest samples (the spatial_join
  tie rules).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .join import bucketed_attach_column, bucketed_group_apply
from .spatial_join import distance_join


def idw_interpolate(queries_ds, samples_ds, *, eps: float,
                    power: float = 2.0, k: int | None = None,
                    value_col: str = "value",
                    q_id: str = "id", q_x: str = "lon", q_y: str = "lat",
                    s_id: str = "id", s_x: str = "lon", s_y: str = "lat",
                    max_cell_pairs: int = 1_000_000):
    """-> Dataset (id, value, n_used): IDW estimate per query point
    that has >= 1 sample within eps. Capped cells surface sentinel
    rows from `distance_join` — they are dropped here after counting
    (printed), never silently."""
    pairs = distance_join(
        queries_ds, samples_ds, eps=eps, k=k,
        max_cell_pairs=max_cell_pairs,
        a_id=q_id, a_x=q_x, a_y=q_y,
        b_id=s_id, b_x=s_x, b_y=s_y).materialize()

    import pyarrow.compute as pc
    n_capped = 0

    def drop_sent(t: pa.Table) -> pa.Table:
        nonlocal n_capped
        cap = pc.equal(t["a_id"], -1)
        n_capped += int(pc.sum(pc.cast(cap, pa.int64())).as_py() or 0)
        return t.filter(pc.invert(cap))

    pairs = pairs.map_batches(drop_sent, batch_format="pyarrow") \
        .materialize()
    if n_capped:
        print(f"idw_interpolate: {n_capped} over-cap grid cells "
              f"dropped (raise max_cell_pairs)")
    empty = pa.table({"id": pa.array([], pa.int64()),
                      "value": pa.array([], pa.float64()),
                      "n_used": pa.array([], pa.int64())})
    if pairs.count() == 0:
        import ray.data
        return ray.data.from_arrow(empty)

    vals = samples_ds.map_batches(
        lambda t: pa.table({
            "id": t[s_id].cast(pa.int64()),
            "__v": t[value_col].cast(pa.float64())}),
        batch_format="pyarrow").materialize()
    pairs = bucketed_attach_column(pairs, "b_id", vals, "id", "__v")

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return empty
        # pinned fold order: (query, dist, sample)
        g = g.sort_values(["a_id", "dist", "b_id"], kind="mergesort")
        a = g["a_id"].to_numpy(np.int64)
        d = g["dist"].to_numpy(np.float64)
        v = g["__v"].to_numpy(np.float64)
        starts = np.concatenate(
            ([0], np.flatnonzero(a[1:] != a[:-1]) + 1, [len(a)]))
        first = starts[:-1]
        out_id = a[first]
        out_n = (starts[1:] - first).astype(np.int64)
        # vectorized segment folds (reduceat is the same sequential
        # in-order sum as a per-group loop); zero-dist rows get w = 0
        # — their groups are overridden by the exact-hit rule below
        with np.errstate(divide="ignore"):
            w = np.where(d > 0, d ** -power, 0.0)
        wsum = np.add.reduceat(w, first)
        wv = np.add.reduceat(w * v, first)
        with np.errstate(invalid="ignore"):
            out_v = wv / wsum
        exact = d[first] == 0.0  # first row per group is (dist, id)-min
        out_v[exact] = v[first[exact]]
        return pa.table({"id": pa.array(out_id),
                         "value": pa.array(out_v),
                         "n_used": pa.array(out_n)})

    return bucketed_group_apply(pairs, "a_id", per_bucket)

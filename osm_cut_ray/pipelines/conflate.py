"""POI conflation: match the same real-world place across two
datasets (the OSM-vs-external-gazetteer merge every map pipeline
runs) — spatial candidates, then a name gate, then best-match
selection.

Composition of existing verified machinery, no new kernels:

1. `spatial_join.distance_join(eps)` — cell-bucketed candidate
   pairs (never all-pairs); over-cap cells surface sentinels, which
   this pipeline DROPS with a printed report.
2. two `join.bucketed_attach_column` passes hang both names onto
   the slim pair rows (materialized between attaches — the repo's
   schema-peek rule).
3. `edit_join.banded_edit_distances` on casefolded names, keeping
   pairs within `name_d_max` edits — vectorized across pairs.
4. optional best-match per A id: (name_dist, dist, b_id)
   lexicographic minimum, one bucketed fold.

Names never ride the spatial shuffle; pair rows are 3 int64s until
the name gate. Pinned against a pure-Python replay in
tests/test_conflate.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _fold_name(arr) -> list[str]:
    return [("" if v is None else str(v)).casefold().strip()
            for v in arr]


def conflate_pois(a_ds, b_ds, *, eps: float, name_d_max: int = 2,
                  best_only: bool = True,
                  a_id: str = "id", a_x: str = "lon", a_y: str = "lat",
                  a_name: str = "name",
                  b_id: str = "id", b_x: str = "lon", b_y: str = "lat",
                  b_name: str = "name",
                  max_cell_pairs: int = 1_000_000,
                  num_buckets: int = 64):
    """-> Dataset (a_id, b_id, dist, name_dist): spatially close
    pairs whose casefolded names are within `name_d_max` edits;
    with best_only, each A id keeps its (name_dist, dist, b_id)
    minimum."""
    from ..stages.edit_join import banded_edit_distances
    from ..stages.join import (bucketed_attach_column,
                               bucketed_group_apply)
    from ..stages.spatial_join import distance_join

    pairs = distance_join(
        a_ds, b_ds, eps=eps, max_cell_pairs=max_cell_pairs,
        a_id=a_id, a_x=a_x, a_y=a_y,
        b_id=b_id, b_x=b_x, b_y=b_y)

    def drop_sentinels(t: pa.Table) -> pa.Table:
        aid = t["a_id"].to_numpy(zero_copy_only=False)
        bad = int((aid == -1).sum())
        if bad:
            print(f"conflate_pois: {bad} over-cap cell sentinel "
                  "row(s) dropped — raise max_cell_pairs to include")
        return t.filter(pa.array(aid != -1))

    pairs = pairs.map_batches(drop_sentinels,
                              batch_format="pyarrow").materialize()

    def names_of(ds, id_col, name_col, out):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({
                "nid": t[id_col].cast(pa.int64()),
                out: t[name_col].cast(pa.large_string())})
        return ds.map_batches(fn, batch_format="pyarrow")\
            .materialize()

    pairs = bucketed_attach_column(
        pairs, "a_id", names_of(a_ds, a_id, a_name, "a_nm"),
        "nid", "a_nm", num_buckets=num_buckets).materialize()
    pairs = bucketed_attach_column(
        pairs, "b_id", names_of(b_ds, b_id, b_name, "b_nm"),
        "nid", "b_nm", num_buckets=num_buckets)

    def name_gate(t: pa.Table) -> pa.Table:
        empty = pa.table({"a_id": pa.array([], pa.int64()),
                          "b_id": pa.array([], pa.int64()),
                          "dist": pa.array([], pa.float64()),
                          "name_dist": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        an = _fold_name(t["a_nm"].to_pylist())
        bn = _fold_name(t["b_nm"].to_pylist())
        nd = banded_edit_distances(an, bn, name_d_max)
        keep = nd <= name_d_max
        if not keep.any():
            return empty
        return pa.table({
            "a_id": t["a_id"].to_numpy(zero_copy_only=False)[keep],
            "b_id": t["b_id"].to_numpy(zero_copy_only=False)[keep],
            "dist": t["dist"].to_numpy(zero_copy_only=False)[keep],
            "name_dist": nd[keep].astype(np.int64)})

    matched = pairs.map_batches(name_gate, batch_format="pyarrow")
    if not best_only:
        return matched

    def best(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({"a_id": pa.array([], pa.int64()),
                             "b_id": pa.array([], pa.int64()),
                             "dist": pa.array([], pa.float64()),
                             "name_dist": pa.array([], pa.int64())})
        order = np.lexsort((g["b_id"].to_numpy(),
                            g["dist"].to_numpy(),
                            g["name_dist"].to_numpy(),
                            g["a_id"].to_numpy()))
        aid = g["a_id"].to_numpy()[order]
        first = np.concatenate(([True], aid[1:] != aid[:-1]))
        sel = order[first]
        return pa.table({
            "a_id": g["a_id"].to_numpy()[sel].astype(np.int64),
            "b_id": g["b_id"].to_numpy()[sel].astype(np.int64),
            "dist": g["dist"].to_numpy()[sel],
            "name_dist": g["name_dist"].to_numpy()[sel]
            .astype(np.int64)})

    return bucketed_group_apply(matched, "a_id", best,
                                num_buckets=num_buckets)

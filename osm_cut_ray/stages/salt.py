"""Hot-cell skew splitting ("salting", north_star requirement).

Spatial keys are Zipfian: polygon-boundary cells and dense-city cells
concentrate rows, and a plain groupby(cell) makes one reducer eat the
hot cell (SURVEY §4 skew row). The standard fix:

1. cheap pre-pass histogram: per-batch partial counts -> tiny
   groupby -> hot set = cells above a row threshold;
2. map: salted_key = (cell, row_hash % split_factor) for hot cells,
   (cell, 0) otherwise — encoded into one int64 (cell ^ salt in the
   low bits reserved by the caller's key layout; here a struct of two
   columns to stay layout-agnostic);
3. aggregate per salted key, then a second tiny aggregate per cell
   merges the salt buckets (sums/counts/mins merge associatively).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data.aggregate import Sum


def cell_histogram(ds, cell_col: str = "cell"):
    """Pre-pass per-cell row counts (combiner + small groupby)."""
    def partial(t: pa.Table) -> pa.Table:
        cells, counts = np.unique(
            t[cell_col].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({cell_col: cells, "n": counts.astype(np.int64)})

    return ds.map_batches(partial, batch_format="pyarrow")\
        .groupby(cell_col).aggregate(Sum("n", alias_name="n"))


def hot_cells(ds, cell_col: str = "cell",
              threshold_rows: int = 1_000_000) -> np.ndarray:
    """Cells whose row count exceeds the per-reducer comfort level."""
    hist = cell_histogram(ds, cell_col)
    out = []
    for t in hist.iter_batches(batch_size=None, batch_format="pyarrow"):
        mask = np.asarray(t["n"].to_numpy(zero_copy_only=False)) \
            > threshold_rows
        out.append(np.asarray(
            t[cell_col].to_numpy(zero_copy_only=False))[mask])
    return np.concatenate(out) if out else np.array([], np.int64)


def with_salted_key(ds, cell_col: str, hot: np.ndarray,
                    split_factor: int = 16, row_key_col: str | None = None,
                    out_col: str = "salt"):
    """Append a salt column: 0 for cold cells, hash(row) % factor for
    hot ones. Group by [cell_col, out_col] for the skew-free shuffle,
    then merge salt buckets per cell in a second (tiny) aggregate."""
    hot_ref = ray.put(np.asarray(hot, np.int64))

    def add_salt(t: pa.Table) -> pa.Table:
        hot_arr = ray.get(hot_ref)
        cells = t[cell_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if row_key_col is not None:
            rk = t[row_key_col].to_numpy(zero_copy_only=False)\
                .astype(np.int64)
        else:
            rk = np.arange(len(t), dtype=np.int64)
        salt = ((rk * np.int64(0x9E3779B1)) % np.int64(split_factor))\
            .astype(np.int64)
        is_hot = np.isin(cells, hot_arr)
        return t.append_column(out_col,
                               pa.array(np.where(is_hot, salt, 0)))

    return ds.map_batches(add_salt, batch_format="pyarrow")


def salted_cell_counts(ds, cell_col: str = "cell",
                       hot_threshold: int = 1_000_000,
                       split_factor: int = 16):
    """Per-cell row counts with automatic hot-cell splitting: the
    canonical two-stage (salted partial -> per-cell merge) aggregate.
    Result equals a plain groupby(cell).count() but no reducer sees
    more than ~threshold rows."""
    hot = hot_cells(ds, cell_col, hot_threshold)
    salted = with_salted_key(ds, cell_col, hot, split_factor)

    def partial(t: pa.Table) -> pa.Table:
        tg = t.select([cell_col, "salt"]).group_by([cell_col, "salt"])\
            .aggregate([([], "count_all")])
        return tg.rename_columns([cell_col, "salt", "n"])

    per_salt = salted.map_batches(partial, batch_format="pyarrow")\
        .groupby([cell_col, "salt"]).aggregate(Sum("n", alias_name="n"))
    # second stage: merge salt buckets per cell (tiny)
    return per_salt.groupby(cell_col).aggregate(Sum("n", alias_name="n"))

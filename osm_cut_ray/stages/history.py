"""History snapshots (the `osmium time-filter` analog, generalized).

A full-history corpus holds EVERY version of each object (id,
version, timestamp, optional visible flag). `snapshot_at` rebuilds
the state as of time T: each object's LATEST version with
timestamp <= T — (timestamp, version) lexicographic latest, the OSM
rule — dropped when that version is a deletion (`visible=False`).
The same operation is the generic slowly-changing-dimension
snapshot, so it takes any table with those three columns.

Ray-Data shape: ONE bucketed fold on the object id (all versions of
an id share a bucket); inside a bucket one lexsort picks every
object's winning version with no per-id Python. Timestamps compare
as ISO-8601 strings (which order correctly) or any orderable dtype.

DuckDB-pinned in tests/test_history.py (row_number() OVER
(PARTITION BY id ORDER BY ts DESC, version DESC) == 1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def snapshot_at(ds, at_ts, *, id_col: str = "id",
                version_col: str = "version",
                ts_col: str = "timestamp",
                visible_col: str | None = None,
                num_buckets: int | None = None):
    """-> Dataset: the full rows of each id's latest version with
    `ts_col` <= at_ts (ties by highest version); rows whose winning
    version has `visible_col` == False are dropped entirely."""
    from .join import bucketed_group_apply

    def pre(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mask = pc.and_(pc.is_valid(t[ts_col]),
                       pc.less_equal(t[ts_col], at_ts))
        return t.filter(mask)

    filtered = ds.map_batches(pre, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            out = pa.Table.from_pandas(g, preserve_index=False)
            return out.replace_schema_metadata(None)
        ids = g[id_col].to_numpy()
        ver = g[version_col].to_numpy()
        ts = g[ts_col].to_numpy()
        order = np.lexsort((ver, ts, ids))
        last = np.concatenate((ids[order][1:] != ids[order][:-1],
                               [True]))
        win = g.iloc[order[last]]
        if visible_col is not None:
            win = win[win[visible_col].astype(bool)]
        return pa.Table.from_pandas(win, preserve_index=False)\
            .replace_schema_metadata(None)

    return bucketed_group_apply(filtered, id_col, per_bucket,
                                num_buckets=num_buckets)


def version_churn(ds, *, id_col: str = "id",
                  version_col: str = "version",
                  num_buckets: int | None = None):
    """-> Dataset (id, n_versions, min_version, max_version): per-
    object edit intensity (the history-analysis companion). One
    bucketed fold over a slim projection."""
    from .join import bucketed_group_apply

    slim = ds.select_columns([id_col, version_col])

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({"id": pa.array([], pa.int64()),
                             "n_versions": pa.array([], pa.int64()),
                             "min_version": pa.array([], pa.int64()),
                             "max_version": pa.array([], pa.int64())})
        agg = g.groupby(id_col)[version_col]\
            .agg(["size", "min", "max"])
        return pa.table({
            "id": pa.array(agg.index.to_numpy(np.int64)),
            "n_versions": pa.array(agg["size"].to_numpy(np.int64)),
            "min_version": pa.array(agg["min"].to_numpy(np.int64)),
            "max_version": pa.array(agg["max"].to_numpy(np.int64))})

    return bucketed_group_apply(slim, id_col, per_bucket,
                                num_buckets=num_buckets)

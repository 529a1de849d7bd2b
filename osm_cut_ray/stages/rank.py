"""Distributed global ranking over one value column: row_number,
rank, dense_rank, percent_rank and ntile — the window functions a
feature pipeline needs globally (score percentiles, decile bucketing)
that naively require a full sort plus a sequential scan.

Semantics are pinned to DuckDB window functions over
`ORDER BY v, id` (ties in v broken by id for row_number/ntile;
rank/dense_rank/percent_rank depend on v only):
- rank      = 1 + count(v' < v)            (competition rank)
- dense     = 1 + distinct-count(v' < v)
- percent   = (rank - 1) / (n - 1), 0.0 when n == 1
- ntile(k)  = DuckDB rule: the first n%k tiles get ceil(n/k) rows
              in row_number order.

Distributed shape (the stages/blocking.py range-bucket recipe):
EXACT-quantile split values (stages/quantile.py — deterministic
histogram radix, no sampling) define B value ranges; rows shuffle
ONCE to their range bucket (equal values always share a bucket, so
no tie spans buckets); each bucket sorts locally by (v, id) and
emits LOCAL row/rank/dense; per-bucket (count, distinct) fold to the
driver (B rows), cumulative offsets broadcast back inside a closure;
one final vectorized map adds offsets and derives percent/ntile.
Total: one data shuffle + one tiny aggregate + one map pass.

NaN/null values are EXCLUDED (documented; DuckDB sorts NULLs last —
filter first if you need them ranked). `max_key_rows` caps a
degenerate single-value corpus (every equal value must co-locate).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from . import join as J
from .join import bucketed_group_apply
from .quantile import quantiles

_EMPTY = pa.table({
    "id": pa.array([], pa.int64()),
    "value": pa.array([], pa.float64()),
    "row_number": pa.array([], pa.int64()),
    "rank": pa.array([], pa.int64()),
    "dense_rank": pa.array([], pa.int64()),
    "percent_rank": pa.array([], pa.float64()),
    "ntile": pa.array([], pa.int64())})


def _ntile(rn: np.ndarray, n: int, k: int) -> np.ndarray:
    """DuckDB/standard NTILE: first n%k tiles take ceil(n/k) rows."""
    size_small = n // k
    n_big = n % k
    size_big = size_small + 1
    cut = n_big * size_big
    tile = np.where(
        rn <= cut,
        (rn - 1) // max(size_big, 1) + 1,
        n_big + (rn - 1 - cut) // max(size_small, 1) + 1)
    return np.minimum(tile, k).astype(np.int64)


def global_rank(ds, *, id_col: str, val_col: str,
                n_buckets: int = 64, ntile_k: int = 10,
                max_key_rows: int | None = None):
    """-> Dataset (id, value, row_number, rank, dense_rank,
    percent_rank, ntile)."""
    if n_buckets < 1 or ntile_k < 1:
        raise ValueError("n_buckets and ntile_k must be >= 1")
    import ray.data as rd

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or val_col not in t.column_names:
            return pa.table({"id": pa.array([], pa.int64()),
                             "value": pa.array([], pa.float64())})
        tt = pa.table({
            "id": pc.cast(t[id_col], pa.int64()),
            "value": pc.cast(t[val_col], pa.float64())})
        return tt.filter(pc.and_(
            pc.is_valid(tt["value"]),
            pc.invert(pc.is_nan(tt["value"]))))

    slim_ds = ds.map_batches(slim, batch_format="pyarrow") \
        .materialize()
    n = slim_ds.count()
    if n == 0:
        return rd.from_arrow(_EMPTY)

    qs = [i / n_buckets for i in range(1, n_buckets)]
    splits = quantiles(slim_ds, "value", qs)["value"] \
        .to_numpy(zero_copy_only=False).astype(np.float64) \
        if n_buckets > 1 else np.array([], np.float64)
    splits = np.unique(splits)

    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"id": pa.array([], pa.int64()),
                             "value": pa.array([], pa.float64()),
                             "bkt": pa.array([], pa.int64())})
        v = t["value"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bkt", pa.array(np.searchsorted(splits, v, side="left")
                            .astype(np.int64)))

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({
                "id": pa.array([], pa.int64()),
                "value": pa.array([], pa.float64()),
                "bkt": pa.array([], pa.int64()),
                "l_rn": pa.array([], pa.int64()),
                "l_rank": pa.array([], pa.int64()),
                "l_dense": pa.array([], pa.int64())})
        bkt = g["bkt"].to_numpy(np.int64)
        rid = g["id"].to_numpy(np.int64)
        val = g["value"].to_numpy(np.float64)
        order = np.lexsort((rid, val, bkt))
        bkt, rid, val = bkt[order], rid[order], val[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(bkt[1:] != bkt[:-1]) + 1))
        seg = np.zeros(len(bkt), np.int64)
        seg[starts] = 1
        seg_id = np.cumsum(seg) - 1
        pos = np.arange(len(bkt), dtype=np.int64)
        l_rn = pos - starts[seg_id] + 1
        # first row of each value-run within its bucket
        first = np.concatenate(
            ([True], (val[1:] != val[:-1]) | (bkt[1:] != bkt[:-1])))
        l_rank = l_rn[np.maximum.accumulate(
            np.where(first, pos, 0))] if len(bkt) else l_rn
        l_dense = np.cumsum(first) - np.cumsum(first)[
            starts[seg_id]] + 1
        return pa.table({
            "id": pa.array(rid), "value": pa.array(val),
            "bkt": pa.array(bkt), "l_rn": pa.array(l_rn),
            "l_rank": pa.array(l_rank), "l_dense": pa.array(l_dense)})

    local, n2 = J.solidify(bucketed_group_apply(
        slim_ds.map_batches(tag, batch_format="pyarrow"), "bkt",
        fold, max_key_rows=max_key_rows))
    assert n2 == n

    # per-bucket (count, distinct) -> cumulative offsets (B rows)
    def stats(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"bkt": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        df = t.to_pandas().groupby("bkt").agg(
            cnt=("l_rn", "max"), dst=("l_dense", "max"))
        return pa.table({
            "bkt": pa.array(df.index.to_numpy(np.int64)),
            "cnt": pa.array(df["cnt"].to_numpy(np.int64)),
            "dst": pa.array(df["dst"].to_numpy(np.int64))})

    st = pa.concat_tables(
        [pa.table(b) for b in local.map_batches(
            stats, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow")
         if b.num_rows]).to_pandas().groupby("bkt").max()
    st = st.sort_index()
    off_cnt = {int(b): int(c) for b, c in zip(
        st.index, np.concatenate(([0], st["cnt"].cumsum()
                                  .to_numpy()[:-1])))}
    off_dst = {int(b): int(c) for b, c in zip(
        st.index, np.concatenate(([0], st["dst"].cumsum()
                                  .to_numpy()[:-1])))}

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMPTY
        bkt = t["bkt"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(bkt, return_inverse=True)
        ocnt = np.array([off_cnt[int(b)] for b in u], np.int64)[inv]
        odst = np.array([off_dst[int(b)] for b in u], np.int64)[inv]
        rn = t["l_rn"].to_numpy(zero_copy_only=False) + ocnt
        rank = t["l_rank"].to_numpy(zero_copy_only=False) + ocnt
        dense = t["l_dense"].to_numpy(zero_copy_only=False) + odst
        pct = (rank - 1) / (n - 1) if n > 1 else \
            np.zeros(len(rn), np.float64)
        return pa.table({
            "id": t["id"], "value": t["value"],
            "row_number": pa.array(rn),
            "rank": pa.array(rank),
            "dense_rank": pa.array(dense),
            "percent_rank": pa.array(
                pct if n > 1 else np.zeros(len(rn))),
            "ntile": pa.array(_ntile(rn, n, ntile_k))})

    return local.map_batches(finish, batch_format="pyarrow")

"""Sorted-neighborhood blocking for entity resolution (Hernández &
Stolfo 1995): sort all records by a blocking key and emit every
candidate pair within a sliding window of `window` positions in the
GLOBAL sort order.

Distributed shape (no Ray-sort block introspection needed): the key
is encoded order-preservingly into a float64 (first 8 utf-8 bytes as
a big-endian integer — bytewise prefix order == bytewise string
order), bucket split points come from the repo's EXACT distributed
quantile selection (stages/quantile.py — deterministic, no
sampling), rows shuffle ONCE to their key-range bucket, and each
bucket sorts locally by the FULL byte key (ties by id). Equal
encoded keys always land in one bucket, so cross-bucket order is
exact. Within-bucket pairs are vectorized shifts; boundary pairs
(tail of bucket b x head of bucket b+1, global rank distance d1 +
d2 <= window - 1) go through a second tiny shuffle of 2(window-1)
rows per bucket.

Caps (RAISE, never silently wrong): a non-empty bucket smaller than
`window` would let pairs span 3+ buckets — the stage RAISES with
"fewer buckets" advice; `max_key_rows` guards degenerate key piles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import join as J
from .join import bucketed_group_apply
from .quantile import quantiles


def _encode_keys(keys: "pd.Series") -> np.ndarray:
    """First 8 utf-8 bytes, big-endian -> exact float64 of the
    uint64 >> 11 (53-bit mantissa-safe; order-preserving on the
    truncated prefix)."""
    raw = [s.encode("utf-8")[:8].ljust(8, b"\x00")
           for s in keys.astype(str).tolist()]
    arr = np.frombuffer(b"".join(raw), dtype=">u8") \
        .astype(np.uint64)
    return (arr >> np.uint64(11)).astype(np.float64)


def sorted_neighborhood_pairs(ds, *, id_col: str, key_col: str,
                              window: int = 5,
                              num_buckets: int | None = None,
                              max_key_rows: int | None = None):
    """-> Dataset (a_id, b_id): all record pairs within `window`
    positions of each other in the (key, id) sort order, a_id at the
    earlier position."""
    if window < 2:
        raise ValueError("window must be >= 2")
    import ray.data as rd

    if num_buckets is None:
        num_buckets = J.cluster_parts()

    def slim(t: pa.Table) -> pa.Table:
        if len(t) == 0 or key_col not in t.column_names:
            return pa.table({"id": pa.array([], pa.int64()),
                             "key": pa.array([], pa.string()),
                             "enc": pa.array([], pa.float64())})
        keys = pd.Series(t[key_col].to_pylist()).astype(str)
        return pa.table({
            "id": pa.compute.cast(t[id_col], pa.int64()),
            "key": pa.array(keys.tolist(), pa.string()),
            "enc": pa.array(_encode_keys(keys))})

    rows, n_rows = J.solidify(
        ds.map_batches(slim, batch_format="pyarrow"))
    if n_rows == 0:
        return rd.from_arrow(pa.table({
            "a_id": pa.array([], pa.int64()),
            "b_id": pa.array([], pa.int64())}))
    rows = rows.materialize()

    n_buckets = int(min(num_buckets,
                        max(1, n_rows // max(4 * window, 16))))
    if n_buckets > 1:
        qs = [i / n_buckets for i in range(1, n_buckets)]
        splits = np.unique(
            quantiles(rows, "enc", qs)["value"].to_numpy())
    else:
        splits = np.array([], np.float64)

    def tag(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "enc" not in t.column_names:
            return pa.table({"id": pa.array([], pa.int64()),
                             "key": pa.array([], pa.string()),
                             "bkt": pa.array([], pa.int64())})
        enc = t["enc"].to_numpy(zero_copy_only=False)
        bkt = np.searchsorted(splits, enc, side="right") \
            .astype(np.int64)
        return pa.table({"id": t["id"], "key": t["key"],
                         "bkt": pa.array(bkt)})

    tagged = rows.map_batches(tag, batch_format="pyarrow")

    w1 = window - 1

    def bucket_fold(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({
            "kind": pa.array([], pa.int8()),
            "a_id": pa.array([], pa.int64()),
            "b_id": pa.array([], pa.int64()),
            "bnd": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
            "side": pa.array([], pa.int8())})
        if len(g) == 0:
            return empty
        out = []
        for bkt, gb in g.groupby("bkt", sort=False):
            gb = gb.sort_values(["key", "id"], kind="mergesort")
            ids = gb["id"].to_numpy(np.int64)
            n = len(ids)
            if n < window:
                raise ValueError(
                    f"bucket {bkt} holds {n} rows < window="
                    f"{window}: pairs would span 3+ buckets — "
                    "reduce num_buckets or window")
            a, b = [], []
            for d in range(1, window):
                a.append(ids[:-d])
                b.append(ids[d:])
            a = np.concatenate(a)
            b = np.concatenate(b)
            out.append(pa.table({
                "kind": pa.array(np.zeros(len(a), np.int8)),
                "a_id": pa.array(a), "b_id": pa.array(b),
                "bnd": pa.array(np.zeros(len(a), np.int64)),
                "pos": pa.array(np.zeros(len(a), np.int64)),
                "side": pa.array(np.zeros(len(a), np.int8))}))
            # tail -> boundary bkt (d1: 1-based from end)
            tail = ids[-w1:]
            d1 = np.arange(len(tail), 0, -1, dtype=np.int64)
            out.append(pa.table({
                "kind": pa.array(np.ones(len(tail), np.int8)),
                "a_id": pa.array(tail),
                "b_id": pa.array(np.zeros(len(tail), np.int64)),
                "bnd": pa.array(np.full(len(tail), bkt, np.int64)),
                "pos": pa.array(d1),
                "side": pa.array(np.zeros(len(tail), np.int8))}))
            # head -> boundary bkt - 1 (d2: 0-based from start)
            head = ids[:w1]
            d2 = np.arange(len(head), dtype=np.int64)
            out.append(pa.table({
                "kind": pa.array(np.ones(len(head), np.int8)),
                "a_id": pa.array(head),
                "b_id": pa.array(np.zeros(len(head), np.int64)),
                "bnd": pa.array(np.full(len(head), bkt - 1,
                                        np.int64)),
                "pos": pa.array(d2),
                "side": pa.array(np.ones(len(head), np.int8))}))
        return pa.concat_tables(out)

    mixed, _ = J.solidify(bucketed_group_apply(
        tagged, "bkt", bucket_fold, max_key_rows=max_key_rows))

    def split_pairs(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "kind" not in t.column_names:
            return pa.table({"a_id": pa.array([], pa.int64()),
                             "b_id": pa.array([], pa.int64())})
        m = pa.compute.equal(t["kind"], 0)
        f = t.filter(m)
        return pa.table({"a_id": f["a_id"], "b_id": f["b_id"]})

    inner = mixed.map_batches(split_pairs, batch_format="pyarrow")

    def boundary_rows(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "kind" not in t.column_names:
            return pa.table({"a_id": pa.array([], pa.int64()),
                             "bnd": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "side": pa.array([], pa.int8())})
        f = t.filter(pa.compute.equal(t["kind"], 1))
        return pa.table({"a_id": f["a_id"], "bnd": f["bnd"],
                         "pos": f["pos"], "side": f["side"]})

    def boundary_fold(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"a_id": pa.array([], pa.int64()),
                          "b_id": pa.array([], pa.int64())})
        if len(g) == 0:
            return empty
        out_a, out_b = [], []
        for bnd, gb in g.groupby("bnd", sort=False):
            if bnd < 0:
                continue
            side = gb["side"].to_numpy(np.int8)
            t_id = gb["a_id"].to_numpy(np.int64)[side == 0]
            d1 = gb["pos"].to_numpy(np.int64)[side == 0]
            h_id = gb["a_id"].to_numpy(np.int64)[side == 1]
            d2 = gb["pos"].to_numpy(np.int64)[side == 1]
            if len(t_id) == 0 or len(h_id) == 0:
                continue
            ok = (d1[:, None] + d2[None, :]) <= w1
            ia, ib = np.nonzero(ok)
            out_a.append(t_id[ia])
            out_b.append(h_id[ib])
        if not out_a:
            return empty
        return pa.table({
            "a_id": pa.array(np.concatenate(out_a)),
            "b_id": pa.array(np.concatenate(out_b))})

    bmix, n_b = J.solidify(mixed.map_batches(
        boundary_rows, batch_format="pyarrow"))
    if n_b > 0:
        cross = bucketed_group_apply(bmix, "bnd", boundary_fold)
        out = inner.union(cross)
    else:
        out = inner
    res, n_res = J.solidify(out)
    if n_res == 0:
        return rd.from_arrow(pa.table({
            "a_id": pa.array([], pa.int64()),
            "b_id": pa.array([], pa.int64())}))
    return res

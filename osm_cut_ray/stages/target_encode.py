"""Smoothed target encoding (mean encoding) for high-cardinality
categorical features — the classic tabular-ML prep step (Micci-
Barreca 2001), leave-one-out by default so a row never sees its own
label (the standard leakage guard).

Scale contract: per-key label sums are int64-QUANTIZED map-side
(house determinism rule — float partial sums would be partition-
order dependent) and combined with ONE small groupby over unique-key
partials; the per-key (sum, count) pair is then attached back to the
rows with a bucketed Arrow join (payload never reshuffled beyond
that one attach). The encoded value is computed from exact integer
sums with a FIXED float expression

    prior = (total_sum / total_cnt) / scale
    enc   = ((key_sum - own_q) / scale + m * prior) / (cnt - 1 + m)   # loo
    enc   = ( key_sum          / scale + m * prior) / (cnt     + m)   # plain

so results are bit-deterministic under any partitioning and bit-
reproducible in SQL (tests pin against DuckDB evaluating the same
expression). Keys must be int64; quantized per-key sums bound corpus
size at ~8.8e12 rows/key at the default 2^20 scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .join import bucketed_attach_column

_SCALE = 1 << 20


def target_encode(ds, *, key_col: str, target_col: str,
                  out_col: str = "te", m: float = 20.0,
                  loo: bool = True):
    """-> Dataset: the input rows plus `out_col` (float64 smoothed
    [leave-one-out] target mean of `target_col` per `key_col`)."""
    import ray.data

    if m <= 0:
        raise ValueError("smoothing m must be > 0 (loo singleton "
                         "groups divide by m)")

    def partial(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        q = np.rint(t[target_col].to_numpy(zero_copy_only=False)
                    .astype(np.float64) * _SCALE).astype(np.int64)
        u, inv = np.unique(k, return_inverse=True)
        sq = np.zeros(len(u), np.int64)
        np.add.at(sq, inv, q)
        cnt = np.bincount(inv, minlength=len(u)).astype(np.int64)
        return pa.table({"k": pa.array(u), "sq": pa.array(sq),
                         "cnt": pa.array(cnt)})

    parts = ds.map_batches(partial, batch_format="pyarrow") \
        .materialize()
    stats = parts.groupby("k").aggregate(
        ray.data.aggregate.Sum(on="sq", alias_name="sq"),
        ray.data.aggregate.Sum(on="cnt", alias_name="cnt")) \
        .materialize()
    tot = parts.aggregate(ray.data.aggregate.Sum(on="sq"),
                          ray.data.aggregate.Sum(on="cnt"))
    tsq = int(tot["sum(sq)"] or 0)
    tcnt = int(tot["sum(cnt)"] or 0)
    if tcnt == 0:
        return ds.map_batches(
            lambda t: t.append_column(out_col,
                                      pa.array([], pa.float64())),
            batch_format="pyarrow")
    prior = (tsq / tcnt) / _SCALE

    packed = stats.map_batches(
        lambda t: pa.table({
            "k": t["k"],
            "__te_stats": pa.array(
                np.stack([t["sq"].to_numpy(zero_copy_only=False),
                          t["cnt"].to_numpy(zero_copy_only=False)],
                         axis=1).tolist(),
                pa.list_(pa.int64()))}),
        batch_format="pyarrow")

    joined = bucketed_attach_column(ds, key_col, packed, "k",
                                    "__te_stats")

    def finish(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.drop_columns(["__te_stats"]).append_column(
                out_col, pa.array([], pa.float64()))
        st = np.asarray(t["__te_stats"].to_pylist(), np.int64)
        sq, cnt = st[:, 0], st[:, 1]
        q = np.rint(t[target_col].to_numpy(zero_copy_only=False)
                    .astype(np.float64) * _SCALE).astype(np.int64)
        # subtract in int64 FIRST (exact past 2^53), then one cast —
        # the same expression shape the SQL pin evaluates
        if loo:
            enc = ((sq - q) / _SCALE + m * prior) / (cnt - 1 + m)
        else:
            enc = (sq / _SCALE + m * prior) / (cnt + m)
        return t.drop_columns(["__te_stats"]).append_column(
            out_col, pa.array(enc, pa.float64()))

    return joined.map_batches(finish, batch_format="pyarrow")

"""Per-key mergeable sketches: approximate COUNT(DISTINCT v) GROUP BY
key via HyperLogLog and approximate per-key quantiles via KLL — the
100-TB replacement for exact per-key distinct/quantile shuffles
(exact needs every value to transit the exchange; sketches shrink a
key's contribution to a fixed-size register blob).

Execution shape:
- map side: ONE vectorized pass per batch — values are hashed with
  the repo's recursive Arrow row hash (`diff.py:row_content_hashes`,
  any column type), then ALL per-key HLL registers in the batch are
  built with a single `np.maximum.at` on a (local_key x m) composite
  index. No per-row Python; the per-unique-key loop exists only for
  KLL (bounded by batch key cardinality, and each add() is
  vectorized over that key's values).
- fold side: ONE bucketed shuffle of (key, register-blob) rows; HLL
  merge is an elementwise max (register order is a lattice join, so
  the estimate is BIT-deterministic under any partitioning — pinned);
  KLL merge is deterministic but compaction depends on arrival order,
  so the pin is the published rank-error envelope, not bit equality.

Pinned against DuckDB `count(DISTINCT ...) GROUP BY` (relative-error
envelope) and exact numpy quantiles (rank error).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import join as J
from .diff import row_content_hashes
from .join import bucketed_group_apply
from ..functions.hll import HyperLogLog
from ..functions.sketch import KLL


def _hll_partials(ds, key_col: str, value_col: str, p: int):
    m = 1 << p

    def part(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "key": pa.array([], pa.int64()),
            "regs": pa.array([], pa.large_binary())})
        if len(t) == 0 or key_col not in t.column_names:
            return empty
        key = t[key_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        hv = row_content_hashes(t.select([value_col]),
                                [value_col]).view(np.uint64)
        # splitmix-style finalize is already inside the row hash;
        # derive register index + rank from the 64-bit value
        idx = (hv >> np.uint64(64 - p)).astype(np.int64)
        rest = ((hv << np.uint64(p))
                | np.uint64(1 << (p - 1)))
        rank = np.zeros(len(hv), np.uint8)
        cur = rest
        for shift in (32, 16, 8, 4, 2, 1):
            mask = cur < (np.uint64(1) << np.uint64(64 - shift))
            rank[mask] += shift
            cur = np.where(mask, cur << np.uint64(shift), cur)
        rank += 1
        uk, inv = np.unique(key, return_inverse=True)
        flat = np.zeros(len(uk) * m, np.uint8)
        np.maximum.at(flat, inv * m + idx, rank)
        regs = flat.reshape(len(uk), m)
        return pa.table({
            "key": pa.array(uk),
            "regs": pa.array([r.tobytes() for r in regs],
                             pa.large_binary())})

    return ds.map_batches(part, batch_format="pyarrow")


def approx_distinct_by_key(ds, *, key_col: str, value_col: str,
                           p: int = 12):
    """-> Dataset (key int64, distinct_est int64). ~1.04/sqrt(2^p)
    relative error (p=12 -> ~1.6%). Bit-deterministic under any
    partitioning (register max is order-free)."""
    parts = _hll_partials(ds, key_col, value_col, p)
    m = 1 << p

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({
                "key": pa.array([], pa.int64()),
                "distinct_est": pa.array([], pa.int64())})
        key = g["key"].to_numpy(np.int64)
        stack = np.frombuffer(
            b"".join(g["regs"].tolist()), np.uint8
        ).reshape(len(g), m)
        order = np.argsort(key, kind="stable")
        key, stack = key[order], stack[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(key[1:] != key[:-1]) + 1))
        merged = np.maximum.reduceat(stack, starts, axis=0)
        ests = []
        for row in merged:
            h = HyperLogLog(p=p)
            h.registers = row.copy()
            ests.append(int(round(h.estimate())))
        return pa.table({
            "key": pa.array(key[starts]),
            "distinct_est": pa.array(np.array(ests, np.int64))})

    out, _ = J.solidify(bucketed_group_apply(parts, "key", fold))
    return out


def approx_quantiles_by_key(ds, *, key_col: str, value_col: str,
                            qs, k: int = 200):
    """-> Dataset (key int64, quantiles list<float64> — one value per
    entry of `qs`). KLL(k=200) -> ~1.3% rank error at 99% conf."""
    qs = [float(q) for q in qs]

    def part(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "key": pa.array([], pa.int64()),
            "blob": pa.array([], pa.large_binary())})
        if len(t) == 0 or key_col not in t.column_names:
            return empty
        key = t[key_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        val = t[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        order = np.argsort(key, kind="stable")
        key, val = key[order], val[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(key[1:] != key[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(key)]))
        keys_out, blobs = [], []
        for s, e in zip(starts, ends):
            sk = KLL(k=k)
            sk.add(val[s:e])
            keys_out.append(int(key[s]))
            blobs.append(sk.to_bytes())
        return pa.table({
            "key": pa.array(keys_out, pa.int64()),
            "blob": pa.array(blobs, pa.large_binary())})

    parts = ds.map_batches(part, batch_format="pyarrow")

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({
                "key": pa.array([], pa.int64()),
                "quantiles": pa.array([], pa.list_(pa.float64()))})
        keys_out, rows = [], []
        for key, sub in g.groupby("key", sort=True):
            sk = None
            for blob in sub["blob"]:
                cur = KLL.from_bytes(blob)
                sk = cur if sk is None else sk.merge(cur)
            keys_out.append(int(key))
            rows.append([sk.quantile(q) for q in qs])
        return pa.table({
            "key": pa.array(keys_out, pa.int64()),
            "quantiles": pa.array(rows, pa.list_(pa.float64()))})

    out, _ = J.solidify(bucketed_group_apply(parts, "key", fold))
    return out

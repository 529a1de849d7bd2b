"""Deterministic weighted sampling WITHOUT replacement, per key —
the Efraimidis–Spirakis (2006) priority sample: each row draws
u = uniform(0,1) and survives if its priority u^(1/w) is among the
key's k largest (log form log(u)/w used for numerical range). The
result is exactly a weighted k-sample without replacement.

The uniform is NOT an RNG stream: it is the splitmix64 finalizer of
(row id, seed) — the repo's dsir.py trick — so the sample is
bit-deterministic under any partitioning and any cluster size, and
re-runs are reproducible from (seed, ids) alone. Rows with w <= 0
never sample (they have priority -inf by convention).

Ray-Data shape: map-side priority (one hash per row, no shuffle),
then ONE bucketed per-key top-k fold over the slim (key, id,
priority) projection — payload bytes never transit the shuffle; use
the returned winner ids to semi-join the payload if full rows are
needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import join as J
from .join import bucketed_group_apply

_SM1 = np.uint64(0xBF58476D1CE4E5B9)
_SM2 = np.uint64(0x94D049BB133111EB)
_GOLD = np.uint64(0x9E3779B97F4A7C15)


def uniform_hash(ids: np.ndarray, seed: int) -> np.ndarray:
    """splitmix64(id + seed*golden) -> uniform open (0,1),
    bit-deterministic."""
    with np.errstate(over="ignore"):
        z = ids.astype(np.uint64) + np.uint64(seed) * _GOLD
        z = (z ^ (z >> np.uint64(30))) * _SM1
        z = (z ^ (z >> np.uint64(27))) * _SM2
        z = z ^ (z >> np.uint64(31))
    return ((z >> np.uint64(11)).astype(np.float64) + 0.5) \
        / float(1 << 53)


def weighted_sample_per_key(ds, *, key_col: str, id_col: str,
                            weight_col: str, k: int, seed: int = 0,
                            max_key_rows: int | None = None):
    """-> Dataset (key, id, weight, priority): up to k rows per key,
    weighted without replacement, deterministic in (seed, ids).
    Ties (identical priority, possible only via identical ids) break
    by id."""
    if k <= 0:
        raise ValueError("k must be >= 1")
    import ray.data as rd

    empty = pa.table({
        "key": pa.array([], pa.int64()),
        "id": pa.array([], pa.int64()),
        "weight": pa.array([], pa.float64()),
        "priority": pa.array([], pa.float64())})

    def slim(t: pa.Table) -> pa.Table:
        if len(t) == 0 or key_col not in t.column_names:
            return empty
        ids = t[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        w = t[weight_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        u = uniform_hash(ids, seed)
        with np.errstate(divide="ignore", invalid="ignore"):
            prio = np.where(w > 0, np.log(u) / w, -np.inf)
        return pa.table({
            "key": pa.compute.cast(t[key_col], pa.int64()),
            "id": pa.array(ids),
            "weight": pa.array(w),
            "priority": pa.array(prio)})

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return empty
        g = g[np.isfinite(g["priority"].to_numpy(np.float64))]
        if len(g) == 0:
            return empty
        g = g.sort_values(["key", "priority", "id"],
                          ascending=[True, False, True],
                          kind="mergesort")
        top = g.groupby("key", sort=False).head(k)
        return pa.table({
            "key": pa.array(top["key"].to_numpy(np.int64)),
            "id": pa.array(top["id"].to_numpy(np.int64)),
            "weight": pa.array(top["weight"].to_numpy(np.float64)),
            "priority": pa.array(
                top["priority"].to_numpy(np.float64))})

    out, n = J.solidify(bucketed_group_apply(
        ds.map_batches(slim, batch_format="pyarrow"), "key", fold,
        max_key_rows=max_key_rows))
    if n == 0:
        return rd.from_arrow(empty)
    return out

"""Distributed per-key heavy hitters with bounded memory: the
"top items per group" question (top tags per tile, top domains per
language, hot parts per region) answered without materializing
per-key exact count tables.

Ray-Data shape: each `map_batches` task builds ONE Misra-Gries sketch
per key present in the batch (vectorized adds; `functions/sketch.py`)
and emits slim (key, blob, n) rows; a single `bucketed_group_apply`
shuffle merges each key's sketches (Agarwal et al. mergeable-summary
merge) and emits the surviving items. Only sketch blobs — k counters
each — ever transit, so a key with a billion rows costs the same
shuffle bytes as a key with a thousand.

Guarantees (inherited from MG, pinned in tests): every item with true
frequency > n_key/(k+1) is present; estimates undercount by at most
n_key/(k+1); per-key row totals `n` are exact. Outputs are
deterministic for a fixed partitioning (merge order is normalized by
sorting blobs); across different partitionings the GUARANTEED items
are identical but near-threshold estimates may differ — the standard
mergeable-sketch trade, use exact groupby counts when bit-stable
output matters more than memory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.sketch import KLL, MisraGries
from .join import bucketed_group_apply


def _partial_sketches(t: pa.Table, key_col: str, item_col: str,
                      k: int) -> pa.Table:
    empty = pa.table({"key": pa.array([], pa.int64()),
                      "blob": pa.array([], pa.binary()),
                      "n": pa.array([], pa.int64())})
    if len(t) == 0 or key_col not in t.column_names:
        return empty
    keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
    items = t[item_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(keys, kind="stable")
    keys, items = keys[order], items[order]
    uk, starts = np.unique(keys, return_index=True)
    bounds = np.concatenate((starts, [len(keys)]))
    blobs = [MisraGries(k).add_int64(items[bounds[i]:bounds[i + 1]])
             .to_bytes() for i in range(len(uk))]
    return pa.table({"key": uk,
                     "blob": pa.array(blobs, pa.binary()),
                     "n": np.diff(bounds).astype(np.int64)})


def heavy_hitters_by_key(ds, key_col: str, item_col: str, *,
                         k: int = 64, min_frac: float = 0.01):
    """-> Dataset (key, item, est_count, n_key): per-key items whose
    MG estimate is >= min_frac * n_key. Both columns must be int64
    (hash strings first — the repo convention)."""

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "key": pd.Series(dtype=np.int64),
            "item": pd.Series(dtype=np.int64),
            "est_count": pd.Series(dtype=np.int64),
            "n_key": pd.Series(dtype=np.int64)})
        if len(g) == 0:
            return empty
        # normalize merge order so a fixed partitioning is reproducible
        g = g.sort_values(["key", "n", "blob"], kind="mergesort")
        out_k, out_i, out_c, out_n = [], [], [], []
        for key, grp in g.groupby("key", sort=False):
            mg = MisraGries(k)
            for b in grp["blob"]:
                mg.merge(MisraGries.from_bytes(bytes(b)))
            n_key = int(grp["n"].sum())
            for item, c in sorted(mg.heavy_hitters(min_frac).items()):
                out_k.append(key); out_i.append(item)
                out_c.append(c); out_n.append(n_key)
        return pd.DataFrame({
            "key": np.array(out_k, np.int64),
            "item": np.array(out_i, np.int64),
            "est_count": np.array(out_c, np.int64),
            "n_key": np.array(out_n, np.int64)})

    slim = ds.map_batches(
        lambda t: _partial_sketches(t, key_col, item_col, k),
        batch_format="pyarrow")
    return bucketed_group_apply(slim, "key", merge)


def quantiles_by_key(ds, key_col: str, value_col: str, *,
                     qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                     k: int = 200):
    """Per-key approximate quantiles with bounded memory: one KLL
    sketch per key per batch (slim blobs), ONE bucketed merge — the
    quantile sibling of `heavy_hitters_by_key` (per-cell latency
    percentiles, per-zone size distributions). Returns
    (key, n_key, q_<pct>...) rows; KLL rank error ~1.65/sqrt(k)."""

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"key": pa.array([], pa.int64()),
                          "blob": pa.array([], pa.binary()),
                          "n": pa.array([], pa.int64())})
        if len(t) == 0 or key_col not in t.column_names:
            return empty
        keys = t[key_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        vals = t[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        order = np.argsort(keys, kind="stable")
        keys, vals = keys[order], vals[order]
        uk, starts = np.unique(keys, return_index=True)
        bounds = np.concatenate((starts, [len(keys)]))
        blobs = [KLL(k).add(vals[bounds[i]:bounds[i + 1]]).to_bytes()
                 for i in range(len(uk))]
        return pa.table({"key": uk,
                         "blob": pa.array(blobs, pa.binary()),
                         "n": np.diff(bounds).astype(np.int64)})

    qcols = [f"q_{int(q * 100)}" for q in qs]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "key": pd.Series(dtype=np.int64),
            "n_key": pd.Series(dtype=np.int64),
            **{c: pd.Series(dtype=np.float64) for c in qcols}})
        if len(g) == 0:
            return empty
        g = g.sort_values(["key", "n", "blob"], kind="mergesort")
        out = {c: [] for c in ("key", "n_key", *qcols)}
        for key, grp in g.groupby("key", sort=False):
            sk = KLL(k)
            for b in grp["blob"]:
                sk.merge(KLL.from_bytes(bytes(b)))
            out["key"].append(key)
            out["n_key"].append(int(grp["n"].sum()))
            for q, c in zip(qs, qcols):
                out[c].append(float(sk.quantile(q)))
        return pd.DataFrame({
            "key": np.array(out["key"], np.int64),
            "n_key": np.array(out["n_key"], np.int64),
            **{c: np.array(out[c], np.float64) for c in qcols}})

    slim = ds.map_batches(partial, batch_format="pyarrow")
    return bucketed_group_apply(slim, "key", merge)

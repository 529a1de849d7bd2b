"""Per-key winsorization: clip each key's values to that key's own
exact [q_lo, q_hi] quantiles — the standard robust-scaling pass
before feature aggregation (outlier capping without dropping rows).

Quantile semantics match the repo's exact-quantile stage
(stages/quantile.py): the element at index floor(q * (n-1)) of the
key's sorted values (numpy method='lower'). NOTE: DuckDB
quantile_disc uses ceil(q*n)-1, which coincides with 'lower' only
when q*n is an integer — the two diverge on arbitrary group sizes.

Ray-Data shape: slim (key, id, value) projection, ONE bucketed
shuffle on the key, per-key vectorized sort + clip (all keys in a
bucket handled in one lexsort pass — no Python loop over rows).
Output is the slim projection plus (value_w, lo, hi); attach
`value_w` back to the payload by id if full rows are needed —
payload bytes never transit the shuffle. `max_key_rows` RAISES on
corpus-scale keys (the repo cap contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import join as J
from .join import bucketed_group_apply


def winsorize_per_key(ds, *, key_col: str, id_col: str,
                      val_col: str, q_lo: float = 0.01,
                      q_hi: float = 0.99,
                      max_key_rows: int | None = None):
    """-> Dataset (key, id, value, value_w, lo, hi)."""
    if not 0.0 <= q_lo <= q_hi <= 1.0:
        raise ValueError("need 0 <= q_lo <= q_hi <= 1")
    import ray.data as rd

    empty = pa.table({
        "key": pa.array([], pa.int64()),
        "id": pa.array([], pa.int64()),
        "value": pa.array([], pa.float64()),
        "value_w": pa.array([], pa.float64()),
        "lo": pa.array([], pa.float64()),
        "hi": pa.array([], pa.float64())})

    def slim(t: pa.Table) -> pa.Table:
        if len(t) == 0 or key_col not in t.column_names:
            return pa.table({"key": pa.array([], pa.int64()),
                             "id": pa.array([], pa.int64()),
                             "value": pa.array([], pa.float64())})
        return pa.table({
            "key": pa.compute.cast(t[key_col], pa.int64()),
            "id": pa.compute.cast(t[id_col], pa.int64()),
            "value": pa.compute.cast(t[val_col], pa.float64())})

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return empty
        key = g["key"].to_numpy(np.int64)
        rid = g["id"].to_numpy(np.int64)
        val = g["value"].to_numpy(np.float64)
        order = np.lexsort((val, key))
        key, rid, val = key[order], rid[order], val[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(key[1:] != key[:-1]) + 1))
        n = np.diff(np.concatenate((starts, [len(key)])))
        # per-key lower-quantile indices into the key-sorted values
        ilo = starts + np.floor(q_lo * (n - 1)).astype(np.int64)
        ihi = starts + np.floor(q_hi * (n - 1)).astype(np.int64)
        seg = np.zeros(len(key), np.int64)
        seg[starts] = 1
        seg_id = np.cumsum(seg) - 1
        lo = val[ilo][seg_id]
        hi = val[ihi][seg_id]
        return pa.table({
            "key": pa.array(key),
            "id": pa.array(rid),
            "value": pa.array(val),
            "value_w": pa.array(np.clip(val, lo, hi)),
            "lo": pa.array(lo),
            "hi": pa.array(hi)})

    out, n = J.solidify(bucketed_group_apply(
        ds.map_batches(slim, batch_format="pyarrow"), "key", fold,
        max_key_rows=max_key_rows))
    if n == 0:
        return rd.from_arrow(empty)
    return out

"""Per-key as-of join — match each left row to the most recent right
row at-or-before (backward) its timestamp; the canonical time-series
enrichment join (quotes->trades, telemetry->config, fix->weather)
that Ray Data lacks natively and DuckDB ships as ASOF JOIN.

Semantics (pinned to DuckDB `ASOF LEFT JOIN ... ON l.k = r.k AND
l.ts >= r.ts` in tests):
- backward join: the matched right row has the greatest r_ts <= l_ts
  (strict=True uses r_ts < l_ts);
- among right rows sharing that r_ts, the one with the LARGEST right
  id wins (deterministic; DuckDB leaves this unspecified, so the
  DuckDB pin uses unique (key, ts) right rows and duplicates are
  pinned against the brute spec);
- unmatched left rows emit null (r_ts, value) — a LEFT join.

Ray-Data shape: both sides slim-projected to (key, id, ts, value,
side) with typed-null padding (Ray `union` needs manually-aligned
schemas), ONE bucketed shuffle co-locating each key's rows from both
sides (the linkpred marker-row pattern — no second join to attach
sides), per-key vectorized `np.searchsorted` inside the bucket fold.
Payload columns beyond `value_col` should be re-attached by left id
(`stages/join.py:bucketed_attach_column`) — payload bytes never ride
the shuffle. `max_key_rows` RAISES on corpus-scale keys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from . import join as J
from .join import bucketed_group_apply

_EMPTY = pa.table({
    "id": pa.array([], pa.int64()),
    "key": pa.array([], pa.int64()),
    "ts": pa.array([], pa.int64()),
    "r_ts": pa.array([], pa.int64()),
    "value": pa.array([], pa.float64())})


def _ts_int(col):
    if pa.types.is_timestamp(col.type):
        return pc.cast(col, pa.int64())
    return pc.cast(col, pa.int64())


def asof_join(left_ds, right_ds, *, key_col: str, left_id_col: str,
              left_ts_col: str, right_id_col: str,
              right_ts_col: str, value_col: str,
              strict: bool = False,
              max_key_rows: int | None = None):
    """-> Dataset (id, key, ts, r_ts, value): one row per left row."""
    import ray.data as rd

    def slim_left(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return pa.table({
                "key": pa.array([], pa.int64()),
                "rid": pa.array([], pa.int64()),
                "ts": pa.array([], pa.int64()),
                "value": pa.array([], pa.float64()),
                "side": pa.array([], pa.int8())})
        n = t.num_rows
        return pa.table({
            "key": pc.cast(t[key_col], pa.int64()),
            "rid": pc.cast(t[left_id_col], pa.int64()),
            "ts": _ts_int(t[left_ts_col]),
            "value": pa.nulls(n, pa.float64()),
            "side": pa.array(np.ones(n, np.int8))})

    def slim_right(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return pa.table({
                "key": pa.array([], pa.int64()),
                "rid": pa.array([], pa.int64()),
                "ts": pa.array([], pa.int64()),
                "value": pa.array([], pa.float64()),
                "side": pa.array([], pa.int8())})
        n = t.num_rows
        return pa.table({
            "key": pc.cast(t[key_col], pa.int64()),
            "rid": pc.cast(t[right_id_col], pa.int64()),
            "ts": _ts_int(t[right_ts_col]),
            "value": pc.cast(t[value_col], pa.float64()),
            "side": pa.array(np.zeros(n, np.int8))})

    both = left_ds.map_batches(slim_left, batch_format="pyarrow") \
        .union(right_ds.map_batches(slim_right,
                                    batch_format="pyarrow"))

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return _EMPTY
        key = g["key"].to_numpy(np.int64)
        rid = g["rid"].to_numpy(np.int64)
        ts = g["ts"].to_numpy(np.int64)
        val = g["value"].to_numpy(np.float64)
        side = g["side"].to_numpy(np.int8)
        order = np.lexsort((rid, ts, side, key))
        key, rid, ts, val, side = (a[order] for a in
                                   (key, rid, ts, val, side))
        out_id, out_key, out_ts, out_rts, out_val, out_ok = \
            [], [], [], [], [], []
        starts = np.concatenate(
            ([0], np.flatnonzero(key[1:] != key[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(key)]))
        sd = "left" if strict else "right"
        for s, e in zip(starts, ends):
            is_l = side[s:e] == 1
            lts, lid = ts[s:e][is_l], rid[s:e][is_l]
            rts, rv = ts[s:e][~is_l], val[s:e][~is_l]
            if len(lts) == 0:
                continue
            # rights sorted by (ts, rid): searchsorted lands past the
            # LAST equal-ts right, so index-1 is the max-rid winner
            idx = np.searchsorted(rts, lts, side=sd) - 1
            ok = idx >= 0
            safe = np.maximum(idx, 0)
            out_id.append(lid)
            out_key.append(np.full(len(lid), key[s], np.int64))
            out_ts.append(lts)
            out_rts.append(np.where(ok, rts[safe] if len(rts)
                                    else 0, 0).astype(np.int64))
            out_val.append(np.where(ok, rv[safe] if len(rv)
                                    else np.nan, np.nan))
            out_ok.append(ok)
        if not out_id:
            return _EMPTY
        ok = np.concatenate(out_ok)
        return pa.table({
            "id": pa.array(np.concatenate(out_id)),
            "key": pa.array(np.concatenate(out_key)),
            "ts": pa.array(np.concatenate(out_ts)),
            "r_ts": pa.array(np.concatenate(out_rts), pa.int64(),
                             mask=~ok),
            "value": pa.array(np.concatenate(out_val), pa.float64(),
                              mask=~ok)})

    out, n = J.solidify(bucketed_group_apply(
        both, "key", fold, max_key_rows=max_key_rows))
    if n == 0:
        return rd.from_arrow(_EMPTY)
    return out


def asof_join_brute(lk, lid, lts, rk, rid, rts, rv,
                    strict: bool = False) -> pd.DataFrame:
    """Driver-side spec (per-left-row scan) for pinning tests."""
    rows = []
    for k, i, t in zip(lk, lid, lts):
        best = None
        for k2, ri, rt, v in zip(rk, rid, rts, rv):
            if k2 != k:
                continue
            if (rt < t) if strict else (rt <= t):
                cand = (rt, ri, v)
                if best is None or cand[:2] > best[:2]:
                    best = cand
        rows.append({"id": int(i), "key": int(k), "ts": int(t),
                     "r_ts": None if best is None else int(best[0]),
                     "value": None if best is None
                     else float(best[2])})
    return pd.DataFrame(rows)

"""First-order Markov transition matrix over per-user event
sequences — session-flow analysis ("view -> click -> buy"), anomaly
baselines, and synthetic-sequence generators all start here.

Semantics (pinned by tests/test_transitions.py): each user's events
are ordered by (ts, tiebreak_col); every consecutive pair contributes
one (from_state, to_state) count; p(to | from) = n_ft / sum_t n_f.
Single-event users contribute nothing.

Ray-Data shape: slim (user, ts, tie, state) projection -> ONE
user-bucket shuffle -> per-bucket vectorized pair extraction (one
lexsort, no per-user Python) emitting PRE-SUMMED (from, to, n)
string partials -> a tiny groupby sum bounded by n_states^2 ->
driver probability normalization (cap `max_states` RAISES). Integer
count sums commute, so the matrix is bit-deterministic under any
partitioning; probabilities are a pure driver function of the
counts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Sum

_EMPTY_PART = pa.table({"from_state": pa.array([], pa.string()),
                        "to_state": pa.array([], pa.string()),
                        "n": pa.array([], pa.int64())})
_EMPTY_OUT = pa.table({"from_state": pa.array([], pa.string()),
                       "to_state": pa.array([], pa.string()),
                       "n": pa.array([], pa.int64()),
                       "p": pa.array([], pa.float64())})


def transition_matrix(events_ds, *, user_col: str = "user_id",
                      ts_col: str = "ts", state_col: str = "event_type",
                      tiebreak_col: str = "event_id",
                      max_states: int = 100_000) -> pa.Table:
    """-> pa.Table (from_state, to_state, n, p) sorted by
    (from_state, to_state)."""
    from .join import bucketed_group_apply

    def slim(t: pa.Table) -> pa.Table:
        cols = [user_col, ts_col, tiebreak_col, state_col]
        return t.select(cols).rename_columns(
            ["user", "ts", "tie", "state"])

    rows = events_ds.map_batches(slim, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return _EMPTY_PART
        u = g["user"].to_numpy()
        ts = g["ts"].to_numpy()
        tie = g["tie"].to_numpy()
        codes, states = pd.factorize(g["state"].to_numpy())
        order = np.lexsort((tie, ts, u))
        us = u[order]
        cs = codes[order]
        same = np.zeros(len(us), bool)
        if len(us) > 1:
            same[1:] = us[1:] == us[:-1]   # consecutive same-user pair
        f = cs[np.flatnonzero(same) - 1]
        t_ = cs[same]
        if len(f) == 0:
            return _EMPTY_PART
        key = f.astype(np.int64) * np.int64(len(states)) + t_
        uk, n = np.unique(key, return_counts=True)
        return pa.table({
            "from_state": pa.array(states[uk // len(states)],
                                   pa.string()),
            "to_state": pa.array(states[uk % len(states)], pa.string()),
            "n": pa.array(n.astype(np.int64))})

    counts = bucketed_group_apply(rows, "user", per_bucket)\
        .groupby(["from_state", "to_state"])\
        .aggregate(Sum("n", alias_name="n"))

    parts = [b for b in counts.iter_batches(batch_size=None,
                                            batch_format="pyarrow")
             if b.num_rows]
    if not parts:
        return _EMPTY_OUT
    tbl = pa.concat_tables(parts)
    d = tbl.to_pandas().sort_values(["from_state", "to_state"],
                                    kind="mergesort")
    n_states = pd.concat([d.from_state, d.to_state]).nunique()
    if n_states > max_states:
        raise ValueError(
            f"{n_states} states exceed max_states={max_states}; the "
            "matrix no longer fits a driver table — keep it as the "
            "distributed count Dataset instead")
    totals = d.groupby("from_state")["n"].transform("sum")
    d["p"] = d["n"] / totals
    return pa.Table.from_pandas(d.reset_index(drop=True),
                                preserve_index=False)\
        .replace_schema_metadata(None)

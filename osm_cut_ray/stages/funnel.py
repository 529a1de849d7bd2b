"""Funnel analysis over the events table: for an ordered list of step
event types, count how many users reach each step with strictly
increasing timestamps (the classic product-analytics query, and a
genuinely ORDER-sensitive per-key computation — the engine's other
event ops are order-insensitive aggregates).

Ray-Data shape: a map-side projection keeps only step-typed events as
slim (user_id, ts, step) rows; ONE `bucketed_group_apply` shuffle
groups per user (Ray group overhead per bucket, not per user) where
the greedy earliest-match chain runs vectorized per user via
`np.searchsorted` per step over the user's sorted step timestamps.
Greedy-earliest is optimal for "did the user reach step k" (matching
earlier never hurts later steps), so results equal the brute-force
scan.

`within` optionally bounds the whole funnel: the chain must complete
within `within` seconds of its step-0 event; the greedy chain is
restarted from each candidate step-0 event (vectorized over
candidates), so a later entry that fits the window is still found.

Output: one row per step — (step, event_type, n_users) where n_users
is users whose chain reached at least that step.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .join import bucketed_group_apply


def _chain_depth(ts_by_step: list[np.ndarray]) -> int:
    """Greedy earliest-match depth for one user (unbounded window)."""
    t = -np.inf
    depth = 0
    for ts in ts_by_step:
        i = np.searchsorted(ts, t, side="right")
        if i >= len(ts):
            break
        t = ts[i]
        depth += 1
    return depth


def _chain_depth_within(ts_by_step: list[np.ndarray],
                        within: float) -> int:
    """Max depth over step-0 entry points with the window bound."""
    t0s = ts_by_step[0]
    if len(t0s) == 0:
        return 0
    best = 1
    for t0 in t0s:
        t = t0
        depth = 1
        for ts in ts_by_step[1:]:
            i = np.searchsorted(ts, t, side="right")
            if i >= len(ts) or ts[i] - t0 > within:
                break
            t = ts[i]
            depth += 1
        best = max(best, depth)
        if best == len(ts_by_step):
            break
    return best


def funnel_counts(events_ds, steps: list[str], *,
                  within: float | None = None,
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type",
                  max_key_rows: int | None = None) -> pa.Table:
    """-> (step, event_type, n_users) funnel table. `max_key_rows`
    surfaces a corpus-scale user key (bot/service account) instead of
    silently stalling its bucket task (RAISES; the
    bucketed_group_apply cap contract)."""
    k = len(steps)
    if k == 0:
        raise ValueError("funnel needs >= 1 step")
    step_of = {s: i for i, s in enumerate(steps)}

    def slim(t: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "ts": pa.array([], pa.float64()),
                          "step": pa.array([], pa.int64())})
        if len(t) == 0 or type_col not in t.column_names:
            return empty
        types = np.asarray(t[type_col].to_pylist(), dtype=object)
        codes, uniq = pd.factorize(types)
        lut = np.array([step_of.get(u, -1) for u in uniq], np.int64)
        sidx = lut[codes]
        keep = sidx >= 0
        if not keep.any():
            return empty
        ts = t[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False).astype(np.float64) / 1e6 \
            if pa.types.is_timestamp(t.schema.field(ts_col).type) \
            else t[ts_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "user_id": t[user_col].to_numpy(zero_copy_only=False)
            .astype(np.int64)[keep],
            "ts": pa.array(ts[keep]),
            "step": pa.array(sidx[keep])})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"depth": pd.Series(dtype=np.int64)})
        if len(g) == 0:
            return empty
        g = g.sort_values(["user_id", "step", "ts"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        st = g["step"].to_numpy(np.int64)
        ts = g["ts"].to_numpy(np.float64)
        depths = []
        starts = np.concatenate(
            ([0], np.flatnonzero(uid[1:] != uid[:-1]) + 1, [len(uid)]))
        for j in range(len(starts) - 1):
            sl = slice(starts[j], starts[j + 1])
            by_step = [ts[sl][st[sl] == s] for s in range(k)]
            d = _chain_depth_within(by_step, within) \
                if within is not None else _chain_depth(by_step)
            depths.append(d)
        return pd.DataFrame({"depth": np.array(depths, np.int64)})

    slim_ds = events_ds.map_batches(slim, batch_format="pyarrow")
    depths_ds = bucketed_group_apply(slim_ds, "user_id", per_bucket,
                                     max_key_rows=max_key_rows)
    hist = np.zeros(k + 1, np.int64)
    for b in depths_ds.iter_batches(batch_size=None,
                                    batch_format="pyarrow"):
        if b.num_rows:
            hist += np.bincount(
                b["depth"].to_numpy(zero_copy_only=False),
                minlength=k + 1)
    reached = np.cumsum(hist[::-1])[::-1]  # users with depth >= s+1
    return pa.table({
        "step": pa.array(range(k), pa.int64()),
        "event_type": pa.array(list(steps), pa.string()),
        "n_users": pa.array(reached[1:].astype(np.int64))})


def retention_cohorts(events_ds, *, period_s: float = 86_400.0,
                      max_periods: int = 30,
                      user_col: str = "user_id", ts_col: str = "ts"
                      ) -> pa.Table:
    """Cohort retention: users bucketed by FIRST-activity period;
    cell (cohort, age) counts cohort users active `age` periods later.

    Engine shape: a slim (user, period) projection with per-batch
    dedup, ONE bucketed shuffle groups each user's periods (min =
    cohort, offsets = ages, all vectorized), partial (cohort, age)
    counts reduce exactly on the driver (bounded by max_periods^2).
    Output: (cohort, age, n_users)."""

    def slim(t: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "period": pa.array([], pa.int64())})
        if len(t) == 0 or user_col not in t.column_names:
            return empty
        ts = t[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False).astype(np.float64) / 1e6 \
            if pa.types.is_timestamp(t.schema.field(ts_col).type) \
            else t[ts_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        uid = t[user_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        per = np.floor(ts / period_s).astype(np.int64)
        packed = np.unique((uid << np.int64(20)) | (per & 0xFFFFF))
        return pa.table({"user_id": packed >> np.int64(20),
                         "period": packed & np.int64(0xFFFFF)})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"cohort": pd.Series(dtype=np.int64),
                              "age": pd.Series(dtype=np.int64),
                              "c": pd.Series(dtype=np.int64)})
        if len(g) == 0:
            return empty
        # batch-level dedup is per batch only — a (user, period) seen
        # in two batches must still count once, so dedup the bucket
        packed = np.unique(
            (g["user_id"].to_numpy(np.int64) << np.int64(20))
            | (g["period"].to_numpy(np.int64) & np.int64(0xFFFFF)))
        uid = packed >> np.int64(20)
        per = packed & np.int64(0xFFFFF)
        start = np.concatenate(([True], uid[1:] != uid[:-1]))
        # cohort of each row = first period of its user
        coh = per[np.maximum.accumulate(
            np.where(start, np.arange(len(per)), 0))]
        age = per - coh
        keep = age < max_periods
        key = (coh[keep] << np.int64(20)) | age[keep]
        uk, c = np.unique(key, return_counts=True)
        return pd.DataFrame({"cohort": uk >> np.int64(20),
                             "age": uk & np.int64(0xFFFFF),
                             "c": c.astype(np.int64)})

    slim_ds = events_ds.map_batches(slim, batch_format="pyarrow")
    parts = bucketed_group_apply(slim_ds, "user_id", per_bucket)
    agg: dict[tuple[int, int], int] = {}
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        for i in range(b.num_rows):
            k = (int(b["cohort"][i].as_py()), int(b["age"][i].as_py()))
            agg[k] = agg.get(k, 0) + int(b["c"][i].as_py())
    keys = sorted(agg)
    return pa.table({
        "cohort": pa.array([k[0] for k in keys], pa.int64()),
        "age": pa.array([k[1] for k in keys], pa.int64()),
        "n_users": pa.array([agg[k] for k in keys], pa.int64())})

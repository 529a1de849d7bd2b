"""Per-way speed profiles from map-matched traces — the traffic-map
step downstream of `stages/match.py`: consecutive fixes of one
trajectory matched to the SAME way yield along-way speed samples;
aggregating them per way gives the corpus speed profile.

Ray-Data shape: input is `match_trajectories` output (traj_id, ts,
way_id, seg, snap_dist, along_deg) — already slim. ONE
trajectory-bucket shuffle computes the per-trace consecutive deltas
vectorized (shifted arrays, no per-trace Python), emitting one
(way_id, speed) sample per qualifying fix pair; per-way stats fold
through the standard partial-combine + tiny way groupby (Arrow out,
int64-quantized sums for bit-determinism, the zonal.py rule).

Sample rules (pinned by tests/test_speed.py):
- a pair qualifies iff same trajectory, both fixes on the same way
  (way_id >= 0) and dt > 0; speed = |along2 - along1| / dt
  (degrees/second — planar-degree convention, callers scale);
- off-network fixes (way_id = -1) break the chain exactly like the
  matcher's gap resets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .join import bucketed_group_apply

_QUANT = float(1 << 20)


def way_speed_samples(match_ds, *, traj_col: str = "traj_id",
                      ts_col: str = "ts", way_col: str = "way_id",
                      along_col: str = "along_deg"):
    """-> Dataset (way_id, speed): one sample per consecutive
    same-way fix pair (module docstring)."""

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"way_id": pa.array([], pa.int64()),
                          "speed": pa.array([], pa.float64())})
        if len(g) == 0:
            return empty
        g = g.sort_values([traj_col, ts_col], kind="mergesort")
        tid = g[traj_col].to_numpy(np.int64)
        ts = g[ts_col].to_numpy(np.float64)
        way = g[way_col].to_numpy(np.int64)
        along = g[along_col].to_numpy(np.float64)
        same = (tid[1:] == tid[:-1]) & (way[1:] == way[:-1]) \
            & (way[1:] >= 0)
        dt = ts[1:] - ts[:-1]
        ok = same & (dt > 0)
        if not ok.any():
            return empty
        speed = np.abs(along[1:][ok] - along[:-1][ok]) / dt[ok]
        return pa.table({"way_id": pa.array(way[1:][ok]),
                         "speed": pa.array(speed)})

    return bucketed_group_apply(match_ds, traj_col, per_bucket)


def way_speed_stats(match_ds, **kw):
    """-> Dataset (way_id, n_samples, mean_speed, min_speed,
    max_speed): per-way aggregate over the samples; sums are
    int64-quantized before the reduce (bit-deterministic across
    partitionings)."""
    import ray.data

    samples = way_speed_samples(match_ds, **kw)

    def combine(t: pa.Table) -> pa.Table:
        empty = pa.table({"way_id": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "sq": pa.array([], pa.int64()),
                          "mn": pa.array([], pa.float64()),
                          "mx": pa.array([], pa.float64())})
        if len(t) == 0:
            return empty
        df = pd.DataFrame({
            "way_id": t["way_id"].to_numpy(zero_copy_only=False),
            "sq": np.floor(t["speed"].to_numpy(zero_copy_only=False)
                           * _QUANT).astype(np.int64),
            "s": t["speed"].to_numpy(zero_copy_only=False)})
        out = df.groupby("way_id", as_index=False).agg(
            n=("sq", "size"), sq=("sq", "sum"), mn=("s", "min"),
            mx=("s", "max"))
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    partial = samples.map_batches(combine, batch_format="pyarrow")
    agg = partial.groupby("way_id").aggregate(
        ray.data.aggregate.Sum("n", alias_name="n_samples"),
        ray.data.aggregate.Sum("sq", alias_name="sq"),
        ray.data.aggregate.Min("mn", alias_name="min_speed"),
        ray.data.aggregate.Max("mx", alias_name="max_speed"))

    def final(t: pa.Table) -> pa.Table:
        n = t["n_samples"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sq = t["sq"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "way_id": t["way_id"].cast(pa.int64()),
            "n_samples": pa.array(n),
            "mean_speed": pa.array((sq / _QUANT) / n),
            "min_speed": t["min_speed"].cast(pa.float64()),
            "max_speed": t["max_speed"].cast(pa.float64())})

    return agg.map_batches(final, batch_format="pyarrow")

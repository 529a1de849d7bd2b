"""Stream-shaped operators over the events table.

Ray Data has no event-time windows (guide §streaming); windows are
expressed as key-partitioned, time-sorted group transforms:
- tumbling window aggregate = groupby(key, floor(ts, width));
- sessionization = groupby(key).map_groups over ts-sorted rows with a
  gap rule (the stateful-reducer analog of the reference's single
  gen_server stream state, src/osm_processor.erl — dissolved into
  explicit keyed shuffles).
Ordering assumption: rows within a key fit one group and are sorted by
(ts, event_id) inside the group fn.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def tumbling_batch(df: pd.DataFrame, *, ts_col="ts", key_col="event_type",
                   value_col="value", quant: int = 1000) -> pd.DataFrame:
    """Per-batch partial tumbling-hour aggregate (combiner before the
    groupby shuffle). Values are int64-quantized (floor(v*quant)) so
    sums are order-independent and oracle-hash-identical."""
    hour = df[ts_col].dt.floor("h").dt.strftime("%Y-%m-%d %H:00")
    vq = np.floor(df[value_col].to_numpy() * quant).astype(np.int64)
    g = pd.DataFrame({key_col: df[key_col], "hour": hour, "v": vq})\
        .groupby([key_col, "hour"], as_index=False)\
        .agg(sum_v_q=("v", "sum"), n=("v", "size"))
    # emit ARROW: pandas-format blocks make the downstream sort-shuffle
    # ~20x slower per task (measured; see BASELINE.md)
    import pyarrow as pa
    return pa.Table.from_pandas(g, preserve_index=False)


def sessionize_group(g: pd.DataFrame, *, gap_minutes=30, ts_col="ts",
                     id_col="event_id", key_col="user_id") -> pd.DataFrame:
    """One user's events -> session stats. New session when the gap to
    the previous event exceeds `gap_minutes` (strict >)."""
    g = g.sort_values([ts_col, id_col])
    gap = g[ts_col].diff() > pd.Timedelta(minutes=gap_minutes)
    session_id = gap.cumsum().astype(np.int64) + 1  # first row: NaT -> False
    out = pd.DataFrame({key_col: g[key_col], "session_id": session_id,
                        id_col: g[id_col]})
    return out.groupby([key_col, "session_id"], as_index=False)\
        .agg(n_events=(id_col, "size"), first_event=(id_col, "min"))

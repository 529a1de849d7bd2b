"""Stream-shaped operators over the events table.

Ray Data has no event-time windows (guide §streaming); windows are
expressed as key-partitioned, time-sorted group transforms:
- tumbling window aggregate = groupby(key, floor(ts, width));
- sessionization = bucketed key partition + a fully vectorized
  sorted scan (see queries.sessionize_events — the stateful-reducer
  analog of the reference's single gen_server stream state,
  src/osm_processor.erl, dissolved into explicit keyed shuffles).
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
    return pa.Table.from_pandas(g, preserve_index=False) \
        .replace_schema_metadata(None)

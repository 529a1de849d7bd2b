"""Tag-frequency statistics — the taginfo-style corpus readout
(which keys/values dominate an extract), and the profiling step
before choosing `--way-tag` filters.

Map-side combine: each batch explodes its tags map column (Arrow
MapArray keys/items, no Python row walk) and emits ONE partial row
per unique (key[, value]) in the batch; a single small groupby folds
the partials and a sort+limit returns the top-k. Determinism: ties
break (count desc, key asc, value asc).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def tag_stats(ds, *, tags_col: str = "tags", top_k: int = 100,
              by_value: bool = True) -> pa.Table:
    """-> pa.Table (key[, value], n): the corpus's most frequent tag
    keys (or key=value pairs with by_value=True), count-descending,
    top_k rows."""
    import ray.data

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"key": pa.array([], pa.large_string()),
                          "value": pa.array([], pa.large_string()),
                          "n": pa.array([], pa.int64())})
        if len(t) == 0 or tags_col not in t.column_names:
            return empty
        col = t[tags_col].combine_chunks()
        if len(col) == 0 or col.null_count == len(col):
            return empty
        keys = col.keys.to_pandas()
        vals = col.items.to_pandas() if by_value else \
            pd.Series([""] * len(keys))
        df = pd.DataFrame({"key": keys.astype(str),
                           "value": vals.astype(str)})
        agg = df.groupby(["key", "value"], as_index=False).size()
        return pa.table({
            "key": pa.array(agg["key"], pa.large_string()),
            "value": pa.array(agg["value"], pa.large_string()),
            "n": pa.array(agg["size"].to_numpy(np.int64))})

    # unique (key, value) pairs at planet scale are ~1e8 — top-k via
    # a DISTRIBUTED sort + limit, only top_k rows reach the driver
    folded = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["key", "value"]).aggregate(
            ray.data.aggregate.Sum(on="n", alias_name="n"))
    top = folded.sort(["n", "key", "value"],
                      descending=[True, False, False]).limit(top_k)
    parts = [b for b in top.iter_batches(batch_size=None,
                                         batch_format="pyarrow")
             if b.num_rows]
    cols = ["key", "value", "n"] if by_value else ["key", "n"]
    if not parts:
        return pa.table({c: pa.array(
            [], pa.int64() if c == "n" else pa.large_string())
            for c in cols})
    df = pa.concat_tables(parts).to_pandas()
    out = {"key": pa.array(df["key"], pa.large_string())}
    if by_value:
        out["value"] = pa.array(df["value"], pa.large_string())
    out["n"] = pa.array(df["n"].to_numpy(np.int64))
    return pa.table(out)

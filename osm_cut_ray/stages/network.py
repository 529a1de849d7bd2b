"""Road-network analysis: connected components of the way graph (two
ways are connected when they share >= 1 node) — network QA (is the
extract one component?), island detection, per-component routing
shards.

Scale shape: hub nodes are the classic blowup (a roundabout node
touching df ways would emit O(df^2) pairs) — star edges fix it
exactly: per node, edges (min way, other way) keep O(df) rows AND the
same connectivity, so no df cap is needed and the result is exact.
One explode pass + ONE node-bucket shuffle emit the edges; the
union-find runs on the driver below `max_driver_edges` (edges are
bounded by total refs, orders below points) with the shared
`dup_clusters_distributed` min-label fixpoint past it. Labels return
as a broadcast map (capped, RAISES) applied map-side, so the output
Dataset streams one row per way with no further shuffle.

Component label = min way id in the component (pinned by tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .dedup import dup_clusters, dup_clusters_distributed
from .join import bucketed_group_apply


def _star_edges(ways_ds, refs_col: str, id_col: str):
    """(way, refs) -> Dataset (a_id, b_id): per-node star edges."""

    def explode(t: pa.Table) -> pa.Table:
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "way": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        refs = t[refs_col].combine_chunks()
        lens = pa.compute.list_value_length(refs) \
            .fill_null(0).to_numpy(zero_copy_only=False)
        flat = pa.compute.list_flatten(refs) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        wid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": pa.array(flat),
                         "way": pa.array(np.repeat(wid, lens))})

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"a_id": pa.array([], pa.int64()),
                          "b_id": pa.array([], pa.int64())})
        if len(g) == 0:
            return empty
        g = g.drop_duplicates().sort_values(["node", "way"],
                                            kind="mergesort")
        nd = g["node"].to_numpy(np.int64)
        wy = g["way"].to_numpy(np.int64)
        first = np.concatenate(([True], nd[1:] != nd[:-1]))
        base = np.zeros(len(nd), np.int64)
        idx = np.arange(len(nd))
        base[first] = idx[first]
        anchor = wy[np.maximum.accumulate(base)]  # node's min way
        others = ~first & (wy != anchor)
        if not others.any():
            return empty
        ab = np.unique(np.stack([anchor[others], wy[others]]), axis=1)
        return pa.table({"a_id": pa.array(ab[0]),
                         "b_id": pa.array(ab[1])})

    rows = ways_ds.map_batches(explode, batch_format="pyarrow")
    return bucketed_group_apply(rows, "node", per_bucket)


def way_components(ways_ds, *, refs_col: str = "refs",
                   id_col: str = "id",
                   max_driver_edges: int = 5_000_000,
                   max_broadcast_labels: int = 50_000_000):
    """-> Dataset (way_id, component): every input way labeled with
    its connected component's min way id (singleton ways label
    themselves)."""
    edges = _star_edges(ways_ds, refs_col, id_col).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        comp_tbl = pa.table({"doc_id": pa.array([], pa.int64()),
                             "cluster_id": pa.array([], pa.int64())})
    elif n_edges <= max_driver_edges:
        comp_tbl = dup_clusters(pa.concat_tables(
            list(edges.iter_batches(batch_size=None,
                                    batch_format="pyarrow"))))
    else:
        comp_tbl = dup_clusters_distributed(edges)
    if comp_tbl.num_rows > max_broadcast_labels:
        raise ValueError(
            f"{comp_tbl.num_rows} component labels exceed "
            f"max_broadcast_labels; shard the corpus or raise the cap")
    keys = comp_tbl["doc_id"].to_numpy(zero_copy_only=False)
    lbls = comp_tbl["cluster_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(keys)
    ref = ray.put((keys[order], lbls[order]))

    def label(t: pa.Table) -> pa.Table:
        wid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ks, ls = ray.get(ref)
        comp = wid.copy()  # singleton default: own id
        if len(ks):
            pos = np.clip(np.searchsorted(ks, wid), 0, len(ks) - 1)
            hit = ks[pos] == wid
            comp[hit] = ls[pos[hit]]
        return pa.table({"way_id": pa.array(wid),
                         "component": pa.array(comp)})

    return ways_ds.map_batches(label, batch_format="pyarrow")

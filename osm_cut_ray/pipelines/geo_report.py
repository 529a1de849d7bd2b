"""Geo-corpus datasheet: the spatial sibling of `pipelines/report.py`
— the pre-flight summary a map-data curator reads before cutting or
training on an OSM-shaped corpus (nodes/ways/relations tables).

Same engine contract as the document datasheet: every statistic is a
MERGEABLE partial (exact int64 counts and bbox extrema, an HLL sketch
over hex cells for distinct-cell / density estimates, a KLL sketch
over per-way ref counts for size quantiles), each map task emits one
slim sketch row, the corpus streams with NO shuffle. The optional
connectivity section reuses `stages/network.py:way_components` (that
one does shuffle; off by default).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hll import HyperLogLog
from ..functions.sketch import KLL
from ..geometry.cells import hex_cell


def _node_partial(res: int):
    def fn(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n": pa.array([], pa.int64()),
            "minx": pa.array([], pa.float64()),
            "maxx": pa.array([], pa.float64()),
            "miny": pa.array([], pa.float64()),
            "maxy": pa.array([], pa.float64()),
            "hll": pa.array([], pa.binary())})
        if len(t) == 0:
            return empty
        x = t["lon"].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t["lat"].to_numpy(zero_copy_only=False).astype(np.float64)
        h = HyperLogLog()
        h.add_int64(hex_cell(x, y, res))
        return pa.table({
            "n": pa.array([len(t)], pa.int64()),
            "minx": pa.array([float(x.min())]),
            "maxx": pa.array([float(x.max())]),
            "miny": pa.array([float(y.min())]),
            "maxy": pa.array([float(y.max())]),
            "hll": pa.array([h.to_bytes()], pa.binary())})
    return fn


def _way_partial(refs_col: str):
    def fn(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n": pa.array([], pa.int64()),
            "refs": pa.array([], pa.int64()),
            "kll": pa.array([], pa.binary())})
        if len(t) == 0:
            return empty
        lens = pa.compute.list_value_length(t[refs_col]) \
            .fill_null(0).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        k = KLL()
        k.add(lens)
        return pa.table({
            "n": pa.array([len(t)], pa.int64()),
            "refs": pa.array([int(lens.sum())], pa.int64()),
            "kll": pa.array([k.to_bytes()], pa.binary())})
    return fn


def geo_corpus_report(nodes_ds, ways_ds, relations_ds=None, *,
                      res: int = 6, refs_col: str = "refs",
                      include_components: bool = False) -> dict:
    """-> one dict datasheet: node count + bbox + distinct hex cells
    (HLL estimate) + mean points per occupied cell; way count + total
    refs + ref-count quantiles (KLL p50/p90/max); optional relation
    count and way-component count."""
    out: dict = {}
    n = minx = maxx = miny = maxy = None
    hll = HyperLogLog()
    n = 0
    for b in nodes_ds.map_batches(_node_partial(res),
                                  batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        for i in range(b.num_rows):
            n += int(b["n"][i].as_py())
            bx0, bx1 = b["minx"][i].as_py(), b["maxx"][i].as_py()
            by0, by1 = b["miny"][i].as_py(), b["maxy"][i].as_py()
            minx = bx0 if minx is None else min(minx, bx0)
            maxx = bx1 if maxx is None else max(maxx, bx1)
            miny = by0 if miny is None else min(miny, by0)
            maxy = by1 if maxy is None else max(maxy, by1)
            hll.merge(HyperLogLog.from_bytes(b["hll"][i].as_py()))
    cells = hll.estimate() if n else 0.0
    out["n_nodes"] = n
    out["bbox"] = (minx, miny, maxx, maxy) if n else None
    out["hex_res"] = res
    out["distinct_cells_est"] = float(cells)
    out["points_per_cell_est"] = float(n / cells) if cells else 0.0

    n_ways = total_refs = 0
    kll = None
    for b in ways_ds.map_batches(_way_partial(refs_col),
                                 batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        for i in range(b.num_rows):
            n_ways += int(b["n"][i].as_py())
            total_refs += int(b["refs"][i].as_py())
            part = KLL.from_bytes(b["kll"][i].as_py())
            kll = part if kll is None else kll.merge(part)
    out["n_ways"] = n_ways
    out["total_refs"] = total_refs
    if kll is not None and n_ways:
        out["way_refs_p50"] = float(kll.quantile(0.5))
        out["way_refs_p90"] = float(kll.quantile(0.9))
    else:
        out["way_refs_p50"] = out["way_refs_p90"] = 0.0

    if relations_ds is not None:
        out["n_relations"] = relations_ds.count()
    if include_components and n_ways:
        from ..stages.network import way_components
        comp = way_components(ways_ds, refs_col=refs_col)
        import pyarrow.compute as pc
        comps = set()
        for b in comp.iter_batches(batch_size=None,
                                   batch_format="pyarrow"):
            if b.num_rows:
                comps.update(pc.unique(b["component"]).to_pylist())
        out["n_way_components"] = len(comps)
    return out

"""Corridor extraction — cut everything within a distance of a
selected way set (the railway/highway/pipeline corridor extract:
"give me the corpus within 500 m of this line"). No polygon ever
exists; the inside-node set comes from segment distance instead of
ray casting, and then the cut's own phases 2-4 (way membership,
complete-object back-joins, relation closure, emission) run
unchanged via `cut.cut_from_inside_ids`.

Ray-Data shape: corridor ways select map-side (tag filter or
broadcast id set); their segments compile through the EXISTING
broadcast/tiled dual (`stages/snap.py:build_segment_grid_auto` — so
a planet-scale corridor source tiles instead of raising); every node
batch probes the grid map-side. One distance scan, zero node-side
shuffles, and the grid holds only the CORRIDOR's segments, not the
corpus's.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages import join as J
from ..stages.snap import build_segment_grid_auto, snap_points
from ..stages.tag_filter import filter_by_tag
from .cut import CutResult, cut_from_inside_ids


def cut_corridor(nodes, ways, relations, *, dist_deg: float,
                 way_tag: str | None = None, way_ids=None,
                 complete: bool = True, id_col: str = "id",
                 cell_deg: float | None = None) -> CutResult:
    """Extract the corpus within `dist_deg` of the selected ways
    (select by `way_tag` "key=v1,v2" / "key", or an explicit
    `way_ids` iterable; exactly one selector required)."""
    if (way_tag is None) == (way_ids is None):
        raise ValueError("pass exactly one of way_tag / way_ids")
    if way_tag is not None:
        key, _, vals = way_tag.partition("=")
        sel = filter_by_tag(ways, key,
                            vals.split(",") if vals else None)
    else:
        import ray
        ids = np.unique(np.asarray(list(way_ids), np.int64))
        ref = ray.put(ids)

        def filt(t: pa.Table) -> pa.Table:
            want = ray.get(ref)
            have = t[id_col].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            pos = np.minimum(np.searchsorted(want, have),
                             len(want) - 1)
            return t.filter(pa.array(want[pos] == have))

        sel = ways.map_batches(filt, batch_format="pyarrow")
    sel = sel.materialize()
    if sel.count() == 0:
        raise RuntimeError("cut_corridor: the way selector matched "
                           "nothing — no corridor to extract")

    # grid cells sized to the probe radius (>= radius so the 1-cell
    # ring covers every candidate), floored at the default
    grid = build_segment_grid_auto(
        sel, nodes, refs_col="node_ids", id_col=id_col,
        cell_deg=max(dist_deg, cell_deg or 0.5))
    snapped = snap_points(
        nodes.map_batches(lambda t: t.select([id_col, "lon", "lat"]),
                          batch_format="pyarrow"),
        grid, radius=dist_deg, id_col=id_col)
    hits = snapped.map_batches(
        lambda t: t.filter(pc.not_equal(t["way_id"], -1))
        .select([id_col]), batch_format="pyarrow")
    inside_ids = J.collect_key_array(hits, id_col)
    return cut_from_inside_ids(nodes, ways, relations, inside_ids,
                               complete=complete, id_col=id_col)

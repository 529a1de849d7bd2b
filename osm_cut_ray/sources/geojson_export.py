"""GeoJSON export — the `osmium export` analog: tagged nodes become
Point features, ways become LineString features (with their node
locations attached via `stages/locate.py`), tags map to properties.

Streaming write: features serialize per batch through `iter_batches`
(never a whole-corpus JSON object in memory); the file is a
line-delimited-friendly FeatureCollection (one feature per line),
deterministic order (nodes by id, then ways by id). Coordinates are
emitted with repr-roundtrip precision (not the XML sink's %g — a
geometry export must not lose precision)."""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa


def _props(tags) -> dict:
    return {str(k): str(v) for k, v in (tags or [])}


def write_geojson(out_path: str, nodes, ways_located, *,
                  tagged_nodes_only: bool = True) -> int:
    """nodes + located ways (from `add_locations_to_ways`) ->
    FeatureCollection file; returns feature count. Ways with fewer
    than 2 located points are skipped (not a line)."""
    n_feat = 0
    with open(out_path, "w", encoding="utf-8") as f:
        f.write('{"type": "FeatureCollection", "features": [\n')
        first = True

        def emit(obj):
            nonlocal first, n_feat
            f.write(("" if first else ",\n")
                    + json.dumps(obj, separators=(",", ":"),
                                 sort_keys=True))
            first = False
            n_feat += 1

        for b in nodes.sort("id").iter_batches(batch_size=None,
                                               batch_format="pyarrow"):
            for r in b.to_pylist():
                props = _props(r.get("tags"))
                if tagged_nodes_only and not props:
                    continue
                emit({"type": "Feature",
                      "id": f"node/{r['id']}",
                      "geometry": {"type": "Point",
                                   "coordinates": [r["lon"],
                                                   r["lat"]]},
                      "properties": props})
        for b in ways_located.sort("id").iter_batches(
                batch_size=None, batch_format="pyarrow"):
            for r in b.to_pylist():
                lons, lats = r.get("lons") or [], r.get("lats") or []
                if len(lons) < 2:
                    continue
                emit({"type": "Feature",
                      "id": f"way/{r['id']}",
                      "geometry": {"type": "LineString",
                                   "coordinates":
                                   [[x, y] for x, y in
                                    zip(lons, lats)]},
                      "properties": _props(r.get("tags"))})
        f.write("\n]}\n")
    return n_feat

"""Corpus info: the `osmium fileinfo --extended` analog — per-kind
counts, id ranges, node bbox, timestamp range, tag volume, and an
HLL estimate of distinct users, computed in ONE zero-shuffle pass
per kind (per-block single-row partials, driver merge of #blocks
rows).

Reference scope note: the reference CLI prints corpus statistics on
load (osm_cut.erl progress counters); osmium's fileinfo verb is the
ecosystem tool users reach for first — this is its distributed
analog over the repo's columnar corpus model.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hll import HyperLogLog


def _kind_partials(ds, *, with_coords: bool):
    """One row per block: count, id/lon/lat/timestamp extrema,
    tag entries, HLL of uid (serialized bytes)."""
    def part(t: pa.Table) -> pa.Table:
        cols = {
            "n": pa.array([], pa.int64()),
            "id_min": pa.array([], pa.int64()),
            "id_max": pa.array([], pa.int64()),
            "lon_min": pa.array([], pa.float64()),
            "lon_max": pa.array([], pa.float64()),
            "lat_min": pa.array([], pa.float64()),
            "lat_max": pa.array([], pa.float64()),
            "ts_min": pa.array([], pa.large_string()),
            "ts_max": pa.array([], pa.large_string()),
            "n_tags": pa.array([], pa.int64()),
            "ver_max": pa.array([], pa.int64()),
            "uid_hll": pa.array([], pa.large_binary())}
        if len(t) == 0 or "id" not in t.column_names:
            return pa.table(cols)
        ids = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if with_coords and "lon" in t.column_names:
            lon = t["lon"].to_numpy(zero_copy_only=False)
            lat = t["lat"].to_numpy(zero_copy_only=False)
            lon_min, lon_max = float(np.min(lon)), float(np.max(lon))
            lat_min, lat_max = float(np.min(lat)), float(np.max(lat))
        else:
            lon_min = lat_min = np.inf
            lon_max = lat_max = -np.inf
        ts_min = ts_max = None
        if "timestamp" in t.column_names:
            ts = t["timestamp"].drop_null()
            if len(ts):
                ts_min = str(pc.min(ts).as_py())
                ts_max = str(pc.max(ts).as_py())
        n_tags = 0
        if "tags" in t.column_names:
            col = t["tags"].combine_chunks()
            if isinstance(col, pa.ChunkedArray):
                col = col.chunk(0) if col.num_chunks else None
            if col is not None and len(col):
                # list AND map arrays both expose offsets
                offs = col.offsets.to_numpy(zero_copy_only=False)
                n_tags = int(offs[-1] - offs[0])
        h = HyperLogLog()
        if "uid" in t.column_names:
            uids = t["uid"].drop_null().to_numpy(
                zero_copy_only=False).astype(np.int64)
            h.add_int64(uids)
        ver_max = 0
        if "version" in t.column_names:
            v = t["version"].drop_null()
            if len(v):
                ver_max = int(pc.max(v).as_py())
        return pa.table({
            "n": pa.array([len(t)], pa.int64()),
            "id_min": pa.array([int(ids.min())], pa.int64()),
            "id_max": pa.array([int(ids.max())], pa.int64()),
            "lon_min": pa.array([lon_min], pa.float64()),
            "lon_max": pa.array([lon_max], pa.float64()),
            "lat_min": pa.array([lat_min], pa.float64()),
            "lat_max": pa.array([lat_max], pa.float64()),
            "ts_min": pa.array([ts_min], pa.large_string()),
            "ts_max": pa.array([ts_max], pa.large_string()),
            "n_tags": pa.array([n_tags], pa.int64()),
            "ver_max": pa.array([ver_max], pa.int64()),
            "uid_hll": pa.array([h.to_bytes()], pa.large_binary())})

    return ds.map_batches(part, batch_format="pyarrow")


def _merge_kind(parts) -> dict:
    out = {"count": 0, "id_min": None, "id_max": None,
           "lon_min": None, "lon_max": None,
           "lat_min": None, "lat_max": None,
           "ts_min": None, "ts_max": None,
           "n_tags": 0, "ver_max": 0, "users_est": 0}
    h = HyperLogLog()
    seen = False
    for b in parts.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        for i in range(len(t)):
            seen = True
            out["count"] += int(t["n"][i].as_py())
            for k, fn in (("id_min", min), ("id_max", max)):
                v = int(t[k][i].as_py())
                out[k] = v if out[k] is None else fn(out[k], v)
            for k, fn in (("lon_min", min), ("lon_max", max),
                          ("lat_min", min), ("lat_max", max)):
                v = float(t[k][i].as_py())
                if np.isfinite(v):
                    out[k] = v if out[k] is None else fn(out[k], v)
            for k, fn in (("ts_min", min), ("ts_max", max)):
                v = t[k][i].as_py()
                if v is not None:
                    out[k] = v if out[k] is None else fn(out[k], v)
            out["n_tags"] += int(t["n_tags"][i].as_py())
            out["ver_max"] = max(out["ver_max"],
                                 int(t["ver_max"][i].as_py()))
            h.merge(HyperLogLog.from_bytes(t["uid_hll"][i].as_py()))
    out["users_est"] = int(round(h.estimate())) if seen else 0
    return out


def corpus_info(nodes, ways, relations) -> dict:
    """-> {"nodes": {...}, "ways": {...}, "relations": {...},
    "bbox": (lon_min, lat_min, lon_max, lat_max) | None}."""
    info = {
        "nodes": _merge_kind(_kind_partials(nodes,
                                            with_coords=True)),
        "ways": _merge_kind(_kind_partials(ways,
                                           with_coords=False)),
        "relations": _merge_kind(_kind_partials(relations,
                                                with_coords=False))}
    n = info["nodes"]
    info["bbox"] = (
        (n["lon_min"], n["lat_min"], n["lon_max"], n["lat_max"])
        if n["lon_min"] is not None else None)
    return info


def format_info(info: dict) -> str:
    """osmium-fileinfo-style text block."""
    lines = []
    if info["bbox"]:
        b = info["bbox"]
        lines.append(f"  Bounding box: ({b[0]:.7f},{b[1]:.7f},"
                     f"{b[2]:.7f},{b[3]:.7f})")
    for kind in ("nodes", "ways", "relations"):
        k = info[kind]
        lines.append(f"  Number of {kind}: {k['count']}")
        if k["count"]:
            lines.append(f"    id range: {k['id_min']}.."
                         f"{k['id_max']}")
            if k["ts_min"]:
                lines.append(f"    timestamps: {k['ts_min']}.."
                             f"{k['ts_max']}")
            lines.append(f"    tag entries: {k['n_tags']}  "
                         f"max version: {k['ver_max']}  "
                         f"distinct users (est): {k['users_est']}")
    return "\n".join(lines)

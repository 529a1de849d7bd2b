"""OsmChange (.osc) source + apply — the `osmium apply-changes`
analog, so a cut corpus can be kept current from replication diffs
instead of re-ingesting the planet.

Format: an `<osmChange>` document whose `<create>/<modify>/<delete>`
sections wrap ordinary node/way/relation elements (same attribute
typing as the base parser, sources/osm_xml.py:70). Application
semantics follow osmium/osmosis: for each (kind, id) the LAST
occurrence in document order wins; a winning `delete` removes the
object, a winning `create`/`modify` replaces (or inserts) it; base
objects the change never mentions pass through untouched.

Scale contract: a change file is a DELTA — inherently small next to
the corpus — so the winning decisions are resolved driver-side and
the touched-id set is broadcast ONCE (`ray.put`, 8 B/id); the base
corpus is then filtered map-side (sorted-array `searchsorted`, zero
shuffles) and the replacement rows ride one aligned-schema union.
`max_broadcast_changes` guards the broadcast and RAISES past it
(repo cap contract) — a "change" bigger than that is a re-ingest,
not a diff.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np
import pyarrow as pa

from .osm_xml import (XML_NODE_SCHEMA, XML_REL_SCHEMA, XML_WAY_SCHEMA,
                      _meta_of, _tags_of)

_OPS = ("create", "modify", "delete")
_SCHEMAS = {"node": XML_NODE_SCHEMA, "way": XML_WAY_SCHEMA,
            "relation": XML_REL_SCHEMA}


def parse_osc_xml(path: str) -> dict[str, pa.Table]:
    """.osc -> {"node"|"way"|"relation": pa.Table} with the base
    schemas plus (op: string, seq: int64 document order). Delete
    elements may omit lon/lat (they are dropped anyway) — missing
    coordinates parse as NaN."""
    rows: dict[str, list[dict]] = {k: [] for k in _SCHEMAS}
    op = None
    seq = 0
    for event, elem in ET.iterparse(path, events=("start", "end")):
        if event == "start":
            if elem.tag in _OPS:
                op = elem.tag
            continue
        kind = elem.tag
        if kind in _OPS:
            op = None
            elem.clear()
            continue
        if op is None or kind not in _SCHEMAS:
            continue
        if kind == "node":
            row = {"id": int(elem.get("id")),
                   "lon": float(elem.get("lon", "nan")),
                   "lat": float(elem.get("lat", "nan"))}
        elif kind == "way":
            row = {"id": int(elem.get("id")),
                   "node_ids": [int(nd.get("ref")) for nd in elem
                                if nd.tag == "nd"]}
        else:
            row = {"id": int(elem.get("id")),
                   "members": [{"type": m.get("type"),
                                "ref": int(m.get("ref")),
                                "role": m.get("role") or ""}
                               for m in elem if m.tag == "member"]}
        row.update(_meta_of(elem.attrib))
        row["tags"] = _tags_of(elem)
        row["op"] = op
        row["seq"] = seq
        seq += 1
        rows[kind].append(row)
        elem.clear()
    out = {}
    for kind, schema in _SCHEMAS.items():
        ext = schema.append(pa.field("op", pa.large_string())) \
            .append(pa.field("seq", pa.int64()))
        out[kind] = pa.Table.from_pylist(rows[kind], schema=ext)
    return out


def _winners(change: pa.Table) -> tuple[np.ndarray, pa.Table]:
    """Last-occurrence-wins per id -> (all touched ids SORTED,
    surviving replacement rows in base schema, sorted by id)."""
    ids = change["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    seq = change["seq"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((seq, ids))
    last = np.concatenate((ids[order][1:] != ids[order][:-1], [True]))
    win_rows = order[last]
    touched = ids[win_rows]  # sorted ascending by construction
    ops = change["op"].to_numpy(zero_copy_only=False)[win_rows]
    keep = win_rows[ops != "delete"]
    repl = change.take(pa.array(keep)).drop_columns(["op", "seq"])
    return touched, repl


def apply_change(base_ds, change: pa.Table, *,
                 max_broadcast_changes: int = 50_000_000):
    """Apply one kind's change table (from `parse_osc_xml`) to the
    matching base Dataset -> Dataset in the base schema."""
    import ray
    import ray.data

    if change.num_rows > max_broadcast_changes:
        raise RuntimeError(
            f"apply_change: {change.num_rows} change rows exceed "
            f"max_broadcast_changes={max_broadcast_changes} — that is "
            "a re-ingest, not a diff")
    if change.num_rows == 0:
        return base_ds
    touched, repl = _winners(change)
    if len(touched) == 0:
        return base_ds
    ref = ray.put(touched)

    def drop_touched(t: pa.Table) -> pa.Table:
        ts = ray.get(ref)
        ids = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(ts, ids)
        pos = np.minimum(pos, len(ts) - 1)
        return t.filter(pa.array(ts[pos] != ids))

    kept = base_ds.map_batches(drop_touched, batch_format="pyarrow")
    if repl.num_rows == 0:
        return kept
    base_schema = base_ds.schema().base_schema

    def align(t: pa.Table) -> pa.Table:
        return pa.table({f.name: t[f.name].cast(f.type)
                         for f in base_schema})

    add = ray.data.from_arrow(repl).map_batches(
        align, batch_format="pyarrow")
    kept = kept.map_batches(align, batch_format="pyarrow")
    return kept.union(add)


def apply_osc(nodes, ways, rels, osc_path: str, *,
              max_broadcast_changes: int = 50_000_000):
    """Apply a .osc file to the three base Datasets -> new
    (nodes, ways, relations) Datasets."""
    ch = parse_osc_xml(osc_path)
    return (apply_change(nodes, ch["node"],
                         max_broadcast_changes=max_broadcast_changes),
            apply_change(ways, ch["way"],
                         max_broadcast_changes=max_broadcast_changes),
            apply_change(rels, ch["relation"],
                         max_broadcast_changes=max_broadcast_changes))

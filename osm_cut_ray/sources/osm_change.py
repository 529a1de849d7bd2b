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


def _fetch_rows(ds, ids: np.ndarray, cap: int) -> pa.Table | None:
    """Broadcast id-set filter + bounded driver collect (full rows)."""
    import ray

    if len(ids) == 0:
        return None
    ids = np.unique(ids)
    ref = ray.put(ids)

    def filt(t: pa.Table) -> pa.Table:
        want = ray.get(ref)
        have = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.minimum(np.searchsorted(want, have), len(want) - 1)
        return t.filter(pa.array(want[pos] == have))

    parts = [b for b in ds.map_batches(filt, batch_format="pyarrow")
             .iter_batches(batch_size=None, batch_format="pyarrow")
             if b.num_rows]
    if not parts:
        return None
    out = pa.concat_tables(parts)
    if out.num_rows > cap:
        raise RuntimeError(
            f"derive_osc: {out.num_rows} changed rows exceed the "
            f"driver cap {cap} — that delta is a re-ingest")
    return out


def derive_osc(old, new, out_path: str, *,
               max_broadcast_changes: int = 50_000_000
               ) -> dict[str, int]:
    """osmium derive-changes analog: diff two corpus versions (each a
    (nodes, ways, relations) Dataset triple) and write the OsmChange
    file that turns `old` into `new` — `apply_osc(old, out) == new`
    exactly (pinned round-trip). Diff classification is the
    vectorized row-hash diff (`stages/diff.py`, one slim shuffle per
    kind); only the CHANGED rows are fetched (broadcast id filter,
    capped driver collect). Returns per-section element counts."""
    from ..stages.diff import diff_corpora
    from .osm_xml import element_lines

    sections: dict[str, list[tuple[str, dict]]] = {
        "create": [], "modify": [], "delete": []}
    for kind, ods, nds in (("node", old[0], new[0]),
                           ("way", old[1], new[1]),
                           ("relation", old[2], new[2])):
        ch = diff_corpora(ods, nds)
        rows = [b for b in ch.iter_batches(batch_size=None,
                                           batch_format="pyarrow")
                if b.num_rows]
        if not rows:
            continue
        tab = pa.concat_tables(rows)
        if tab.num_rows > max_broadcast_changes:
            raise RuntimeError(
                f"derive_osc: {tab.num_rows} changed ids exceed "
                f"max_broadcast_changes — that delta is a re-ingest")
        ids = tab["id"].to_numpy(zero_copy_only=False)
        chg = tab["change"].to_numpy(zero_copy_only=False)
        by = {"added": ids[chg == "added"],
              "modified": ids[chg == "modified"],
              "removed": ids[chg == "removed"]}
        fresh = _fetch_rows(nds, np.concatenate(
            [by["added"], by["modified"]]), max_broadcast_changes)
        if fresh is not None:
            added = set(by["added"].tolist())
            for r in fresh.to_pylist():
                sec = "create" if r["id"] in added else "modify"
                sections[sec].append((kind, r))
        gone = _fetch_rows(ods, by["removed"], max_broadcast_changes)
        if gone is not None:
            for r in gone.to_pylist():
                sections["delete"].append((kind, r))

    kind_rank = {"node": 0, "way": 1, "relation": 2}
    counts = {}
    with open(out_path, "w", encoding="utf-8") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write('<osmChange version="0.6" generator="osm_cut_ray">\n')
        for sec in ("create", "modify", "delete"):
            elems = sorted(sections[sec],
                           key=lambda kr: (kind_rank[kr[0]],
                                           kr[1]["id"]))
            counts[sec] = len(elems)
            if not elems:
                continue
            f.write(f"<{sec}>\n")
            for kind, row in elems:
                f.write("\n".join(element_lines(kind, row)) + "\n")
            f.write(f"</{sec}>\n")
        f.write("</osmChange>\n")
    return counts


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

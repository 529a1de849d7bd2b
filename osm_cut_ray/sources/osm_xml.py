"""Streaming OSM XML source + sink (reference S1/S4).

The reference SAX-parses OSM XML in 100 KB chunks
(src/osm_parser.erl:26-48 via vendored erlsom) and serializes kept
elements back to XML through a 1,000-element buffered writer
(src/osm_writer.erl:72-88, src/osm_simple_xml_formatter.erl:22-103).

Here the source is `xml.etree.iterparse` (incremental, elements cleared
as consumed — never materializes the document) emitting Arrow record
batches that land in partitioned parquet; downstream pipelines then
read columnar and parallel. The sink serializes a CutResult back to
OSM XML (nodes -> ways -> relations order, the OSM dump convention the
reference's FSM depends on, src/osm_process_complete.erl:102-106 —
our batch engine doesn't need the order, but emits it for
compatibility).

Attribute typing mirrors M1/M2 (src/osm_parser.erl:232-325): id/
version/changeset/uid -> int64, lon/lat -> float64, user/timestamp ->
string, unknown attributes dropped; missing stay null.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

import pyarrow as pa
import pyarrow.parquet as pq

_META = [("version", pa.int64()), ("changeset", pa.int64()),
         ("uid", pa.int64()), ("user", pa.large_string()),
         ("timestamp", pa.large_string())]
_TAGS = ("tags", pa.map_(pa.large_string(), pa.large_string()))

XML_NODE_SCHEMA = pa.schema([("id", pa.int64()), ("lon", pa.float64()),
                             ("lat", pa.float64()), *_META, _TAGS])
XML_WAY_SCHEMA = pa.schema([("id", pa.int64()),
                            ("node_ids", pa.list_(pa.int64())),
                            *_META, _TAGS])
XML_REL_SCHEMA = pa.schema([
    ("id", pa.int64()),
    ("members", pa.list_(pa.struct([("type", pa.large_string()),
                                    ("ref", pa.int64()),
                                    ("role", pa.large_string())]))),
    *_META, _TAGS])


def _meta_of(attrib: dict) -> dict:
    # the reference writer serializes absent metadata as the literal
    # string "undefined" (osm_simple_xml_formatter.erl:22-103 via
    # osm_utils:any_to_iolist on the undefined atom) — read it back
    # as null so reference-written files roundtrip
    def _get(k):
        v = attrib.get(k)
        return None if v == "undefined" else v

    def _i(k):
        v = _get(k)
        return int(v) if v is not None else None
    return {"version": _i("version"), "changeset": _i("changeset"),
            "uid": _i("uid"), "user": _get("user"),
            "timestamp": _get("timestamp")}


def _tags_of(elem) -> list[tuple[str, str]]:
    return [(t.get("k"), t.get("v")) for t in elem if t.tag == "tag"]


def parse_osm_xml(path: str, batch_rows: int = 100_000):
    """Yield ("node"|"way"|"relation", pa.Table) batches, streaming."""
    rows: dict[str, list[dict]] = {"node": [], "way": [], "relation": []}
    schemas = {"node": XML_NODE_SCHEMA, "way": XML_WAY_SCHEMA,
               "relation": XML_REL_SCHEMA}

    def flush(kind):
        if rows[kind]:
            tbl = pa.Table.from_pylist(rows[kind], schema=schemas[kind])
            rows[kind] = []
            return tbl
        return None

    for _, elem in ET.iterparse(path, events=("end",)):
        kind = elem.tag
        if kind == "node":
            rows["node"].append({
                "id": int(elem.get("id")),
                "lon": float(elem.get("lon")),
                "lat": float(elem.get("lat")),
                **_meta_of(elem.attrib), "tags": _tags_of(elem)})
        elif kind == "way":
            rows["way"].append({
                "id": int(elem.get("id")),
                "node_ids": [int(nd.get("ref")) for nd in elem
                             if nd.tag == "nd"],
                **_meta_of(elem.attrib), "tags": _tags_of(elem)})
        elif kind == "relation":
            rows["relation"].append({
                "id": int(elem.get("id")),
                "members": [{"type": m.get("type"),
                             "ref": int(m.get("ref")),
                             "role": m.get("role") or ""}
                            for m in elem if m.tag == "member"],
                **_meta_of(elem.attrib), "tags": _tags_of(elem)})
        else:
            continue
        elem.clear()  # streaming: drop the subtree immediately
        if len(rows[kind]) >= batch_rows:
            yield kind, flush(kind)
    for kind in ("node", "way", "relation"):
        tbl = flush(kind)
        if tbl is not None:
            yield kind, tbl


def osm_xml_to_parquet(xml_path: str, out_dir: str,
                       batch_rows: int = 100_000) -> dict[str, str]:
    """Convert an OSM XML dump to three partitioned parquet dirs.

    One part file per batch — downstream reads parallelize per part and
    a re-run can resume per part (write is atomic via temp+rename).
    """
    writers: dict[str, int] = {"node": 0, "way": 0, "relation": 0}
    dirs = {k: os.path.join(out_dir, f"{k}s") for k in writers}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    schemas = {"node": XML_NODE_SCHEMA, "way": XML_WAY_SCHEMA,
               "relation": XML_REL_SCHEMA}
    for kind, tbl in parse_osm_xml(xml_path, batch_rows):
        part = os.path.join(dirs[kind], f"part-{writers[kind]:05d}.parquet")
        tmp = part + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, part)
        writers[kind] += 1
    for kind, d in dirs.items():  # empty inputs still need a schema file
        if writers[kind] == 0:
            pq.write_table(schemas[kind].empty_table(),
                           os.path.join(d, "part-00000.parquet"))
    return dirs


def load_osm_xml(xml_path: str, work_dir: str):
    """OSM XML -> (nodes, ways, relations) Ray Datasets via parquet."""
    import ray.data as rd
    dirs = osm_xml_to_parquet(xml_path, work_dir)
    return (rd.read_parquet(dirs["node"]), rd.read_parquet(dirs["way"]),
            rd.read_parquet(dirs["relation"]))


# ------------------------------------------------------------------ sink

# Reference attribute order and missing-value fidelity: the writer
# always emits every metadata attribute, serializing absent values as
# the literal `undefined` (osm_writer.erl:228-237 builds the full list;
# osm_utils:any_to_iolist prints the undefined atom; pinned by
# test/processor_SUITE.erl:261-262).
_ATTR_ORDER = ["version", "timestamp", "uid", "changeset", "user"]


def _attrs(row: dict, extra: list[tuple[str, object]]) -> str:
    parts = [f'id={quoteattr(str(row["id"]))}']
    for k, v in extra:
        parts.append(f"{k}={quoteattr(str(v))}")
    for k in _ATTR_ORDER:
        v = row.get(k)
        parts.append(f"{k}={quoteattr('undefined' if v is None else str(v))}")
    return " ".join(parts)


def _fmt_num(x: float) -> str:
    return f"{x:g}"


def _tags_xml(row: dict, indent: str) -> list[str]:
    out = []
    for k, v in (row.get("tags") or []):
        out.append(f'{indent}<tag k={quoteattr(str(k))} '
                   f'v={quoteattr(str(v))}/>')
    return out


def element_lines(kind: str, row: dict) -> list[str]:
    """One element's XML lines (byte-identical to the streaming
    writer's output; shared with the OsmChange serializer)."""
    if kind == "node":
        extra = [("lat", _fmt_num(row["lat"])),
                 ("lon", _fmt_num(row["lon"]))]
        head = f'  <node {_attrs(row, extra)}'
        tags = _tags_xml(row, "    ")
        if tags:
            return [head + ">", *tags, "  </node>"]
        return [head + "/>"]
    if kind == "way":
        return [f'  <way {_attrs(row, [])}>',
                *(f'    <nd ref="{int(ref)}"/>'
                  for ref in row["node_ids"]),
                *_tags_xml(row, "    "),
                "  </way>"]
    if kind == "relation":
        return [f'  <relation {_attrs(row, [])}>',
                *(f'    <member type={quoteattr(m["type"])} '
                  f'ref="{int(m["ref"])}" '
                  f'role={quoteattr(m.get("role") or "")}/>'
                  for m in row["members"]),
                *_tags_xml(row, "    "),
                "  </relation>"]
    raise ValueError(f"unknown element kind: {kind}")


class OsmXmlStreamWriter:
    """Incremental buffered OSM XML writer (the reference's
    1,000-element writer buffer, osm_writer.erl:30,72-88): rows are
    serialized as they arrive and flushed to disk whenever the line
    buffer reaches `buffer_elements` — memory held is O(buffer), never
    O(corpus). Feed kinds in nodes -> ways -> relations document order;
    `close()` writes the footer and atomically renames into place.
    """

    def __init__(self, out_path: str, buffer_elements: int = 1000):
        self.out_path = out_path
        self.buffer_elements = buffer_elements
        self._tmp = out_path + ".tmp"
        self._f = open(self._tmp, "w", encoding="utf-8")
        self._buf: list[str] = ['<?xml version="1.0" encoding="UTF-8"?>',
                                '<osm version="0.6" generator="osm_cut_ray">']
        self.count = 0
        self._closed = False

    def _flush(self):
        if self._buf:
            self._f.write("\n".join(self._buf) + "\n")
            self._buf.clear()

    def write_rows(self, kind: str, rows) -> int:
        """Serialize dict rows of one kind; returns rows written."""
        buf = self._buf
        n = 0
        for row in rows:
            buf.extend(element_lines(kind, row))
            n += 1
            if len(buf) >= self.buffer_elements:
                self._flush()
        self.count += n
        return n

    def close(self) -> int:
        if not self._closed:
            self._buf.append("</osm>")
            self._flush()
            self._f.close()
            os.replace(self._tmp, self.out_path)
            self._closed = True
        return self.count


def write_osm_xml(out_path: str, nodes_iter, ways_iter, rels_iter,
                  buffer_elements: int = 1000) -> int:
    """Serialize row iterables back to OSM XML (buffered, S4 analog).

    Each *_iter yields dict rows (as from Dataset.iter_rows()). Returns
    the element count written. Output order: nodes, ways, relations.
    """
    w = OsmXmlStreamWriter(out_path, buffer_elements)
    w.write_rows("node", nodes_iter)
    w.write_rows("way", ways_iter)
    w.write_rows("relation", rels_iter)
    return w.close()

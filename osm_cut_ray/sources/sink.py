"""Pluggable output sinks (reference S5).

The reference exposes a `writer_module` library option — any module
implementing the writer contract can replace the XML writer
(/root/reference/src/osm_supervisor.erl:93-101), and the e2e suite
injects a collecting test double that records written elements
(/root/reference/test/test_osm_writer.erl:9-194). This module is the
Ray-side analog: a `Sink` receives Arrow batches per element kind,
`write_cut_result` streams a CutResult through one, and tests inject
`CollectSink` exactly like `test_osm_writer` does.

Sinks consume *streamed* batches (`iter_batches`) — a sink never holds
the corpus unless it chooses to (CollectSink is test-only by design;
the XML sink buffers rows per the reference's 1,000-element writer
buffer, src/osm_writer.erl:72-88).
"""

from __future__ import annotations

import os
from typing import Protocol, runtime_checkable

import pyarrow as pa
import pyarrow.parquet as pq

KINDS = ("node", "way", "relation")


@runtime_checkable
class Sink(Protocol):
    """Writer contract: batches arrive per kind (nodes first, then
    ways, then relations — the OSM dump order the reference emits);
    `close` finalizes the output and returns per-kind element counts."""

    def write(self, kind: str, batch: pa.Table) -> None: ...

    def close(self) -> dict: ...


class ParquetSink:
    """Partitioned parquet: one directory per kind, one part file per
    batch (atomic temp+rename, so a crashed run leaves only complete
    parts and a re-run can skip them)."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.counts = {k: 0 for k in KINDS}
        self._part = {k: 0 for k in KINDS}
        for k in KINDS:
            os.makedirs(os.path.join(out_dir, f"{k}s"), exist_ok=True)

    def write(self, kind: str, batch: pa.Table) -> None:
        d = os.path.join(self.out_dir, f"{kind}s")
        part = os.path.join(d, f"part-{self._part[kind]:05d}.parquet")
        pq.write_table(batch, part + ".tmp")
        os.replace(part + ".tmp", part)
        self._part[kind] += 1
        self.counts[kind] += len(batch)

    def close(self) -> dict:
        return dict(self.counts)


class OsmXmlSink:
    """Buffered OSM XML writer (reference S4 semantics: single output
    file, nodes -> ways -> relations order, `undefined` for missing
    metadata). Rows buffer per kind and serialize on close because XML
    is a single ordered document."""

    def __init__(self, out_path: str, buffer_elements: int = 1000):
        self.out_path = out_path
        self.buffer_elements = buffer_elements
        self._rows: dict[str, list[dict]] = {k: [] for k in KINDS}

    def write(self, kind: str, batch: pa.Table) -> None:
        self._rows[kind].extend(batch.to_pylist())

    def close(self) -> dict:
        from .osm_xml import write_osm_xml
        write_osm_xml(self.out_path, self._rows["node"],
                      self._rows["way"], self._rows["relation"],
                      buffer_elements=self.buffer_elements)
        return {k: len(v) for k, v in self._rows.items()}


class CollectSink:
    """In-memory test double (the `test_osm_writer.erl` analog):
    records every written element for assertions."""

    def __init__(self):
        self.tables: dict[str, list[pa.Table]] = {k: [] for k in KINDS}

    def write(self, kind: str, batch: pa.Table) -> None:
        self.tables[kind].append(batch)

    def table(self, kind: str) -> pa.Table:
        parts = self.tables[kind]
        return pa.concat_tables(parts, promote_options="default") \
            if parts else pa.table({})

    def close(self) -> dict:
        return {k: sum(len(t) for t in v) for k, v in self.tables.items()}


SINK_REGISTRY = {"parquet": ParquetSink, "xml": OsmXmlSink}


def write_cut_result(result, sink: Sink) -> dict:
    """Stream a CutResult (or cut_shuffle dict) through a Sink in the
    reference's element order; returns sink.close()'s counts."""
    if isinstance(result, dict):  # cut_shuffle output shape
        trio = (result["nodes"], result["ways"], result["relations_meta"])
    else:
        trio = (result.nodes, result.ways, result.relations)
    for kind, ds in zip(KINDS, trio):
        for batch in ds.iter_batches(batch_size=None,
                                     batch_format="pyarrow"):
            if len(batch):
                sink.write(kind, batch)
    return sink.close()

"""Table sources (reference: streaming XML source S1, osm_parser.erl:26-48).

The reference SAX-parses OSM XML incrementally; our inputs are columnar
(Parquet today, Lance when the library is present), so the "source" is
``ray.data.read_parquet`` with column pruning and predicate pushdown —
streaming block reads replace the 100 KB SAX chunks.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd


def sf_path(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _strip_md(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def strip_schema_metadata(ds):
    """Drop Arrow schema metadata right after a parquet read.

    Pandas-written parquet embeds a 'pandas' dict in the schema
    metadata; such schemas are UNHASHABLE in pyarrow 16, which defeats
    Ray's block-schema deduplication — every `unify_schemas` on a
    shuffle/union takes the expensive path and logs "Failed to hash
    the schemas". The rewrite is metadata-only (zero-copy) and fuses
    into the read task."""
    return ds.map_batches(_strip_md, batch_format="pyarrow")


def read_table(path: str, columns: list[str] | None = None, **kwargs):
    """Read a columnar table as a streaming Dataset.

    Prefers Lance when a `.lance` path is given and the lance reader is
    available (the production format per BASELINE.json); otherwise
    Parquet. Always pass `columns` in pipelines — a read that loads all
    columns for a narrow transform is wrong at 100 TB.
    """
    if path.endswith(".lance"):
        try:
            return rd.read_lance(path, columns=columns, **kwargs)
        except (AttributeError, ImportError) as exc:  # lance not installed here
            raise NotImplementedError(
                "Lance reader unavailable in this environment; "
                "use parquet inputs"
            ) from exc
    if path.endswith((".jsonl", ".json", ".jsonl.gz", ".json.gz")):
        return read_jsonl(path, columns=columns, **kwargs)
    return strip_schema_metadata(
        rd.read_parquet(path, columns=columns, **kwargs))


def read_jsonl(path, columns: list[str] | None = None, **kwargs):
    """JSON-Lines source (the interchange format of the public
    text-corpus pipelines — Dolma, FineWeb, RedPajama all ship JSONL).

    `ray.data.read_json` streams line-delimited blocks; column pruning
    happens right after parse (JSONL is row-major, so unlike parquet
    the bytes must be read — prune anyway so only the projection
    transits the pipeline)."""
    ds = rd.read_json(path, **kwargs)
    if columns is not None:
        ds = ds.select_columns(columns)
    return strip_schema_metadata(ds)


def write_jsonl(ds, out_dir: str, **kwargs):
    """JSON-Lines sink (one file per block, same layout contract as
    `write_parquet` — resumable, never one giant file)."""
    ds.write_json(out_dir, **kwargs)
    return out_dir

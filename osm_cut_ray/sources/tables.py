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


def read_csv_table(path, columns: list[str] | None = None, **kwargs):
    """CSV source (`ray.data.read_csv` streams pyarrow CSV blocks).
    Like JSONL, CSV is row-major — the projection happens after
    parse, but prune anyway so only the needed columns transit."""
    ds = rd.read_csv(path, **kwargs)
    if columns is not None:
        ds = ds.select_columns(columns)
    return strip_schema_metadata(ds)


_CSV_BAD = (pa.types.is_binary, pa.types.is_large_binary,
            pa.types.is_list, pa.types.is_large_list,
            pa.types.is_map, pa.types.is_struct)


def write_csv_table(ds, out_dir: str, **kwargs):
    """CSV sink. RAISES on binary/nested columns — CSV cannot carry
    them faithfully; convert those tables to parquet/jsonl instead."""
    schema = ds.schema()
    for name, typ in zip(schema.names, schema.types):
        if any(bad(typ) for bad in _CSV_BAD):
            raise ValueError(
                f"column {name!r} has non-CSV-representable type "
                f"{typ}; use parquet or jsonl for this table")
    ds.write_csv(out_dir, **kwargs)
    return out_dir


_FORMATS = ("parquet", "jsonl", "csv")


def compact_table(in_path: str, out_dir: str, *,
                  target_rows_per_file: int = 1_000_000,
                  sort_by: str | None = None,
                  columns: list[str] | None = None) -> dict:
    """Small-file compaction (the table-maintenance pass every
    long-running ingest needs): rewrite a parquet file/directory as
    ceil(rows / target_rows_per_file) right-sized files.

    `sort_by` adds ONE global sort shuffle before the write so each
    output file (and row group) covers a tight key range — that is
    what makes `read_points_pruned`-style min/max row-group pruning
    effective on later reads. Without it the rewrite is a pure
    streaming repartition (zero shuffles).

    -> {rows, files, out_dir}. Values are preserved exactly; only
    layout changes."""
    if target_rows_per_file <= 0:
        raise ValueError("target_rows_per_file must be positive")
    ds = read_table(in_path, columns=columns)
    n = ds.count()
    n_files = max(1, -(-n // target_rows_per_file))
    if sort_by is not None:
        if sort_by not in ds.schema().names:
            raise ValueError(f"sort_by column {sort_by!r} not in "
                             f"{ds.schema().names}")
        ds = ds.sort(sort_by)
    # materialize pins the block count — the streaming executor may
    # otherwise re-block dynamically and write one giant file
    ds = ds.repartition(n_files).materialize()
    ds.write_parquet(out_dir)
    import glob
    files = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
    return {"rows": int(n), "files": len(files), "out_dir": out_dir}


def convert_table(in_path: str, out_dir: str, *, to: str,
                  columns: list[str] | None = None):
    """Format converter (the `osmium cat` analog for columnar
    tables): parquet/jsonl/csv in -> parquet/jsonl/csv out, streaming
    block-by-block with optional column pruning at the read."""
    if to not in _FORMATS:
        raise ValueError(f"unknown output format {to!r}; "
                         f"expected one of {_FORMATS}")
    probe = in_path
    if os.path.isdir(in_path):
        names = sorted(f for f in os.listdir(in_path)
                       if not f.startswith("."))
        if names:
            probe = names[0]
    if probe.endswith((".csv", ".csv.gz")):
        ds = read_csv_table(in_path, columns=columns)
    elif probe.endswith((".jsonl", ".json", ".jsonl.gz",
                         ".json.gz")):
        ds = read_jsonl(in_path, columns=columns)
    else:
        ds = read_table(in_path, columns=columns)
    if to == "parquet":
        ds.write_parquet(out_dir)
    elif to == "jsonl":
        write_jsonl(ds, out_dir)
    else:
        write_csv_table(ds, out_dir)
    return out_dir

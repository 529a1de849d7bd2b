"""Column encoding helpers (reference M5 string interning analog:
src/osm_utils.erl:58-63 interns low-cardinality strings as atoms; the
columnar equivalent is Arrow dictionary encoding)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def dictionary_encode_batch(t: pa.Table, columns: list[str]) -> pa.Table:
    """Dictionary-encode low-cardinality string columns in place —
    shrinks blocks in the object store and speeds grouping."""
    for c in columns:
        i = t.schema.get_field_index(c)
        t = t.set_column(i, c, pc.dictionary_encode(
            t[c].combine_chunks() if isinstance(t[c], pa.ChunkedArray)
            else t[c]))
    return t


def dictionary_decode_batch(t: pa.Table, columns: list[str]) -> pa.Table:
    for c in columns:
        i = t.schema.get_field_index(c)
        col = t[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_dictionary(col.type):
            t = t.set_column(i, c, col.dictionary_decode())
    return t

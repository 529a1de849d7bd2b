"""Vectorized list-column rewrites (reference M7/M8).

The reference rewrites a way's node list (non-complete mode,
src/osm_process_non_complete.erl:79-87) and a relation's member list
(src/osm_process_complete.erl:253-257) by per-element membership
filtering. Columnar equivalent: flatten the list column, evaluate a
vectorized element predicate, rebuild offsets with numpy — no Python
row loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def filter_list_column(t: pa.Table, list_col: str, keep: np.ndarray,
                       lengths: np.ndarray, values: pa.Array) -> pa.Table:
    """Rebuild `list_col` keeping only flattened elements where `keep`.

    The rebuilt column keeps the ORIGINAL list dtype (list<T> stays
    list<T>, large_list<T> stays large_list<T>) so rewritten outputs
    share a schema with verbatim/complete-mode outputs and the
    parquet-ingest schema (XML_WAY_SCHEMA/XML_REL_SCHEMA).
    """
    n = len(t)
    row_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)
    kept_counts = np.bincount(row_idx[keep], minlength=n)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(kept_counts, out=offsets[1:])
    new_values = values.filter(pa.array(keep))
    orig_type = t.schema.field(list_col).type
    new_col = pa.LargeListArray.from_arrays(pa.array(offsets), new_values)
    if not new_col.type.equals(orig_type):
        new_col = new_col.cast(orig_type)
    i = t.schema.get_field_index(list_col)
    return t.set_column(i, list_col, new_col)


def _flatten(t: pa.Table, list_col: str):
    col = t[list_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lengths = pc.fill_null(pc.list_value_length(col), 0)\
        .to_numpy(zero_copy_only=False).astype(np.int64)
    return lengths, pc.list_flatten(col)


def rewrite_id_list(t: pa.Table, list_col: str,
                    keep_ids: pa.Array) -> pa.Table:
    """M8: keep only list elements present in `keep_ids` (int64 ids)."""
    lengths, values = _flatten(t, list_col)
    keep = pc.fill_null(pc.is_in(values, value_set=keep_ids), False)\
        .to_numpy(zero_copy_only=False)
    return filter_list_column(t, list_col, keep, lengths, values)


def rewrite_member_list(t: pa.Table, list_col: str,
                        node_ids: pa.Array, way_ids: pa.Array,
                        rel_ids: pa.Array,
                        type_field: str = "type",
                        ref_field: str = "ref",
                        rel_lt_parent_col: str | None = None) -> pa.Table:
    """M7/J5: keep members whose (type, ref) is in the membership sets.

    `rel_lt_parent_col` models the reference's NON-COMPLETE forward
    pass (osm_process_non_complete.erl:90-105): members are filtered
    against the membership set AT PROCESSING TIME, so under the
    declared ascending-id file order a relation-type member is only
    visible if its id is LOWER than the parent's. Pass the parent-id
    column name to enable that rule; complete mode (end-of-stream
    re-projection, osm_process_complete.erl:253-257) leaves it None.
    """
    lengths, values = _flatten(t, list_col)  # StructArray
    mtype = pc.struct_field(values, type_field)
    mref = pc.struct_field(values, ref_field)

    def hit(ids):
        return pc.fill_null(pc.is_in(mref, value_set=ids), False)

    is_node = pc.equal(mtype, "node")
    is_way = pc.equal(mtype, "way")
    is_rel = pc.equal(mtype, "relation")
    rel_hit = pc.and_(is_rel, hit(rel_ids))
    if rel_lt_parent_col is not None:
        parent = np.repeat(
            t[rel_lt_parent_col].to_numpy(zero_copy_only=False)
            .astype(np.int64), lengths)
        before = pa.array(
            mref.to_numpy(zero_copy_only=False) < parent)
        rel_hit = pc.and_(rel_hit, before)
    keep = pc.or_(pc.or_(pc.and_(is_node, hit(node_ids)),
                         pc.and_(is_way, hit(way_ids))),
                  rel_hit)
    keep = pc.fill_null(keep, False).to_numpy(zero_copy_only=False)
    return filter_list_column(t, list_col, keep, lengths, values)

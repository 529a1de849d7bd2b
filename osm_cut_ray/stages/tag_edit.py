"""Tag editing (the osmosis tag-transform / `osmium tags-filter`
companion): rename keys, drop keys, and set/overwrite key-value
pairs across a corpus's `tags` map column.

Fully vectorized per batch: the map column's flattened key/value
children are edited with Arrow kernels, and the output map is
rebuilt through ONE take-permutation over the concatenated
[kept-entries ++ tiled-set-pairs] source — no per-row Python. One
map pass, zero shuffles, schema preserved.

Semantics: `rename` applies first (old key -> new key, values
untouched); `drop` removes keys; `set` upserts — any existing entry
with a set key is removed, then the (key, value) pair appends at
the row's end. Keys are matched exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def edit_tags_batch(t: pa.Table, *, rename=None, drop=None,
                    set_tags=None, col: str = "tags") -> pa.Table:
    rename = dict(rename or {})
    drop = list(drop or [])
    set_items = sorted((set_tags or {}).items())
    if not (rename or drop or set_items):
        return t
    tags = t[col].combine_chunks()
    if t.num_rows == 0 or len(tags) == 0:
        return t
    n = len(tags)
    off = tags.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat_k = tags.keys
    flat_v = tags.items
    counts = np.diff(off)
    base = off[0]          # child arrays may start at a nonzero offset
    total = int(off[-1] - base)
    flat_k = flat_k.slice(base, total)
    flat_v = flat_v.slice(base, total)

    for old, new in rename.items():
        flat_k = pc.if_else(
            pc.equal(flat_k, old),
            pa.scalar(new, flat_k.type), flat_k)

    gone = drop + [k for k, _ in set_items]
    if gone:
        keep = pc.invert(pc.is_in(
            flat_k, value_set=pa.array(gone, flat_k.type)))
        keep_np = keep.to_numpy(zero_copy_only=False)
        keep_np = np.asarray(keep_np, bool)
    else:
        keep_np = np.ones(total, bool)

    kept_idx = np.flatnonzero(keep_np)
    guard = np.concatenate((keep_np.astype(np.int64), [0]))
    counts_kept = (np.add.reduceat(guard, off - base)[:n]
                   if n else np.zeros(0, np.int64))
    counts_kept = np.where(counts == 0, 0, counts_kept)
    n_set = len(set_items)
    new_counts = counts_kept + n_set
    new_off = np.concatenate(([0], np.cumsum(new_counts)))
    total_out = int(new_off[-1])

    # take-permutation: output position -> source position in
    # [kept-entries ++ row-major tiled set pairs]
    src = np.empty(total_out, np.int64)
    tk = len(kept_idx)
    row_kept = np.repeat(np.arange(n), counts_kept)
    rank = (np.arange(tk)
            - np.repeat(np.concatenate(
                ([0], np.cumsum(counts_kept)))[:-1], counts_kept))
    src[new_off[row_kept] + rank] = np.arange(tk)
    if n_set:
        rows = np.repeat(np.arange(n), n_set)
        j = np.tile(np.arange(n_set), n)
        src[new_off[rows] + counts_kept[rows] + j] = \
            tk + rows * n_set + j

    kept_k = pc.take(flat_k, pa.array(kept_idx))
    kept_v = pc.take(flat_v, pa.array(kept_idx))
    if n_set:
        set_k = pa.array([k for k, _ in set_items] * n,
                         flat_k.type) if n else pa.array([], flat_k.type)
        # row-major tiling: pa.array(list * n) repeats the whole
        # group per row, matching the src layout
        set_v = pa.array([v for _, v in set_items] * n, flat_v.type)
        cat_k = pa.concat_arrays([kept_k.combine_chunks()
                                  if isinstance(kept_k, pa.ChunkedArray)
                                  else kept_k, set_k])
        cat_v = pa.concat_arrays([kept_v.combine_chunks()
                                  if isinstance(kept_v, pa.ChunkedArray)
                                  else kept_v, set_v])
    else:
        cat_k = kept_k.combine_chunks() \
            if isinstance(kept_k, pa.ChunkedArray) else kept_k
        cat_v = kept_v.combine_chunks() \
            if isinstance(kept_v, pa.ChunkedArray) else kept_v
    out_k = pc.take(cat_k, pa.array(src))
    out_v = pc.take(cat_v, pa.array(src))
    new_map = pa.MapArray.from_arrays(
        pa.array(new_off, pa.int32()),
        out_k.combine_chunks() if isinstance(out_k, pa.ChunkedArray)
        else out_k,
        out_v.combine_chunks() if isinstance(out_v, pa.ChunkedArray)
        else out_v)
    idx = t.schema.get_field_index(col)
    return t.set_column(idx, col, new_map.cast(t.schema.field(col).type))


def edit_tags(ds, *, rename=None, drop=None, set_tags=None,
              col: str = "tags"):
    """-> Dataset with the tag edits applied (see module doc)."""

    def fn(t: pa.Table) -> pa.Table:
        return edit_tags_batch(t, rename=rename, drop=drop,
                               set_tags=set_tags, col=col)

    return ds.map_batches(fn, batch_format="pyarrow")

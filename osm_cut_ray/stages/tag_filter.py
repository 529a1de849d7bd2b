"""Tag-predicate filtering over OSM map-typed tag columns — the
osmium/osmosis `--tag-filter` surface (keep ways with highway=*, drop
nodes with amenity in {...}): selection by tag BEFORE geometry, the
first stage of most real OSM pipelines.

Pure map-side over Arrow map columns: `pc.map_lookup` (the C++
kernel) extracts each element's value for the key; presence/value
predicates are vectorized Arrow compute. Zero shuffles; composes in
front of `cut` / `clip_ways` / any pipeline.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def tag_value(t: pa.Table, key: str, *, col: str = "tags"):
    """First value of `key` per row (null when absent) as an Arrow
    array."""
    tags = t[col]
    if isinstance(tags, pa.ChunkedArray):
        tags = tags.combine_chunks()
    key_t = tags.type.key_type
    return pc.map_lookup(tags, query_key=pa.scalar(key, key_t),
                         occurrence="first")


def filter_by_tag(ds, key: str, values=None, *, mode: str = "keep",
                  col: str = "tags"):
    """Keep (or drop) rows whose tag `key` is present — and, when
    `values` is given, equals one of them. mode: 'keep' | 'drop'."""
    if mode not in ("keep", "drop"):
        raise ValueError("mode must be keep|drop")
    vals = list(values) if values is not None else None

    def fn(t: pa.Table) -> pa.Table:
        if len(t) == 0 or col not in t.column_names:
            return t
        v = tag_value(t, key, col=col)
        hit = pc.is_valid(v)
        if vals is not None:
            hit = pc.and_(hit, pc.fill_null(
                pc.is_in(v, value_set=pa.array(vals, v.type)), False))
        return t.filter(hit if mode == "keep" else pc.invert(hit))

    return ds.map_batches(fn, batch_format="pyarrow")

"""Snapshot diff between two corpus versions — the osmium
`derive-changes` analog (reference: incremental extract updates), and
a general training-data ingest auditor: which rows were added,
removed, or modified between yesterday's and today's table.

Content equality is a 64-bit recursive row hash computed VECTORIZED
over Arrow buffers (no Python per-row walk): numerics hash their
canonical float64/int64 bits through splitmix64, strings hash one
blake2b per UNIQUE batch value (the SimHash trick), lists/maps/
structs fold child hashes with position mixing and XOR segment
reduction straight over the offsets — nested OSM schemas
(tags map<string,string>, way node_ids list<int64>, relation
member structs) hash without materializing any Python objects.

Ray-Data shape: each side maps to slim (id, rhash, side) rows; ONE
id-bucket shuffle classifies every id (added / removed / modified,
optionally unchanged). Payload bytes never shuffle. Duplicate ids
within one side RAISE (snapshots are keyed tables).

64-bit hashes: a colliding modified row (p ~ 2^-64 per row) would
report as unchanged; acceptable for audit streams, pin with
compare_cols=... on payload-critical flows.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .join import bucketed_group_apply

_SM1 = np.uint64(0xBF58476D1CE4E5B9)
_SM2 = np.uint64(0x94D049BB133111EB)
_NULL = np.uint64(0x9E3779B97F4A7C15)
_EMPTY = np.uint64(0xD1B54A32D192ED03)


def _sm64(z: np.ndarray) -> np.ndarray:
    z = z.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * _SM1
        z = (z ^ (z >> np.uint64(27))) * _SM2
        return z ^ (z >> np.uint64(31))


def _segment_fold(child: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-row fold of child element hashes (position-mixed XOR +
    length mix). offsets: int array len n+1."""
    lens = np.diff(offsets)
    pos = np.arange(len(child), dtype=np.uint64)
    if len(offsets) > 1:
        pos -= np.repeat(offsets[:-1].astype(np.uint64), lens)
    e = _sm64(child ^ _sm64(pos))
    out = np.full(len(lens), _EMPTY, np.uint64)
    nz = lens > 0
    if nz.any():
        guard = np.concatenate([e, np.zeros(1, np.uint64)])
        seg = np.bitwise_xor.reduceat(
            guard, offsets[:-1][nz].astype(np.int64))
        out[nz] = seg
    with np.errstate(over="ignore"):
        return _sm64(out + _sm64(lens.astype(np.uint64)))


def _hash_array(arr: pa.Array) -> np.ndarray:
    """-> uint64 hash per element, nulls = constant."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_dictionary(t):
        arr = arr.cast(t.value_type)
        t = arr.type
    null_mask = np.asarray(arr.is_null())
    if pa.types.is_integer(t) or pa.types.is_boolean(t):
        v = np.asarray(arr.cast(pa.int64()).fill_null(0)
                       .to_numpy(zero_copy_only=False))
        h = _sm64(v.view(np.uint64) ^ np.uint64(0xA5A5))
    elif pa.types.is_floating(t):
        v = np.asarray(arr.cast(pa.float64()).fill_null(0.0)
                       .to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        v = np.where(np.isnan(v), 0.0, v) + 0.0  # -0.0 -> +0.0
        nan = np.isnan(np.asarray(
            arr.cast(pa.float64()).fill_null(0.0)
            .to_numpy(zero_copy_only=False)))
        h = _sm64(v.view(np.uint64) ^ np.uint64(0x5A5A))
        h[nan] = _sm64(np.full(int(nan.sum()), 0xFFF, np.uint64))
    elif pa.types.is_string(t) or pa.types.is_large_string(t) \
            or pa.types.is_binary(t) or pa.types.is_large_binary(t):
        vals = arr.to_pylist()
        uniq: dict = {}
        h = np.empty(len(vals), np.uint64)
        for i, s in enumerate(vals):
            if s is None:
                h[i] = _NULL
                continue
            hh = uniq.get(s)
            if hh is None:
                b = s.encode() if isinstance(s, str) else s
                hh = np.uint64(int.from_bytes(
                    hashlib.blake2b(b, digest_size=8).digest(),
                    "big"))
                uniq[s] = hh
            h[i] = hh
    elif pa.types.is_list(t) or pa.types.is_large_list(t):
        child = _hash_array(arr.values)
        off = np.asarray(arr.offsets.to_numpy(zero_copy_only=False),
                         np.int64)
        # offsets may not start at 0 on sliced arrays
        h = _segment_fold(child[off[0]:off[-1]], off - off[0])
    elif pa.types.is_map(t):
        kh = _hash_array(arr.keys)
        vh = _hash_array(arr.items)
        child = _sm64(kh ^ _sm64(vh))
        off = np.asarray(arr.offsets.to_numpy(zero_copy_only=False),
                         np.int64)
        h = _segment_fold(child[off[0]:off[-1]], off - off[0])
    elif pa.types.is_struct(t):
        h = np.full(len(arr), np.uint64(0x51ED), np.uint64)
        for i in range(t.num_fields):
            fh = _hash_array(arr.field(i))
            with np.errstate(over="ignore"):
                h = _sm64(h ^ (fh + np.uint64(i + 1)))
    elif pa.types.is_null(t):
        h = np.full(len(arr), _NULL, np.uint64)
    else:
        raise TypeError(f"row hash: unsupported Arrow type {t}")
    if null_mask.any():
        h = h.copy()
        h[null_mask] = _NULL
    return h


def row_content_hashes(tbl: pa.Table, cols=None) -> np.ndarray:
    """-> int64 content hash per row over `cols` (default: all)."""
    cols = list(cols) if cols is not None else tbl.column_names
    h = np.full(len(tbl), np.uint64(0x1234), np.uint64)
    for name in cols:
        salt = np.uint64(int.from_bytes(
            hashlib.blake2b(name.encode(), digest_size=8).digest(),
            "big"))
        ch = _hash_array(tbl[name].combine_chunks())
        with np.errstate(over="ignore"):
            h = _sm64(h ^ (ch + salt))
    return h.view(np.int64)


def diff_corpora(old_ds, new_ds, *, id_col: str = "id",
                 compare_cols=None, keep_unchanged: bool = False):
    """-> Dataset (id, change): 'added' (new only), 'removed' (old
    only), 'modified' (both, content differs); 'unchanged' rows are
    emitted only with keep_unchanged=True. compare_cols defaults to
    every column except id_col."""
    def slim(side: int):
        def fn(t: pa.Table) -> pa.Table:
            empty = pa.table({"id": pa.array([], pa.int64()),
                              "rhash": pa.array([], pa.int64()),
                              "side": pa.array([], pa.int8())})
            if len(t) == 0:
                return empty
            cols = compare_cols if compare_cols is not None else \
                [c for c in t.column_names if c != id_col]
            return pa.table({
                "id": t[id_col].cast(pa.int64()),
                "rhash": pa.array(row_content_hashes(t, cols)),
                "side": pa.array(np.full(len(t), side, np.int8))})
        return fn

    rows = old_ds.map_batches(slim(0), batch_format="pyarrow") \
        .union(new_ds.map_batches(slim(1), batch_format="pyarrow"))

    def classify(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"id": pa.array([], pa.int64()),
                          "change": pa.array([], pa.string())})
        if len(g) == 0:
            return empty
        g = g.sort_values(["id", "side"], kind="mergesort")
        ids = g["id"].to_numpy(np.int64)
        side = g["side"].to_numpy(np.int8)
        rh = g["rhash"].to_numpy(np.int64)
        starts = np.concatenate(
            ([0], np.flatnonzero(ids[1:] != ids[:-1]) + 1, [len(ids)]))
        lens = np.diff(starts)
        if (lens > 2).any():
            bad = ids[starts[:-1][lens > 2][0]]
            raise ValueError(
                f"id {bad} appears more than once in a snapshot — "
                "diff requires unique ids per side")
        s0 = starts[:-1]
        one_side = side[s0]
        both = lens == 2
        # lens==2 with same side twice = duplicate within one side
        if both.any() and (side[s0[both]]
                           == side[s0[both] + 1]).any():
            raise ValueError("duplicate id within one snapshot")
        out_id, out_ch = [], []
        only = lens == 1
        if only.any():
            out_id.append(ids[s0[only]])
            out_ch.append(np.where(one_side[only] == 0,
                                   "removed", "added"))
        if both.any():
            same = rh[s0[both]] == rh[s0[both] + 1]
            mod = ~same
            if mod.any():
                out_id.append(ids[s0[both]][mod])
                out_ch.append(np.full(int(mod.sum()), "modified",
                                      object))
            if keep_unchanged and same.any():
                out_id.append(ids[s0[both]][same])
                out_ch.append(np.full(int(same.sum()), "unchanged",
                                      object))
        if not out_id:
            return empty
        return pa.table({
            "id": pa.array(np.concatenate(out_id)),
            "change": pa.array(
                np.concatenate(out_ch).astype(object).tolist(),
                pa.string())})

    return bucketed_group_apply(rows, "id", classify)

"""Aspect-ratio bucketing and fixed-size training-batch packing.

Image training stacks (SDXL-style bucketed batching, NaViT packing)
need batches whose members share a resolution bucket: every image in a
training batch is resized to the SAME target shape, so mixing a 2:1
panorama with a 1:2 portrait wastes pixels or distorts. The engine-
shape problem is assigning every image a (bucket, batch, slot) triple
that is GLOBALLY consistent, deterministic under any partitioning, and
computed without ever shuffling image bytes.

Ray-Data shape (two slim passes, one bucketed shuffle):

1. Slim projection map: (id, aspect-bucket `ab`, order hash `h`).
   The order within a bucket is (h, id) — the same deterministic
   hash order the stratified sampler and geo-debias cap use.
2. Count pass: per-batch bincount over (ab, range-bucket-of-h) →
   tiny partial count tables → exact int64 driver reduce → global
   rank OFFSETS per (ab, hb), broadcast once. hb is the TOP 6 bits
   of h, so hb ranges partition the (h, id) order and
   `offset(ab, hb) + local_rank` IS the global rank.
3. One `bucketed_group_apply` shuffle of the slim rows: sort each
   (ab, hb) group by (h, id), add the broadcast offset, emit
   `batch_seq = rank // B`, `slot = rank % B`.

Image bytes never transit; the assignment table is (id, ab,
batch_seq, slot) — join it back map-side (broadcast or bucketed
semi-join) when materializing the packed shards.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .geo_sample import sample_hash

_HB_BITS = 6                       # 64 range buckets over the 32-bit hash
_HB_SHIFT = 32 - _HB_BITS


def aspect_bucket(w: np.ndarray, h: np.ndarray, *, step: float = 0.25,
                  max_abs: float = 2.0) -> np.ndarray:
    """log2(w/h) rounded to `step`, clamped to ±max_abs; returned as
    the integer bucket index log2(ratio)/step (0 = square)."""
    r = np.log2(np.maximum(w, 1).astype(np.float64)
                / np.maximum(h, 1).astype(np.float64))
    r = np.clip(r, -max_abs, max_abs)
    return np.round(r / step).astype(np.int64)


def pack_training_batches(images_ds, *, batch_size: int,
                          step: float = 0.25, max_abs: float = 2.0,
                          id_prefix_len: int = 3,
                          drop_last: bool = True):
    """input_hint-shaped Dataset (only image_id/w/h are read) ->
    assignment Dataset (doc_id, ab, batch_seq, slot).

    Every (ab, batch_seq) group has exactly `batch_size` members (the
    final partial batch per bucket is dropped when `drop_last`), and
    the assignment is bit-deterministic under any partitioning: order
    within a bucket is (sample_hash(id), id), offsets are exact
    integer sums.
    """
    from ..pipelines.curate_images import parse_image_ids
    from .dedup import _spread
    from .join import bucketed_group_apply

    def slim(t: pa.Table) -> pa.Table:
        empty = pa.table({"key": pa.array([], pa.int64()),
                          "doc_id": pa.array([], pa.int64()),
                          "h": pa.array([], pa.int64())})
        if len(t) == 0 or "image_id" not in t.column_names:
            return empty
        ids = parse_image_ids(t["image_id"], id_prefix_len)
        ab = aspect_bucket(t["w"].to_numpy(zero_copy_only=False),
                           t["h"].to_numpy(zero_copy_only=False),
                           step=step, max_abs=max_abs)
        hv = sample_hash(ids)
        hb = (hv >> np.int64(_HB_SHIFT)).astype(np.int64)
        key = (ab << np.int64(_HB_BITS + 1)) | hb  # ab sign-safe shift
        return pa.table({"key": key, "doc_id": ids, "h": hv})

    slim_ds = _spread(images_ds.select_columns(
        ["image_id", "w", "h"])).map_batches(
        slim, batch_format="pyarrow").materialize()

    # ---- pass 2: exact (ab, hb) counts -> global rank offsets
    def partial_counts(t: pa.Table) -> pa.Table:
        empty = pa.table({"key": pa.array([], pa.int64()),
                          "cnt": pa.array([], pa.int64())})
        if len(t) == 0 or "key" not in t.column_names:
            return empty
        k, c = np.unique(t["key"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"key": k.astype(np.int64),
                         "cnt": c.astype(np.int64)})

    counts: dict[int, int] = {}
    for b in slim_ds.map_batches(partial_counts, batch_format="pyarrow")\
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        for k, c in zip(b["key"].to_pylist(), b["cnt"].to_pylist()):
            counts[k] = counts.get(k, 0) + c

    # offsets: within each ab, hb ascending (hb = top hash bits, so
    # this ordering matches the (h, id) sort the group pass applies);
    # broadcast as sorted parallel arrays for searchsorted lookups
    key_arr = np.array(sorted(counts), np.int64)
    cnt_arr = np.array([counts[k] for k in key_arr.tolist()], np.int64)
    ab_of_key = key_arr >> np.int64(_HB_BITS + 1)
    ab_arr, ab_inv = np.unique(ab_of_key, return_inverse=True)
    totals = np.bincount(ab_inv, weights=cnt_arr).astype(np.int64)
    cum = np.concatenate(([0], np.cumsum(cnt_arr)))[:-1]
    ab_start = np.zeros(len(ab_arr), np.int64)
    first = np.concatenate(([True], ab_inv[1:] != ab_inv[:-1]))
    ab_start[ab_inv[first]] = cum[first]
    off_arr = cum - ab_start[ab_inv]          # rank offset per (ab, hb)
    mrank_arr = (totals // batch_size) * batch_size if drop_last \
        else totals
    ref = ray.put((key_arr, off_arr, ab_arr, mrank_arr))

    # ---- pass 3: one bucketed shuffle assigns (batch_seq, slot)
    def assign(g: pd.DataFrame) -> pd.DataFrame:
        ka, oa, aa, ma = ray.get(ref)
        g = g.sort_values(["key", "h", "doc_id"], kind="mergesort")
        local = g.groupby("key", sort=False).cumcount().to_numpy()
        keys = g["key"].to_numpy()
        rank = oa[np.searchsorted(ka, keys)] + local
        ab = keys >> np.int64(_HB_BITS + 1)
        lim = ma[np.searchsorted(aa, ab)]
        keep = rank < lim
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy()[keep],
            "ab": ab[keep],
            "batch_seq": rank[keep] // batch_size,
            "slot": rank[keep] % batch_size,
        })

    return bucketed_group_apply(slim_ds, "key", assign)

"""Perceptual-hash near-duplicate detection over the image corpus.

The image-payload sibling of the text SimHash pipeline: decode each
image (stub codec, `sources/images.py` — swap in PIL on a full
cluster), reduce it to a 64-bit average-hash fingerprint (the public
aHash: 8x8 block means thresholded at their global mean — robust to
re-encoding/quantization noise, which only nudges block means), then
find near-dup pairs with the SAME banded-Hamming machinery text
SimHash uses (`stages/dedup.py:fp_hamming_pairs`: pigeonhole-complete
banding, ONE capped bucketed shuffle, exact Hamming verify,
broadcast-or-join strategy dispatch).

At 100 TB the image bytes never transit a shuffle: fingerprints are
computed map-side next to the decode, and only (doc_id, fp) —
16 B/image — enters candidate generation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.images import decode_image
from .dedup import _spread, fp_hamming_pairs


def ahash_stack(stack: np.ndarray) -> np.ndarray:
    """(m, h, w) uint8 image stack -> (m,) uint64 average-hash.

    Fully vectorized across the stack: 8x8 block sums via two
    `np.add.reduceat` passes, block means thresholded at the per-image
    global block mean, bits packed LSB-first. Requires h, w >= 8."""
    m, h, w = stack.shape
    if h < 8 or w < 8:
        raise ValueError("ahash needs images at least 8x8")
    ro = (np.arange(8) * h) // 8
    co = (np.arange(8) * w) // 8
    s = np.add.reduceat(stack.astype(np.int64), ro, axis=1)
    s = np.add.reduceat(s, co, axis=2)                      # (m, 8, 8)
    hh = np.diff(np.append(ro, h))
    ww = np.diff(np.append(co, w))
    means = s / (hh[:, None] * ww[None, :])
    bits = means > means.mean(axis=(1, 2), keepdims=True)
    return (bits.reshape(m, 64).astype(np.uint64)
            << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1)


def image_fingerprints(images_ds, *, id_prefix_len: int = 3):
    """input_hint-shaped images Dataset -> (doc_id:int64, fp:int64).

    doc_id is parsed from the trailing digits of `image_id` (the
    'img%08d' convention of the synthetic corpus; adjust
    `id_prefix_len` for other prefixes). Decode is per-row (zlib is
    inherent to the codec) but hashing is vectorized per shape group,
    mirroring `sources/images.py:ImageDecodeStage`."""
    def fp_batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "fp": pa.array([], pa.int64())})
        if len(t) == 0 or "image_id" not in t.column_names:
            return empty
        ids = pc.cast(pc.utf8_slice_codeunits(
            t["image_id"], id_prefix_len, np.iinfo(np.int32).max),
            pa.int64()).to_numpy(zero_copy_only=False)
        pixels = [decode_image(buf)[0] for buf in t["bytes"].to_pylist()]
        by_shape: dict[tuple[int, int], list[int]] = {}
        for i, px in enumerate(pixels):
            by_shape.setdefault(px.shape, []).append(i)
        fp = np.empty(len(t), np.uint64)
        for shape, idxs in by_shape.items():
            idx = np.asarray(idxs, np.int64)
            fp[idx] = ahash_stack(np.stack([pixels[i] for i in idxs]))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "fp": pa.array(fp.view(np.int64))})

    return _spread(images_ds).map_batches(fp_batch,
                                          batch_format="pyarrow")


def image_dup_pairs(images_ds, *, hamming_threshold: int = 3,
                    n_bands: int = 4, max_bucket_df: int = 256,
                    id_prefix_len: int = 3) -> pa.Table:
    """Near-duplicate image pairs (a_id, b_id) with perceptual-hash
    Hamming distance <= threshold — exact over the aHash fingerprints
    (pigeonhole-complete banding + exact verify) up to the surfaced
    `max_bucket_df` cap, like the text SimHash sibling."""
    if n_bands <= hamming_threshold:
        raise ValueError("need n_bands > hamming_threshold for "
                         "pigeonhole-complete banding")
    fps = image_fingerprints(images_ds, id_prefix_len=id_prefix_len)
    return fp_hamming_pairs(fps, hamming_threshold=hamming_threshold,
                            n_bands=n_bands, max_bucket_df=max_bucket_df,
                            report_name="image_dup_pairs")

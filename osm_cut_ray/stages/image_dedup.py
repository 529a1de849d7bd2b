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


_DCT8x32 = None


def _dct_rows(n: int = 32, keep: int = 8) -> np.ndarray:
    """First `keep` rows of the orthonormal DCT-II matrix (cached)."""
    global _DCT8x32
    if _DCT8x32 is None:
        k = np.arange(n)
        d = np.sqrt(2.0 / n) * np.cos(
            np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
        d[0] /= np.sqrt(2.0)
        _DCT8x32 = np.ascontiguousarray(d[:keep])
    return _DCT8x32


def phash_stack(stack: np.ndarray) -> np.ndarray:
    """(m, h, w) uint8 stack -> (m,) uint64 DCT perceptual hash (the
    public pHash: nearest-neighbor resample to 32x32, 2-D orthonormal
    DCT-II, keep the 8x8 lowest frequencies, threshold each at the
    per-image MEDIAN of those 64 coefficients). Vectorized across the
    stack as two matrix products. Any input size (NN index resample
    up- or down-samples)."""
    m, h, w = stack.shape
    ri = (np.arange(32) * h) // 32
    ci = (np.arange(32) * w) // 32
    x = stack[:, ri][:, :, ci].astype(np.float64)       # (m, 32, 32)
    d8 = _dct_rows()
    low = np.einsum("ij,mjk,lk->mil", d8, x, d8)        # (m, 8, 8)
    flat = low.reshape(m, 64)
    med = np.median(flat, axis=1)
    bits = flat > med[:, None]
    return (bits.astype(np.uint64)
            << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1)


_HASHERS = {"ahash": ahash_stack, "phash": phash_stack}


def image_fingerprints(images_ds, *, id_prefix_len: int = 3,
                       method: str = "ahash"):
    """input_hint-shaped images Dataset -> (doc_id:int64, fp:int64).

    doc_id is parsed from the trailing digits of `image_id` (the
    'img%08d' convention of the synthetic corpus; adjust
    `id_prefix_len` for other prefixes). Decode is per-row (zlib is
    inherent to the codec) but hashing is vectorized per shape group,
    mirroring `sources/images.py:ImageDecodeStage`. `method` picks the
    fingerprint: 'ahash' (8x8 block means) or 'phash' (DCT low-freq
    median — robust where aHash confuses smooth gradients)."""
    if method not in _HASHERS:
        raise ValueError(f"method must be one of {sorted(_HASHERS)}, "
                         f"got {method!r}")
    hasher = _HASHERS[method]

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
            fp[idx] = hasher(np.stack([pixels[i] for i in idxs]))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "fp": pa.array(fp.view(np.int64))})

    return _spread(images_ds).map_batches(fp_batch,
                                          batch_format="pyarrow")


def image_dup_pairs(images_ds, *, hamming_threshold: int = 3,
                    n_bands: int = 4, max_bucket_df: int = 256,
                    id_prefix_len: int = 3,
                    method: str = "ahash") -> pa.Table:
    """Near-duplicate image pairs (a_id, b_id) with perceptual-hash
    Hamming distance <= threshold — exact over the chosen fingerprints
    (pigeonhole-complete banding + exact verify) up to the surfaced
    `max_bucket_df` cap, like the text SimHash sibling."""
    if n_bands <= hamming_threshold:
        raise ValueError("need n_bands > hamming_threshold for "
                         "pigeonhole-complete banding")
    fps = image_fingerprints(images_ds, id_prefix_len=id_prefix_len,
                             method=method)
    return fp_hamming_pairs(fps, hamming_threshold=hamming_threshold,
                            n_bands=n_bands, max_bucket_df=max_bucket_df,
                            report_name="image_dup_pairs")


class RefFpIndex:
    """Broadcastable banded index over a REFERENCE fingerprint set —
    the image analog of `stages/decontaminate.py`'s benchmark shingle
    set: build once from the existing training corpus's aHashes
    (16 B/image), `ray.put` once, probe map-side with zero shuffles.

    Banding mirrors `stages/dedup.py:fp_hamming_pairs` (pigeonhole:
    n_bands > threshold guarantees a within-threshold pair shares at
    least one exact band), so lookups are exact up to the per-probe
    `max_candidates` cap (degenerate bands — e.g. the all-flat aHash —
    are truncated with a surfaced count)."""

    def __init__(self, ref_ids: np.ndarray, ref_fps: np.ndarray,
                 n_bands: int = 4):
        self.n_bands = n_bands
        self.bits = 64 // n_bands
        fps = np.asarray(ref_fps, np.int64).view(np.uint64)
        ids = np.asarray(ref_ids, np.int64)
        self.segs, self.fps, self.ids = [], [], []
        for b in range(n_bands):
            seg = (fps >> np.uint64(b * self.bits)) \
                & np.uint64((1 << self.bits) - 1)
            order = np.argsort(seg, kind="stable")
            self.segs.append(seg[order])
            self.fps.append(fps[order])
            self.ids.append(ids[order])

    def query(self, probe_fps: np.ndarray, threshold: int,
              max_candidates: int = 4096
              ) -> tuple[np.ndarray, np.ndarray, int]:
        """probe int64 fps -> (hit mask, matched ref id or -1,
        truncated-candidate count)."""
        from .dedup import hamming64
        p = np.asarray(probe_fps, np.int64).view(np.uint64)
        hit = np.zeros(len(p), bool)
        ref = np.full(len(p), -1, np.int64)
        truncated = 0
        for b in range(self.n_bands):
            todo = np.flatnonzero(~hit)
            if len(todo) == 0:
                break
            seg = (p[todo] >> np.uint64(b * self.bits)) \
                & np.uint64((1 << self.bits) - 1)
            lo = np.searchsorted(self.segs[b], seg, side="left")
            hi = np.searchsorted(self.segs[b], seg, side="right")
            for j, i in enumerate(todo.tolist()):
                l, h = int(lo[j]), int(hi[j])
                if h - l > max_candidates:
                    truncated += h - l - max_candidates
                    h = l + max_candidates
                if h <= l:
                    continue
                d = hamming64(self.fps[b][l:h].view(np.int64),
                              np.full(h - l, p[i], np.uint64)
                              .view(np.int64))
                k = int(np.argmin(d))
                if d[k] <= threshold:
                    hit[i] = True
                    ref[i] = self.ids[b][l + k]
        return hit, ref, truncated


def build_ref_fp_index(ref_images_ds, *, n_bands: int = 4,
                       id_prefix_len: int = 3) -> RefFpIndex:
    """Fingerprint the reference corpus distributed, pull only the
    (id, fp) projection (16 B/image — the broadcast side must fit,
    same contract as the decontamination benchmark set)."""
    fps = image_fingerprints(ref_images_ds, id_prefix_len=id_prefix_len)
    ids_l, fps_l = [], []
    for b in fps.iter_batches(batch_size=None, batch_format="pyarrow"):
        if b.num_rows:
            ids_l.append(b["doc_id"].to_numpy(zero_copy_only=False))
            fps_l.append(b["fp"].to_numpy(zero_copy_only=False))
    if not ids_l:
        return RefFpIndex(np.array([], np.int64),
                          np.array([], np.int64), n_bands)
    return RefFpIndex(np.concatenate(ids_l), np.concatenate(fps_l),
                      n_bands)


def image_cross_dup_filter(new_ds, ref_index: RefFpIndex, *,
                           hamming_threshold: int = 3,
                           mode: str = "anti",
                           max_candidates: int = 4096,
                           id_prefix_len: int = 3):
    """Drop (mode='anti') or keep (mode='semi') new-corpus images
    whose aHash is within `hamming_threshold` of ANY reference image —
    cross-corpus dedup of a fresh crawl against the existing training
    set. The index rides the object store once; each batch decodes,
    hashes, and probes map-side with zero shuffles."""
    import ray
    if mode not in ("anti", "semi"):
        raise ValueError("mode must be anti|semi")
    if ref_index.n_bands <= hamming_threshold:
        raise ValueError("index n_bands must exceed hamming_threshold "
                         "for pigeonhole-complete lookups")
    ref = ray.put(ref_index)

    def fn(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "image_id" not in t.column_names:
            from ..pipelines.curate_images import EMPTY_HINT
            return EMPTY_HINT
        idx: RefFpIndex = ray.get(ref)
        pixels = [decode_image(buf)[0] for buf in t["bytes"].to_pylist()]
        by_shape: dict[tuple[int, int], list[int]] = {}
        for i, px in enumerate(pixels):
            by_shape.setdefault(px.shape, []).append(i)
        fp = np.empty(len(t), np.uint64)
        for _, idxs in by_shape.items():
            ii = np.asarray(idxs, np.int64)
            fp[ii] = ahash_stack(np.stack([pixels[i] for i in idxs]))
        hit, _refid, truncated = idx.query(fp.view(np.int64),
                                           hamming_threshold,
                                           max_candidates)
        if truncated:
            print(f"image_cross_dup_filter: {truncated} candidate(s) "
                  f"past max_candidates={max_candidates} skipped in a "
                  "degenerate band — raise the cap for exactness")
        keep = ~hit if mode == "anti" else hit
        out = t.filter(pa.array(keep))
        if len(out):
            return out
        from ..pipelines.curate_images import EMPTY_HINT
        return EMPTY_HINT

    from .dedup import _spread
    return _spread(new_ds).map_batches(fn, batch_format="pyarrow")

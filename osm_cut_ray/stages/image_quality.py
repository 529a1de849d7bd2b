"""Image quality scoring — the image-payload sibling of
`stages/text.py:TextStats` (north_star: quality gates over the 10^12
image+caption corpus so the curation pipeline can drop blank, flat,
over/under-exposed, or noise-free-synthetic frames map-side).

All scores are computed from the decoded pixel stack, vectorized per
shape group (the same grouping trick as `ImageDecodeStage` /
`ahash_stack`): per-row zlib decode is inherent to the stub codec, but
histogram/entropy/gradient math runs on whole (m, h, w) stacks. Only
scalar scores leave the stage — image bytes never transit a shuffle.

Scores (all float64, deterministic):

- ``brightness``   mean pixel / 255              (0 = black, 1 = white)
- ``contrast``     pixel stddev / 255            (0 = flat)
- ``entropy``      Shannon entropy of the 256-bin pixel histogram, in
                   bits (0 = constant image, 8 = uniform)
- ``sharpness``    mean |first difference| along x and y, / 255 — a
                   gradient-energy blur proxy (Laplacian-family)
- ``extreme_frac`` fraction of pixels at the rails (<= 1 or >= 254) —
                   clipping / dead-frame detector
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.images import decode_image


def quality_stack(stack: np.ndarray) -> dict[str, np.ndarray]:
    """(m, h, w) uint8 stack -> per-image score arrays (each (m,))."""
    m, h, w = stack.shape
    f = stack.astype(np.float64)
    brightness = f.mean(axis=(1, 2)) / 255.0
    contrast = f.std(axis=(1, 2)) / 255.0
    # per-image 256-bin histogram in ONE bincount: offset each image's
    # pixels into its own 256-wide slot
    offs = ((np.arange(m, dtype=np.int64)[:, None, None] << 8)
            | stack.astype(np.int64))
    hist = np.bincount(offs.ravel(), minlength=m * 256) \
        .reshape(m, 256).astype(np.float64)
    p = hist / float(h * w)
    ent = -(p * np.log2(np.where(p > 0.0, p, 1.0))).sum(axis=1)
    gx = (np.abs(np.diff(f, axis=2)).mean(axis=(1, 2))
          if w > 1 else np.zeros(m))
    gy = (np.abs(np.diff(f, axis=1)).mean(axis=(1, 2))
          if h > 1 else np.zeros(m))
    sharpness = (gx + gy) / 2.0 / 255.0
    extreme = ((stack <= 1) | (stack >= 254)).mean(axis=(1, 2))
    return {"brightness": brightness, "contrast": contrast,
            "entropy": ent, "sharpness": sharpness,
            "extreme_frac": extreme}


def decode_by_shape(bufs: list) -> tuple[list, dict[tuple[int, int], list[int]]]:
    """Decode a batch of image blobs and group row indices by shape so
    downstream math can run on same-shape stacks (shared by the
    decode/resize/quality/ahash stages)."""
    pixels: list = [None] * len(bufs)
    by_shape: dict[tuple[int, int], list[int]] = {}
    for i, buf in enumerate(bufs):
        px, _ = decode_image(buf)
        pixels[i] = px
        by_shape.setdefault(px.shape, []).append(i)
    return pixels, by_shape


SCORE_COLS = ("brightness", "contrast", "entropy", "sharpness",
              "extreme_frac")


def image_quality_batch(t: pa.Table) -> pa.Table:
    """input_hint-shaped batch -> (image_id, w, h, fmt, <scores>).

    Map-side `map_batches` body (stateless -> task mode; no actor pool
    needed, mirroring `decode_stage_batch`'s measured rationale)."""
    empty = pa.table({
        "image_id": pa.array([], pa.string()),
        "w": pa.array([], pa.int32()), "h": pa.array([], pa.int32()),
        "fmt": pa.array([], pa.string()),
        **{c: pa.array([], pa.float64()) for c in SCORE_COLS}})
    if len(t) == 0 or "image_id" not in t.column_names:
        return empty
    n = len(t)
    pixels, by_shape = decode_by_shape(t["bytes"].to_pylist())
    out = {c: np.empty(n, np.float64) for c in SCORE_COLS}
    for _, idxs in by_shape.items():
        idx = np.asarray(idxs, np.int64)
        scores = quality_stack(np.stack([pixels[i] for i in idxs]))
        for c in SCORE_COLS:
            out[c][idx] = scores[c]
    return pa.table({
        "image_id": t["image_id"], "w": t["w"], "h": t["h"],
        "fmt": t["fmt"],
        **{c: pa.array(out[c]) for c in SCORE_COLS}})


def image_quality(images_ds):
    """input_hint-shaped Dataset -> per-image quality-score Dataset."""
    from .dedup import _spread
    return _spread(images_ds).map_batches(image_quality_batch,
                                          batch_format="pyarrow")


def quality_keep_mask(scores: dict[str, np.ndarray], *,
                      min_entropy: float = 0.5,
                      min_contrast: float = 0.01,
                      max_extreme_frac: float = 0.9,
                      min_brightness: float = 0.02,
                      max_brightness: float = 0.98) -> np.ndarray:
    """The curation gate over `quality_stack` scores (one bool per
    image). Thresholds are deliberately loose defaults — a blank or
    constant frame fails entropy/contrast, a clipped frame fails
    extreme_frac/brightness."""
    return ((scores["entropy"] >= min_entropy)
            & (scores["contrast"] >= min_contrast)
            & (scores["extreme_frac"] <= max_extreme_frac)
            & (scores["brightness"] >= min_brightness)
            & (scores["brightness"] <= max_brightness))


def validate_images_batch(t: pa.Table) -> pa.Table:
    """Ingest-time corpus validation: decode every blob defensively
    and report rows that would poison downstream stages — undecodable
    bytes, dimension metadata disagreeing with the decoded pixels,
    empty payloads. Output: (image_id, error) for BAD rows only
    (healthy corpora produce zero rows at ~decode speed)."""
    empty = pa.table({"image_id": pa.array([], pa.string()),
                      "error": pa.array([], pa.string())})
    if len(t) == 0 or "image_id" not in t.column_names:
        return empty
    ids = t["image_id"].to_pylist()
    ws = t["w"].to_pylist()
    hs = t["h"].to_pylist()
    bad_id, bad_err = [], []
    for i, buf in enumerate(t["bytes"].to_pylist()):
        if not buf:
            bad_id.append(ids[i])
            bad_err.append("empty payload")
            continue
        try:
            px, _fmt = decode_image(buf)
        except Exception as e:                     # corrupt blob
            bad_id.append(ids[i])
            bad_err.append(f"decode failed: {type(e).__name__}")
            continue
        if px.shape != (hs[i], ws[i]):
            bad_id.append(ids[i])
            bad_err.append(
                f"dims {px.shape[1]}x{px.shape[0]} != metadata "
                f"{ws[i]}x{hs[i]}")
    return pa.table({"image_id": pa.array(bad_id, pa.string()),
                     "error": pa.array(bad_err, pa.string())})


def validate_images(images_ds):
    """input_hint-shaped Dataset -> (image_id, error) rows for every
    invalid image (empty on a healthy corpus)."""
    from .dedup import _spread
    return _spread(images_ds).map_batches(validate_images_batch,
                                          batch_format="pyarrow")

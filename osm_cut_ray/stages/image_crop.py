"""Content-aware (saliency) cropping — the smart-crop step of an
image curation pipeline (thumbnailing, aspect normalization before
patching/training): pick the (crop_w x crop_h) window with the
maximum total saliency, where saliency is the Sobel gradient
magnitude (`stages/image_filter.py:sobel_stack` — real math over the
stub codec's pixels, swap PIL in on a full cluster for real codecs).

Vectorization: per same-shape group, ONE stacked Sobel + ONE 2-D
cumsum (integral image) per stack; every candidate window sum is
four integral lookups, evaluated for ALL positions at once; argmax is
row-major so ties break (lowest y, then lowest x) deterministically.
Per-row Python is confined to the stub decode/encode, exactly like
ImageResizeStage / ImageFilterStage.

Scale shape: actor-pool `map_batches` stage, input_hint schema in and
out (bytes/w/h become the crop; crop_x/crop_y appended), so it
composes with resize/quality/patch/augment and the curate_images
pipeline. No shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.images import decode_image, encode_image
from .image_filter import sobel_stack


def saliency_windows(stack: np.ndarray, crop_h: int,
                     crop_w: int) -> tuple[np.ndarray, np.ndarray]:
    """(m, h, w) uint8 -> per-image (y, x) of the max-saliency
    crop_h x crop_w window. Saliency = Sobel magnitude; window sums
    via one integral image per stack; row-major argmax (lowest y,
    then lowest x on ties)."""
    m, h, w = stack.shape
    if crop_h > h or crop_w > w:
        raise ValueError(f"crop {crop_h}x{crop_w} exceeds image "
                         f"{h}x{w}")
    sal = sobel_stack(stack)
    # integral image with a zero top row / left column
    integ = np.zeros((m, h + 1, w + 1), np.float64)
    integ[:, 1:, 1:] = sal.cumsum(axis=1).cumsum(axis=2)
    sums = (integ[:, crop_h:, crop_w:]
            - integ[:, :-crop_h or None, crop_w:]
            - integ[:, crop_h:, :-crop_w or None]
            + integ[:, :-crop_h or None, :-crop_w or None])
    flat = np.argmax(sums.reshape(m, -1), axis=1)
    n_x = w - crop_w + 1
    return (flat // n_x).astype(np.int64), \
        (flat % n_x).astype(np.int64)


class SaliencyCropStage:
    """Actor-pool map_batches stage: decode -> per-shape stacked
    saliency argmax -> crop -> re-encode in the row's own format.
    Images already <= the crop size pass through unchanged with
    crop_x = crop_y = 0. Output schema: input_hint columns with
    bytes/w/h of the crop, plus crop_x/crop_y (int64)."""

    def __init__(self, crop_w: int, crop_h: int):
        if crop_w <= 0 or crop_h <= 0:
            raise ValueError("crop dims must be positive")
        self.cw = int(crop_w)
        self.ch = int(crop_h)

    def __call__(self, t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return t.append_column(
                "crop_x", pa.array([], pa.int64())).append_column(
                "crop_y", pa.array([], pa.int64()))
        bufs = t["bytes"].to_pylist()
        fmts = t["fmt"].to_pylist()
        out_bufs: list = [None] * n
        out_w = np.empty(n, np.int64)
        out_h = np.empty(n, np.int64)
        cx = np.zeros(n, np.int64)
        cy = np.zeros(n, np.int64)
        pixels: list = [None] * n
        by_shape: dict[tuple[int, int], list[int]] = {}
        for i, buf in enumerate(bufs):
            px, _ = decode_image(buf)
            pixels[i] = px
            h, w = px.shape
            if h <= self.ch and w <= self.cw:
                out_bufs[i] = buf          # passthrough, no re-encode
                out_h[i], out_w[i] = h, w
            else:
                # clamp per-axis: an image narrower than the crop in
                # one axis crops only the other axis
                by_shape.setdefault(px.shape, []).append(i)
        for (h, w), idxs in by_shape.items():
            ch = min(self.ch, h)
            cw = min(self.cw, w)
            stack = np.stack([pixels[i] for i in idxs])
            ys, xs = saliency_windows(stack, ch, cw)
            for j, i in enumerate(idxs):
                y, x = int(ys[j]), int(xs[j])
                out_bufs[i] = encode_image(
                    pixels[i][y:y + ch, x:x + cw], fmts[i])
                out_h[i], out_w[i] = ch, cw
                cy[i], cx[i] = y, x
        return pa.table({
            "image_id": t["image_id"],
            "bytes": pa.array(out_bufs, pa.binary()),
            "w": pa.array(out_w), "h": pa.array(out_h),
            "fmt": t["fmt"], "caption": t["caption"],
            "phash": t["phash"],
            "crop_x": pa.array(cx), "crop_y": pa.array(cy),
        })


def saliency_crop(ds, *, crop_w: int, crop_h: int,
                  concurrency=None):
    """input_hint Dataset -> cropped input_hint Dataset (+ crop_x/
    crop_y). Actor pool sized by `pip.default_pool_size` (NEVER the
    full cluster CPU count — the repo's upstream-repartition deadlock
    lesson)."""
    if concurrency is None:
        from .pip import default_pool_size
        concurrency = default_pool_size()
    return ds.map_batches(
        SaliencyCropStage,
        fn_constructor_kwargs={"crop_w": crop_w, "crop_h": crop_h},
        batch_format="pyarrow", concurrency=concurrency)

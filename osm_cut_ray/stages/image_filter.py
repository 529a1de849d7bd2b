"""Per-pixel image filters — histogram equalization, Sobel edge
magnitude, Otsu binarization — as composable input_hint-schema stages
(the enhancement/feature-extraction step of the image curation
pipeline, alongside resize/quality/augment).

All kernels run on same-shape (m, h, w) uint8 stacks, grouped by
`decode_by_shape` exactly like ImageResizeStage: per-row zlib
decode/encode is inherent to the stub codec, the math is stack-
vectorized. Published formulations:

- `equalize_stack`: Wikipedia "Histogram equalization" — lut(v) =
  round((cdf(v) - cdf_min) / (n_pix - cdf_min) * 255), per image,
  degenerate constant images pass through unchanged.
- `sobel_stack`: the 3x3 Sobel operator with edge-replicate padding;
  magnitude sqrt(gx^2 + gy^2).
- `otsu_threshold_stack`: exhaustive 256-bin between-class-variance
  maximization, LOWEST maximizing threshold on ties (deterministic);
  binarize as pixel > t -> 255 else 0.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.images import decode_image, encode_image


def _stack_hists(stack: np.ndarray) -> np.ndarray:
    """(m, h, w) uint8 -> (m, 256) int64 histograms, one bincount."""
    m = stack.shape[0]
    offs = ((np.arange(m, dtype=np.int64)[:, None, None] << 8)
            | stack.astype(np.int64))
    return np.bincount(offs.ravel(), minlength=m * 256) \
        .reshape(m, 256)


def equalize_stack(stack: np.ndarray) -> np.ndarray:
    """(m, h, w) uint8 -> equalized uint8 stack (per-image LUT)."""
    m, h, w = stack.shape
    n_pix = h * w
    cdf = _stack_hists(stack).cumsum(axis=1)
    # cdf_min = cdf at each image's lowest occupied bin = min over
    # nonzero-cdf entries; since cdf is nondecreasing and the first
    # occupied bin has cdf == its count > 0:
    cdf_min = np.where(cdf > 0, cdf, np.iinfo(np.int64).max) \
        .min(axis=1)
    denom = n_pix - cdf_min
    safe = np.maximum(denom, 1).astype(np.float64)
    lut = np.rint((cdf - cdf_min[:, None]) / safe[:, None] * 255.0)
    lut = np.clip(lut, 0, 255).astype(np.uint8)
    out = np.take_along_axis(
        lut, stack.reshape(m, -1).astype(np.int64), axis=1) \
        .reshape(m, h, w)
    # constant image: denom == 0, equalization undefined -> identity
    return np.where((denom == 0)[:, None, None], stack, out)


def sobel_stack(stack: np.ndarray) -> np.ndarray:
    """(m, h, w) uint8 -> float64 Sobel gradient magnitude stack
    (edge-replicate padding)."""
    f = np.pad(stack.astype(np.float64),
               ((0, 0), (1, 1), (1, 1)), mode="edge")
    # gx = [[-1,0,1],[-2,0,2],[-1,0,1]], gy = gx.T (y down)
    c = f[:, 1:-1, :]
    u = f[:, :-2, :]
    d = f[:, 2:, :]
    gx = ((u[:, :, 2:] - u[:, :, :-2])
          + 2.0 * (c[:, :, 2:] - c[:, :, :-2])
          + (d[:, :, 2:] - d[:, :, :-2]))
    left = f[:, :, :-2]
    right = f[:, :, 2:]
    gy = ((right[:, 2:, :] - right[:, :-2, :])
          + 2.0 * (f[:, 2:, 1:-1] - f[:, :-2, 1:-1])
          + (left[:, 2:, :] - left[:, :-2, :]))
    return np.hypot(gx, gy)


def otsu_threshold_stack(stack: np.ndarray) -> np.ndarray:
    """(m, h, w) uint8 -> (m,) uint8 Otsu thresholds (lowest
    maximizer of the between-class variance on ties)."""
    hist = _stack_hists(stack).astype(np.float64)
    n = hist.sum(axis=1, keepdims=True)
    p = hist / n
    omega = p.cumsum(axis=1)                      # class-0 weight
    mu = (p * np.arange(256)).cumsum(axis=1)      # class-0 mass mean
    mu_t = mu[:, -1:]
    denom = omega * (1.0 - omega)
    with np.errstate(divide="ignore", invalid="ignore"):
        sigma_b = np.where(denom > 0,
                           (mu_t * omega - mu) ** 2 / denom, -1.0)
    return np.argmax(sigma_b, axis=1).astype(np.uint8)


_OPS = ("equalize", "sobel_mag", "otsu_binarize")


class ImageFilterStage:
    """Actor-pool map_batches stage: decode -> per-shape stacked
    filter -> re-encode in the row's own format; input_hint schema in
    and out (bytes/w/h preserved shapes), so it composes with every
    other image stage. `op` in {"equalize", "sobel_mag",
    "otsu_binarize"}; sobel magnitude is emitted as uint8
    clip(round(mag), 0, 255)."""

    def __init__(self, op: str = "equalize"):
        if op not in _OPS:
            raise ValueError(f"op must be one of {_OPS}")
        self.op = op

    def _apply(self, stack: np.ndarray) -> np.ndarray:
        if self.op == "equalize":
            return equalize_stack(stack)
        if self.op == "sobel_mag":
            return np.clip(np.rint(sobel_stack(stack)), 0, 255) \
                .astype(np.uint8)
        t = otsu_threshold_stack(stack)
        return np.where(stack > t[:, None, None], np.uint8(255),
                        np.uint8(0))

    def __call__(self, t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return t
        bufs = t["bytes"].to_pylist()
        fmts = t["fmt"].to_pylist()
        out_bufs: list = [None] * n
        pixels: list = [None] * n
        by_shape: dict[tuple[int, int], list[int]] = {}
        for i, buf in enumerate(bufs):
            px, _ = decode_image(buf)
            pixels[i] = px
            by_shape.setdefault(px.shape, []).append(i)
        for shape, idxs in by_shape.items():
            out = self._apply(np.stack([pixels[i] for i in idxs]))
            for j, i in enumerate(idxs):
                out_bufs[i] = encode_image(out[j], fmts[i])
        return pa.table({
            "image_id": t["image_id"],
            "bytes": pa.array(out_bufs, pa.binary()),
            "w": t["w"], "h": t["h"],
            "fmt": t["fmt"], "caption": t["caption"],
            "phash": t["phash"],
        })

"""Training-time image augmentation and corpus normalization stats —
the pre-training data-prep sibling of the curation stages.

Unlike the codec boundary (sources/images.py stubs real JPEG/PNG
behind deterministic containers), every transform here is an EXACT
uint8 numpy operation — flips, rotations, transposes, crop+NN-resize
— so this stage is fully real in this container, not a stub.

`ImageAugmentStage` emits `n_variants` rows per input image: variant
0 is the identity passthrough; each other variant picks its transform
deterministically from crc32(image_id) + variant (reproducible across
runs and partitionings, no RNG state). Output keeps the input_hint
schema (image_id gains a '~a{v}' suffix for variants > 0; w/h follow
rotations) so it composes with every downstream image stage. Work is
grouped per (shape, op) and applied as stacked numpy slices; per-row
decode/encode is inherent to the codec.

`channel_stats` computes corpus pixel mean/std (the normalization
constants a training job needs) as a single streamed pass: one slim
(n, sum, sumsq) row per BATCH, then a driver fold over per-batch
partials — int64-exact sums (uint8 pixels cannot overflow int64 at
any corpus size), no shuffle at all.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..sources.images import decode_image, encode_image, resize_stack

_N_OPS = 8


def _apply_op(stack: np.ndarray, op: int) -> np.ndarray:
    """stack: (m, h, w) uint8 -> transformed stack (maybe w/h swap)."""
    if op == 0:
        return stack
    if op == 1:
        return stack[:, :, ::-1]                      # hflip
    if op == 2:
        return stack[:, ::-1, :]                      # vflip
    if op == 3:
        return stack[:, ::-1, ::-1]                   # rot180
    if op == 4:
        return np.rot90(stack, 1, axes=(1, 2))        # rot90 ccw
    if op == 5:
        return np.rot90(stack, 3, axes=(1, 2))        # rot270
    if op == 6:                                       # center crop 75%
        m, h, w = stack.shape
        ch, cw = max(1, (h * 3) // 4), max(1, (w * 3) // 4)
        y0, x0 = (h - ch) // 2, (w - cw) // 2
        return resize_stack(stack[:, y0:y0 + ch, x0:x0 + cw], h, w)
    m, h, w = stack.shape                             # op 7: TL crop 50%
    ch, cw = max(1, h // 2), max(1, w // 2)
    return resize_stack(stack[:, :ch, :cw], h, w)


class ImageAugmentStage:
    """Callable batch stage: n_variants rows per image (variant 0 =
    identity), deterministic op choice per (image_id, variant)."""

    def __init__(self, n_variants: int = 3, seed: int = 0):
        if n_variants < 1:
            raise ValueError("n_variants must be >= 1")
        self.n_variants = n_variants
        self.seed = seed

    def __call__(self, t: pa.Table) -> pa.Table:
        names = ["image_id", "bytes", "w", "h", "fmt", "caption",
                 "phash"]
        if len(t) == 0:
            return t.select([n for n in names if n in t.column_names])
        ids = t["image_id"].to_pylist()
        bufs = t["bytes"].to_pylist()
        fmts = t["fmt"].to_pylist()
        caps = t["caption"].to_pylist()
        phs = t["phash"].to_pylist()
        pixels = [decode_image(b)[0] for b in bufs]
        out = {n: [] for n in names}

        def emit(i, vid, buf, h, w):
            out["image_id"].append(ids[i] if vid == 0
                                   else f"{ids[i]}~a{vid}")
            out["bytes"].append(buf)
            out["w"].append(w)
            out["h"].append(h)
            out["fmt"].append(fmts[i])
            out["caption"].append(caps[i])
            out["phash"].append(phs[i])

        # group (row, variant) work items by (shape, op) for stacked
        # numpy transforms
        groups: dict[tuple[tuple[int, int], int], list[tuple[int, int]]] = {}
        for i, px in enumerate(pixels):
            emit(i, 0, bufs[i], px.shape[0], px.shape[1])
            base = zlib.crc32(ids[i].encode()) ^ self.seed
            for v in range(1, self.n_variants):
                op = 1 + (base + v * 0x9E3779B1) % (_N_OPS - 1)
                groups.setdefault((px.shape, op), []).append((i, v))
        for (shape, op), items in sorted(groups.items()):
            stack = np.stack([pixels[i] for i, _ in items])
            res = _apply_op(stack, op)
            for j, (i, v) in enumerate(items):
                emit(i, v, encode_image(np.ascontiguousarray(res[j]),
                                        fmts[i]),
                     res.shape[1], res.shape[2])
        return pa.table({
            "image_id": pa.array(out["image_id"]),
            "bytes": pa.array(out["bytes"], pa.binary()),
            "w": pa.array(np.asarray(out["w"], np.int32)),
            "h": pa.array(np.asarray(out["h"], np.int32)),
            "fmt": pa.array(out["fmt"]),
            "caption": pa.array(out["caption"]),
            "phash": pa.array(np.asarray(out["phash"], np.int64))})


def augment_images(images_ds, *, n_variants: int = 3, seed: int = 0,
                   batch_size: int = 1024):
    return images_ds.map_batches(
        ImageAugmentStage(n_variants=n_variants, seed=seed),
        batch_format="pyarrow", batch_size=batch_size)


def channel_stats(images_ds) -> dict:
    """-> {n_images, n_pixels, mean, std}: corpus pixel statistics in
    ONE streamed pass (per-batch int64-exact partials, driver fold)."""

    def partial(t: pa.Table) -> pa.Table:
        n = np.int64(0)
        s = np.int64(0)
        sq = np.int64(0)
        imgs = len(t)
        for buf in t["bytes"].to_pylist():
            px = decode_image(buf)[0].astype(np.int64)
            n += px.size
            s += int(px.sum())
            sq += int((px * px).sum())
        return pa.table({"imgs": pa.array([imgs], pa.int64()),
                         "n": pa.array([int(n)], pa.int64()),
                         "s": pa.array([int(s)], pa.int64()),
                         "sq": pa.array([int(sq)], pa.int64())})

    imgs = n = s = sq = 0
    for b in images_ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        if b.num_rows:
            imgs += int(pa.compute.sum(b["imgs"]).as_py() or 0)
            n += int(pa.compute.sum(b["n"]).as_py() or 0)
            s += int(pa.compute.sum(b["s"]).as_py() or 0)
            sq += int(pa.compute.sum(b["sq"]).as_py() or 0)
    if n == 0:
        return {"n_images": 0, "n_pixels": 0, "mean": 0.0, "std": 0.0}
    mean = s / n
    var = max(sq / n - mean * mean, 0.0)
    return {"n_images": imgs, "n_pixels": n, "mean": mean,
            "std": float(np.sqrt(var))}

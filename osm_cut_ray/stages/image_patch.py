"""Grid patch (tile) extraction over the image corpus — the
raster-tiling member of the north_star's multimodal family (ViT-style
training pipelines consume fixed-size patches, and the raster side of
the raster↔vector join wants per-tile rows).

Each image becomes its non-overlapping ``patch × patch`` tiles
(ragged right/bottom remainders dropped — standard tiling; images
smaller than one patch vanish). Output rows keep the full input_hint
column set and add ``patch_row`` / ``patch_col``, so a patch corpus
still composes with the quality / dedup / resize stages (captions and
the phash geotag are inherited from the parent image — a tile sits at
the parent's location for the spatial gates).

The pixel math is one reshape+transpose per shape group
((m, h, w) → (m·ny·nx, p, p), zero Python per pixel); per-patch zlib
re-encode is inherent to the stub codec. This is a row-EXPANDING
`map_batches` body (1 → ny·nx), so feed it modest batch sizes when
patches are small relative to images.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.images import encode_image
from .image_quality import decode_by_shape

PATCH_SCHEMA = pa.schema([
    ("image_id", pa.string()), ("patch_row", pa.int32()),
    ("patch_col", pa.int32()), ("bytes", pa.binary()),
    ("w", pa.int32()), ("h", pa.int32()), ("fmt", pa.string()),
    ("caption", pa.string()), ("phash", pa.int64()),
])
EMPTY_PATCHES = PATCH_SCHEMA.empty_table()


def patch_stack(stack: np.ndarray, p: int) -> tuple[np.ndarray, int, int]:
    """(m, h, w) stack -> ((m*ny*nx, p, p) patches, ny, nx) in
    row-major patch order per image."""
    m, h, w = stack.shape
    ny, nx = h // p, w // p
    if ny == 0 or nx == 0:
        return np.empty((0, p, p), stack.dtype), 0, 0
    crop = stack[:, :ny * p, :nx * p]
    tiles = crop.reshape(m, ny, p, nx, p).transpose(0, 1, 3, 2, 4)
    return np.ascontiguousarray(tiles).reshape(m * ny * nx, p, p), ny, nx


def image_patches_batch(t: pa.Table, patch: int = 16) -> pa.Table:
    if len(t) == 0 or "image_id" not in t.column_names:
        return EMPTY_PATCHES
    pixels, by_shape = decode_by_shape(t["bytes"].to_pylist())
    fmts = t["fmt"].to_pylist()
    take_idx: list[np.ndarray] = []
    rows: list[np.ndarray] = []
    cols: list[np.ndarray] = []
    bufs: list[bytes] = []
    for (h, w), idxs in by_shape.items():
        idx = np.asarray(idxs, np.int64)
        tiles, ny, nx = patch_stack(
            np.stack([pixels[i] for i in idxs]), patch)
        if ny == 0:
            continue
        per = ny * nx
        take_idx.append(np.repeat(idx, per))
        grid_r = np.repeat(np.arange(ny, dtype=np.int32), nx)
        grid_c = np.tile(np.arange(nx, dtype=np.int32), ny)
        rows.append(np.tile(grid_r, len(idx)))
        cols.append(np.tile(grid_c, len(idx)))
        for j in range(len(tiles)):
            bufs.append(encode_image(tiles[j], fmts[idx[j // per]]))
    if not take_idx:
        return EMPTY_PATCHES
    ti = pa.array(np.concatenate(take_idx))
    sel = t.take(ti)
    n = len(sel)
    return pa.table({
        "image_id": sel["image_id"],
        "patch_row": pa.array(np.concatenate(rows)),
        "patch_col": pa.array(np.concatenate(cols)),
        "bytes": pa.array(bufs, pa.binary()),
        "w": pa.array(np.full(n, patch, np.int32)),
        "h": pa.array(np.full(n, patch, np.int32)),
        "fmt": sel["fmt"], "caption": sel["caption"],
        "phash": sel["phash"],
    })


def image_patches(images_ds, *, patch: int = 16, batch_size: int = 512):
    """input_hint-shaped Dataset -> patch-row Dataset (PATCH_SCHEMA)."""
    from .dedup import _spread
    return _spread(images_ds).map_batches(
        lambda t: image_patches_batch(t, patch),
        batch_format="pyarrow", batch_size=batch_size)


AUG_OPS = ("hflip", "vflip", "rot90", "rot180", "rot270")


def aug_stack(stack: np.ndarray, op: str) -> np.ndarray:
    """Deterministic whole-stack augmentation (m, h, w) -> (m, h', w')."""
    if op == "hflip":
        return stack[:, :, ::-1]
    if op == "vflip":
        return stack[:, ::-1, :]
    if op == "rot90":
        return np.rot90(stack, 1, axes=(1, 2))
    if op == "rot180":
        return np.rot90(stack, 2, axes=(1, 2))
    if op == "rot270":
        return np.rot90(stack, 3, axes=(1, 2))
    raise ValueError(f"unknown augmentation '{op}' "
                     f"(supported: {AUG_OPS})")


def image_augment_batch(t: pa.Table, ops) -> pa.Table:
    """Row-expanding augmentation: each image emits itself (aug='')
    plus one variant per op, all in the image-table schema + an `aug`
    column. Pixel ops are whole-stack numpy views per shape group;
    per-variant zlib re-encode is inherent to the stub codec."""
    empty = pa.table({
        "image_id": pa.array([], pa.string()),
        "aug": pa.array([], pa.string()),
        "bytes": pa.array([], pa.binary()),
        "w": pa.array([], pa.int32()), "h": pa.array([], pa.int32()),
        "fmt": pa.array([], pa.string()),
        "caption": pa.array([], pa.string()),
        "phash": pa.array([], pa.int64())})
    if len(t) == 0 or "image_id" not in t.column_names:
        return empty
    for op in ops:
        if op not in AUG_OPS:
            raise ValueError(f"unknown augmentation '{op}'")
    pixels, by_shape = decode_by_shape(t["bytes"].to_pylist())
    fmts = t["fmt"].to_pylist()
    take: list[np.ndarray] = []
    augs: list[str] = []
    bufs: list[bytes] = []
    ws: list[int] = []
    hs: list[int] = []
    orig = t["bytes"].to_pylist()
    wcol = t["w"].to_pylist()
    hcol = t["h"].to_pylist()
    for (h, w), idxs in by_shape.items():
        idx = np.asarray(idxs, np.int64)
        stack = np.stack([pixels[i] for i in idxs])
        take.append(idx)
        augs.extend([""] * len(idx))
        bufs.extend(orig[i] for i in idxs)        # identity passthrough
        ws.extend(wcol[i] for i in idxs)
        hs.extend(hcol[i] for i in idxs)
        for op in ops:
            var = aug_stack(stack, op)
            oh, ow = var.shape[1], var.shape[2]
            take.append(idx)
            augs.extend([op] * len(idx))
            bufs.extend(encode_image(np.ascontiguousarray(var[j]),
                                     fmts[i])
                        for j, i in enumerate(idxs))
            ws.extend([ow] * len(idx))
            hs.extend([oh] * len(idx))
    ti = pa.array(np.concatenate(take))
    sel = t.take(ti)
    return pa.table({
        "image_id": sel["image_id"],
        "aug": pa.array(augs, pa.string()),
        "bytes": pa.array(bufs, pa.binary()),
        "w": pa.array(np.asarray(ws, np.int32)),
        "h": pa.array(np.asarray(hs, np.int32)),
        "fmt": sel["fmt"], "caption": sel["caption"],
        "phash": sel["phash"],
    })


def image_augment(images_ds, *, ops=("hflip",), batch_size: int = 512):
    """image-table Dataset -> original + augmented variants (schema +
    `aug` column). Row-expanding (1 -> 1+len(ops)): size batches so a
    batch x expansion fits the worker heap."""
    from .dedup import _spread
    return _spread(images_ds).map_batches(
        lambda t: image_augment_batch(t, ops),
        batch_format="pyarrow", batch_size=batch_size)

"""Atlas (sprite-sheet) packing: tile thumbnails into grid x grid
sheets — the corpus-inspection artifact reviewers actually open
(spot-check a 100M-image corpus by eyeballing a few thousand sheets),
and the inverse of `stages/image_patch.py`.

Deterministic without a global sort: every image hashes to one of
`n_groups` atlas groups (count-sized so groups average ~70% of one
sheet); within a group images sort by image_id and fill row-major
grid slots, spilling onto additional PAGES when a group overflows —
exact, reproducible across partitionings, no silent drops. One
bucketed shuffle of slim (group, id, thumb) rows; decode + NN-resize
are per-shape-group vectorized map-side.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources.images import decode_image, encode_image, resize_stack
from .join import bucketed_group_apply


def pack_atlases(images_ds, *, grid: int = 8, thumb: int = 16,
                 n_groups: int | None = None, fill: float = 0.7):
    """-> Dataset (atlas_id:string, page:int64, bytes, w, h, fmt,
    ids:list<string>): one row per sheet; `ids` lists the member
    image_ids in slot order (row-major; short sheets leave trailing
    slots black)."""
    if grid < 1 or thumb < 1:
        raise ValueError("grid and thumb must be >= 1")
    slots = grid * grid
    if n_groups is None:
        n = images_ds.count()
        n_groups = max(1, int(np.ceil(n / (slots * fill))))

    def slim(t: pa.Table) -> pa.Table:
        empty = pa.table({"g": pa.array([], pa.int64()),
                          "image_id": pa.array([], pa.string()),
                          "thumb": pa.array([], pa.binary())})
        if len(t) == 0:
            return empty
        ids = t["image_id"].to_pylist()
        pixels = [decode_image(b)[0] for b in t["bytes"].to_pylist()]
        out = [None] * len(ids)
        by_shape: dict = {}
        for i, px in enumerate(pixels):
            by_shape.setdefault(px.shape, []).append(i)
        for shape, idxs in by_shape.items():
            small = resize_stack(np.stack([pixels[i] for i in idxs]),
                                 thumb, thumb)
            for j, i in enumerate(idxs):
                out[i] = np.ascontiguousarray(small[j]).tobytes()
        g = np.array([zlib.crc32(s.encode()) % n_groups for s in ids],
                     np.int64)
        return pa.table({"g": pa.array(g),
                         "image_id": pa.array(ids),
                         "thumb": pa.array(out, pa.binary())})

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        empty = pa.table({
            "atlas_id": pa.array([], pa.string()),
            "page": pa.array([], pa.int64()),
            "bytes": pa.array([], pa.binary()),
            "w": pa.array([], pa.int32()),
            "h": pa.array([], pa.int32()),
            "fmt": pa.array([], pa.string()),
            "ids": pa.array([], pa.list_(pa.string()))})
        if len(df) == 0:
            return empty
        df = df.sort_values(["g", "image_id"], kind="mergesort")
        side = grid * thumb
        rows = {k: [] for k in ("aid", "page", "buf", "ids")}
        for gk, sub in df.groupby("g", sort=True):
            ids = sub["image_id"].tolist()
            thumbs = sub["thumb"].tolist()
            for p in range(0, len(ids), slots):
                chunk = ids[p:p + slots]
                sheet = np.zeros((side, side), np.uint8)
                for s, tb in enumerate(thumbs[p:p + slots]):
                    r, c = divmod(s, grid)
                    sheet[r * thumb:(r + 1) * thumb,
                          c * thumb:(c + 1) * thumb] = \
                        np.frombuffer(tb, np.uint8) \
                        .reshape(thumb, thumb)
                rows["aid"].append(f"atlas{int(gk):06d}")
                rows["page"].append(p // slots)
                rows["buf"].append(encode_image(sheet, "fpng"))
                rows["ids"].append(chunk)
        m = len(rows["aid"])
        return pa.table({
            "atlas_id": pa.array(rows["aid"], pa.string()),
            "page": pa.array(np.asarray(rows["page"], np.int64)),
            "bytes": pa.array(rows["buf"], pa.binary()),
            "w": pa.array(np.full(m, side, np.int32)),
            "h": pa.array(np.full(m, side, np.int32)),
            "fmt": pa.array(["fpng"] * m),
            "ids": pa.array(rows["ids"], pa.list_(pa.string()))})

    rows = images_ds.map_batches(slim, batch_format="pyarrow")
    return bucketed_group_apply(rows, "g", per_bucket)

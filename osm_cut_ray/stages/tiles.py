"""Density-tile rendering: bin a point corpus into a web-map tile
level and emit one grayscale IMAGE per non-empty tile — the geo x
image composition (heatmap basemaps, coverage QA, dataset debias
inspection) whose output rows feed every downstream image stage
(resize, patches, quality, WebDataset export).

Projection is equirectangular on the repo's planar-degree convention:
u = (lon + 180) / 360, v = (90 - lat) / 180, tile = floor(u * 2^z)
(right/bottom edges clamp into the last tile/pixel). Ray-Data shape:
one slim map pass emits (tile key, pixel ordinal) int64 rows — the
only thing that shuffles — then ONE `bucketed_group_apply` renders
each tile with a single np.bincount + deterministic tone map and
encodes it with the shared container codec.

Tone map (pinned by tests): c=0 -> 0; else
  log:    1 + floor(254 * log1p(c) / log1p(cmax))
  linear: 1 + floor(254 * c / cmax)
so any non-empty pixel is visible and the hottest pixel is 255.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources.images import encode_image
from .join import bucketed_group_apply

_TILE_MUL = np.int64(1 << 26)


def _project(lon: np.ndarray, lat: np.ndarray, zoom: int,
             tile_px: int):
    n = np.int64(1) << zoom
    u = np.clip((lon + 180.0) / 360.0, 0.0, np.nextafter(1.0, 0.0))
    v = np.clip((90.0 - lat) / 180.0, 0.0, np.nextafter(1.0, 0.0))
    gx = np.floor(u * float(int(n) * tile_px)).astype(np.int64)
    gy = np.floor(v * float(int(n) * tile_px)).astype(np.int64)
    lim = np.int64(int(n) * tile_px - 1)
    gx = np.minimum(gx, lim)
    gy = np.minimum(gy, lim)
    tx, px = gx // tile_px, gx % tile_px
    ty, py = gy // tile_px, gy % tile_px
    return tx, ty, py * tile_px + px


def tone_map(counts: np.ndarray, log_scale: bool) -> np.ndarray:
    """int64 counts -> uint8 (0 empty, 1..255 increasing, max -> 255)."""
    out = np.zeros(len(counts), np.uint8)
    nz = counts > 0
    if not nz.any():
        return out
    cmax = counts.max()
    if log_scale:
        scaled = np.log1p(counts[nz]) / np.log1p(cmax)
    else:
        scaled = counts[nz] / cmax
    out[nz] = (1 + np.floor(254.0 * scaled)).astype(np.uint8)
    return out


def render_density_tiles(points_ds, *, zoom: int, tile_px: int = 256,
                         x_col: str = "lon", y_col: str = "lat",
                         log_scale: bool = True, fmt: str = "fpng"):
    """-> Dataset (tz, tx, ty, n_pts, bytes, w, h, fmt): one rendered
    grayscale tile per non-empty (tx, ty) at `zoom`."""
    if not (0 <= zoom <= 24):
        raise ValueError("zoom must be in [0, 24]")

    def slim(t: pa.Table) -> pa.Table:
        lon = t[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lat = t[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        tx, ty, pix = _project(lon, lat, zoom, tile_px)
        return pa.table({"tkey": pa.array(tx * _TILE_MUL + ty),
                         "pix": pa.array(pix)})

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({
            "tz": pa.array([], pa.int32()),
            "tx": pa.array([], pa.int64()),
            "ty": pa.array([], pa.int64()),
            "n_pts": pa.array([], pa.int64()),
            "bytes": pa.array([], pa.binary()),
            "w": pa.array([], pa.int32()),
            "h": pa.array([], pa.int32()),
            "fmt": pa.array([], pa.string())})
        if len(g) == 0:
            return empty
        tk = g["tkey"].to_numpy(np.int64)
        pix = g["pix"].to_numpy(np.int64)
        order = np.argsort(tk, kind="stable")
        tk, pix = tk[order], pix[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(tk[1:] != tk[:-1]) + 1, [len(tk)]))
        rows = {k: [] for k in ("tx", "ty", "n", "buf")}
        for k in range(len(starts) - 1):
            s, e = int(starts[k]), int(starts[k + 1])
            counts = np.bincount(pix[s:e], minlength=tile_px * tile_px)
            img = tone_map(counts, log_scale) \
                .reshape(tile_px, tile_px)
            rows["tx"].append(tk[s] // _TILE_MUL)
            rows["ty"].append(tk[s] % _TILE_MUL)
            rows["n"].append(e - s)
            rows["buf"].append(encode_image(img, fmt))
        m = len(rows["tx"])
        return pa.table({
            "tz": pa.array(np.full(m, zoom, np.int32)),
            "tx": pa.array(np.asarray(rows["tx"], np.int64)),
            "ty": pa.array(np.asarray(rows["ty"], np.int64)),
            "n_pts": pa.array(np.asarray(rows["n"], np.int64)),
            "bytes": pa.array(rows["buf"], pa.binary()),
            "w": pa.array(np.full(m, tile_px, np.int32)),
            "h": pa.array(np.full(m, tile_px, np.int32)),
            "fmt": pa.array([fmt] * m)})

    rows = points_ds.map_batches(slim, batch_format="pyarrow")
    return bucketed_group_apply(rows, "tkey", per_bucket)


def _box_sum(padded: np.ndarray, r: int) -> np.ndarray:
    """Exact int64 (2r+1)^2 box sums at every interior center of a
    zero-padded array via an integral image."""
    ii = np.zeros((padded.shape[0] + 1, padded.shape[1] + 1), np.int64)
    np.cumsum(padded, axis=0, out=ii[1:, 1:])
    np.cumsum(ii[1:, 1:], axis=1, out=ii[1:, 1:])
    k = 2 * r + 1
    n = padded.shape[0] - 2 * r
    return (ii[k:k + n, k:k + n] - ii[0:n, k:k + n]
            - ii[k:k + n, 0:n] + ii[0:n, 0:n])


def smooth_tiles(tiles_ds, *, radius: int = 2):
    """Box-blur a rendered tile set ACROSS tile borders: each tile
    ships the `radius`-pixel strips its 8 neighbors need (the halo
    exchange), one bucketed shuffle assembles every input tile's
    padded window, and an exact int64 integral-image box filter
    produces floor(mean) pixels — bit-identical to blurring the
    stitched global raster (pinned by tests). Tiles absent from the
    input contribute zeros and are not emitted (density-map
    semantics). Output schema: (tz, tx, ty, bytes, w, h, fmt)."""
    if radius < 1:
        raise ValueError("radius must be >= 1")
    from ..sources.images import decode_image

    def halo_rows(t: pa.Table) -> pa.Table:
        empty = pa.table({"tkey": pa.array([], pa.int64()),
                          "place": pa.array([], pa.int8()),
                          "tz": pa.array([], pa.int32()),
                          "fmt": pa.array([], pa.string()),
                          "payload": pa.array([], pa.binary())})
        if len(t) == 0:
            return empty
        txs = t["tx"].to_numpy(zero_copy_only=False)
        tys = t["ty"].to_numpy(zero_copy_only=False)
        tzs = t["tz"].to_numpy(zero_copy_only=False)
        fmts = t["fmt"].to_pylist()
        keys, places, zs, fs, payloads = [], [], [], [], []
        for i, buf in enumerate(t["bytes"].to_pylist()):
            img = decode_image(buf)[0]
            px = img.shape[0]
            r = min(radius, px)
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    rows = img if dy == 0 else (
                        img[px - r:] if dy == 1 else img[:r])
                    sub = rows if dx == 0 else (
                        rows[:, px - r:] if dx == 1 else rows[:, :r])
                    keys.append((txs[i] + dx) * _TILE_MUL
                                + (tys[i] + dy))
                    places.append((dx + 1) * 3 + (dy + 1))
                    zs.append(tzs[i])
                    fs.append(fmts[i])
                    payloads.append(np.ascontiguousarray(sub).tobytes())
        return pa.table({
            "tkey": pa.array(np.asarray(keys, np.int64)),
            "place": pa.array(np.asarray(places, np.int8)),
            "tz": pa.array(np.asarray(zs, np.int32)),
            "fmt": pa.array(fs),
            "payload": pa.array(payloads, pa.binary())})

    def per_bucket(g) -> pa.Table:
        empty = pa.table({
            "tz": pa.array([], pa.int32()),
            "tx": pa.array([], pa.int64()),
            "ty": pa.array([], pa.int64()),
            "bytes": pa.array([], pa.binary()),
            "w": pa.array([], pa.int32()),
            "h": pa.array([], pa.int32()),
            "fmt": pa.array([], pa.string())})
        if len(g) == 0:
            return empty
        g = g.sort_values(["tkey", "place"], kind="mergesort")
        tk = g["tkey"].to_numpy(np.int64)
        pl = g["place"].to_numpy(np.int8)
        tz = g["tz"].to_numpy(np.int32)
        fmts = g["fmt"].tolist()
        pay = g["payload"].tolist()
        starts = np.concatenate(
            ([0], np.flatnonzero(tk[1:] != tk[:-1]) + 1, [len(tk)]))
        out = {k: [] for k in ("tz", "tx", "ty", "buf", "w", "fmt")}
        for kk in range(len(starts) - 1):
            s, e = int(starts[kk]), int(starts[kk + 1])
            center = [j for j in range(s, e) if pl[j] == 4]
            if not center:
                continue  # halo spill into a tile absent from input
            c = center[0]
            # infer px from the center payload (square tile)
            px = int(np.sqrt(len(pay[c])))
            r = min(radius, px)
            padded = np.zeros((px + 2 * r, px + 2 * r), np.int64)
            for j in range(s, e):
                dx, dy = pl[j] // 3 - 1, pl[j] % 3 - 1
                # this payload came FROM neighbor (-dx, -dy): place it
                # on the matching halo slab
                nr = px if dy == 0 else r
                nc = px if dx == 0 else r
                arr = np.frombuffer(pay[j], np.uint8).reshape(nr, nc)
                y0 = r if dy == 0 else (0 if dy == 1 else px + r)
                x0 = r if dx == 0 else (0 if dx == 1 else px + r)
                padded[y0:y0 + nr, x0:x0 + nc] = arr
            area = (2 * r + 1) ** 2
            img = (_box_sum(padded, r) // area).astype(np.uint8)
            out["tz"].append(tz[c])
            out["tx"].append(tk[c] // _TILE_MUL)
            out["ty"].append(tk[c] % _TILE_MUL)
            out["buf"].append(encode_image(img, fmts[c]))
            out["w"].append(px)
            out["fmt"].append(fmts[c])
        if not out["buf"]:
            return empty
        m = len(out["buf"])
        return pa.table({
            "tz": pa.array(np.asarray(out["tz"], np.int32)),
            "tx": pa.array(np.asarray(out["tx"], np.int64)),
            "ty": pa.array(np.asarray(out["ty"], np.int64)),
            "bytes": pa.array(out["buf"], pa.binary()),
            "w": pa.array(np.asarray(out["w"], np.int32)),
            "h": pa.array(np.asarray(out["w"], np.int32)),
            "fmt": pa.array(out["fmt"])})

    rows = tiles_ds.map_batches(halo_rows, batch_format="pyarrow")
    return bucketed_group_apply(rows, "tkey", per_bucket)


def tile_pyramid_level(tiles_ds, *, parent_px: int | None = None):
    """One pyramid rollup step: zoom z tiles -> zoom z-1 tiles, each
    parent assembled from its <= 4 children (absent children are
    zero) and 2x2 mean-pooled (floor) back to the child resolution.
    One bucketed shuffle per level; apply iteratively for a full
    pyramid. Output schema matches `render_density_tiles` minus
    n_pts."""
    from ..sources.images import decode_image

    def child_rows(t: pa.Table) -> pa.Table:
        empty = pa.table({"tkey": pa.array([], pa.int64()),
                          "quad": pa.array([], pa.int8()),
                          "tz": pa.array([], pa.int32()),
                          "fmt": pa.array([], pa.string()),
                          "payload": pa.array([], pa.binary())})
        if len(t) == 0:
            return empty
        txs = t["tx"].to_numpy(zero_copy_only=False)
        tys = t["ty"].to_numpy(zero_copy_only=False)
        tzs = t["tz"].to_numpy(zero_copy_only=False)
        return pa.table({
            "tkey": pa.array((txs // 2) * _TILE_MUL + tys // 2),
            "quad": pa.array(((txs % 2) * 2 + tys % 2).astype(np.int8)),
            "tz": pa.array((tzs - 1).astype(np.int32)),
            "fmt": t["fmt"],
            "payload": t["bytes"]})

    def per_bucket(g) -> pa.Table:
        empty = pa.table({
            "tz": pa.array([], pa.int32()),
            "tx": pa.array([], pa.int64()),
            "ty": pa.array([], pa.int64()),
            "bytes": pa.array([], pa.binary()),
            "w": pa.array([], pa.int32()),
            "h": pa.array([], pa.int32()),
            "fmt": pa.array([], pa.string())})
        if len(g) == 0:
            return empty
        g = g.sort_values(["tkey", "quad"], kind="mergesort")
        tk = g["tkey"].to_numpy(np.int64)
        qd = g["quad"].to_numpy(np.int8)
        tz = g["tz"].to_numpy(np.int32)
        fmts = g["fmt"].tolist()
        pay = g["payload"].tolist()
        starts = np.concatenate(
            ([0], np.flatnonzero(tk[1:] != tk[:-1]) + 1, [len(tk)]))
        out = {k: [] for k in ("tz", "tx", "ty", "buf", "w", "fmt")}
        for kk in range(len(starts) - 1):
            s, e = int(starts[kk]), int(starts[kk + 1])
            first = decode_image(pay[s])[0]
            px = first.shape[0]
            big = np.zeros((2 * px, 2 * px), np.int64)
            for j in range(s, e):
                img = decode_image(pay[j])[0] if j != s else first
                cx, cy = int(qd[j]) // 2, int(qd[j]) % 2
                big[cy * px:(cy + 1) * px, cx * px:(cx + 1) * px] = img
            pooled = ((big[0::2, 0::2] + big[1::2, 0::2]
                       + big[0::2, 1::2] + big[1::2, 1::2]) // 4) \
                .astype(np.uint8)
            out["tz"].append(tz[s])
            out["tx"].append(tk[s] // _TILE_MUL)
            out["ty"].append(tk[s] % _TILE_MUL)
            out["buf"].append(encode_image(pooled, fmts[s]))
            out["w"].append(px)
            out["fmt"].append(fmts[s])
        m = len(out["buf"])
        return pa.table({
            "tz": pa.array(np.asarray(out["tz"], np.int32)),
            "tx": pa.array(np.asarray(out["tx"], np.int64)),
            "ty": pa.array(np.asarray(out["ty"], np.int64)),
            "bytes": pa.array(out["buf"], pa.binary()),
            "w": pa.array(np.asarray(out["w"], np.int32)),
            "h": pa.array(np.asarray(out["w"], np.int32)),
            "fmt": pa.array(out["fmt"])})

    rows = tiles_ds.map_batches(child_rows, batch_format="pyarrow")
    return bucketed_group_apply(rows, "tkey", per_bucket)

"""Distributed raster connected-component labeling (4-connectivity)
over a sparse foreground-cell table (x, y) — the segmentation /
region-extraction pass for rasterized masks, density grids and
binarized tiles at corpus scale (a planet-scale raster never fits one
machine; per-tile labeling + boundary stitching is the textbook
parallel CCL formulation).

Labels are DETERMINISTIC: every component is labeled by the packed id
of its lexicographically-smallest (x, y) cell, independent of tiling
or partitioning.

Ray-Data shape:
- phase 1: cells bucket-shuffle on their tile id (tile = 2^tile_bits
  square); each bucket runs one vectorized min-label + pointer-jump
  CC pass over ALL its cells at once (edges found by searchsorted on
  packed coords — no Python loop over cells; rounds are O(log n)
  thanks to the pointer jumping, `max_rounds` RAISES).
- phase 2: tile-boundary cells only (~4n/T rows) are collected to
  the driver behind `max_boundary_cells` (the repo cap contract:
  RAISE, never silently straggle), cross-tile equivalences resolved
  by one more vectorized CC, and the label→root map broadcast via
  `ray.put` (sorted arrays + searchsorted, not a Python dict).
- phase 3: pure map-side relabel; payload never reshuffles.

Reference parity: the reference engine has no raster ops; graft-side
operator (SURVEY.md training-data / image-axis additions).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from . import join as J
from .join import bucketed_group_apply

_OFF = np.int64(1) << np.int64(30)          # coords in [-2^30, 2^30)
_MULT = np.int64(1) << np.int64(31)         # 31-bit y field
_XSTEP = _MULT                               # +x neighbor delta
_YSTEP = np.int64(1)                         # +y neighbor delta


def pack_xy(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Lexicographic-order-preserving pack of (x, y) into a POSITIVE
    int64 ((x+2^30)*2^31 + (y+2^30) <= 2^62, no sign overflow).
    Requires -2^30 <= x, y < 2^30 (RAISES otherwise)."""
    x = np.asarray(x, np.int64)
    y = np.asarray(y, np.int64)
    if len(x) and (int(x.min(initial=0)) < -_OFF or
                   int(x.max(initial=0)) >= _OFF or
                   int(y.min(initial=0)) < -_OFF or
                   int(y.max(initial=0)) >= _OFF):
        raise ValueError("raster coordinates must fit in 31 bits")
    return (x + _OFF) * _MULT + (y + _OFF)


def unpack_xy(p: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    p = np.asarray(p, np.int64)
    return p // _MULT - _OFF, p % _MULT - _OFF


def _cc_min_label(packs_sorted: np.ndarray,
                  max_rounds: int = 64) -> np.ndarray:
    """Vectorized 4-connectivity CC over SORTED unique packed cells:
    returns, per cell, the index of its component's minimum cell.
    Min-label propagation over the right/down edge lists with
    pointer jumping; RAISES past max_rounds."""
    n = len(packs_sorted)
    lab = np.arange(n, dtype=np.int64)
    if n == 0:
        return lab
    edges_a, edges_b = [], []
    for delta in (_XSTEP, _YSTEP):                # +x, +y
        q = packs_sorted + delta
        j = np.searchsorted(packs_sorted, q)
        ok = (j < n)
        ok[ok] = packs_sorted[j[ok]] == q[ok]
        edges_a.append(np.flatnonzero(ok))
        edges_b.append(j[ok])
    a = np.concatenate(edges_a)
    b = np.concatenate(edges_b)
    if len(a) == 0:
        return lab
    for _ in range(max_rounds):
        old = lab.copy()
        np.minimum.at(lab, a, old[b])
        np.minimum.at(lab, b, old[a])
        lab = np.minimum(lab, old)
        lab = lab[lab[lab]]                       # pointer jump x2
        if np.array_equal(lab, old):
            return lab
    raise ValueError(
        f"CC min-label did not converge in {max_rounds} rounds "
        "(pathological snake raster?); raise max_rounds")


def raster_components(ds, *, x_col: str = "x", y_col: str = "y",
                      tile_bits: int = 8,
                      max_boundary_cells: int = 5_000_000,
                      max_rounds: int = 64):
    """-> Dataset (x, y, label): label = packed id of the component's
    lexicographically-smallest cell (use `unpack_xy` to decode).
    Duplicate input cells are deduped map-side. See module docstring
    for the three phases."""
    import ray.data as rd

    tile = np.int64(1) << np.int64(tile_bits)
    empty = pa.table({"x": pa.array([], pa.int64()),
                      "y": pa.array([], pa.int64()),
                      "label": pa.array([], pa.int64())})

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or x_col not in t.column_names:
            return pa.table({"key": pa.array([], pa.int64()),
                             "pack": pa.array([], pa.int64())})
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        p = np.unique(pack_xy(x, y))              # map-side dedup
        x, y = unpack_xy(p)
        key = pack_xy(x >> tile_bits, y >> tile_bits)
        return pa.table({"key": pa.array(key), "pack": pa.array(p)})

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({"pack": pa.array([], pa.int64()),
                             "lab": pa.array([], pa.int64())})
        p = np.unique(g["pack"].to_numpy(np.int64))
        lab = _cc_min_label(p, max_rounds=max_rounds)
        return pa.table({"pack": pa.array(p),
                         "lab": pa.array(p[lab])})

    labeled, n = J.solidify(bucketed_group_apply(
        ds.map_batches(slim, batch_format="pyarrow"), "key", fold))
    if n == 0:
        return rd.from_arrow(empty)
    labeled = labeled.materialize()

    # ---- phase 2: boundary equivalences on the driver (capped) ----
    mask = np.int64(tile - 1)

    def boundary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"pack": pa.array([], pa.int64()),
                             "lab": pa.array([], pa.int64())})
        p = t["pack"].to_numpy(zero_copy_only=False)
        x, y = unpack_xy(p)
        on = ((x & mask) == 0) | ((x & mask) == mask) | \
             ((y & mask) == 0) | ((y & mask) == mask)
        return t.filter(pa.array(on))

    bnd = labeled.map_batches(boundary, batch_format="pyarrow") \
        .materialize()
    nb = bnd.count()
    if nb > max_boundary_cells:
        raise ValueError(
            f"{nb} tile-boundary cells exceed max_boundary_cells="
            f"{max_boundary_cells}; raise tile_bits (fewer, larger "
            "tiles) or the cap")
    if nb == 0:
        remap_packs = np.empty(0, np.int64)
        remap_roots = np.empty(0, np.int64)
    else:
        bt = pa.concat_tables([pa.table(b) for b in bnd.iter_batches(
            batch_size=None, batch_format="pyarrow") if b.num_rows])
        bp = bt["pack"].to_numpy(zero_copy_only=False)
        bl = bt["lab"].to_numpy(zero_copy_only=False)
        order = np.argsort(bp, kind="stable")
        bp, bl = bp[order], bl[order]
        # node set = distinct phase-1 labels among boundary cells
        labs, inv = np.unique(bl, return_inverse=True)
        # adjacency among boundary cells -> edges between labels
        ea, eb = [], []
        for delta in (_XSTEP, _YSTEP):
            q = bp + delta
            j = np.searchsorted(bp, q)
            ok = (j < len(bp))
            ok[ok] = bp[j[ok]] == q[ok]
            ea.append(inv[np.flatnonzero(ok)])
            eb.append(inv[j[ok]])
        a = np.concatenate(ea)
        b = np.concatenate(eb)
        root = np.arange(len(labs), dtype=np.int64)
        if len(a):
            for _ in range(max_rounds):
                old = root.copy()
                np.minimum.at(root, a, old[b])
                np.minimum.at(root, b, old[a])
                root = np.minimum(root, old)
                root = root[root[root]]
                if np.array_equal(root, old):
                    break
            else:
                raise ValueError(
                    "boundary CC did not converge; raise max_rounds")
        changed = root != np.arange(len(labs))
        remap_packs = labs[changed]
        remap_roots = labs[root[changed]]

    ref = ray.put((remap_packs, remap_roots))

    def relabel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        keys, roots = ray.get(ref)
        p = t["pack"].to_numpy(zero_copy_only=False)
        lab = t["lab"].to_numpy(zero_copy_only=False).copy()
        if len(keys):
            j = np.searchsorted(keys, lab)
            ok = (j < len(keys))
            ok[ok] = keys[j[ok]] == lab[ok]
            lab[ok] = roots[j[ok]]
        x, y = unpack_xy(p)
        return pa.table({"x": pa.array(x), "y": pa.array(y),
                         "label": pa.array(lab)})

    return labeled.map_batches(relabel, batch_format="pyarrow")


def raster_components_brute(x: np.ndarray, y: np.ndarray):
    """Driver-side BFS spec implementation (tests / tiny rasters):
    -> dict pack -> label (same min-pack labeling)."""
    p = np.unique(pack_xy(np.asarray(x, np.int64),
                          np.asarray(y, np.int64)))
    cells = set(int(v) for v in p)
    out: dict[int, int] = {}
    for start in sorted(cells):
        if start in out:
            continue
        comp = [start]
        seen = {start}
        stack = [start]
        while stack:
            c = stack.pop()
            cx = c // int(_MULT) - int(_OFF)
            cy = c % int(_MULT) - int(_OFF)
            for nx, ny in ((cx + 1, cy), (cx - 1, cy),
                           (cx, cy + 1), (cx, cy - 1)):
                q = (nx + int(_OFF)) * int(_MULT) + (ny + int(_OFF))
                if q in cells and q not in seen:
                    seen.add(q)
                    comp.append(q)
                    stack.append(q)
        lab = min(comp)
        for c in comp:
            out[c] = lab
    return out

"""S2 cell-set compaction / expansion (the h3 compactCells /
uncompactCells analog, over the repo's public-algorithm S2 ids).

`s2_compact` replaces every complete 4-sibling set by its parent,
recursively — the standard trick that turns a polygon's O(area)
cell cover into an O(perimeter) multi-level cover before shipping
it as a broadcast filter. `s2_uncompact` expands back to one fixed
level.

100-TB shape: the 4-ary S2 hierarchy is PREFIX-LOCAL — every
ancestor of a cell above `bucket_level` shares the cell's
`bucket_level` ancestor — so ONE hash-bucket shuffle on that
ancestor co-locates every possible merge below it, and each bucket
compacts its subtree independently (vectorized per level). Cells at
or above `bucket_level` are geometrically bounded (≤ 6*4^L ids
exist at level L ≤ 5 → ≤ 6144), so the cross-bucket tail is a
driver stitch over a provably tiny pool — the raster_cc /
blocking boundary pattern.

Input contract (same as h3 compact): a valid cell SET — no
duplicates, no cell an ancestor of another. Duplicates and
in-subtree ancestor overlaps RAISE in the bucket kernel; overlaps
against the coarse pool RAISE in one broadcast check pass.

Pinned in tests/test_cell_compact.py against a recursive driver
brute, with uncompact(compact(S)) == S round-trips.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geometry.cells import S2_MAX_LEVEL, s2_level, s2_parent


def _lvl(cells: np.ndarray) -> np.ndarray:
    return s2_level(cells)


def _compact_pool(cells: np.ndarray, floor_level: int = 0
                  ) -> np.ndarray:
    """Vectorized in-memory compaction down to `floor_level`."""
    cells = np.asarray(cells, np.int64)
    if len(cells) == 0:
        return cells
    levels = _lvl(cells)
    for lvl in range(int(levels.max()), floor_level, -1):
        at = cells[levels == lvl]
        if len(at) < 4:
            continue
        par = s2_parent(at, lvl - 1)
        uniq, cnt = np.unique(par, return_counts=True)
        full = uniq[cnt == 4]
        if len(full) == 0:
            continue
        drop = np.isin(par, full)
        keep = np.ones(len(cells), bool)
        keep[np.flatnonzero(levels == lvl)[drop]] = False
        cells = np.concatenate([cells[keep], full])
        levels = np.concatenate([levels[keep],
                                 np.full(len(full), lvl - 1,
                                         levels.dtype)])
    return cells


def _validate_bucket(cells: np.ndarray, levels: np.ndarray,
                     floor_level: int) -> None:
    if len(np.unique(cells)) != len(cells):
        raise ValueError("s2_compact: duplicate cell ids in input")
    for lvl in range(floor_level, int(levels.max())):
        here = cells[levels == lvl]
        deeper = cells[levels > lvl]
        if len(here) and len(deeper) \
                and np.isin(s2_parent(deeper, lvl), here).any():
            raise ValueError(
                "s2_compact: input contains a cell and one of its "
                "descendants — not a valid cell set")


def s2_compact(cells_ds, *, col: str = "cell", bucket_level: int = 5,
               num_buckets: int | None = None) -> "ray.data.Dataset":
    """-> Dataset with one `col` column: the minimal equivalent
    multi-level cover. One bucket shuffle + a bounded driver stitch
    for levels <= bucket_level."""
    import ray

    from .join import bucketed_group_apply, default_bucket_count

    if not 0 <= bucket_level <= 8:
        raise ValueError("bucket_level must be 0..8 (the driver pool "
                         "is 6*4^bucket_level ids)")
    if num_buckets is None:
        num_buckets = default_bucket_count()

    def tag(t: pa.Table) -> pa.Table:
        c = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        lv = _lvl(c)
        key = np.where(lv > bucket_level,
                       s2_parent(c, bucket_level), c)
        return pa.table({col: c, "__anc": key})

    def per_bucket(g) -> pa.Table:
        if len(g) == 0:
            return pa.table({col: pa.array([], pa.int64())})
        out = []
        for _, cg in g.groupby("__anc", sort=True):
            cells = cg[col].to_numpy().astype(np.int64)
            levels = _lvl(cells)
            _validate_bucket(cells, levels, bucket_level)
            out.append(_compact_pool(cells, bucket_level))
        return pa.table({col: np.concatenate(out)})

    tagged = cells_ds.map_batches(tag, batch_format="pyarrow")
    merged = bucketed_group_apply(tagged, "__anc", per_bucket,
                                  num_buckets=num_buckets)

    # split: fine cells stay distributed; the coarse pool is
    # geometrically bounded (<= 6*4^bucket_level) and stitches on
    # the driver
    mat = merged.materialize()

    def only_coarse(t: pa.Table) -> pa.Table:
        c = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({col: c[_lvl(c) <= bucket_level]})

    def only_fine(t: pa.Table) -> pa.Table:
        c = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({col: c[_lvl(c) > bucket_level]})

    pool = []
    for t in mat.map_batches(only_coarse, batch_format="pyarrow")\
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        if t.num_rows:
            pool.append(t[col].to_numpy(zero_copy_only=False)
                        .astype(np.int64))
    pool_cells = (np.unique(np.concatenate(pool)) if pool
                  else np.zeros(0, np.int64))
    if pool and len(np.concatenate(pool)) != len(pool_cells):
        raise ValueError("s2_compact: duplicate coarse cells")
    fine = mat.map_batches(only_fine, batch_format="pyarrow")

    if len(pool_cells):
        # cross-level overlap: no fine cell may descend from a pool
        # cell (one broadcast check pass, zero shuffles)
        pref = ray.put(pool_cells)
        pool_levels = np.unique(_lvl(pool_cells)).tolist()

        def check(t: pa.Table) -> pa.Table:
            c = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
            pl = ray.get(pref)
            for lvl in pool_levels:
                if np.isin(s2_parent(c, int(lvl)), pl).any():
                    raise ValueError(
                        "s2_compact: input contains a cell and one "
                        "of its descendants (across the coarse pool)")
            return t

        fine = fine.map_batches(check, batch_format="pyarrow")
        stitched = _compact_pool(pool_cells, 0)
        coarse_ds = ray.data.from_arrow(
            pa.table({col: pa.array(stitched, pa.int64())}))
        return fine.union(coarse_ds)
    return fine


def s2_uncompact(cells_ds, level: int, *, col: str = "cell",
                 max_fanout_levels: int = 8) -> "ray.data.Dataset":
    """Expand every cell to its descendants at `level` (cells already
    at `level` pass through). Cells DEEPER than `level` RAISE, as do
    expansions past 4^max_fanout_levels children per cell."""
    if not 0 <= level <= S2_MAX_LEVEL:
        raise ValueError(f"level must be 0..{S2_MAX_LEVEL}")

    def expand(t: pa.Table) -> pa.Table:
        c = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(c) == 0:
            return pa.table({col: pa.array([], pa.int64())})
        lv = _lvl(c)
        if (lv > level).any():
            raise ValueError(
                "s2_uncompact: input cell deeper than target level")
        if (level - lv.min()) > max_fanout_levels:
            raise ValueError(
                f"s2_uncompact: expansion of {level - lv.min()} "
                f"levels exceeds max_fanout_levels="
                f"{max_fanout_levels} (4^n children per cell)")
        u = c.view(np.uint64)
        out = []
        lsb_l = np.uint64(1) << np.uint64(2 * (S2_MAX_LEVEL - level))
        for lvl in np.unique(lv):
            sel = u[lv == lvl]
            lsb = np.uint64(1) << np.uint64(2 * (S2_MAX_LEVEL
                                                 - int(lvl)))
            n_child = 1 << (2 * (level - int(lvl)))
            start = sel - lsb + lsb_l
            step = np.uint64(2) * lsb_l
            kids = (start[:, None]
                    + np.arange(n_child, dtype=np.uint64)[None, :]
                    * step).ravel()
            out.append(kids.view(np.int64))
        return pa.table({col: np.concatenate(out)})

    return cells_ds.map_batches(expand, batch_format="pyarrow")


def _to_level(ds, level: int, col: str):
    return s2_uncompact(ds, level, col=col)


def cover_set_op(a_ds, b_ds, op: str, *, level: int,
                 col: str = "cell", compact: bool = True,
                 num_buckets: int | None = None):
    """Set algebra on two (possibly multi-level) cell covers:
    op = 'union' | 'intersect' | 'difference' (A \\ B). Both covers
    are expanded to `level` (each cell to its descendants), combined
    with ONE bucketed fold on the cell id, then re-compacted (the
    boolean-ops shape for polygon covers at scale — geofence regions
    compose without any geometry code).

    `level` must be >= every input cell's level (s2_uncompact RAISES
    otherwise)."""
    import pandas as pd

    from .join import bucketed_group_apply

    if op not in ("union", "intersect", "difference"):
        raise ValueError(f"unknown op {op!r}")
    a = _to_level(a_ds, level, col).map_batches(
        lambda t: pa.table({col: t[col],
                            "side": pa.array(
                                np.zeros(t.num_rows, np.int8))}),
        batch_format="pyarrow")
    b = _to_level(b_ds, level, col).map_batches(
        lambda t: pa.table({col: t[col],
                            "side": pa.array(
                                np.ones(t.num_rows, np.int8))}),
        batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({col: pa.array([], pa.int64())})
        cells = g[col].to_numpy().astype(np.int64)
        side = g["side"].to_numpy()
        in_a = np.unique(cells[side == 0])
        in_b = np.unique(cells[side == 1])
        if op == "union":
            out = np.union1d(in_a, in_b)
        elif op == "intersect":
            out = np.intersect1d(in_a, in_b)
        else:
            out = np.setdiff1d(in_a, in_b)
        return pa.table({col: out})

    merged = bucketed_group_apply(a.union(b), col, per_bucket,
                                  num_buckets=num_buckets)
    return s2_compact(merged, col=col,
                      num_buckets=num_buckets) if compact else merged

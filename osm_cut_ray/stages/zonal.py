"""Zonal statistics: tag every point with the polygon (zone) that
contains it and aggregate a value column per zone — the multi-polygon
generalization of the engine's flagship PIP (admin-area rollups,
per-district densities, coverage QA).

Ray-Data shape: the K compiled `PolygonIndex`es ship once via
`ray.put` (the broadcast small side); each batch tags points with a
vectorized per-polygon pass behind a bbox pre-mask (cost scales with
the points actually inside each polygon's bbox, not K x n). The
aggregate is the repo's standard partial-combine pattern: one slim
(zone, count, int64-quantized sum, min, max) row per batch per zone,
then a tiny `groupby("zone")` over rows bounded by batches x zones —
the corpus never shuffles.

Overlapping zones resolve deterministically to the LOWEST zone index
(document the polygons disjoint when that matters); points in no zone
get zone = -1. Sums are int64-quantized before the reduce (the
repo-wide bit-determinism rule).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..geometry.polygon import PolygonIndex

_QUANT = float(1 << 20)


def compile_zones(zone_specs) -> list[PolygonIndex]:
    """zone_specs: list of ring lists (each the parse_poly_file
    format) -> compiled polygon indexes."""
    return [PolygonIndex.compile(rings) for rings in zone_specs]


def _tag_batch(x: np.ndarray, y: np.ndarray, polys) -> np.ndarray:
    zone = np.full(len(x), -1, np.int64)
    todo = np.ones(len(x), bool)
    for zi, poly in enumerate(polys):
        if not todo.any():
            break
        bx0, by0, bx1, by1 = poly.bbox
        cand = todo & (x >= bx0) & (x <= bx1) & (y >= by0) & (y <= by1)
        if not cand.any():
            continue
        idx = np.flatnonzero(cand)
        hit = poly.contains(x[idx], y[idx])
        zone[idx[hit]] = zi
        todo[idx[hit]] = False
    return zone


def tag_zones(points_ds, zone_specs, *, x_col: str = "lon",
              y_col: str = "lat"):
    """Attach a `zone` column (lowest containing polygon index,
    -1 = none). Pure map-side."""
    ref = ray.put(compile_zones(zone_specs))

    def fn(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column("zone", pa.array([], pa.int64()))
        polys = ray.get(ref)
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return t.append_column("zone", pa.array(_tag_batch(x, y, polys)))

    return points_ds.map_batches(fn, batch_format="pyarrow")


def zonal_stats(points_ds, zone_specs, value_col: str, *,
                x_col: str = "lon", y_col: str = "lat",
                include_unzoned: bool = False):
    """-> Dataset (zone, n, sum, mean, min, max) of `value_col` per
    zone. Per-batch partial combine + tiny zone groupby; `sum` (and
    hence `mean`) is int64-quantized for bit-determinism."""
    ref = ray.put(compile_zones(zone_specs))

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"zone": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "sq": pa.array([], pa.int64()),
                          "mn": pa.array([], pa.float64()),
                          "mx": pa.array([], pa.float64())})
        if len(t) == 0:
            return empty
        polys = ray.get(ref)
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        zone = _tag_batch(x, y, polys)
        if not include_unzoned:
            keep = zone >= 0
            zone, v = zone[keep], v[keep]
        if len(zone) == 0:
            return empty
        uz, inv = np.unique(zone, return_inverse=True)
        n = np.bincount(inv)
        vq = np.round(v * _QUANT).astype(np.int64)
        sq = np.bincount(inv, weights=vq).astype(np.int64)
        mn = np.full(len(uz), np.inf)
        mx = np.full(len(uz), -np.inf)
        np.minimum.at(mn, inv, v)
        np.maximum.at(mx, inv, v)
        return pa.table({"zone": uz, "n": n.astype(np.int64),
                         "sq": sq, "mn": mn, "mx": mx})

    agg = points_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("zone").aggregate(
            ray.data.aggregate.Sum("n", alias_name="n"),
            ray.data.aggregate.Sum("sq", alias_name="sq"),
            ray.data.aggregate.Min("mn", alias_name="mn"),
            ray.data.aggregate.Max("mx", alias_name="mx"))

    def final(t: pa.Table) -> pa.Table:
        empty = pa.table({"zone": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "sum": pa.array([], pa.float64()),
                          "mean": pa.array([], pa.float64()),
                          "min": pa.array([], pa.float64()),
                          "max": pa.array([], pa.float64())})
        if len(t) == 0:
            return empty
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t["sq"].to_numpy(zero_copy_only=False) / _QUANT
        return pa.table({
            "zone": t["zone"],
            "n": pa.array(n),
            "sum": pa.array(s),
            "mean": pa.array(s / np.maximum(n, 1)),
            "min": t["mn"], "max": t["mx"]})

    return agg.map_batches(final, batch_format="pyarrow")

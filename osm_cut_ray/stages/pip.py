"""PIP stage — the flagship filter (reference M6/T1).

The reference applies a compiled polygon closure per streamed node
(src/osm_process_complete.erl:67-83); here the compiled
`PolygonIndex` is broadcast once via `ray.put` and rehydrated in each
actor's `__init__` (once per worker, amortized over every batch), then
evaluated vectorized over whole Arrow batches — never `ds.filter(row_fn)`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..geometry.geotag import decode_geotag
from ..geometry.polygon import PolygonIndex


class PIPStage:
    """Callable class for ``map_batches(PIPStage, concurrency=N, ...)``.

    Reads (lon, lat) columns — or decodes them from `phash` when
    ``from_phash=True`` (the graft image-corpus path) — and appends a
    boolean ``inside`` column. Zero-copy Arrow in/out.
    """

    def __init__(self, index_ref, lon_col: str = "lon", lat_col: str = "lat",
                 out_col: str = "inside", from_phash: bool = False,
                 phash_col: str = "phash"):
        self.idx: PolygonIndex = (ray.get(index_ref)
                                  if isinstance(index_ref, ray.ObjectRef)
                                  else index_ref)
        self.lon_col = lon_col
        self.lat_col = lat_col
        self.out_col = out_col
        self.from_phash = from_phash
        self.phash_col = phash_col
        # global include-ring bbox for the vectorized pre-mask: points
        # outside it can never be inside (exclude rings only subtract),
        # so the full kernel runs only on bbox candidates (round-2
        # verdict item #4)
        self.bbox = self.idx.bbox

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.from_phash:
            lon, lat = decode_geotag(
                batch[self.phash_col].to_numpy(zero_copy_only=False))
        else:
            lon = batch[self.lon_col].to_numpy(zero_copy_only=False)
            lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        lon = np.ascontiguousarray(lon, np.float64)
        lat = np.ascontiguousarray(lat, np.float64)
        xmin, ymin, xmax, ymax = self.bbox
        cand = ((lon >= xmin) & (lon <= xmax)
                & (lat >= ymin) & (lat <= ymax))
        inside = np.zeros(len(lon), dtype=bool)
        if cand.any():
            if cand.all():
                inside = self.idx.contains(lon, lat)
            else:
                inside[cand] = self.idx.contains(lon[cand], lat[cand])
        return batch.append_column(self.out_col, pa.array(inside))


def read_points_pruned(paths, polygon: PolygonIndex, *,
                       lon_col: str = "lon", lat_col: str = "lat",
                       columns=None, **read_kwargs):
    """Parquet point read with the polygon's include-ring bbox pushed
    into the scan as a row-group/fragment filter (parquet min/max
    stats pruning), feeding `PolygonIndex.bbox` into the read so only
    bbox-intersecting row groups leave storage (round-2 verdict #4 —
    "pruned read" is part of the 100-TB bar).

    Correct for any INSIDE-set computation: inside ⊆ include-ring
    bbox, so a row dropped here can never be inside. Do NOT use it for
    payload reads that must keep outside rows (the complete-mode
    keep-referenced-nodes back-join re-reads the unpruned table).
    """
    import pyarrow.dataset as pds
    import ray.data as rd
    xmin, ymin, xmax, ymax = polygon.bbox
    expr = ((pds.field(lon_col) >= xmin) & (pds.field(lon_col) <= xmax)
            & (pds.field(lat_col) >= ymin) & (pds.field(lat_col) <= ymax))
    if columns is not None:
        read_kwargs["columns"] = columns
    from ..sources.tables import strip_schema_metadata
    return strip_schema_metadata(
        rd.read_parquet(paths, filter=expr, **read_kwargs))


def default_pool_size() -> tuple[int, int]:
    """Autoscaling actor-pool bounds sized to the cluster: leave head
    room for the read/write stages so the pool doesn't starve them."""
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    return (1, max(2, ncpu - 2))


def apply_pip(ds, index: PolygonIndex, *, concurrency=None, batch_size=65536,
              use_actors: bool = False, **stage_kwargs):
    """Attach an `inside` column; the index travels through the object
    store exactly once (ray.put), not per task.

    Two execution modes:
    - tasks (default): stateless ``map_batches`` fn that ``ray.get``s
      the broadcast index per task. The compiled index is plain numpy,
      so the get is a zero-copy view of shared memory — no rebuild
      cost — and tasks reuse already-warm worker processes (no actor
      pool cold start). Right choice when per-task state hydration is
      O(1).
    - actor pool (``use_actors=True``): hydrate once per actor in
      ``__init__``. Right choice when hydration is expensive and NOT
      zero-copy (models, compiled regexes, Python indexes).
    """
    ref = ray.put(index)
    if use_actors:
        if concurrency is None:
            concurrency = default_pool_size()
        return ds.map_batches(
            PIPStage,
            fn_constructor_kwargs={"index_ref": ref, **stage_kwargs},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )

    def fn(batch: pa.Table) -> pa.Table:
        stage = PIPStage(ref, **stage_kwargs)
        return stage(batch)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)

"""Cell-assignment stage (north_star: H3 res 7-9 + S2 per row).

Stateless vectorized `map_batches` transform: reads (lon, lat) (or
decodes `phash`), appends int64 cell-id columns. Pure numpy — no
per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geometry import cells as C
from ..geometry.geotag import decode_geotag


def assign_cells(batch: pa.Table, *, lon_col: str = "lon",
                 lat_col: str = "lat", from_phash: bool = False,
                 phash_col: str = "phash", s2_level: int = 12,
                 hex_resolutions: tuple[int, ...] = (7, 8, 9)) -> pa.Table:
    if from_phash:
        lon, lat = decode_geotag(batch[phash_col].to_numpy(zero_copy_only=False))
    else:
        lon = np.asarray(batch[lon_col].to_numpy(zero_copy_only=False),
                         np.float64)
        lat = np.asarray(batch[lat_col].to_numpy(zero_copy_only=False),
                         np.float64)
    if from_phash:
        batch = batch.append_column("lon", pa.array(lon))
        batch = batch.append_column("lat", pa.array(lat))
    batch = batch.append_column(f"s2_{s2_level}",
                                pa.array(C.s2_cell_id(lon, lat, s2_level)))
    for res in hex_resolutions:
        batch = batch.append_column(f"hex_{res}",
                                    pa.array(C.hex_cell(lon, lat, res)))
    return batch


def with_cells(ds, **kwargs):
    """`ds.map_batches` wrapper: stateless task pool, Arrow in/out."""
    return ds.map_batches(lambda b: assign_cells(b, **kwargs),
                          batch_format="pyarrow")

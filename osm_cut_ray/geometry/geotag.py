"""phash <-> (lon, lat) geotag codec (FIXTURES.md §1).

The graft input table carries its geotag inside the int64 `phash`
column: ``phash = (lon_q << 32) | lat_q`` with
``lon_q = uint32((lon+180)/360 * 2^32)`` and
``lat_q = uint32((lat+90)/180 * 2^32)``.

Both directions are pure vectorized integer/float math — used inside
`map_batches` with zero-copy numpy views of the Arrow column.
"""

from __future__ import annotations

import numpy as np

_SCALE = float(2 ** 32)


def encode_geotag(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """(lon, lat) float64 arrays -> int64 phash array."""
    lon_q = np.clip((np.asarray(lon, np.float64) + 180.0) / 360.0 * _SCALE,
                    0, _SCALE - 1).astype(np.uint64)
    lat_q = np.clip((np.asarray(lat, np.float64) + 90.0) / 180.0 * _SCALE,
                    0, _SCALE - 1).astype(np.uint64)
    return ((lon_q << np.uint64(32)) | lat_q).view(np.int64)


def decode_geotag(phash: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """int64 phash array -> (lon, lat) float64 arrays."""
    u = np.asarray(phash, np.int64).view(np.uint64)
    lon = (u >> np.uint64(32)).astype(np.float64) / _SCALE * 360.0 - 180.0
    lat = (u & np.uint64(0xFFFFFFFF)).astype(np.float64) / _SCALE * 180.0 - 90.0
    return lon, lat

"""Geohash codec (the public Niemeyer base-32 algorithm) — a third
cell family beside the hex and S2 indexers, and the one whose outputs
can be checked against PUBLISHED test vectors (geohash.org examples),
unlike the from-spec S2 reimplementation.

Vectorized: encode interleaves quantized lon/lat bits across numpy
arrays (5 bits per character, lon first on even bits); decode walks
the characters back to the cell bbox. Both are pure functions —
map-side in any pipeline, no state, no shuffle.
"""

from __future__ import annotations

import numpy as np

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_B32_INV = {c: i for i, c in enumerate(_B32)}


def geohash_encode(lon: np.ndarray, lat: np.ndarray,
                   precision: int = 9) -> np.ndarray:
    """(lon, lat) arrays -> object array of geohash strings."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    nbits = precision * 5
    lon_bits = (nbits + 1) // 2   # lon gets bit 0 (the first bit)
    lat_bits = nbits // 2
    qlon = np.clip(((lon + 180.0) / 360.0 * (1 << lon_bits))
                   .astype(np.int64), 0, (1 << lon_bits) - 1)
    qlat = np.clip(((lat + 90.0) / 180.0 * (1 << lat_bits))
                   .astype(np.int64), 0, (1 << lat_bits) - 1)
    # interleave: even bit positions (0,2,..) from lon, odd from lat,
    # most-significant first
    bits = np.zeros((len(lon), nbits), np.uint8)
    for i in range(lon_bits):
        bits[:, 2 * i] = (qlon >> np.int64(lon_bits - 1 - i)) & 1
    for i in range(lat_bits):
        bits[:, 2 * i + 1] = (qlat >> np.int64(lat_bits - 1 - i)) & 1
    vals = bits.reshape(len(lon), precision, 5)
    codes = (vals * np.array([16, 8, 4, 2, 1], np.uint8)).sum(axis=2)
    lut = np.array(list(_B32))
    chars = lut[codes]
    return np.array(["".join(row) for row in chars], dtype=object)


def geohash_encode_int(lon: np.ndarray, lat: np.ndarray,
                       precision: int = 9) -> np.ndarray:
    """Same interleaved bits as the string form, packed into int64
    (precision <= 12 fits 60 bits) — plugs geohash cells straight into
    the engine's int64-cell operators (salted counts, geo-debias
    sampling, heavy hitters)."""
    if precision > 12:
        raise ValueError("precision > 12 exceeds int64")
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    nbits = precision * 5
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    qlon = np.clip(((lon + 180.0) / 360.0 * (1 << lon_bits))
                   .astype(np.int64), 0, (1 << lon_bits) - 1)
    qlat = np.clip(((lat + 90.0) / 180.0 * (1 << lat_bits))
                   .astype(np.int64), 0, (1 << lat_bits) - 1)
    out = np.zeros(len(lon), np.int64)
    for i in range(lon_bits):
        bit = (qlon >> np.int64(lon_bits - 1 - i)) & 1
        out |= bit << np.int64(nbits - 1 - 2 * i)
    for i in range(lat_bits):
        bit = (qlat >> np.int64(lat_bits - 1 - i)) & 1
        out |= bit << np.int64(nbits - 2 - 2 * i)
    return out


def geohash_decode(hashes) -> tuple[np.ndarray, np.ndarray,
                                    np.ndarray, np.ndarray]:
    """geohash strings -> (lon_min, lat_min, lon_max, lat_max) cell
    bboxes (center = midpoint)."""
    out = [np.empty(len(hashes), np.float64) for _ in range(4)]
    for j, h in enumerate(hashes):
        lon_lo, lon_hi = -180.0, 180.0
        lat_lo, lat_hi = -90.0, 90.0
        even = True
        for ch in str(h):
            code = _B32_INV[ch]
            for b in (16, 8, 4, 2, 1):
                if even:
                    mid = (lon_lo + lon_hi) / 2
                    if code & b:
                        lon_lo = mid
                    else:
                        lon_hi = mid
                else:
                    mid = (lat_lo + lat_hi) / 2
                    if code & b:
                        lat_lo = mid
                    else:
                        lat_hi = mid
                even = not even
        out[0][j], out[1][j] = lon_lo, lat_lo
        out[2][j], out[3][j] = lon_hi, lat_hi
    return out[0], out[1], out[2], out[3]

"""Deterministic derivations of spatial tables from the sf parquet corpus.

The correctness gate runs every Ray pipeline against an ANSI-SQL oracle
on the same parquet inputs (TESTDATA.md). Spatial inputs (points, ways,
relations, image geotags) are derived deterministically from the
`events` / `lineitem` tables with formulas mirrored VERBATIM in the SQL
strings, chosen so every decision is exact in float64 on both engines:

- coordinates are dyadic rationals (k / 1024): IEEE-exact in both
  numpy and DuckDB, so point-on-edge sign tests agree bit-for-bit;
- the cut polygon is a CONVEX integer-vertex pentagon, so the SQL
  oracle can express PIP as half-plane sign tests (cross >= 0 == the
  kernel's on-edge-is-inside rule) while the engine runs the real
  ray-cast kernel;
- aggregate floats are quantized to int64 (cents) BEFORE summing so
  sums are order-independent and hash-identical across engines.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

LON_MUL, LON_MOD = 48271, 368640     # lon = (id*MUL % MOD)/1024 - 180
LAT_MUL, LAT_MOD = 69621, 184320     # lat = (id*MUL % MOD)/1024 - 90

# Convex CCW pentagon with integer vertices — the cut shape for the
# oracle-checked spatial queries (engine side uses the real ray-cast
# PolygonIndex; SQL side uses half-plane tests; both exact).
PENTAGON = [(-120.0, -60.0), (0.0, -80.0), (120.0, -60.0),
            (80.0, 60.0), (-80.0, 60.0)]

GRID_DEG = 0.5  # tile size for grid-cell queries

# relation-graph edge step: relation u contains relation (u - REL_STEP)
REL_STEP = 7


def lon_of(ids: np.ndarray) -> np.ndarray:
    return ((ids.astype(np.int64) * LON_MUL) % LON_MOD) / 1024.0 - 180.0


def lat_of(ids: np.ndarray) -> np.ndarray:
    return ((ids.astype(np.int64) * LAT_MUL) % LAT_MOD) / 1024.0 - 90.0


def sql_lon(id_expr: str) -> str:
    return f"(({id_expr} * {LON_MUL}) % {LON_MOD}) / 1024.0 - 180.0"


def sql_lat(id_expr: str) -> str:
    return f"(({id_expr} * {LAT_MUL}) % {LAT_MOD}) / 1024.0 - 90.0"


def sql_convex_pip(lon_expr: str = "lon", lat_expr: str = "lat",
                   poly: list[tuple[float, float]] | None = None) -> str:
    """Half-plane AND over the convex CCW polygon's edges.

    cross((P2-P1), (P-P1)) >= 0 for every edge == inside-or-on-edge,
    matching the kernel's on-edge-is-inside tie rule
    (reference: src/osm_polygon_compiler.erl:698-699).
    """
    poly = poly or PENTAGON
    terms = []
    for i in range(len(poly)):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % len(poly)]
        terms.append(
            f"(({x2} - {x1}) * ({lat_expr} - {y1})"
            f" - ({y2} - {y1}) * ({lon_expr} - {x1})) >= 0")
    return "(" + " AND ".join(terms) + ")"


def sql_grid_cell(lon_expr: str = "lon", lat_expr: str = "lat",
                  cell_deg: float = GRID_DEG) -> str:
    """Mirror of geometry.cells.grid_cell — same expression shape."""
    return (f"(CAST(floor(({lon_expr} + 180.0) / {cell_deg}) AS BIGINT)"
            f" * 4294967296)"
            f" + CAST(floor(({lat_expr} + 90.0) / {cell_deg}) AS BIGINT)")


def points_batch(t: pa.Table, id_col: str = "event_id") -> pa.Table:
    """events batch -> (id, lon, lat) points (vectorized)."""
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table({"id": ids, "lon": lon_of(ids), "lat": lat_of(ids)})


# --- image corpus derivation (input_hint shape) -------------------------

def image_ids_from_lineitem(t: pa.Table) -> np.ndarray:
    """Unique int64 image key per lineitem row (l_linenumber is 1..7)."""
    ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    ln = t["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
    return ok * 8 + ln


SQL_IMAGE_ID = "(l_orderkey * 8 + l_linenumber)"


def sql_quantized_lonlat(id_expr: str) -> tuple[str, str]:
    """SQL mirror of encode_geotag∘decode_geotag quantization: the
    engine routes coordinates through the int64 phash (FIXTURES.md §1);
    the oracle replays the same floor-quantization in double math."""
    lon_raw = sql_lon(id_expr)
    lat_raw = sql_lat(id_expr)
    lon_q = f"floor((({lon_raw}) + 180.0) / 360.0 * 4294967296.0)"
    lat_q = f"floor((({lat_raw}) + 90.0) / 180.0 * 4294967296.0)"
    return (f"(({lon_q}) / 4294967296.0 * 360.0 - 180.0)",
            f"(({lat_q}) / 4294967296.0 * 180.0 - 90.0)")

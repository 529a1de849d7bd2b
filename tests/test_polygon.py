"""PIP kernel golden tests.

Every probe point ported from the reference suite
/root/reference/test/poligon_compiler_SUITE.erl (bbox :111-121, convex
triangle :124-134, non-convex quad :136-146, slanted triangle
:148-172), each polygon checked in BOTH winding orders (:99-104).
On-edge and on-vertex points are inside (:141-171).
"""

import numpy as np
import pytest

from osm_cut_ray.geometry.polygon import (PolygonIndex, parse_poly_text)

BBOX = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]
CONVEX_TRI = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0)]
NONCONVEX = [(-5.0, 0.0), (5.0, 0.0), (-5.0, 10.0), (5.0, 10.0)]
SLANTED = [(0.0, 0.0), (5.0, 0.0), (10.0, 5.0)]

CASES = [
    # (polygon, inside points, outside points)
    (BBOX,
     [(5, 5), (0, 0), (10, 5)],
     [(-5, 0), (15, 5), (5, -5), (5, 15)]),
    (CONVEX_TRI,
     [(0, 0), (5, 5), (3, 3)],
     [(0, 10), (3, 7)]),
    (NONCONVEX,
     [(0, 0), (0, 5), (1, 3)],
     [(1, 5), (10, 7)]),
    (SLANTED,
     [(0, 0), (5, 0), (10, 5), (9.8, 4.9), (9.85, 4.9), (9.9, 4.9),
      (0.3, 0.1), (5, 0.01), (4.7, 0.01)],
     [(10, 10), (0, 10), (9, 0), (9.75, 4.9), (9.95, 4.9), (10, 4.9),
      (10, 0), (15, 5), (0.3, 0.4), (5.1, 0.01)]),
]


def _check(poly_points, inside, outside):
    idx = PolygonIndex.compile([("include", poly_points)])
    pts = inside + outside
    x = np.array([p[0] for p in pts], dtype=np.float64)
    y = np.array([p[1] for p in pts], dtype=np.float64)
    got = idx.contains(x, y)
    want = np.array([True] * len(inside) + [False] * len(outside))
    bad = [(pts[i], bool(got[i])) for i in range(len(pts)) if got[i] != want[i]]
    assert not bad, f"mismatches (point, got): {bad}"


@pytest.mark.parametrize("case", CASES, ids=["bbox", "convex", "nonconvex",
                                             "slanted"])
def test_golden_probes_forward(case):
    _check(*case)


@pytest.mark.parametrize("case", CASES, ids=["bbox", "convex", "nonconvex",
                                             "slanted"])
def test_golden_probes_reversed_winding(case):
    poly, inside, outside = case
    _check(list(reversed(poly)), inside, outside)


def test_exclude_ring_composition():
    # include triangle minus an interior box (FIXTURES.md §3);
    # compiler.erl:168-180 composition: any-include AND NOT any-exclude.
    idx = PolygonIndex.compile([
        ("include", SLANTED),
        ("exclude", [(1.0, 0.2), (2.0, 0.2), (2.0, 0.8), (1.0, 0.8)]),
    ])
    # hole swallows (1.5, 0.4); just-outside-hole point stays in
    assert not idx.contains_point(1.5, 0.4)
    assert idx.contains_point(2.5, 0.3)
    # on-edge of the exclude ring is inside the exclude ring => excluded
    assert not idx.contains_point(1.0, 0.5)


def test_banded_index_matches_dense():
    # A many-edge star polygon crosses the banding threshold; verify the
    # banded path agrees with a brute-force small compile of the same ring.
    rng = np.random.default_rng(42)
    n = 500
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    rad = 5.0 + 2.0 * np.sin(7 * ang)
    ring = list(zip(10 + rad * np.cos(ang), 20 + rad * np.sin(ang)))
    idx = PolygonIndex.compile([("include", ring)])
    assert idx.include[0].band_start is not None  # banding active

    import osm_cut_ray.geometry.polygon as P
    old = P._BAND_MIN_EDGES
    P._BAND_MIN_EDGES = 10 ** 9
    try:
        dense = PolygonIndex.compile([("include", ring)])
        assert dense.include[0].band_start is None
    finally:
        P._BAND_MIN_EDGES = old

    x = rng.uniform(0, 20, 5000)
    y = rng.uniform(10, 30, 5000)
    np.testing.assert_array_equal(idx.contains(x, y), dense.contains(x, y))


def test_poly_parser():
    text = """australia_v
first_area
     0.1446693E+03    -0.3826255E+02
     0.1446627E+03    -0.3825661E+02
     0.1446763E+03    -0.3824465E+02
END
!hole
     1.0 2.0
     3.0 4.0
     5.0 2.0
END
END
"""
    rings = parse_poly_text(text)
    assert len(rings) == 2
    assert rings[0][0] == "include" and len(rings[0][1]) == 3
    assert rings[0][1][0] == (pytest.approx(144.6693), pytest.approx(-38.26255))
    assert rings[1][0] == "exclude" and rings[1][1][1] == (3.0, 4.0)


def test_simple_poly_triangle():
    # mirror of test/processor_SUITE_data/poly/simple.poly: triangle
    # (0,0) (5,0) (10,5) — node containment drives the e2e golden sets.
    text = "poly\narea\n0 0\n5 0\n10 5\nEND\nEND\n"
    idx = PolygonIndex.compile(parse_poly_text(text))
    assert idx.contains_point(0, 0)      # node 1
    assert idx.contains_point(5, 0)      # node 2
    assert idx.contains_point(10, 5)     # node 3
    assert not idx.contains_point(10, 10)  # node 4
    assert not idx.contains_point(0, 10)   # node 5
    assert not idx.contains_point(15, 15)  # node 6

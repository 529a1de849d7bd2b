"""Property-based PIP verification (SURVEY §7.4: property-test the
kernel against an independent implementation).

For CONVEX polygons, inside-or-on-edge is exactly the AND of half-plane
sign tests — an independent formulation of the same decision function
(the oracle SQL uses it too). The ray-cast kernel must agree on every
point, including vertices and on-edge points, for random convex
polygons in both windings.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_cut_ray.geometry.polygon import PolygonIndex


def _convex_polygon(rng_seed: int, n: int) -> np.ndarray:
    """Random convex polygon: points on a wobbled circle, hull order.
    Integer-snapped vertices so on-edge probes are exactly on edges."""
    rng = np.random.default_rng(rng_seed)
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(20, 100)
    pts = np.stack([np.round(rad * np.cos(ang)),
                    np.round(rad * np.sin(ang))], axis=1)
    # dedupe and take convex hull by gift wrapping via angle sort
    pts = np.unique(pts, axis=0)  # sorted lexicographically
    if len(pts) < 3:
        return None

    # Andrew monotone chain -> strictly convex CCW hull
    def half(points):
        out = []
        for p in points:
            while len(out) >= 2:
                a, b = out[-2], out[-1]
                if (b[0] - a[0]) * (p[1] - a[1]) \
                        - (b[1] - a[1]) * (p[0] - a[0]) > 0:
                    break
                out.pop()
            out.append(tuple(p))
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    hull = np.array(lower[:-1] + upper[:-1])
    return hull if len(hull) >= 3 else None


def _halfplane_inside(poly: np.ndarray, x: np.ndarray,
                      y: np.ndarray) -> np.ndarray:
    ok = np.ones(len(x), dtype=bool)
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        ok &= ((x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)) >= 0
    return ok


@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 10 ** 6), n=st.integers(4, 24),
       reverse=st.booleans())
def test_raycast_matches_halfplane_on_convex(seed, n, reverse):
    poly = _convex_polygon(seed, n)
    if poly is None:
        return
    ring = poly[::-1] if reverse else poly
    idx = PolygonIndex.compile([("include", [tuple(p) for p in ring])])

    rng = np.random.default_rng(seed + 1)
    # random interior/exterior probes on a half-integer grid (exact
    # arithmetic, never float-ambiguous vs either formulation)
    x = np.round(rng.uniform(-120, 120, 300) * 2) / 2
    y = np.round(rng.uniform(-120, 120, 300) * 2) / 2
    # plus every vertex and every edge midpoint (boundary => inside)
    mids = (poly + np.roll(poly, -1, axis=0)) / 2.0
    x = np.concatenate([x, poly[:, 0], mids[:, 0]])
    y = np.concatenate([y, poly[:, 1], mids[:, 1]])

    got = idx.contains(x, y)
    want = _halfplane_inside(poly, x, y)
    bad = np.flatnonzero(got != want)
    assert len(bad) == 0, \
        f"poly={poly.tolist()} first bad point=({x[bad[0]]},{y[bad[0]]}) " \
        f"got={got[bad[0]]} want={want[bad[0]]}"

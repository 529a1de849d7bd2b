"""Marching-squares contour extraction vs an independent scalar
implementation (stages/contour.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from osm_cut_ray.stages.contour import (contour_segments, grid_to_world,
                                        rasterize_points)

_EDGE_CORNERS = {0: ("ll", "lr"), 1: ("lr", "ur"),
                 2: ("ul", "ur"), 3: ("ll", "ul")}
_CORNER_EDGES = {"ll": (0, 3), "lr": (0, 1),
                 "ur": (1, 2), "ul": (2, 3)}


def brute_contours(V, levels, default=0.0):
    """Independent scalar marching squares over dense V[x, y], padded
    by one default ring (the distributed version evaluates every
    square touching a data cell). Connectivity from first principles:
    2 crossed edges -> join them; 4 crossed (saddle) -> the center
    average decides which corners are isolated, and each isolated
    corner's two incident edges pair up."""
    W, H = V.shape
    P = np.full((W + 2, H + 2), default, float)
    P[1:-1, 1:-1] = V
    segs = set()
    for level in levels:
        level = float(level)
        for x in range(W + 1):
            for y in range(H + 1):
                c = {"ll": P[x, y], "lr": P[x + 1, y],
                     "ur": P[x + 1, y + 1], "ul": P[x, y + 1]}
                inside = {k: v >= level for k, v in c.items()}
                crossed = [e for e, (p, q) in _EDGE_CORNERS.items()
                           if inside[p] != inside[q]]
                if not crossed:
                    continue

                def pt(e):
                    p, q = _EDGE_CORNERS[e]
                    t = (level - c[p]) / (c[q] - c[p])
                    base = {"ll": (0.0, 0.0), "lr": (1.0, 0.0),
                            "ur": (1.0, 1.0), "ul": (0.0, 1.0)}
                    px, py = base[p]
                    qx, qy = base[q]
                    return (x - 1 + px + t * (qx - px),
                            y - 1 + py + t * (qy - py))

                def add(ea, eb):
                    a, b = pt(ea), pt(eb)
                    a = (round(a[0], 9), round(a[1], 9))
                    b = (round(b[0], 9), round(b[1], 9))
                    segs.add((level, min(a, b), max(a, b)))

                if len(crossed) == 2:
                    add(*crossed)
                else:  # saddle: 4 crossings
                    center_in = sum(c.values()) / 4.0 >= level
                    iso = [k for k, v in inside.items()
                           if v != center_in]
                    assert len(iso) == 2
                    for k in iso:
                        add(*_CORNER_EDGES[k])
    return segs


def seg_set(ds):
    t = ds.take_all()
    out = set()
    for r in t:
        a = (round(r["x1"], 9), round(r["y1"], 9))
        b = (round(r["x2"], 9), round(r["y2"], 9))
        out.add((r["level"], min(a, b), max(a, b)))
    return out


def cells_from_dense(V):
    W, H = V.shape
    ix, iy = np.meshgrid(np.arange(W), np.arange(H), indexing="ij")
    return rd.from_arrow(pa.table({
        "ix": pa.array(ix.ravel().astype(np.int64)),
        "iy": pa.array(iy.ravel().astype(np.int64)),
        "value": pa.array(V.ravel().astype(np.float64))}))


def test_contour_matches_brute_randomized():
    rng = np.random.default_rng(7)
    for trial in range(4):
        W, H = int(rng.integers(5, 24)), int(rng.integers(5, 20))
        V = rng.integers(0, 6, size=(W, H)).astype(float)
        levels = [0.5, 2.0, 4.5]  # integer level exercises >= ties
        ds = cells_from_dense(V)
        got = seg_set(contour_segments(ds, levels, tile=8))
        want = brute_contours(V, levels)
        assert got == want, f"trial {trial}: {len(got)} vs {len(want)}"


def test_contour_negative_indices_and_partitioning():
    rng = np.random.default_rng(11)
    W, H = 17, 13
    V = rng.random((W, H)) * 3.0
    # shift the grid to negative coordinates: same segments shifted
    t = pa.table({
        "ix": pa.array((np.repeat(np.arange(W), H) - 9)
                       .astype(np.int64)),
        "iy": pa.array((np.tile(np.arange(H), W) - 40)
                       .astype(np.int64)),
        "value": pa.array(V.ravel().astype(np.float64))})
    ds = rd.from_arrow(t)
    got = seg_set(contour_segments(ds, [1.5], tile=8))
    got_rep = seg_set(contour_segments(
        ds.repartition(7), [1.5], tile=8))
    assert got == got_rep and len(got) > 0
    base = seg_set(contour_segments(cells_from_dense(V), [1.5],
                                    tile=8))
    shifted = {(lv, (a[0] - 9, a[1] - 40), (b[0] - 9, b[1] - 40))
               for lv, a, b in base}
    shifted = {(lv, (round(a[0], 9), round(a[1], 9)),
                (round(b[0], 9), round(b[1], 9)))
               for lv, a, b in shifted}
    assert got == shifted


def test_contour_closed_loops():
    """A compact bump above the level yields closed loops: every
    vertex is shared by exactly two segments."""
    x = np.arange(20) - 9.5
    V = np.exp(-(x[:, None] ** 2 + x[None, :] ** 2) / 30.0) * 10.0
    got = seg_set(contour_segments(cells_from_dense(V), [3.0],
                                   tile=8))
    assert len(got) > 8
    from collections import Counter
    cnt = Counter()
    for _, a, b in got:
        cnt[a] += 1
        cnt[b] += 1
    assert set(cnt.values()) == {2}


def test_contour_degenerates():
    flat = cells_from_dense(np.full((6, 6), 2.0))
    assert contour_segments(flat, [5.0], tile=4).count() == 0
    # default BELOW the level: the data/void boundary contours
    got_b = seg_set(contour_segments(flat, [-1.0], tile=4,
                                     default=-2.0))
    want_b = brute_contours(np.full((6, 6), 2.0), [-1.0],
                            default=-2.0)
    assert got_b == want_b and len(got_b) > 0
    single = cells_from_dense(np.array([[7.0]]))
    got = seg_set(contour_segments(single, [1.0], tile=4))
    want = brute_contours(np.array([[7.0]]), [1.0])
    assert got == want and len(got) == 4
    with pytest.raises(ValueError):
        contour_segments(flat, [])
    with pytest.raises(ValueError):
        contour_segments(flat, [1.0], tile=1)


def test_rasterize_points_matches_pandas():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-10, 10, 5000)
    lat = rng.uniform(40, 50, 5000)
    ds = rd.from_arrow(pa.table({"lon": pa.array(lon),
                                 "lat": pa.array(lat)}))
    out = rasterize_points(ds.repartition(6), cell=0.5).take_all()
    got = {(r["ix"], r["iy"]): r["value"] for r in out}
    import pandas as pd
    df = pd.DataFrame({
        "ix": np.floor((lon + 180.0) / 0.5).astype(np.int64),
        "iy": np.floor((lat + 90.0) / 0.5).astype(np.int64)})
    want = df.groupby(["ix", "iy"]).size()
    assert got == {k: float(v) for k, v in want.items()}
    gx, gy = grid_to_world(np.array([0.0]), np.array([0.0]),
                           cell=0.5)
    assert gx[0] == -179.75 and gy[0] == -89.75


def test_contour_of_rasterized_density():
    """e2e: points -> raster -> contours == brute over the dense
    count grid."""
    rng = np.random.default_rng(5)
    lon = np.concatenate([rng.normal(0, 0.8, 4000),
                          rng.normal(4, 0.5, 3000)])
    lat = np.concatenate([rng.normal(45, 0.6, 4000),
                          rng.normal(47, 0.4, 3000)])
    ds = rd.from_arrow(pa.table({"lon": pa.array(lon),
                                 "lat": pa.array(lat)}))
    cells = rasterize_points(ds, cell=0.25).materialize()
    rows = cells.take_all()
    ixs = np.array([r["ix"] for r in rows])
    iys = np.array([r["iy"] for r in rows])
    vs = np.array([r["value"] for r in rows])
    ox, oy = ixs.min(), iys.min()
    V = np.zeros((ixs.max() - ox + 1, iys.max() - oy + 1))
    V[ixs - ox, iys - oy] = vs
    want = {(lv, (round(a[0] + ox, 9), round(a[1] + oy, 9)),
             (round(b[0] + ox, 9), round(b[1] + oy, 9)))
            for lv, a, b in brute_contours(V, [5.0, 20.0])}
    got = seg_set(contour_segments(cells, [5.0, 20.0], tile=16))
    assert got == want and len(got) > 20

"""Douglas-Peucker way simplification: kernel vs recursive brute
force, shape invariants, and the broadcast Ray pipeline."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from osm_cut_ray.stages.simplify import dp_keep_mask, simplify_ways


def _brute_dp(x, y, eps):
    n = len(x)
    keep = np.zeros(n, bool)
    keep[0] = keep[-1] = True

    def rec(i, j):
        if j <= i + 1:
            return
        dx, dy = x[j] - x[i], y[j] - y[i]
        seg = np.hypot(dx, dy)
        best_d, best_k = -1.0, -1
        for k in range(i + 1, j):
            if seg == 0.0:
                d = np.hypot(x[k] - x[i], y[k] - y[i])
            else:
                d = abs(dy * (x[k] - x[i]) - dx * (y[k] - y[i])) / seg
            if d > best_d:
                best_d, best_k = d, k
        if best_d > eps:
            keep[best_k] = True
            rec(i, best_k)
            rec(best_k, j)

    rec(0, n - 1)
    return keep


def test_dp_mask_matches_recursive_brute():
    rng = np.random.default_rng(61)
    for trial in range(20):
        n = int(rng.integers(2, 60))
        x = rng.normal(size=n).cumsum()
        y = rng.normal(size=n).cumsum()
        for eps in (0.0, 0.3, 1.0, 5.0):
            np.testing.assert_array_equal(
                dp_keep_mask(x, y, eps), _brute_dp(x, y, eps),
                err_msg=f"trial={trial} eps={eps}")


def test_dp_mask_shapes():
    # collinear points collapse to the endpoints
    x = np.arange(10, dtype=float)
    y = np.zeros(10)
    k = dp_keep_mask(x, y, 1e-9)
    assert k.tolist() == [True] + [False] * 8 + [True]
    # square wave keeps every extreme at small eps
    x = np.arange(8, dtype=float)
    y = np.array([0.0, 1, 0, 1, 0, 1, 0, 1])
    assert dp_keep_mask(x, y, 0.1).all()
    # degenerate inputs
    assert dp_keep_mask(np.array([1.0]), np.array([2.0]), 1.0).tolist() \
        == [True]
    assert dp_keep_mask(np.array([], float), np.array([], float),
                        1.0).size == 0
    # duplicate endpoints (closed ring shape): falls back to radial dist
    x = np.array([0.0, 2.0, 0.0])
    y = np.array([0.0, 0.0, 0.0])
    assert dp_keep_mask(x, y, 1.0).tolist() == [True, True, True]


def test_simplify_ways_matches_driver(ray_session):
    rng = np.random.default_rng(63)
    n_nodes, n_ways = 500, 40
    ids = np.arange(n_nodes, dtype=np.int64)
    lon = rng.normal(size=n_nodes).cumsum()
    lat = rng.normal(size=n_nodes).cumsum()
    nodes = pa.table({"id": ids, "lon": lon, "lat": lat})
    refs, way_ids = [], []
    for w in range(n_ways):
        ln = int(rng.integers(2, 30))
        refs.append(rng.choice(ids, ln, replace=False).tolist())
        way_ids.append(w)
    # way 40: one ref unknown to the node table -> dropped from geometry
    refs.append([0, 99999, 1, 2])
    way_ids.append(40)
    ways = pa.table({"id": pa.array(way_ids, pa.int64()),
                     "refs": pa.array(refs, pa.list_(pa.int64()))})
    eps = 1.0
    out = simplify_ways(rd.from_arrow(ways), rd.from_arrow(nodes), eps)
    got = pa.concat_tables([b for b in out.iter_batches(
        batch_size=None, batch_format="pyarrow")]).sort_by("id")
    assert got.schema.field("refs").type == pa.list_(pa.int64())
    for i in range(len(got)):
        wid = got["id"][i].as_py()
        orig = np.array(refs[wid], np.int64)
        known = orig < n_nodes
        kn = orig[known]
        mask = _brute_dp(lon[kn], lat[kn], eps)
        exp = kn[mask].tolist()
        assert got["refs"][i].as_py() == exp, wid


def test_simplify_ways_broadcast_cap(ray_session):
    nodes = pa.table({"id": pa.array([0, 1], pa.int64()),
                      "lon": [0.0, 1.0], "lat": [0.0, 1.0]})
    ways = pa.table({"id": pa.array([0], pa.int64()),
                     "refs": pa.array([[0, 1]], pa.list_(pa.int64()))})
    import pytest
    with pytest.raises(ValueError, match="max_broadcast_nodes"):
        simplify_ways(rd.from_arrow(ways), rd.from_arrow(nodes), 1.0,
                      max_broadcast_nodes=1)


def test_simplify_shuffle_matches_broadcast(ray_session):
    from osm_cut_ray.stages.simplify import simplify_ways_shuffle
    rng = np.random.default_rng(67)
    n_nodes = 300
    ids = np.arange(n_nodes, dtype=np.int64)
    nodes = pa.table({"id": ids,
                      "lon": rng.normal(size=n_nodes).cumsum(),
                      "lat": rng.normal(size=n_nodes).cumsum()})
    refs = [rng.choice(ids, int(rng.integers(2, 40)),
                       replace=False).tolist() for _ in range(30)]
    refs.append([5, 99999, 17, 23, 8])   # unknown ref dropped, way kept
    ways = pa.table({"id": pa.array(range(len(refs)), pa.int64()),
                     "refs": pa.array(refs, pa.list_(pa.int64()))})
    eps = 0.8

    def collect(ds):
        return pa.concat_tables(
            [b for b in ds.iter_batches(batch_size=None,
                                        batch_format="pyarrow")
             if b.num_rows]).sort_by("id")

    bc = collect(simplify_ways(rd.from_arrow(ways),
                               rd.from_arrow(nodes), eps)) \
        .select(["id", "refs"])
    sh = collect(simplify_ways_shuffle(rd.from_arrow(ways),
                                       rd.from_arrow(nodes), eps))
    assert bc["id"].to_pylist() == sh["id"].to_pylist()
    assert bc["refs"].to_pylist() == sh["refs"].to_pylist()
    assert sh.schema.field("refs").type == pa.list_(pa.int64())


def test_way_geometry_stats_match_brute(ray_session):
    from osm_cut_ray.stages.simplify import haversine_m, \
        way_geometry_stats
    rng = np.random.default_rng(71)
    n_nodes = 200
    ids = np.arange(n_nodes, dtype=np.int64)
    lon = rng.uniform(-170, 170, n_nodes)
    lat = rng.uniform(-80, 80, n_nodes)
    nodes = pa.table({"id": ids, "lon": lon, "lat": lat})
    refs = [rng.choice(ids, int(rng.integers(2, 25)),
                       replace=False).tolist() for _ in range(25)]
    refs.append([3, 99999, 7])       # unknown ref skipped
    refs.append([5])                 # single vertex: zero length
    refs.append([])                  # empty way
    ways = pa.table({"id": pa.array(range(len(refs)), pa.int64()),
                     "refs": pa.array(refs, pa.list_(pa.int64()))})
    got = pa.concat_tables([b for b in way_geometry_stats(
        rd.from_arrow(ways), rd.from_arrow(nodes)).iter_batches(
            batch_size=None, batch_format="pyarrow")]).sort_by("id")
    for i in range(len(got)):
        wid = got["id"][i].as_py()
        kn = np.array([r for r in refs[wid] if r < n_nodes], np.int64)
        assert got["n_vertices"][i].as_py() == len(kn), wid
        if len(kn) >= 2:
            exp = float(haversine_m(lon[kn][:-1], lat[kn][:-1],
                                    lon[kn][1:], lat[kn][1:]).sum())
            assert abs(got["length_m"][i].as_py() - exp) < 1e-6, wid
        else:
            assert got["length_m"][i].as_py() == 0.0, wid
        if len(kn):
            assert abs(got["lon_min"][i].as_py() - lon[kn].min()) < 1e-12
            assert abs(got["lat_max"][i].as_py() - lat[kn].max()) < 1e-12
            assert abs(got["lon_c"][i].as_py() - lon[kn].mean()) < 1e-12
        else:
            assert np.isnan(got["lon_min"][i].as_py())
    # haversine sanity: one degree of latitude ~ 111.2 km
    d = haversine_m(np.array([0.0]), np.array([0.0]),
                    np.array([0.0]), np.array([1.0]))[0]
    assert abs(d - 111_195) < 100


# -------------------------------------------------- boundary clipping

SQUARE = [("include", [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0),
                       (0.0, 10.0)])]
SQ_HOLE = SQUARE + [("exclude", [(4.0, 4.0), (6.0, 4.0), (6.0, 6.0),
                                 (4.0, 6.0)])]


def _clip_one(coords, rings):
    import numpy as np

    from osm_cut_ray.geometry.polygon import PolygonIndex
    from osm_cut_ray.stages.clip import _EdgeTable, clip_polyline
    a = np.asarray(coords, np.float64)
    return clip_polyline(a[:, 0], a[:, 1], PolygonIndex.compile(rings),
                         _EdgeTable(rings))


def test_clip_polyline_cases():
    import numpy as np

    # fully inside: unchanged single piece
    p = _clip_one([(1, 1), (5, 5), (9, 2)], SQUARE)
    assert len(p) == 1
    assert np.allclose(p[0][0], [1, 5, 9]) and np.allclose(p[0][1],
                                                           [1, 5, 2])
    # fully outside: nothing
    assert _clip_one([(-5, 1), (-1, 9)], SQUARE) == []
    # straight crossing: clipped to the border
    p = _clip_one([(-5, 5), (15, 5)], SQUARE)
    assert len(p) == 1
    assert np.allclose(p[0][0], [0, 10]) and np.allclose(p[0][1], [5, 5])
    # in -> out -> in around a vertex outside: two pieces
    p = _clip_one([(5, 5), (15, 5), (5, 2)], SQUARE)
    assert len(p) == 2
    assert np.allclose(p[0][0], [5, 10]) and np.allclose(p[0][1], [5, 5])
    assert np.allclose(p[1][0], [10, 5]) and np.allclose(p[1][1],
                                                         [3.5, 2])
    # both endpoints outside, dips inside: one interior piece
    p = _clip_one([(-5, 5), (5, 5), (15, 5)], SQUARE)
    assert len(p) == 1
    assert np.allclose(p[0][0], [0, 5, 10]) and np.allclose(p[0][1],
                                                            [5, 5, 5])
    # hole splits a through-way into two pieces
    p = _clip_one([(1, 5), (9, 5)], SQ_HOLE)
    assert len(p) == 2
    assert np.allclose(p[0][0], [1, 4]) and np.allclose(p[1][0], [6, 9])
    # piece endpoints land ON the boundary; midpoints stay inside
    from osm_cut_ray.geometry.polygon import PolygonIndex
    poly = PolygonIndex.compile(SQ_HOLE)
    for xs, ys in p:
        mx, my = (xs[:-1] + xs[1:]) / 2, (ys[:-1] + ys[1:]) / 2
        assert poly.contains(mx, my).all()


def test_clip_ways_matches_driver(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from osm_cut_ray.stages.clip import clip_ways

    rng = np.random.default_rng(13)
    node_ids = np.arange(1, 401, dtype=np.int64)
    lon = rng.uniform(-5, 15, len(node_ids))
    lat = rng.uniform(-5, 15, len(node_ids))
    nodes = rd.from_arrow(pa.table({
        "id": node_ids, "lon": lon, "lat": lat}))
    ways = []
    for w in range(60):
        k = int(rng.integers(2, 8))
        ways.append({"id": 1000 + w,
                     "refs": rng.choice(node_ids, k,
                                        replace=False).tolist()})
    ways_ds = rd.from_items(ways).repartition(4)

    got = clip_ways(ways_ds, nodes, SQ_HOLE).to_pandas()

    # driver reference: same kernel applied way by way
    lon_of = dict(zip(node_ids.tolist(), lon))
    lat_of = dict(zip(node_ids.tolist(), lat))
    n_pieces = 0
    for w in ways:
        coords = [(lon_of[r], lat_of[r]) for r in w["refs"]]
        pieces = _clip_one(coords, SQ_HOLE)
        sub = got[got["way_id"] == w["id"]].sort_values("piece")
        assert len(sub) == len(pieces)
        for (xs, ys), (_, row) in zip(pieces, sub.iterrows()):
            assert np.allclose(row["lons"], xs)
            assert np.allclose(row["lats"], ys)
        n_pieces += len(pieces)
    assert n_pieces > 10          # the corpus really exercises clipping
    assert (got["n_pts"] >= 2).all()


# -------------------------------------------------- snap to nearest way

def test_snap_points_matches_brute(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from osm_cut_ray.stages.snap import build_segment_grid, snap_points

    rng = np.random.default_rng(17)
    node_ids = np.arange(1, 301, dtype=np.int64)
    lon = rng.uniform(0, 10, len(node_ids))
    lat = rng.uniform(0, 10, len(node_ids))
    nodes = rd.from_arrow(pa.table({
        "id": node_ids, "lon": lon, "lat": lat}))
    ways = []
    for w in range(40):
        k = int(rng.integers(2, 6))
        ways.append({"id": 100 + w,
                     "refs": rng.choice(node_ids, k,
                                        replace=False).tolist()})
    ways_ds = rd.from_items(ways).repartition(3)

    grid = build_segment_grid(ways_ds, nodes, cell_deg=2.0)

    # brute segment table straight from the way definitions
    lon_of = dict(zip(node_ids.tolist(), lon))
    lat_of = dict(zip(node_ids.tolist(), lat))
    segs = []
    for w in ways:
        pts = [(lon_of[r], lat_of[r]) for r in w["refs"]]
        for s in range(len(pts) - 1):
            segs.append((w["id"], s, *pts[s], *pts[s + 1]))

    def brute_one(px, py, radius):
        best = (np.inf, -1, -1, np.nan)
        for wid, s, x1, y1, x2, y2 in segs:
            dx, dy = x2 - x1, y2 - y1
            L2 = dx * dx + dy * dy
            t = 0.0 if L2 == 0 else max(0.0, min(
                1.0, ((px - x1) * dx + (py - y1) * dy) / L2))
            d = np.hypot(px - x1 - t * dx, py - y1 - t * dy)
            # along-way prefix for this way up to segment s
            pre = sum(np.hypot(b[4] - b[2], b[5] - b[3])
                      for b in segs if b[0] == wid and b[1] < s)
            if (d, wid, s) < best[:3]:
                best = (d, wid, s, pre + t * np.hypot(dx, dy))
        if best[0] > radius:
            return (-1, -1, np.inf, np.nan)
        return (best[1], best[2], best[0], best[3])

    n_pts = 300
    px = rng.uniform(-1, 11, n_pts)
    py = rng.uniform(-1, 11, n_pts)
    pts_ds = rd.from_arrow(pa.table({
        "id": np.arange(n_pts, dtype=np.int64),
        "lon": px, "lat": py})).repartition(4)
    got = snap_points(pts_ds, grid, radius=1.5).to_pandas() \
        .set_index("id").sort_index()

    n_hit = 0
    for i in range(n_pts):
        wid, s, d, along = brute_one(px[i], py[i], 1.5)
        assert got.loc[i, "way_id"] == wid, i
        assert got.loc[i, "seg"] == s, i
        if wid != -1:
            assert abs(got.loc[i, "snap_dist"] - d) < 1e-12
            assert abs(got.loc[i, "along_deg"] - along) < 1e-9
            n_hit += 1
        else:
            assert np.isinf(got.loc[i, "snap_dist"])
            assert np.isnan(got.loc[i, "along_deg"])
    assert 0 < n_hit < n_pts        # both outcomes exercised

    # radius > cell_deg is rejected (3x3 neighborhood would miss)
    import pytest as _pt
    with _pt.raises(ValueError):
        grid.query(px[:1], py[:1], radius=5.0)


# ------------------------------------------------------ zonal stats

def test_zonal_stats_matches_brute(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from osm_cut_ray.stages.zonal import tag_zones, zonal_stats

    zones = [
        [("include", [(0.0, 0.0), (5.0, 0.0), (5.0, 5.0), (0.0, 5.0)])],
        # overlaps zone 0 on [4,5]x[4,5]: lowest index wins there
        [("include", [(4.0, 4.0), (9.0, 4.0), (9.0, 9.0), (4.0, 9.0)])],
        [("include", [(6.0, 0.0), (9.0, 0.0), (9.0, 3.0), (6.0, 3.0)]),
         ("exclude", [(7.0, 1.0), (8.0, 1.0), (8.0, 2.0), (7.0, 2.0)])],
    ]
    rng = np.random.default_rng(31)
    n = 4000
    x = rng.uniform(-1, 10, n)
    y = rng.uniform(-1, 10, n)
    v = rng.uniform(0, 100, n).round(3)
    pts = rd.from_arrow(pa.table({
        "id": np.arange(n, dtype=np.int64),
        "lon": x, "lat": y, "val": v})).repartition(6)

    from osm_cut_ray.geometry.polygon import PolygonIndex
    polys = [PolygonIndex.compile(z) for z in zones]

    def brute_zone(px, py):
        for zi, p in enumerate(polys):
            if p.contains(np.array([px]), np.array([py]))[0]:
                return zi
        return -1

    bz = np.array([brute_zone(x[i], y[i]) for i in range(n)], np.int64)

    tagged = tag_zones(pts, zones).to_pandas().set_index("id").sort_index()
    assert (tagged["zone"].to_numpy() == bz).all()
    # overlap region resolves to the lower zone
    ov = (x > 4) & (x < 5) & (y > 4) & (y < 5)
    assert (tagged["zone"].to_numpy()[ov] == 0).all()
    # hole in zone 2 excluded
    hole = (x > 7) & (x < 8) & (y > 1) & (y < 2)
    assert (tagged["zone"].to_numpy()[hole] == -1).all()

    stats = zonal_stats(pts, zones, "val").to_pandas() \
        .set_index("zone").sort_index()
    for zi in range(3):
        sel = v[bz == zi]
        assert stats.loc[zi, "n"] == len(sel)
        assert abs(stats.loc[zi, "sum"] - sel.sum()) < 1e-4
        assert abs(stats.loc[zi, "mean"] - sel.mean()) < 1e-6
        assert stats.loc[zi, "min"] == sel.min()
        assert stats.loc[zi, "max"] == sel.max()
    assert -1 not in stats.index

    # bit-determinism under different partitioning
    s2 = zonal_stats(pts.repartition(1), zones, "val").to_pandas() \
        .set_index("zone").sort_index()
    assert (s2["sum"].to_numpy() == stats["sum"].to_numpy()).all()


def test_clip_polyline_coverage_property():
    """Randomized completeness: sampled points along each polyline are
    covered by a piece IFF they are inside the polygon (away from
    crossing breakpoints)."""
    import numpy as np

    from osm_cut_ray.geometry.polygon import PolygonIndex
    from osm_cut_ray.stages.clip import _EdgeTable, clip_polyline

    poly = PolygonIndex.compile(SQ_HOLE)
    et = _EdgeTable(SQ_HOLE)
    rng = np.random.default_rng(41)
    for trial in range(40):
        n = int(rng.integers(2, 8))
        x = rng.uniform(-3, 13, n)
        y = rng.uniform(-3, 13, n)
        pieces = clip_polyline(x, y, poly, et)
        # piece invariants: >= 2 points, midpoints inside
        for xs, ys in pieces:
            assert len(xs) >= 2
            mx, my = (xs[:-1] + xs[1:]) / 2, (ys[:-1] + ys[1:]) / 2
            assert poly.contains(mx, my).all(), trial

        # sample along the original polyline
        def covered(px, py):
            for xs, ys in pieces:
                dx, dy = np.diff(xs), np.diff(ys)
                L2 = dx * dx + dy * dy
                wx, wy = px - xs[:-1], py - ys[:-1]
                with np.errstate(divide="ignore", invalid="ignore"):
                    tt = np.where(L2 > 0, (wx * dx + wy * dy) / L2, 0.0)
                tt = np.clip(tt, 0, 1)
                d = np.hypot(wx - tt * dx, wy - tt * dy)
                if (d < 1e-9).any():
                    return True
            return False

        for s in range(n - 1):
            for tt in rng.uniform(0.02, 0.98, 6):
                px = x[s] + (x[s + 1] - x[s]) * tt
                py = y[s] + (y[s + 1] - y[s]) * tt
                inside = bool(poly.contains(np.array([px]),
                                            np.array([py]))[0])
                # skip samples hugging the boundary (float ties)
                near_edge = False
                d2 = np.hypot(px - (et.x1 + et.x2) / 2,
                              py - (et.y1 + et.y2) / 2)
                if (np.abs((px - et.x1) * et.fy
                           - (py - et.y1) * et.fx)
                        / np.maximum(np.hypot(et.fx, et.fy), 1e-12)
                        < 1e-6).any():
                    near_edge = True
                if near_edge:
                    continue
                assert covered(px, py) == inside, (trial, s, tt)

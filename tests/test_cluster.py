import numpy as np
import pyarrow as pa


def _brute_dbscan(ids, xs, ys, eps, min_pts):
    """Textbook DBSCAN with the engine's deterministic border rule:
    border joins the MIN cluster label among its core neighbors;
    labels are min core id per cluster."""
    n = len(ids)
    d = np.hypot(xs[:, None] - xs[None, :], ys[:, None] - ys[None, :])
    nb = d <= eps
    core = nb.sum(axis=1) >= min_pts  # includes self
    # components over cores
    label = {}
    for i in np.flatnonzero(core):
        if ids[i] in label:
            continue
        stack, comp = [i], []
        seen = {i}
        while stack:
            j = stack.pop()
            comp.append(j)
            for k in np.flatnonzero(nb[j] & core):
                if k not in seen:
                    seen.add(int(k))
                    stack.append(int(k))
        lab = min(int(ids[j]) for j in comp)
        for j in comp:
            label[int(ids[j])] = lab
    out = {}
    for i in range(n):
        if core[i]:
            out[int(ids[i])] = (label[int(ids[i])], True)
        else:
            cand = [label[int(ids[j])]
                    for j in np.flatnonzero(nb[i] & core)]
            out[int(ids[i])] = (min(cand) if cand else -1, False)
    return out


def _got_map(ds):
    df = ds.to_pandas()
    assert df["id"].is_unique
    return {int(r.id): (int(r.cluster), bool(r.is_core))
            for r in df.itertuples()}


def test_dbscan_blobs_vs_brute(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.cluster import dbscan_points

    rng = np.random.default_rng(5)
    blobs = []
    for cx, cy in [(0, 0), (3, 0.5), (1.5, 4), (-2, 2.5)]:
        blobs.append(rng.normal([cx, cy], 0.25, (120, 2)))
    noise = rng.uniform(-5, 7, (60, 2))
    pts = np.vstack(blobs + [noise])
    ids = rng.permutation(len(pts)).astype(np.int64)  # ids != order
    ds = rd.from_arrow(pa.table({
        "id": ids, "lon": pts[:, 0], "lat": pts[:, 1]})) \
        .repartition(7)

    eps, min_pts = 0.35, 5
    got = _got_map(dbscan_points(ds, eps=eps, min_pts=min_pts))
    exp = _brute_dbscan(ids, pts[:, 0], pts[:, 1], eps, min_pts)
    assert got == exp
    n_clusters = len({c for c, _ in exp.values() if c >= 0})
    assert n_clusters >= 4  # the four blobs survive as clusters
    assert any(c == -1 for c, _ in exp.values())  # and noise exists


def test_dbscan_chain_spans_cells(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.cluster import dbscan_points

    # a single elongated chain: every point within eps of the next,
    # crossing MANY eps/sqrt(2) cells -> one cluster end to end
    xs = np.arange(200) * 0.09
    ys = np.zeros(200)
    ids = np.arange(200, dtype=np.int64) + 1000
    ds = rd.from_arrow(pa.table({"id": ids, "lon": xs, "lat": ys}))
    got = _got_map(dbscan_points(ds, eps=0.1, min_pts=2))
    assert all(c == 1000 and ic for c, ic in got.values())

    exp = _brute_dbscan(ids, xs, ys, 0.1, 2)
    assert got == exp


def test_dbscan_degenerate(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.cluster import dbscan_points

    # all-noise corpus: far-apart singletons
    ids = np.arange(5, dtype=np.int64)
    ds = rd.from_arrow(pa.table({
        "id": ids, "lon": ids * 100.0, "lat": ids * 50.0}))
    got = _got_map(dbscan_points(ds, eps=0.5, min_pts=2))
    assert got == {int(i): (-1, False) for i in ids}

    # single point, min_pts=1: a cluster of itself
    one = rd.from_arrow(pa.table({
        "id": pa.array([7], pa.int64()),
        "lon": pa.array([1.0]), "lat": pa.array([2.0])}))
    got1 = _got_map(dbscan_points(one, eps=0.5, min_pts=1))
    assert got1 == {7: (7, True)}

    # empty corpus
    empty = rd.from_arrow(pa.table({
        "id": pa.array([], pa.int64()),
        "lon": pa.array([], pa.float64()),
        "lat": pa.array([], pa.float64())}))
    assert dbscan_points(empty, eps=0.5, min_pts=2).count() == 0


def _brute_hull(pts):
    """Strictly-extreme points (unique argmax over sampled directions)
    — every one MUST be a hull vertex; independent of monotone chain."""
    arr = np.unique(np.asarray(pts, np.float64), axis=0)
    out = set()
    for ang in np.linspace(0, 2 * np.pi, 720, endpoint=False):
        v = np.array([np.cos(ang), np.sin(ang)])
        proj = arr @ v
        top = np.flatnonzero(proj >= proj.max() - 1e-12)
        if len(top) == 1:
            out.add(tuple(arr[top[0]]))
    return out


def test_cluster_hulls(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.cluster import (_hull, cluster_hulls,
                                            dbscan_points)

    # _hull vs a direction-extreme brute on random sets
    rng = np.random.default_rng(13)
    for _ in range(10):
        pts = rng.uniform(0, 1, (int(rng.integers(3, 40)), 2))
        hi = _hull(pts[:, 0], pts[:, 1])
        hull_set = {(pts[i, 0], pts[i, 1]) for i in hi}
        exp = _brute_hull(pts)
        assert exp <= hull_set  # every extreme point is on the hull
        # every hull vertex is extreme in some direction
        for hx, hy in hull_set:
            proj_max = False
            for ang in np.linspace(0, 2 * np.pi, 1440, endpoint=False):
                v = np.array([np.cos(ang), np.sin(ang)])
                if np.isclose(hx * v[0] + hy * v[1],
                              (pts @ v).max(), atol=1e-12):
                    proj_max = True
                    break
            assert proj_max

    # end-to-end over dbscan output
    blobs = [rng.normal([0, 0], 0.1, (50, 2)),
             rng.normal([3, 3], 0.1, (60, 2))]
    noise = np.array([[10.0, 10.0]])
    pts = np.vstack(blobs + [noise])
    ids = np.arange(len(pts), dtype=np.int64)
    ds = rd.from_arrow(pa.table({
        "id": ids, "lon": pts[:, 0], "lat": pts[:, 1]})).repartition(3)
    labeled = dbscan_points(ds, eps=0.2, min_pts=4).materialize()
    hulls = cluster_hulls(labeled, ds).to_pandas() \
        .sort_values("cluster").reset_index(drop=True)
    lab = labeled.to_pandas()
    sizes = lab[lab.cluster >= 0].groupby("cluster").size()
    assert len(hulls) == 2  # noise excluded
    assert hulls["n_pts"].tolist() == sizes.sort_index().tolist()
    m0 = lab[lab.cluster == hulls["cluster"][0]]["id"].to_numpy()
    assert abs(hulls["cx"][0] - pts[m0, 0].mean()) < 1e-9
    # all cluster points lie inside-or-on their hull
    for r in hulls.itertuples():
        hx = np.asarray(r.hull_x)
        hy = np.asarray(r.hull_y)
        members = lab[lab.cluster == r.cluster]["id"].to_numpy()
        mx, my = pts[members, 0], pts[members, 1]
        for k in range(len(hx)):
            x1, y1 = hx[k], hy[k]
            x2, y2 = hx[(k + 1) % len(hx)], hy[(k + 1) % len(hx)]
            cross = (x2 - x1) * (my - y1) - (y2 - y1) * (mx - x1)
            assert (cross >= -1e-9).all()  # CCW: members on the left


def test_dbscan_negative_coords_and_border_tie(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.cluster import dbscan_points

    # two tight 4-point cores left/right of a lone midpoint (negative
    # coords exercise floor-grid keys); the midpoint reaches exactly
    # ONE core of each cluster but is not core itself -> border to
    # BOTH clusters -> deterministic min-label assignment
    left = [(-1.0, 0.0), (-1.1, 0.0), (-1.2, 0.0), (-1.3, 0.0)]
    right = [(-0.2, 0.0), (-0.1, 0.0), (0.0, 0.0), (0.1, 0.0)]
    mid = [(-0.6, 0.0)]
    pts = np.array(left + right + mid)
    ids = np.array([10, 11, 12, 13, 20, 21, 22, 23, 99], np.int64)
    ds = rd.from_arrow(pa.table({
        "id": ids, "lon": pts[:, 0], "lat": pts[:, 1]}))
    eps, min_pts = 0.45, 4
    got = _got_map(dbscan_points(ds, eps=eps, min_pts=min_pts))
    exp = _brute_dbscan(ids, pts[:, 0], pts[:, 1], eps, min_pts)
    assert got == exp
    assert got[99] == (10, False)  # border tie -> min label
    assert got[10] == (10, True) and got[20] == (20, True)
    assert {c for c, _ in got.values()} == {10, 20}

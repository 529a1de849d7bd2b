import numpy as np
import pyarrow as pa
import pytest


def _build_network(rng, n_nodes=240, n_ways=36, span=10.0):
    import ray.data as rd
    node_ids = np.arange(1, n_nodes + 1, dtype=np.int64)
    lon = rng.uniform(0, span, n_nodes)
    lat = rng.uniform(0, span, n_nodes)
    nodes = rd.from_arrow(pa.table({
        "id": node_ids, "lon": lon, "lat": lat}))
    ways = []
    for w in range(n_ways):
        k = int(rng.integers(2, 6))
        ways.append({"id": 100 + w,
                     "refs": rng.choice(node_ids, k,
                                        replace=False).tolist()})
    segs = []
    lon_of = dict(zip(node_ids.tolist(), lon))
    lat_of = dict(zip(node_ids.tolist(), lat))
    for w in ways:
        pts = [(lon_of[r], lat_of[r]) for r in w["refs"]]
        for s in range(len(pts) - 1):
            segs.append((w["id"], s, *pts[s], *pts[s + 1]))
    return nodes, rd.from_items(ways).repartition(3), segs


def _brute_cands(px, py, segs, radius, k):
    """Per-way best segment, top-k ways by (dist, way, seg) — the
    independent reference for SegmentGrid.query_topk."""
    pre = {}
    for wid, s, x1, y1, x2, y2 in segs:
        pre[(wid, s)] = sum(
            np.hypot(b[4] - b[2], b[5] - b[3])
            for b in segs if b[0] == wid and b[1] < s)
    best = {}
    for wid, s, x1, y1, x2, y2 in segs:
        dx, dy = x2 - x1, y2 - y1
        L2 = dx * dx + dy * dy
        t = 0.0 if L2 == 0 else max(0.0, min(
            1.0, ((px - x1) * dx + (py - y1) * dy) / L2))
        d = float(np.hypot(px - x1 - t * dx, py - y1 - t * dy))
        if d > radius:
            continue
        along = pre[(wid, s)] + t * float(np.hypot(dx, dy))
        cur = best.get(wid)
        if cur is None or (d, s) < (cur[0], cur[2]):
            best[wid] = (d, wid, s, along)
    return sorted(best.values())[:k]


def _brute_viterbi(cands_per_pt, penalty):
    """Pure-Python Viterbi with gap resets; candidates per point are
    (dist, way, seg, along) tuples in (dist, way, seg) order."""
    n = len(cands_per_pt)
    out = [(-1, -1, np.inf, np.nan)] * n
    run: list[int] = []

    def flush():
        if not run:
            return
        cs = [cands_per_pt[i] for i in run]
        cost = [c[0] for c in cs[0]]
        bps = [[0] * len(cs[0])]
        for layer in range(1, len(cs)):
            prev_w = [c[1] for c in cs[layer - 1]]
            ncost, nbp = [], []
            for d, w, s, a in cs[layer]:
                tots = [cost[p] + (0.0 if prev_w[p] == w else penalty)
                        for p in range(len(cost))]
                p_best = min(range(len(tots)), key=lambda p: tots[p])
                ncost.append(d + tots[p_best])
                nbp.append(p_best)
            cost, _ = ncost, bps.append(nbp)
        best = min(range(len(cost)), key=lambda c: cost[c])
        for li in range(len(cs) - 1, -1, -1):
            d, w, s, a = cs[li][best]
            out[run[li]] = (w, s, d, a)
            best = bps[li][best]
        run.clear()

    for i, c in enumerate(cands_per_pt):
        if not c:
            flush()
        else:
            run.append(i)
    flush()
    return out


def test_match_trajectories_matches_brute(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.match import match_trajectories
    from osm_cut_ray.stages.snap import build_segment_grid

    rng = np.random.default_rng(23)
    nodes, ways_ds, segs = _build_network(rng)
    grid = build_segment_grid(ways_ds, nodes, cell_deg=2.0)

    radius, k, penalty = 1.0, 4, 0.7
    n_traj, pts_per = 12, 15
    rows = []
    for t in range(n_traj):
        # a wandering trace: some points drift off-network (outside
        # the span) to exercise the gap/reset path
        cx, cy = rng.uniform(1, 9, 2)
        for i in range(pts_per):
            cx += rng.uniform(-0.6, 0.6)
            cy += rng.uniform(-0.6, 0.6)
            px = cx if i % 7 else cx + 25.0  # every 7th point is far
            rows.append((t, float(i), px, cy))
    arr = np.array(rows)
    pts_ds = rd.from_arrow(pa.table({
        "traj_id": arr[:, 0].astype(np.int64),
        "ts": arr[:, 1],
        "lon": arr[:, 2], "lat": arr[:, 3]})).repartition(5)

    got = match_trajectories(
        pts_ds, grid, radius=radius, k_cands=k,
        switch_penalty=penalty).to_pandas() \
        .sort_values(["traj_id", "ts"]).reset_index(drop=True)
    assert len(got) == len(rows)

    for t in range(n_traj):
        traj = [r for r in rows if r[0] == t]
        cands = [_brute_cands(r[2], r[3], segs, radius, k)
                 for r in traj]
        exp = _brute_viterbi(cands, penalty)
        sub = got[got["traj_id"] == t].reset_index(drop=True)
        for i, (w, s, d, a) in enumerate(exp):
            assert int(sub["way_id"][i]) == w, (t, i)
            assert int(sub["seg"][i]) == s, (t, i)
            if w >= 0:
                assert abs(sub["snap_dist"][i] - d) < 1e-9
                assert abs(sub["along_deg"][i] - a) < 1e-9
            else:
                assert np.isinf(sub["snap_dist"][i])
                assert np.isnan(sub["along_deg"][i])


def test_match_fixes_parallel_road_noise(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.match import match_trajectories
    from osm_cut_ray.stages.snap import build_segment_grid, snap_points

    # two parallel roads; the trace follows A but one noisy point
    # lies nearer B — HMM keeps it on A, independent snap flips to B
    nodes = rd.from_arrow(pa.table({
        "id": np.array([1, 2, 3, 4], np.int64),
        "lon": np.array([0.0, 1.0, 0.0, 1.0]),
        "lat": np.array([0.0, 0.0, 0.1, 0.1])}))
    ways_ds = rd.from_items([
        {"id": 500, "refs": [1, 2]},   # road A at y=0
        {"id": 501, "refs": [3, 4]}])  # road B at y=0.1
    grid = build_segment_grid(ways_ds, nodes, cell_deg=1.0)

    xs = np.linspace(0.1, 0.9, 9)
    ys = np.full(9, 0.02)
    ys[4] = 0.08  # noisy: dist 0.08 to A, 0.02 to B
    pts = pa.table({"traj_id": np.zeros(9, np.int64),
                    "ts": np.arange(9, dtype=np.float64),
                    "id": np.arange(9, dtype=np.int64),
                    "lon": xs, "lat": ys})
    pts_ds = rd.from_arrow(pts)

    got = match_trajectories(
        pts_ds, grid, radius=0.5, switch_penalty=0.5).to_pandas() \
        .sort_values("ts")
    assert (got["way_id"] == 500).all()

    snapped = snap_points(pts_ds, grid, radius=0.5).to_pandas() \
        .sort_values("ts")
    assert int(snapped["way_id"].iloc[4]) == 501  # snap flips
    assert (snapped["way_id"].iloc[:4] == 500).all()

    # switch_penalty=0 degenerates to independent snapping
    free = match_trajectories(
        pts_ds, grid, radius=0.5, switch_penalty=0.0).to_pandas() \
        .sort_values("ts")
    assert free["way_id"].tolist() == snapped["way_id"].tolist()
    assert free["seg"].tolist() == snapped["seg"].tolist()
    assert np.allclose(free["along_deg"], snapped["along_deg"])


def test_snapped_positions_and_route_heat(ray_session):
    import ray.data as rd

    from osm_cut_ray.pipelines.route_heat import route_usage_tiles
    from osm_cut_ray.sources.images import decode_image
    from osm_cut_ray.stages.match import snapped_positions
    from osm_cut_ray.stages.snap import build_segment_grid

    # one horizontal road at lat 0; noisy trace above/below it plus
    # off-network outliers
    nodes = rd.from_arrow(pa.table({
        "id": np.array([1, 2, 3], np.int64),
        "lon": np.array([0.0, 1.0, 2.0]),
        "lat": np.array([0.0, 0.0, 0.0])}))
    ways = rd.from_items([{"id": 700, "refs": [1, 2, 3]}])
    grid = build_segment_grid(ways, nodes, cell_deg=1.0)
    n = 12
    xs = np.linspace(0.1, 1.9, n)
    ys = np.where(np.arange(n) % 2 == 0, 0.02, -0.03)
    ys[5] = 9.0  # off network
    pts = rd.from_arrow(pa.table({
        "traj_id": pa.array(np.zeros(n, np.int64)),
        "ts": pa.array(np.arange(n, dtype=np.float64)),
        "lon": pa.array(xs), "lat": pa.array(ys)}))

    matched, tiles = route_usage_tiles(
        pts, ways, nodes, radius=0.5, zoom=5, tile_px=32, grid=grid)
    on_road = snapped_positions(matched, grid).to_pandas() \
        .sort_values("ts").reset_index(drop=True)
    # the off-network fix is dropped; every other fix lands ON the
    # road (lat exactly 0, lon == its x: perpendicular projection)
    assert len(on_road) == n - 1
    assert (on_road["lat"] == 0.0).all()
    exp_x = np.delete(xs, 5)
    assert np.allclose(on_road["lon"].to_numpy(), exp_x, atol=1e-12)

    tdf = tiles.to_pandas()
    assert int(tdf["n_pts"].sum()) == n - 1
    # hot pixels only on the road row: every tile's nonzero pixels
    # sit at lat ~ 0 (one pixel row)
    for r in tdf.itertuples():
        img = decode_image(r.bytes)[0]
        rows = np.unique(np.nonzero(img)[0])
        assert len(rows) == 1


def test_match_topk_radius_guard(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.snap import build_segment_grid

    nodes = rd.from_arrow(pa.table({
        "id": np.array([1, 2], np.int64),
        "lon": np.array([0.0, 1.0]), "lat": np.array([0.0, 0.0])}))
    ways_ds = rd.from_items([{"id": 9, "refs": [1, 2]}])
    grid = build_segment_grid(ways_ds, nodes, cell_deg=0.5)
    with pytest.raises(ValueError):
        grid.query_topk(np.zeros(1), np.zeros(1), 0.9, 2)

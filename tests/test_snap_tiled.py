"""Tiled SegmentGrid fallback == broadcast grid, bit-for-bit.

The scale contract for the matching family (VERDICT r3 item #1): past
`max_broadcast_segments`, `build_segment_grid_auto` degrades to
ix-stripe tiles instead of raising, and snap / match / overlay /
snapped_positions give IDENTICAL results on either grid flavor."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _local_network(rng, n_ways=40, span=20.0):
    """Short local ways (anchor + jitter) so segments touch few ix
    columns and stripes genuinely differ."""
    import ray.data as rd
    node_rows = []
    way_rows = []
    nid = 1
    for w in range(n_ways):
        ax, ay = rng.uniform(0.5, span - 0.5, 2)
        k = int(rng.integers(2, 6))
        refs = []
        for _ in range(k):
            node_rows.append((nid, ax + rng.uniform(-0.4, 0.4),
                              ay + rng.uniform(-0.4, 0.4)))
            refs.append(nid)
            nid += 1
        way_rows.append({"id": 100 + w, "refs": refs})
    arr = np.array(node_rows)
    nodes = rd.from_arrow(pa.table({
        "id": arr[:, 0].astype(np.int64),
        "lon": arr[:, 1], "lat": arr[:, 2]}))
    return nodes, rd.from_items(way_rows).repartition(3)


def _grids(ray_session_unused, rng, cell_deg=1.0):
    from osm_cut_ray.stages.snap import (TiledSegmentGrid,
                                         build_segment_grid,
                                         build_segment_grid_auto)
    nodes, ways = _local_network(rng)
    g_b = build_segment_grid(ways, nodes, cell_deg=cell_deg)
    n_segs = len(g_b.x1)
    g_t = build_segment_grid_auto(
        ways, nodes, cell_deg=cell_deg,
        max_broadcast_segments=max(8, n_segs // 2))
    assert isinstance(g_t, TiledSegmentGrid)
    assert g_t.n_tiles >= 2
    return nodes, ways, g_b, g_t


def test_query_and_topk_tiled_equal_broadcast(ray_session):
    rng = np.random.default_rng(7)
    _, _, g_b, g_t = _grids(ray_session, rng)
    px = rng.uniform(-1, 21, 4000)
    py = rng.uniform(-1, 21, 4000)
    for radius in (0.3, 1.0):
        wb, sb, db, ab = g_b.query(px, py, radius)
        wt, st, dt, at = g_t.query(px, py, radius)
        assert (wb == wt).all() and (sb == st).all()
        assert np.array_equal(db, dt) and np.array_equal(
            ab, at, equal_nan=True)
        for k in (1, 4):
            rb = g_b.query_topk(px, py, radius, k)
            rt = g_t.query_topk(px, py, radius, k)
            for i in range(5):
                assert np.array_equal(rb[i], rt[i]), (radius, k, i)


def test_snap_points_tiled_equal(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.snap import snap_points

    rng = np.random.default_rng(11)
    _, _, g_b, g_t = _grids(ray_session, rng)
    n = 3000
    pts = rd.from_arrow(pa.table({
        "id": np.arange(n, dtype=np.int64),
        "lon": rng.uniform(-1, 21, n),
        "lat": rng.uniform(-1, 21, n)})).repartition(5)
    a = snap_points(pts, g_b, radius=0.8).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    b = snap_points(pts, g_t, radius=0.8).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert (a["way_id"] >= 0).any()  # non-trivial corpus


def test_match_and_positions_tiled_equal(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.match import (match_trajectories,
                                          snapped_positions)

    rng = np.random.default_rng(13)
    _, _, g_b, g_t = _grids(ray_session, rng)
    rows = []
    for t in range(10):
        cx, cy = rng.uniform(2, 18, 2)
        for i in range(12):
            cx += rng.uniform(-0.5, 0.5)
            cy += rng.uniform(-0.5, 0.5)
            px = cx if i % 5 else cx + 40.0  # off-network gaps
            rows.append((t, float(i), px, cy))
    arr = np.array(rows)
    pts = rd.from_arrow(pa.table({
        "traj_id": arr[:, 0].astype(np.int64), "ts": arr[:, 1],
        "lon": arr[:, 2], "lat": arr[:, 3]})).repartition(4)
    kw = dict(radius=0.8, k_cands=4, switch_penalty=0.6)
    a = match_trajectories(pts, g_b, **kw).to_pandas() \
        .sort_values(["traj_id", "ts"]).reset_index(drop=True)
    b = match_trajectories(pts, g_t, **kw).to_pandas() \
        .sort_values(["traj_id", "ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert (a["way_id"] >= 0).any()

    matched = match_trajectories(pts, g_b, **kw).materialize()
    pa_ = snapped_positions(matched, g_b).to_pandas() \
        .sort_values(["traj_id", "ts"]).reset_index(drop=True)
    pb_ = snapped_positions(matched, g_t).to_pandas() \
        .sort_values(["traj_id", "ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(pa_, pb_)
    assert len(pa_) > 0


def _crossing_network(rng, n_ways, span=20.0, reach=2.5):
    """2-node ways long enough (~reach degrees) that two corpora
    genuinely cross, yet local enough that ix-stripes differ."""
    import ray.data as rd
    node_rows = []
    way_rows = []
    nid = 1
    for w in range(n_ways):
        ax, ay = rng.uniform(0.5, span - 0.5, 2)
        bx = ax + rng.uniform(-reach, reach)
        by = ay + rng.uniform(-reach, reach)
        node_rows.append((nid, ax, ay))
        node_rows.append((nid + 1, bx, by))
        way_rows.append({"id": 100 + w, "refs": [nid, nid + 1]})
        nid += 2
    arr = np.array(node_rows)
    nodes = rd.from_arrow(pa.table({
        "id": arr[:, 0].astype(np.int64),
        "lon": arr[:, 1], "lat": arr[:, 2]}))
    return nodes, rd.from_items(way_rows).repartition(3)


def test_way_intersections_tiled_equal(ray_session):
    from osm_cut_ray.stages.overlay import way_intersections

    rng = np.random.default_rng(17)
    nodes_a, ways_a = _crossing_network(rng, n_ways=30)
    nodes_b, ways_b = _crossing_network(rng, n_ways=30)

    def run(**kw):
        return way_intersections(
            ways_a, nodes_a, ways_b, b_nodes=nodes_b, cell_deg=1.0,
            **kw).to_pandas() \
            .sort_values(["a_way", "a_seg", "b_way", "b_seg"]) \
            .reset_index(drop=True)

    base = run()
    tiled = run(max_broadcast_segments=20)
    pd.testing.assert_frame_equal(base, tiled)
    assert len(base) > 0


def test_auto_builder_broadcast_below_cap(ray_session):
    from osm_cut_ray.stages.snap import (SegmentGrid,
                                         build_segment_grid_auto)

    rng = np.random.default_rng(19)
    nodes, ways = _local_network(rng, n_ways=10)
    g = build_segment_grid_auto(ways, nodes, cell_deg=1.0)
    assert isinstance(g, SegmentGrid)


def test_tiled_raises_on_unsplittable_column(ray_session):
    # every segment in ONE ix column: the stripe axis cannot split it
    import ray.data as rd

    from osm_cut_ray.stages.snap import build_segment_grid_auto
    n = 30
    nodes = rd.from_arrow(pa.table({
        "id": np.arange(1, n + 2, dtype=np.int64),
        "lon": np.full(n + 1, 0.5),
        "lat": np.linspace(0.0, 5.0, n + 1)}))
    ways = rd.from_items([
        {"id": 1, "refs": list(range(1, n + 2))}])
    with pytest.raises(ValueError, match="shrink cell_deg"):
        build_segment_grid_auto(ways, nodes, cell_deg=1.0,
                                max_broadcast_segments=10)

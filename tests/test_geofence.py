import numpy as np
import pyarrow as pa
import pytest


def _regular(cx, cy, r, n=8, phase=0.0):
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False) + phase
    return [(cx + r * np.cos(a), cy + r * np.sin(a)) for a in ang]


def _specs():
    """A mix: overlapping octagons, a donut (exclude ring), a sliver
    triangle, negative coordinates."""
    return [
        [("include", _regular(0.0, 0.0, 2.0))],
        [("include", _regular(1.5, 0.5, 1.5, phase=0.3))],   # overlaps 0
        [("include", _regular(-3.0, -2.0, 2.5)),
         ("exclude", _regular(-3.0, -2.0, 1.0))],            # donut
        [("include", [(4.0, -3.0), (6.5, -2.9), (4.1, -2.5)])],
        [("include", _regular(5.0, 4.0, 0.4, n=5))],         # tiny
    ]


def test_geofence_matches_tag_zones(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.geofence import (build_geofence_index,
                                             geofence_points)
    from osm_cut_ray.stages.zonal import tag_zones

    rng = np.random.default_rng(41)
    n = 4000
    pts = rng.uniform([-7, -6], [8, 7], (n, 2))
    ds = rd.from_arrow(pa.table({
        "id": np.arange(n, dtype=np.int64),
        "lon": pts[:, 0], "lat": pts[:, 1]})).repartition(5)

    exp = tag_zones(ds, _specs()).to_pandas().sort_values("id")
    for cell in (0.2, 0.7, 3.0):  # fine -> coarse index cells
        idx = build_geofence_index(_specs(), cell=cell)
        got = geofence_points(ds, idx).to_pandas().sort_values("id")
        assert got["zone"].tolist() == exp["zone"].tolist(), cell
    # coverage sanity: every zone (and none) actually occurs
    assert set(exp["zone"]) == {-1, 0, 1, 2, 3, 4}


def test_geofence_full_cells_exist_and_hole_respected(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.geofence import (build_geofence_index,
                                             geofence_points)

    idx = build_geofence_index(_specs(), cell=0.2)
    assert idx.full.any()  # big polygons at small cells -> FULL cells

    # a point inside the donut hole must be -1 even though its cell
    # is covered by the include ring
    ds = rd.from_arrow(pa.table({
        "lon": pa.array([-3.0, -3.0 + 1.7]),
        "lat": pa.array([-2.0, -2.0])}))
    got = geofence_points(ds, idx).to_pandas()
    assert got["zone"].tolist() == [-1, 2]


def test_geofence_cap_and_empty(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.geofence import (build_geofence_index,
                                             geofence_points)

    with pytest.raises(ValueError):
        build_geofence_index(_specs(), cell=0.001, max_cells=10_000)

    idx = build_geofence_index(_specs(), cell=0.5)
    empty = rd.from_arrow(pa.table({
        "lon": pa.array([], pa.float64()),
        "lat": pa.array([], pa.float64())}))
    assert geofence_points(empty, idx).count() == 0
    far = rd.from_arrow(pa.table({
        "lon": pa.array([500.0]), "lat": pa.array([500.0])}))
    assert geofence_points(far, idx).to_pandas()["zone"].tolist() == [-1]


def test_geofence_tiled_equal_broadcast(ray_session):
    """Past max_cells the auto builder stripes the zone grid; results
    stay bit-identical to the broadcast index (VERDICT r3 item #2)."""
    import ray.data as rd

    from osm_cut_ray.stages.geofence import (TiledGeofenceIndex,
                                             build_geofence_index,
                                             build_geofence_index_auto,
                                             geofence_points)

    rng = np.random.default_rng(47)
    n = 5000
    pts = rng.uniform([-7, -6], [8, 7], (n, 2))
    ds = rd.from_arrow(pa.table({
        "id": np.arange(n, dtype=np.int64),
        "lon": pts[:, 0], "lat": pts[:, 1]})).repartition(5)

    for cell in (0.2, 0.7):
        idx_b = build_geofence_index(_specs(), cell=cell)
        # force tiling: cap well under the full raster size
        cap = max(20, (len(idx_b.poly_ids) * 2) // 3)
        idx_t = build_geofence_index_auto(_specs(), cell=cell,
                                          max_cells=cap)
        assert isinstance(idx_t, TiledGeofenceIndex), cell
        assert idx_t.n_tiles >= 2
        a = geofence_points(ds, idx_b).to_pandas().sort_values("id")
        b = geofence_points(ds, idx_t).to_pandas().sort_values("id")
        assert a["zone"].tolist() == b["zone"].tolist(), cell
        assert set(a["zone"]) == {-1, 0, 1, 2, 3, 4}


def test_geofence_auto_broadcast_below_cap(ray_session):
    from osm_cut_ray.stages.geofence import (GeofenceIndex,
                                             build_geofence_index_auto)

    idx = build_geofence_index_auto(_specs(), cell=0.5)
    assert isinstance(idx, GeofenceIndex)


def test_geofence_tiled_unsplittable_column_raises(ray_session):
    """A single ix column denser than max_cells cannot stripe."""
    from osm_cut_ray.stages.geofence import build_geofence_index_auto

    # one tall thin polygon: all cells share one ix column
    tall = [[("include", [(0.1, 0.0), (0.4, 0.0), (0.4, 50.0),
                          (0.1, 50.0)])]]
    with pytest.raises(ValueError, match="coarsen"):
        build_geofence_index_auto(tall, cell=0.5, max_cells=30)

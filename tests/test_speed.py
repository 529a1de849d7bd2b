import numpy as np
import pyarrow as pa

_QUANT = float(1 << 20)


def _match_rows():
    """Hand-built match output: traj 1 rides way 500 then switches to
    501 with an off-network gap; traj 2 rides 500 the other way."""
    rows = [
        # traj, ts, way, along
        (1, 0.0, 500, 0.00),
        (1, 10.0, 500, 0.30),   # speed 0.03
        (1, 20.0, 500, 0.40),   # speed 0.01
        (1, 30.0, -1, np.nan),  # gap: no sample with neighbors
        (1, 40.0, 501, 0.10),
        (1, 50.0, 501, 0.35),   # speed 0.025
        (2, 5.0, 500, 0.90),
        (2, 15.0, 500, 0.60),   # reverse drive: |.| -> 0.03
        (2, 25.0, 502, 0.00),   # way switch: no sample
        (3, 0.0, 503, 0.50),    # lone fix: nothing
    ]
    return rows


def test_way_speed_samples_and_stats(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.speed import way_speed_samples, way_speed_stats

    rows = _match_rows()
    arr_t = np.array([r[0] for r in rows], np.int64)
    ds = rd.from_arrow(pa.table({
        "traj_id": arr_t,
        "ts": pa.array([r[1] for r in rows], pa.float64()),
        "way_id": pa.array([r[2] for r in rows], pa.int64()),
        "seg": pa.array(np.zeros(len(rows), np.int64)),
        "snap_dist": pa.array(np.zeros(len(rows))),
        "along_deg": pa.array([r[3] for r in rows], pa.float64()),
    })).repartition(3)

    samples = way_speed_samples(ds).to_pandas() \
        .sort_values(["way_id", "speed"]).reset_index(drop=True)
    exp = sorted([(500, 0.01), (500, 0.03), (500, 0.03), (501, 0.025)])
    assert len(samples) == len(exp)
    for i, (w, s) in enumerate(exp):
        assert int(samples["way_id"][i]) == w
        assert abs(samples["speed"][i] - s) < 1e-12

    stats = way_speed_stats(ds).to_pandas().sort_values("way_id") \
        .reset_index(drop=True)
    assert stats["way_id"].tolist() == [500, 501]
    assert stats["n_samples"].tolist() == [3, 1]
    q = lambda x: np.floor(x * _QUANT) / _QUANT  # noqa: E731
    assert abs(stats["mean_speed"][0]
               - (q(0.01) + q(0.03) + q(0.03)) / 3) < 1e-12
    assert abs(stats["min_speed"][0] - 0.01) < 1e-12
    assert abs(stats["max_speed"][0] - 0.03) < 1e-12


def test_way_speeds_end_to_end_from_matcher(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.match import match_trajectories
    from osm_cut_ray.stages.snap import build_segment_grid
    from osm_cut_ray.stages.speed import way_speed_stats

    # one straight road; a trace drives it at constant 0.02 deg/s
    nodes = rd.from_arrow(pa.table({
        "id": np.array([1, 2], np.int64),
        "lon": np.array([0.0, 2.0]), "lat": np.array([0.0, 0.0])}))
    ways = rd.from_items([{"id": 900, "refs": [1, 2]}])
    grid = build_segment_grid(ways, nodes, cell_deg=1.0)
    ts = np.arange(10, dtype=np.float64) * 5.0
    pts = rd.from_arrow(pa.table({
        "traj_id": pa.array(np.zeros(10, np.int64)),
        "ts": pa.array(ts),
        "lon": pa.array(0.1 + 0.02 * ts),
        "lat": pa.array(np.full(10, 0.001))}))
    matched = match_trajectories(pts, grid, radius=0.5)
    stats = way_speed_stats(matched).to_pandas()
    assert stats["way_id"].tolist() == [900]
    assert stats["n_samples"][0] == 9
    assert abs(stats["mean_speed"][0] - 0.02) < 1e-5
    assert abs(stats["max_speed"][0] - 0.02) < 1e-9

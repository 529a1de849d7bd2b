"""Travel-time weights — per-way brute replay + fastest-vs-shortest
route divergence."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from osm_cut_ray.stages.route import _edge_weight_cm, sssp, way_edges
from osm_cut_ray.stages.travel_time import pd_to_num, travel_time_edges

NODES = {1: (0.0, 0.0), 2: (0.01, 0.0), 3: (0.02, 0.0),
         4: (0.01, 0.02)}
# direct slow residential 1-2-3; long fast motorway 1-4-3
WAYS = [
    {"id": 10, "refs": [1, 2, 3],
     "tags": [("highway", "residential")]},
    {"id": 20, "refs": [1, 4, 3],
     "tags": [("highway", "motorway")]},
    {"id": 30, "refs": [2, 4],
     "tags": [("highway", "service"), ("maxspeed", "60")]},
]
SPEEDS = {"residential": 30.0, "motorway": 120.0}


def _nodes_ds():
    ids = sorted(NODES)
    return ray.data.from_arrow(pa.table({
        "id": pa.array(ids, pa.int64()),
        "lon": pa.array([NODES[i][0] for i in ids]),
        "lat": pa.array([NODES[i][1] for i in ids])}))


def _ways_ds(ways=None):
    ways = WAYS if ways is None else ways
    tags_t = pa.map_(pa.large_string(), pa.large_string())
    return ray.data.from_arrow(pa.table({
        "id": pa.array([w["id"] for w in ways], pa.int64()),
        "refs": pa.array([w["refs"] for w in ways],
                         pa.list_(pa.int64())),
        "tags": pa.array([w["tags"] for w in ways], tags_t)}))


def _brute():
    out = {}
    for w in WAYS:
        tags = dict(w["tags"])
        kmh = SPEEDS.get(tags.get("highway"), 30.0)
        if "maxspeed" in tags:
            try:
                kmh = float(tags["maxspeed"])
            except ValueError:
                pass
        for a, b in zip(w["refs"][:-1], w["refs"][1:]):
            d = float(_edge_weight_cm(
                np.array([NODES[a][0]]), np.array([NODES[a][1]]),
                np.array([NODES[b][0]]), np.array([NODES[b][1]]))[0])
            t = max(1, int(round(d * 100.0 / (kmh * 100000 / 3600))))
            out[(a, b)] = t
            out[(b, a)] = t
    return out


def test_matches_brute(ray_session):
    got = travel_time_edges(_ways_ds(), _nodes_ds(),
                            class_speeds=SPEEDS).to_pandas()
    gmap = {(int(r.src), int(r.dst)): int(r.w)
            for r in got.itertuples()}
    assert gmap == _brute()


def test_fastest_differs_from_shortest(ray_session):
    time_e = travel_time_edges(_ways_ds(), _nodes_ds(),
                               class_speeds=SPEEDS).materialize()
    dist_e = way_edges(_ways_ds(), _nodes_ds()).materialize()

    def dist_to3(edges):
        df = sssp(edges, [1]).to_pandas()
        m = df[df.node_id == 3]
        return None if m.empty else int(m["dist"].iloc[0])

    # time-space: motorway detour wins despite being ~2.2x longer
    t_par = time_e.to_pandas()
    via4 = t_par[(t_par.src == 1) & (t_par.dst == 4)]["w"].iloc[0] \
        + t_par[(t_par.src == 4) & (t_par.dst == 3)]["w"].iloc[0]
    direct = t_par[(t_par.src == 1) & (t_par.dst == 2)]["w"].iloc[0] \
        + t_par[(t_par.src == 2) & (t_par.dst == 3)]["w"].iloc[0]
    assert via4 < direct
    assert dist_to3(time_e) == int(via4)
    # distance-space: the direct residential chain wins
    d_par = dist_e.to_pandas()
    d_direct = d_par[(d_par.src == 1) & (d_par.dst == 2)]["w"].iloc[0] \
        + d_par[(d_par.src == 2) & (d_par.dst == 3)]["w"].iloc[0]
    assert dist_to3(dist_e) == int(d_direct)


def test_maxspeed_parsing():
    arr = pa.array(["60", "40 mph", "50 km/h", "none", None],
                   pa.large_string())
    got = pd_to_num(arr)
    assert got[0] == 60.0
    assert abs(got[1] - 64.37376) < 1e-6
    assert got[2] == 50.0
    assert np.isnan(got[3]) and np.isnan(got[4])


def test_validation(ray_session):
    with pytest.raises(ValueError, match="positive"):
        travel_time_edges(_ways_ds(), _nodes_ds(),
                          class_speeds={"x": -1.0})

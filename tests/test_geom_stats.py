"""Geometry stats — pure-Python replays of length/area rules."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from osm_cut_ray.stages.geom_stats import (length_by_tag, ring_areas,
                                           way_lengths)
from osm_cut_ray.stages.route import _edge_weight_cm

NODES = {1: (0.0, 0.0), 2: (0.01, 0.0), 3: (0.02, 0.0),
         4: (0.01, 0.01), 5: (0.03, 0.01), 6: (0.03, 0.0)}
WAYS = [
    {"id": 10, "refs": [1, 2, 3], "tags": [("highway", "primary")]},
    {"id": 20, "refs": [2, 4], "tags": [("highway", "primary")]},
    {"id": 30, "refs": [3, 6, 5, 4, 3], "tags": [("building", "yes")]},
    {"id": 40, "refs": [1, 4, 2, 1], "tags": []},
    {"id": 50, "refs": [6], "tags": [("highway", "service")]},
]


def _nodes_ds(parts=3):
    ids = sorted(NODES)
    return ray.data.from_arrow(pa.table({
        "id": pa.array(ids, pa.int64()),
        "lon": pa.array([NODES[i][0] for i in ids]),
        "lat": pa.array([NODES[i][1] for i in ids])})).repartition(parts)


def _ways_ds(parts=2):
    tags_t = pa.map_(pa.large_string(), pa.large_string())
    return ray.data.from_arrow(pa.table({
        "id": pa.array([w["id"] for w in WAYS], pa.int64()),
        "refs": pa.array([w["refs"] for w in WAYS],
                         pa.list_(pa.int64())),
        "tags": pa.array([w["tags"] for w in WAYS], tags_t)}))\
        .repartition(parts)


def _seg_cm(a, b):
    return int(_edge_weight_cm(
        np.array([NODES[a][0]]), np.array([NODES[a][1]]),
        np.array([NODES[b][0]]), np.array([NODES[b][1]]))[0])


def test_way_lengths_match_brute(ray_session):
    got = way_lengths(_ways_ds(), _nodes_ds()).to_pandas()
    gmap = {int(r.way_id): (int(r.length_cm), int(r.n_segments))
            for r in got.itertuples()}
    for w in WAYS:
        refs = w["refs"]
        exp = sum(_seg_cm(a, b) for a, b in zip(refs[:-1], refs[1:]))
        assert gmap[w["id"]] == (exp, max(0, len(refs) - 1)), w["id"]


def test_length_by_tag(ray_session):
    got = length_by_tag(_ways_ds(), _nodes_ds(), "highway")
    rows = {r["value"]: (r["total_km"], r["n_ways"])
            for r in got.to_pylist()}
    exp_primary = sum(
        _seg_cm(a, b)
        for w in WAYS if dict(w["tags"]).get("highway") == "primary"
        for a, b in zip(w["refs"][:-1], w["refs"][1:])) / 100_000.0
    assert abs(rows["primary"][0] - exp_primary) < 1e-12
    assert rows["primary"][1] == 2
    assert rows["service"] == (0.0, 1)      # single-node way
    assert rows[""][1] == 2                 # untagged + building
    # sorted by km desc
    kms = [r["total_km"] for r in got.to_pylist()]
    assert kms == sorted(kms, reverse=True)


def _shoelace(refs):
    lon = np.array([NODES[r][0] for r in refs])
    lat = np.array([NODES[r][1] for r in refs])
    cos = np.cos(np.radians(lat.mean()))
    x, y = lon * 111_320.0 * cos, lat * 111_320.0
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def test_ring_areas(ray_session):
    got = ring_areas(_ways_ds(), _nodes_ds()).to_pandas()
    gmap = {int(r.way_id): float(r.area_m2) for r in got.itertuples()}
    assert set(gmap) == {30, 40}            # only the closed rings
    for wid in (30, 40):
        refs = [w["refs"] for w in WAYS if w["id"] == wid][0]
        assert abs(gmap[wid] - _shoelace(refs)) < 1e-6
    assert gmap[30] > 0 and gmap[40] < 0    # winding signs differ
    with pytest.raises(Exception, match="closed ring"):
        ring_areas(_ways_ds(), _nodes_ds(),
                   skip_open=False).materialize()


def test_partition_invariance(ray_session):
    a = way_lengths(_ways_ds(1), _nodes_ds(1)).to_pandas()\
        .sort_values("way_id").reset_index(drop=True)
    b = way_lengths(_ways_ds(2), _nodes_ds(5)).to_pandas()\
        .sort_values("way_id").reset_index(drop=True)
    assert a.equals(b)

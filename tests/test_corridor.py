import numpy as np
import pyarrow as pa
import pytest


def _corpus(rd):
    """A straight 'railway' along lat 0 from lon 0..10, plus probe
    nodes at varying offsets, a crossing 'road', and a relation."""
    tags_type = pa.map_(pa.large_string(), pa.large_string())
    mem_type = pa.list_(pa.struct([("type", pa.large_string()),
                                   ("ref", pa.int64()),
                                   ("role", pa.large_string())]))
    # rail nodes 1..6 at (0,0) (2,0) ... (10,0)
    ids = [1, 2, 3, 4, 5, 6]
    lon = [0.0, 2.0, 4.0, 6.0, 8.0, 10.0]
    lat = [0.0] * 6
    # probes: 100 near (dist .05), 101 far (.5), 102 very far, 103
    # near the far END of the line
    ids += [100, 101, 102, 103]
    lon += [3.0, 5.0, 5.0, 10.0]
    lat += [0.05, 0.5, 5.0, 0.08]
    nodes = pa.table({
        "id": pa.array(ids, pa.int64()),
        "lon": pa.array(lon), "lat": pa.array(lat),
        "version": pa.array([1] * len(ids), pa.int64()),
        "tags": pa.array([None] * len(ids), tags_type)})
    ways = pa.table({
        "id": pa.array([50, 51, 52], pa.int64()),
        "node_ids": pa.array([[1, 2, 3, 4, 5, 6],   # the railway
                              [100, 101],           # near road
                              [102, 102]],          # far loop
                             pa.list_(pa.int64())),
        "version": pa.array([1, 1, 1], pa.int64()),
        "tags": pa.array([[("railway", "rail")],
                          [("highway", "x")], [("highway", "y")]],
                         tags_type)})
    rels = pa.table({
        "id": pa.array([80], pa.int64()),
        "members": pa.array([[{"type": "way", "ref": 51,
                               "role": ""}]], mem_type),
        "version": pa.array([1], pa.int64()),
        "tags": pa.array([None], tags_type)})
    return (rd.from_arrow(nodes).repartition(3),
            rd.from_arrow(ways), rd.from_arrow(rels))


def test_cut_corridor_by_tag(ray_session):
    import ray.data as rd

    from osm_cut_ray.pipelines.corridor import cut_corridor

    nodes, ways, rels = _corpus(rd)
    res = cut_corridor(nodes, ways, rels, dist_deg=0.1,
                       way_tag="railway", complete=True)
    kept_nodes = {r["id"] for r in res.nodes.take_all()}
    kept_ways = {r["id"] for r in res.ways.take_all()}
    kept_rels = {r["id"] for r in res.relations.take_all()}
    # rail nodes + both probes within 0.1 deg of the line
    assert {1, 2, 3, 4, 5, 6, 100, 103} <= kept_nodes
    assert 102 not in kept_nodes
    # way 51 touches node 100 (inside) -> kept complete, pulling 101
    assert kept_ways == {50, 51}
    assert 101 in kept_nodes  # complete-mode back-join
    assert kept_rels == {80}  # member way kept -> relation kept


def test_cut_corridor_by_ids_and_validation(ray_session):
    import ray.data as rd

    from osm_cut_ray.pipelines.corridor import cut_corridor

    nodes, ways, rels = _corpus(rd)
    res = cut_corridor(nodes, ways, rels, dist_deg=0.1, way_ids=[50],
                       complete=False)
    kept_nodes = {r["id"] for r in res.nodes.take_all()}
    assert kept_nodes == {1, 2, 3, 4, 5, 6, 100, 103}
    with pytest.raises(ValueError, match="exactly one"):
        cut_corridor(nodes, ways, rels, dist_deg=0.1)
    with pytest.raises(RuntimeError, match="matched nothing"):
        cut_corridor(nodes, ways, rels, dist_deg=0.1,
                     way_tag="waterway")

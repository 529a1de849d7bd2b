"""OD distance matrix — networkx-pinned via the product-graph
reduction onto route.sssp (both engines inherited)."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from osm_cut_ray.stages.dist_matrix import distance_matrix
from osm_cut_ray.stages.route import way_edges

from test_route import _brute_edges, _synth_road, _to_ds


def _nx_per_source(edges, sources):
    import networkx as nx
    g = nx.DiGraph()
    for a, b, w in edges:
        if g.has_edge(a, b):
            w = min(w, g[a][b]["weight"])
        g.add_edge(a, b, weight=w)
    out = {}
    for s in sources:
        if g.has_node(s):
            for node, d in nx.single_source_dijkstra_path_length(
                    g, s, weight="weight").items():
                out[(s, node)] = int(d)
        else:
            out[(s, s)] = 0
    return out


def _got(res):
    df = res.to_pandas()
    return {(int(r.source), int(r.node_id)): int(r.dist)
            for r in df.itertuples()}


def test_matches_networkx_per_source(ray_session):
    rng = np.random.default_rng(31)
    nodes_df, ways_df = _synth_road(rng)
    edges = way_edges(_to_ds(ways_df), _to_ds(nodes_df)).materialize()
    sources = [int(nodes_df.id.iloc[i]) for i in (3, 40, 77)]
    got = _got(distance_matrix(edges, sources))
    assert got == _nx_per_source(_brute_edges(nodes_df, ways_df),
                                 sources)


def test_distributed_engine_identical(ray_session):
    rng = np.random.default_rng(37)
    nodes_df, ways_df = _synth_road(rng, n_nodes=60, extra_edges=30)
    edges = way_edges(_to_ds(ways_df), _to_ds(nodes_df)).materialize()
    sources = [int(nodes_df.id.iloc[i]) for i in (5, 50)]
    full = _got(distance_matrix(edges, sources))
    forced = _got(distance_matrix(edges, sources,
                                  max_driver_edges=1, max_rounds=400))
    assert forced == full


def test_targets_filter(ray_session):
    rng = np.random.default_rng(41)
    nodes_df, ways_df = _synth_road(rng, n_nodes=50, extra_edges=20)
    edges = way_edges(_to_ds(ways_df), _to_ds(nodes_df)).materialize()
    sources = [int(nodes_df.id.iloc[0])]
    targets = [int(nodes_df.id.iloc[i]) for i in (10, 20, 30)]
    full = _got(distance_matrix(edges, sources))
    sub = _got(distance_matrix(edges, sources, targets))
    assert sub == {(s, t): d for (s, t), d in full.items()
                   if t in set(targets)}


def test_negative_ids_decode(ray_session):
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([-5, -3, 2], pa.int64()),
        "dst": pa.array([-3, 2, 7], pa.int64()),
        "w": pa.array([10, 20, 30], pa.int64())}))
    got = _got(distance_matrix(edges, [-5, 2]))
    assert got == {(-5, -5): 0, (-5, -3): 10, (-5, 2): 30,
                   (-5, 7): 60, (2, 2): 0, (2, 7): 30}


def test_caps_raise(ray_session):
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([1], pa.int64()),
        "dst": pa.array([2], pa.int64()),
        "w": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError, match="max_sources"):
        distance_matrix(edges, list(range(100)), max_sources=10)
    with pytest.raises(ValueError, match="empty source"):
        distance_matrix(edges, [])
    big = ray.data.from_arrow(pa.table({
        "src": pa.array([1 << 61], pa.int64()),
        "dst": pa.array([2], pa.int64()),
        "w": pa.array([1], pa.int64())}))
    with pytest.raises(Exception, match="overflows"):
        distance_matrix(big, [1, 2]).materialize()

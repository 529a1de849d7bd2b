import numpy as np
import pyarrow as pa


def _to_maps(per_node):
    t = pa.concat_tables(
        [pa.table(b) for b in per_node.iter_batches(
            batch_format="pyarrow")])
    tri = dict(zip(t["node"].to_pylist(), t["triangles"].to_pylist()))
    cl = dict(zip(t["node"].to_pylist(), t["clustering"].to_pylist()))
    deg = dict(zip(t["node"].to_pylist(), t["degree"].to_pylist()))
    return tri, cl, deg


def test_triangle_stats_complete_graph(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.graph_stats import triangle_stats

    # K5: C(5,3)=10 triangles, each node in C(4,2)=6, clustering 1.0
    edges = [(a, b) for a in range(5) for b in range(5) if a < b]
    ds = rd.from_items([{"src": a, "dst": b} for a, b in edges])
    total, per_node = triangle_stats(ds)
    assert total == 10
    tri, cl, deg = _to_maps(per_node)
    assert tri == {n: 6 for n in range(5)}
    assert deg == {n: 4 for n in range(5)}
    assert all(abs(c - 1.0) < 1e-12 for c in cl.values())


def test_triangle_stats_matches_networkx(ray_session):
    import networkx as nx
    import ray.data as rd

    from osm_cut_ray.stages.graph_stats import triangle_stats

    rng = np.random.default_rng(404)
    n = 120
    # power-law-ish: hub nodes get many edges
    src = (rng.zipf(1.6, 900) % n).astype(np.int64)
    dst = rng.integers(0, n, 900).astype(np.int64)
    # inject duplicates, reversed duplicates and self-loops — the
    # canonicalizer must handle all three
    src = np.concatenate([src, dst[:100], np.arange(10)])
    dst = np.concatenate([dst, src[:100], np.arange(10)])

    g = nx.Graph()
    for a, b in zip(src.tolist(), dst.tolist()):
        if a != b:
            g.add_edge(a, b)

    ds = rd.from_items(
        [{"src": int(a), "dst": int(b)}
         for a, b in zip(src.tolist(), dst.tolist())])
    total, per_node = triangle_stats(ds)

    nx_tri = nx.triangles(g)
    assert total == sum(nx_tri.values()) // 3
    tri, cl, deg = _to_maps(per_node)
    nx_cl = nx.clustering(g)
    assert set(tri) == set(g.nodes)
    for node in g.nodes:
        assert tri[node] == nx_tri[node], node
        assert deg[node] == g.degree(node), node
        assert abs(cl[node] - nx_cl[node]) < 1e-12, node


def test_triangle_stats_zero_triangle_nodes_kept(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.graph_stats import triangle_stats

    # star graph: no triangles at all, every node must still appear
    ds = rd.from_items([{"src": 0, "dst": i} for i in range(1, 8)])
    total, per_node = triangle_stats(ds)
    assert total == 0
    tri, cl, deg = _to_maps(per_node)
    assert set(tri) == set(range(8))
    assert all(v == 0 for v in tri.values())
    assert deg[0] == 7 and all(deg[i] == 1 for i in range(1, 8))
    assert all(c == 0.0 for c in cl.values())


def test_triangle_stats_out_degree_cap_raises(ray_session):
    import pytest
    import ray.data as rd

    from osm_cut_ray.stages.graph_stats import triangle_stats

    edges = [(a, b) for a in range(8) for b in range(8) if a < b]
    ds = rd.from_items([{"src": a, "dst": b} for a, b in edges])
    with pytest.raises((ValueError, Exception)):
        total, per_node = triangle_stats(ds, max_out_degree=2)
        per_node.materialize()

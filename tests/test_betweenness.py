import numpy as np
import pyarrow as pa


def _bc_map(ds):
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return dict(zip(t["node"].to_pylist(),
                    t["betweenness"].to_pylist()))


def test_betweenness_matches_networkx_exact(ray_session):
    import networkx as nx
    import ray.data as rd

    from osm_cut_ray.stages.betweenness import betweenness

    rng = np.random.default_rng(77)
    n = 60
    src = rng.integers(0, n, 260).astype(np.int64)
    dst = rng.integers(0, n, 260).astype(np.int64)
    g = nx.Graph()
    g.add_nodes_from(range(n))
    for a, b in zip(src.tolist(), dst.tolist()):
        if a != b:
            g.add_edge(a, b)

    ds = rd.from_items(
        [{"src": int(a), "dst": int(b)}
         for a, b in zip(src.tolist(), dst.tolist())])
    got = _bc_map(betweenness(ds, chunk=7))
    exp = nx.betweenness_centrality(g, normalized=False)
    # nodes with edges only (isolated nodes have bc 0 and are not in
    # the edge-derived universe)
    for node, v in got.items():
        assert abs(v - exp[node]) < 1e-6, node


def test_betweenness_path_graph_golden(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.betweenness import betweenness

    # path 0-1-2-3-4: bc(i) = (i)(n-1-i) pairs through interior
    ds = rd.from_items([{"src": i, "dst": i + 1} for i in range(4)])
    got = _bc_map(betweenness(ds))
    assert got == {0: 0.0, 1: 3.0, 2: 4.0, 3: 3.0, 4: 0.0}


def test_betweenness_sampled_approximates_and_dets(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.betweenness import betweenness

    rng = np.random.default_rng(3)
    n = 120
    src = rng.integers(0, n, 700).astype(np.int64)
    dst = rng.integers(0, n, 700).astype(np.int64)
    ds = rd.from_items(
        [{"src": int(a), "dst": int(b)}
         for a, b in zip(src.tolist(), dst.tolist())])
    exact = _bc_map(betweenness(ds))
    s1 = _bc_map(betweenness(ds, n_sources=40, seed=5))
    s2 = _bc_map(betweenness(ds, n_sources=40, seed=5))
    assert s1 == s2  # deterministic sample
    # rank correlation with exact should be strong
    nodes = sorted(exact)
    e = np.array([exact[x] for x in nodes])
    a = np.array([s1[x] for x in nodes])
    er = np.argsort(np.argsort(e))
    ar = np.argsort(np.argsort(a))
    rho = np.corrcoef(er, ar)[0, 1]
    assert rho > 0.8, rho


def test_betweenness_node_cap_raises(ray_session):
    import pytest
    import ray.data as rd

    from osm_cut_ray.stages.betweenness import betweenness

    ds = rd.from_items([{"src": i, "dst": i + 1} for i in range(20)])
    with pytest.raises(ValueError, match="max_broadcast_nodes"):
        betweenness(ds, max_broadcast_nodes=5)


# ---------------- distributed (bucketed-shuffle) engine pins ----------------

def _graph_ds(rd, n, m, seed):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    return rd.from_items(
        [{"src": int(a), "dst": int(b)}
         for a, b in zip(src.tolist(), dst.tolist())])


def test_shuffle_engine_bit_equal_exact(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.betweenness import betweenness

    ds = _graph_ds(rd, 24, 60, 11)
    bb = _bc_map(betweenness(ds, engine="broadcast", chunk=5))
    bs = _bc_map(betweenness(ds, engine="shuffle", src_batch=64))
    assert bb.keys() == bs.keys()
    for k in bb:
        assert bb[k] == bs[k], k  # BIT-for-bit, not approx


def test_shuffle_engine_bit_equal_sampled_and_batched(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.betweenness import betweenness

    ds = _graph_ds(rd, 40, 110, 23)
    bb = _bc_map(betweenness(ds, engine="broadcast", n_sources=8,
                             seed=5, chunk=3))
    bs = _bc_map(betweenness(ds, engine="shuffle", n_sources=8,
                             seed=5, src_batch=3))  # 3 sweeps
    assert bb.keys() == bs.keys()
    for k in bb:
        assert bb[k] == bs[k], k


def test_shuffle_engine_disconnected_components(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.betweenness import betweenness

    # two disjoint paths: BFS must terminate per component and zero
    # cross-component dependencies
    edges = [{"src": i, "dst": i + 1} for i in range(3)] \
        + [{"src": 100 + i, "dst": 101 + i} for i in range(2)]
    ds = rd.from_items(edges)
    bb = _bc_map(betweenness(ds, engine="broadcast"))
    bs = _bc_map(betweenness(ds, engine="shuffle", src_batch=64))
    assert bb == bs
    assert bs[1] == 2.0 and bs[2] == 2.0 and bs[101] == 1.0


def test_auto_forced_low_cap_falls_to_shuffle(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.betweenness import betweenness

    ds = _graph_ds(rd, 20, 50, 7)
    ref = _bc_map(betweenness(ds, engine="broadcast", n_sources=6,
                              seed=2))
    # cap of 3 nodes forces auto onto the shuffle path
    got = _bc_map(betweenness(ds, engine="auto", n_sources=6, seed=2,
                              max_broadcast_nodes=3, src_batch=64))
    assert ref == got


def test_shuffle_exact_past_cap_raises(ray_session):
    import pytest
    import ray.data as rd

    from osm_cut_ray.stages.betweenness import betweenness

    ds = _graph_ds(rd, 20, 50, 7)
    with pytest.raises(ValueError, match="n_sources"):
        betweenness(ds, engine="shuffle",
                    max_broadcast_nodes=3).materialize()

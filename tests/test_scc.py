"""SCC — pinned against networkx strongly_connected_components;
driver Tarjan and broadcast coloring engines must agree exactly."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from osm_cut_ray.stages.scc import _tarjan, condense, scc


def _ds(edges, parts=4):
    src = np.array([e[0] for e in edges], np.int64)
    dst = np.array([e[1] for e in edges], np.int64)
    return ray.data.from_arrow(pa.table(
        {"src": src, "dst": dst})).repartition(parts)


def _nx_labels(edges):
    import networkx as nx
    g = nx.DiGraph()
    g.add_edges_from(edges)
    out = {}
    for comp in nx.strongly_connected_components(g):
        root = min(comp)
        for v in comp:
            out[v] = root
    return out


def _got(res):
    df = res.to_pandas()
    return {int(r.node_id): int(r.scc_id) for r in df.itertuples()}


def _rand_graph(n, m, seed):
    rng = np.random.RandomState(seed)
    edges = set()
    while len(edges) < m:
        a, b = rng.randint(0, n, 2)
        edges.add((int(a), int(b)))
    return sorted(edges)


def test_tarjan_matches_networkx():
    for seed in (1, 2, 3):
        edges = _rand_graph(40, 120, seed)
        src = np.array([e[0] for e in edges], np.int64)
        dst = np.array([e[1] for e in edges], np.int64)
        assert _tarjan(src, dst) == _nx_labels(edges)


def test_driver_engine_matches_networkx(ray_session):
    edges = _rand_graph(60, 200, 7)
    assert _got(scc(_ds(edges))) == _nx_labels(edges)


def test_structured_cases(ray_session):
    # two 3-cycles joined by a one-way bridge + a tail chain + self-loop
    edges = [(1, 2), (2, 3), (3, 1),
             (3, 10), (10, 11), (11, 12), (12, 10),
             (12, 20), (20, 21), (30, 30)]
    got = _got(scc(_ds(edges)))
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == got[12] == 10
    assert got[20] == 20 and got[21] == 21 and got[30] == 30


def test_coloring_engine_identical(ray_session):
    for seed in (11, 12):
        edges = _rand_graph(50, 150, seed)
        drv = _got(scc(_ds(edges), engine="driver"))
        col = _got(scc(_ds(edges, parts=7), engine="coloring",
                       max_rounds=200))
        assert col == drv


def test_condense_matches_networkx(ray_session):
    import networkx as nx
    edges = _rand_graph(40, 130, 21)
    labels = scc(_ds(edges)).materialize()
    got = {(int(r.src), int(r.dst))
           for r in condense(_ds(edges), labels).to_pandas()
           .itertuples()}
    lab = _nx_labels(edges)
    exp = {(lab[a], lab[b]) for a, b in edges if lab[a] != lab[b]}
    assert got == exp
    # the condensation is a DAG
    g = nx.DiGraph(list(got))
    assert nx.is_directed_acyclic_graph(g)


def test_caps_and_validation(ray_session):
    edges = _rand_graph(10, 20, 31)
    with pytest.raises(ValueError, match="unknown engine"):
        scc(_ds(edges), engine="nope")
    with pytest.raises(ValueError, match="max_driver_edges"):
        scc(_ds(edges), engine="driver", max_driver_edges=2)
    with pytest.raises(ValueError, match="max_broadcast_nodes"):
        scc(_ds(edges), engine="coloring", max_broadcast_nodes=3)
    with pytest.raises(RuntimeError, match="max_rounds"):
        # a long descending chain forces round exhaustion
        chain = [(i + 1, i) for i in range(30)]
        scc(_ds(chain), engine="coloring", max_rounds=3)
    empty = _ds([(1, 2)]).filter(lambda r: False)
    assert _got(scc(empty, engine="coloring")) == {}

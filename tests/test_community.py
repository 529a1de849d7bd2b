from collections import Counter, defaultdict

import numpy as np
import pyarrow as pa


def _lab_map(ds):
    bs = [pa.table(b)
          for b in ds.iter_batches(batch_format="pyarrow")]
    if not bs:
        return {}
    t = pa.concat_tables(bs)
    return dict(zip(t["node"].to_pylist(), t["label"].to_pylist()))


def _brute_lpa(edges, max_rounds=100):
    """Independent replay of the documented rule: synchronous,
    self-vote included, max count then min label, winner clamped
    to min(old, winner) (monotone — guaranteed termination)."""
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    labels = {v: v for v in adj}
    for _ in range(max_rounds):
        new = {}
        for v in adj:
            votes = Counter([labels[v]] + [labels[u] for u in adj[v]])
            mc = max(votes.values())
            win = min(l for l, c in votes.items() if c == mc)
            new[v] = min(labels[v], win)
        if new == labels:
            return labels
        labels = new
    raise RuntimeError("brute LPA did not converge")


def _clique(nodes):
    return [(a, b) for a in nodes for b in nodes if a < b]


def _planted_graph():
    # three cliques bridged by single edges + duplicate/self noise
    edges = (_clique(range(0, 6)) + _clique(range(10, 15))
             + _clique(range(20, 27)))
    edges += [(5, 10), (14, 20)]
    edges += [(3, 3), (0, 1), (1, 0), (12, 11)]  # self + dup + rev
    return edges


def test_lpa_matches_brute_replay(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.community import label_propagation

    edges = _planted_graph()
    want = _brute_lpa(edges)
    ds = rd.from_items([{"src": a, "dst": b} for a, b in edges])
    got = _lab_map(label_propagation(ds))
    assert got == want
    # two disjoint cliques collapse to their min ids
    assert len({v for k, v in got.items() if k < 10}) == 1


def test_lpa_shuffle_equals_broadcast_bitforbit(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.community import label_propagation

    edges = _planted_graph()
    ds = rd.from_items([{"src": a, "dst": b} for a, b in edges])
    bc = _lab_map(label_propagation(ds, engine="broadcast"))
    sh = _lab_map(label_propagation(ds, engine="shuffle"))
    assert sh == bc
    # forced-low-cap auto must route to shuffle, same result
    capped = _lab_map(label_propagation(ds, max_driver_nodes=3))
    assert capped == bc
    # partition-invariance
    rep = _lab_map(label_propagation(ds.repartition(13)))
    assert rep == bc


def test_lpa_raises_on_round_exhaustion(ray_session):
    import pytest
    import ray.data as rd

    from osm_cut_ray.stages.community import label_propagation

    # a path needs >1 round to settle
    edges = [(i, i + 1) for i in range(6)]
    ds = rd.from_items([{"src": a, "dst": b} for a, b in edges])
    for engine in ("broadcast", "shuffle"):
        with pytest.raises(RuntimeError, match="max_rounds"):
            label_propagation(ds, max_rounds=1, engine=engine)


def test_lpa_empty(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.community import label_propagation

    ds = rd.from_items([{"src": 1, "dst": 1}])  # only a self-loop
    assert _lab_map(label_propagation(ds)) == {}


def test_modularity_matches_networkx(ray_session):
    import networkx as nx
    import ray.data as rd

    from osm_cut_ray.stages.community import (label_propagation,
                                              modularity)

    rng = np.random.default_rng(42)
    edges = _planted_graph()
    # noise edges to make the count structure non-trivial
    extra = [(int(a), int(b)) for a, b in
             zip(rng.integers(0, 27, 30), rng.integers(0, 27, 30))]
    edges = edges + extra

    g = nx.Graph()
    for a, b in edges:
        if a != b:
            g.add_edge(a, b)

    ds = rd.from_items([{"src": a, "dst": b} for a, b in edges])
    labs = label_propagation(ds)
    lab_map = _lab_map(labs)
    comms = defaultdict(set)
    for n, l in lab_map.items():
        comms[l].add(n)
    want = nx.algorithms.community.modularity(
        g, list(comms.values()))
    got = modularity(ds, labs)
    assert abs(got - want) < 1e-12

    # bit-determinism under repartitioning
    got2 = modularity(ds.repartition(17), labs.repartition(5))
    assert got == got2


def test_modularity_perfect_split(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.community import (label_propagation,
                                              modularity)

    # two disjoint equal cliques: Q = 1/2 exactly
    edges = _clique(range(0, 5)) + _clique(range(10, 15))
    ds = rd.from_items([{"src": a, "dst": b} for a, b in edges])
    labs = label_propagation(ds)
    assert abs(modularity(ds, labs) - 0.5) < 1e-12

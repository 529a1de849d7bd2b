"""Label spreading — pinned against a pure-Python replay of the
frozen-frontier majority rule."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

import ray

from osm_cut_ray.stages.label_spread import label_spread


def _ds_edges(edges, parts=4):
    return ray.data.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges], pa.int64()),
        "dst": pa.array([b for _, b in edges], pa.int64())}))\
        .repartition(parts)


def _ds_seeds(seeds):
    return ray.data.from_arrow(pa.table({
        "node": pa.array(sorted(seeds), pa.int64()),
        "label": pa.array([seeds[k] for k in sorted(seeds)],
                          pa.int64())}))


def _replay(edges, seeds, max_rounds=64):
    label = dict(seeds)
    for _ in range(max_rounds):
        votes = {}
        for a, b in edges:
            if a in label and b not in label:
                votes.setdefault(b, Counter())[label[a]] += 1
        if not votes:
            break
        for b, c in votes.items():
            label[b] = sorted(c.items(),
                              key=lambda kv: (-kv[1], kv[0]))[0][0]
    return label


def _got(res):
    return {int(r["node"]): int(r["label"])
            for r in res.to_pandas().to_dict("records")}


def _undirected(pairs):
    return sorted({(a, b) for a, b in pairs} | {(b, a)
                                                for a, b in pairs})


def test_matches_replay_random(ray_session):
    rng = np.random.RandomState(1)
    for seed in (1, 2):
        edges = _undirected(
            {(int(a), int(b)) for a, b in rng.randint(0, 50, (120, 2))
             if a != b})
        seeds = {0: 10, 7: 20, 13: 30}
        got = _got(label_spread(_ds_edges(edges), _ds_seeds(seeds)))
        exp = _replay(edges, seeds)
        for node, lab in got.items():
            assert lab == exp.get(node, -1), node


def test_two_cluster_bridge(ray_session):
    # two cliques joined by one bridge: each clique takes its seed
    a = [(i, j) for i in range(5) for j in range(5) if i != j]
    b = [(i + 10, j + 10) for i, j in a]
    edges = _undirected(a + b + [(4, 10)])
    got = _got(label_spread(_ds_edges(edges),
                            _ds_seeds({0: 100, 13: 200})))
    for i in range(5):
        assert got[i] == 100
    for i in range(10, 15):
        assert got[i] == 200


def test_ties_pick_smaller_label_and_unreached(ray_session):
    edges = _undirected([(1, 3), (2, 3)]) + [(8, 9)]
    got = _got(label_spread(_ds_edges(edges),
                            _ds_seeds({1: 7, 2: 5})))
    assert got[3] == 5           # tie -> smaller label
    assert got[8] == -1 and got[9] == -1
    # off-graph seed survives in the output
    got2 = _got(label_spread(_ds_edges(edges),
                             _ds_seeds({1: 7, 999: 3})))
    assert got2[999] == 3


def test_partition_invariance_and_validation(ray_session):
    rng = np.random.RandomState(4)
    edges = _undirected({(int(a), int(b))
                         for a, b in rng.randint(0, 30, (60, 2))
                         if a != b})
    seeds = {0: 1, 5: 2}
    a = _got(label_spread(_ds_edges(edges, 1), _ds_seeds(seeds)))
    b = _got(label_spread(_ds_edges(edges, 7), _ds_seeds(seeds)))
    assert a == b
    with pytest.raises(ValueError, match="empty seed"):
        label_spread(_ds_edges(edges), _ds_seeds({}))
    dup = ray.data.from_arrow(pa.table({
        "node": pa.array([1, 1], pa.int64()),
        "label": pa.array([2, 3], pa.int64())}))
    with pytest.raises(ValueError, match="duplicate"):
        label_spread(_ds_edges(edges), dup)

"""ALT routing — exact distances pinned against route._dijkstra,
with the landmark heuristic actually pruning expansions."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from osm_cut_ray.stages.alt_route import (ALTIndex, alt_prepare,
                                          select_landmarks)
from osm_cut_ray.stages.route import _dijkstra, way_edges

from test_route import _synth_road, _to_ds


def _prep(seed, n_nodes=120, extra=80, k=6):
    rng = np.random.default_rng(seed)
    nodes_df, ways_df = _synth_road(rng, n_nodes=n_nodes,
                                    extra_edges=extra)
    edges = way_edges(_to_ds(ways_df), _to_ds(nodes_df)).materialize()
    idx = alt_prepare(edges, k_landmarks=k)
    got = edges.to_pandas()
    return idx, (got["src"].to_numpy().astype(np.int64),
                 got["dst"].to_numpy().astype(np.int64),
                 got["w"].to_numpy().astype(np.int64)), nodes_df


def _dij_dist(arrs, s):
    t = _dijkstra(*arrs, [s])
    return {int(r["node_id"]): int(r["dist"])
            for r in t.to_pylist()}


def test_exact_distances(ray_session):
    idx, arrs, nodes_df = _prep(51)
    ids = nodes_df["id"].to_numpy()
    rng = np.random.default_rng(1)
    for s in rng.choice(ids, 4, replace=False):
        base = _dij_dist(arrs, int(s))
        for t in rng.choice(ids, 6, replace=False):
            got = idx.query(int(s), int(t))
            exp = base.get(int(t))
            assert got == exp, (s, t)


def test_pruning_beats_dijkstra(ray_session):
    idx, arrs, nodes_df = _prep(52, n_nodes=200, extra=150, k=8)
    # zero-heuristic twin: same index, bounds forced to 0 == Dijkstra
    plain = ALTIndex(idx.nodes, idx.indptr, idx.nbrs, idx.wts,
                     idx.landmarks, np.full_like(idx.d_fwd, idx.INF),
                     np.full_like(idx.d_bwd, idx.INF))
    ids = nodes_df["id"].to_numpy()
    rng = np.random.default_rng(2)
    wins = total = 0
    for _ in range(10):
        s, t = (int(x) for x in rng.choice(ids, 2, replace=False))
        d_alt, e_alt = idx.query(s, t, return_expanded=True)
        d_pl, e_pl = plain.query(s, t, return_expanded=True)
        assert d_alt == d_pl
        if d_alt is not None:
            total += 1
            if e_alt < e_pl:
                wins += 1
    assert total >= 5 and wins >= total * 0.6


def test_landmark_selection_deterministic(ray_session):
    rng = np.random.default_rng(53)
    nodes_df, ways_df = _synth_road(rng, n_nodes=80, extra_edges=40)
    edges = way_edges(_to_ds(ways_df), _to_ds(nodes_df)).materialize()
    a = select_landmarks(edges, 5)
    b = select_landmarks(edges.repartition(7), 5)
    assert a == b and len(a) == 5
    assert a[0] == int(min(nodes_df["id"]))


def test_unknown_node_raises(ray_session):
    idx, _, _ = _prep(54, n_nodes=40, extra=20, k=3)
    with pytest.raises(KeyError):
        idx.query(999999, int(idx.nodes[0]))

"""Personalized PageRank — brute power-iteration pin, cross-engine
bit-equality, and unchanged uniform default."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from osm_cut_ray.stages.route import pagerank


def _graph(seed, n=40, m=140):
    rng = np.random.RandomState(seed)
    pairs = sorted({(int(a), int(b))
                    for a, b in rng.randint(0, n, (m, 2))
                    if a != b})
    src = np.array([a for a, _ in pairs], np.int64)
    dst = np.array([b for _, b in pairs], np.int64)
    return src, dst


def _ds(src, dst, parts=4):
    return ray.data.from_arrow(pa.table(
        {"src": src, "dst": dst})).repartition(parts)


def _brute_ppr(src, dst, seeds, d=0.85, n_iter=400):
    nodes = sorted(set(src) | set(dst))
    pos = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    tele = np.zeros(n)
    tot_w = sum(seeds.values())
    for k, w in seeds.items():
        tele[pos[k]] = w / tot_w
    deg = np.zeros(n)
    for a in src:
        deg[pos[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        nxt = np.zeros(n)
        for a, b in zip(src, dst):
            nxt[pos[b]] += d * r[pos[a]] / deg[pos[a]]
        nxt += (1.0 - nxt.sum()) * tele
        r = nxt
    return dict(zip(nodes, r))


def _got(res):
    return {int(r["node"]): float(r["rank"])
            for r in res.to_pandas().to_dict("records")}


def test_matches_brute_power_iteration(ray_session):
    src, dst = _graph(3)
    seeds = {int(src[0]): 2.0, int(dst[5]): 1.0}
    got = _got(pagerank(_ds(src, dst), n_iter=60, seeds=seeds))
    exp = _brute_ppr(src, dst, seeds)
    assert set(got) == set(exp)
    for k in got:
        assert abs(got[k] - exp[k]) < 5e-4, k
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # mass concentrates near the seeds vs uniform PR
    uni = _got(pagerank(_ds(src, dst), n_iter=60))
    for s in seeds:
        assert got[s] > uni[s]


def test_engines_bit_identical_with_seeds(ray_session):
    src, dst = _graph(5, n=30, m=90)
    seeds = {int(src[0]): 1.0, int(src[1]): 3.5}
    b = _got(pagerank(_ds(src, dst), n_iter=25, seeds=seeds,
                      engine="broadcast"))
    s = _got(pagerank(_ds(src, dst, parts=7), n_iter=25, seeds=seeds,
                      engine="shuffle"))
    assert b == s  # float equality — identical integer trajectories


def test_uniform_default_unchanged(ray_session):
    src, dst = _graph(7)
    a = _got(pagerank(_ds(src, dst), n_iter=15))
    b = _got(pagerank(_ds(src, dst), n_iter=15, engine="shuffle"))
    assert a == b


def test_validation(ray_session):
    src, dst = _graph(9, n=20, m=50)
    with pytest.raises(ValueError, match="not present"):
        pagerank(_ds(src, dst), seeds={999999: 1.0})
    with pytest.raises(ValueError, match="not present"):
        pagerank(_ds(src, dst), seeds={999999: 1.0},
                 engine="shuffle").materialize()
    with pytest.raises(ValueError, match="positive"):
        pagerank(_ds(src, dst), seeds={int(src[0]): -1.0})
    with pytest.raises(ValueError, match="empty"):
        pagerank(_ds(src, dst), seeds={})

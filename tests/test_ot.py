"""Sinkhorn OT corpus distance — solver pinned against exact OT in
closed-form cases + an independent replay; the distributed histogram
pinned against driver assignment."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from osm_cut_ray.stages.knn import _normalize, deterministic_centroids
from osm_cut_ray.stages.ot import (_sinkhorn, corpus_histogram,
                                   sinkhorn_distance)


# ---------------------------------------------------------- solver pins

def test_two_cell_exact_limit():
    # all mass must move across cost c -> exact OT = c; entropic bias
    # vanishes because the plan is forced
    cost = np.array([[0.0, 3.0], [3.0, 0.0]])
    d, plan = _sinkhorn(np.array([5.0, 0.0]), np.array([0.0, 5.0]),
                        cost, reg=0.05, n_iter=500)
    assert abs(d - 3.0) < 1e-9
    assert abs(plan[0, 1] - 1.0) < 1e-9


def test_identical_histograms_near_zero():
    cost = np.abs(np.arange(4)[:, None] - np.arange(4)[None, :]) * 1.0
    h = np.array([1.0, 2.0, 3.0, 4.0])
    d, _ = _sinkhorn(h, h, cost, reg=0.01, n_iter=2000)
    assert d < 1e-3


def test_1d_line_matches_cdf_formula():
    # exact 1-D OT with unit-spaced cells = sum |CDF_a - CDF_b|
    rng = np.random.RandomState(3)
    a = rng.randint(1, 10, 6).astype(np.float64)
    b = rng.randint(1, 10, 6).astype(np.float64)
    a /= a.sum()
    b /= b.sum()
    cost = np.abs(np.arange(6)[:, None] - np.arange(6)[None, :]) * 1.0
    exact = float(np.abs(np.cumsum(a - b)[:-1]).sum())
    d, _ = _sinkhorn(a, b, cost, reg=0.02, n_iter=5000)
    assert abs(d - exact) < 0.05 * max(exact, 1.0)
    # entropic cost is an upper-biased smoothing: never far below
    assert d > exact - 1e-6
    with pytest.raises(ValueError, match="underflow"):
        _sinkhorn(a, b, cost, reg=0.005, n_iter=10)


def test_plan_marginals():
    rng = np.random.RandomState(4)
    a = rng.rand(5) + 0.1
    b = rng.rand(5) + 0.1
    cost = rng.rand(5, 5)
    _, plan = _sinkhorn(a, b, cost, reg=0.1, n_iter=3000)
    np.testing.assert_allclose(plan.sum(axis=1), a / a.sum(),
                               atol=1e-9)
    np.testing.assert_allclose(plan.sum(axis=0), b / b.sum(),
                               atol=1e-9)


# ----------------------------------------------------- distributed path

def _emb_ds(vecs, id0=0, parts=3):
    t = pa.table({
        "vec_id": pa.array(np.arange(id0, id0 + len(vecs), dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float64()))})
    return ray.data.from_arrow(t).repartition(parts)


def _blobs(n, centers, spread, seed):
    rng = np.random.RandomState(seed)
    which = rng.randint(0, len(centers), n)
    return np.asarray(centers)[which] + rng.randn(n, 2) * spread


def test_histogram_matches_driver_assignment(ray_session):
    vecs = _blobs(300, [(5, 0), (0, 5), (-5, -5)], 0.4, 11)
    ds = _emb_ds(vecs)
    cents = deterministic_centroids(ds, 4)
    got = corpus_histogram(ds, cents)
    exp = np.bincount(
        (_normalize(vecs.astype(np.float64)) @ cents.T).argmax(axis=1),
        minlength=len(cents))
    np.testing.assert_array_equal(got, exp)
    assert got.sum() == 300


def test_e2e_deterministic_and_monotone(ray_session):
    base = [(6, 0), (0, 6)]
    a = _emb_ds(_blobs(400, base, 0.3, 21))
    near = _emb_ds(_blobs(400, base, 0.3, 22), id0=1000, parts=5)
    far = _emb_ds(_blobs(400, [(-6, 0), (0, -6)], 0.3, 23), id0=2000)
    r_near = sinkhorn_distance(a, near, n_centroids=8)
    r_far = sinkhorn_distance(a, far, n_centroids=8)
    assert r_near["distance"] < r_far["distance"]
    # bit-deterministic under repartitioning (shared codebook)
    again = sinkhorn_distance(
        a.repartition(7), near.repartition(2), n_centroids=8,
        centroids=r_near["centroids"])
    assert again["distance"] == r_near["distance"]
    np.testing.assert_array_equal(again["hist_a"], r_near["hist_a"])


def test_validation(ray_session):
    a = _emb_ds(_blobs(20, [(1, 0)], 0.1, 31))
    with pytest.raises(ValueError, match="metric"):
        sinkhorn_distance(a, a, metric="nope")
    with pytest.raises(ValueError, match="reg"):
        sinkhorn_distance(a, a, reg=0.0)

"""JL random projection — matrix replay, exact-arithmetic
bit-determinism, and the distance-preservation property."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from osm_cut_ray.stages.project import (achlioptas_matrix,
                                        project_embeddings)


def _ds(vecs, parts=3):
    t = pa.table({
        "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float64()))})
    return ray.data.from_arrow(t).repartition(parts)


def _collect(res):
    df = res.to_pandas().sort_values("vec_id")
    return np.stack(df["embedding"].to_numpy())


def test_matrix_distribution_and_determinism():
    r = achlioptas_matrix(512, 64, seed=7)
    assert set(np.unique(r)) <= {-1, 0, 1}
    frac = (r != 0).mean()
    assert 0.28 < frac < 0.39  # 1/3 expected
    np.testing.assert_array_equal(r, achlioptas_matrix(512, 64, 7))
    assert (r != achlioptas_matrix(512, 64, 8)).any()


def test_projection_matches_replay(ray_session):
    rng = np.random.RandomState(1)
    vecs = rng.randn(50, 32)
    got = _collect(project_embeddings(_ds(vecs), 8, seed=3))
    r = achlioptas_matrix(32, 8, 3)
    q = 1 << 20
    exp = (np.rint(vecs * q).astype(np.int64) @ r).astype(np.float64) \
        * (np.sqrt(3.0 / 8) / q)
    np.testing.assert_array_equal(got, exp)


def test_partition_invariant_bitwise(ray_session):
    rng = np.random.RandomState(2)
    vecs = rng.randn(120, 16)
    a = _collect(project_embeddings(_ds(vecs, 1), 6))
    b = _collect(project_embeddings(_ds(vecs, 9), 6))
    np.testing.assert_array_equal(a, b)


def test_distance_preservation(ray_session):
    rng = np.random.RandomState(5)
    vecs = rng.randn(60, 256)
    proj = _collect(project_embeddings(_ds(vecs), 64, seed=1))
    d_in, d_out = [], []
    for i in range(0, 60, 3):
        for j in range(i + 1, 60, 7):
            d_in.append(np.linalg.norm(vecs[i] - vecs[j]))
            d_out.append(np.linalg.norm(proj[i] - proj[j]))
    ratio = np.array(d_out) / np.array(d_in)
    # JL at k=64: distortions concentrate near 1
    assert 0.7 < ratio.min() and ratio.max() < 1.3
    assert abs(ratio.mean() - 1.0) < 0.1


def test_other_columns_survive_and_guards(ray_session):
    vecs = np.eye(4)
    out = project_embeddings(_ds(vecs), 2).to_pandas()
    assert set(out.columns) == {"vec_id", "embedding"}
    assert all(len(e) == 2 for e in out["embedding"])
    with pytest.raises(ValueError, match="out_dim"):
        project_embeddings(_ds(vecs), 0)
    big = _ds(np.full((3, 8), 1e18))
    with pytest.raises(Exception, match="overflow"):
        project_embeddings(big, 2).materialize()

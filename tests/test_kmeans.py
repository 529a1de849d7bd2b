import numpy as np
import pyarrow as pa
import pytest


def _blobs(seed=5, n_per=120, d=8, k=3, spread=0.4, sep=10.0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, sep, (k, d))
    mats, labels = [], []
    for c in range(k):
        mats.append(centers[c] + rng.normal(0, spread, (n_per, d)))
        labels.extend([c] * n_per)
    mat = np.concatenate(mats)
    ids = np.arange(len(mat), dtype=np.int64) * 7 + 3
    return ids, mat, np.array(labels)


def _ds(ids, mat, parts):
    import ray.data as rd
    t = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([row.tolist() for row in mat],
                              pa.list_(pa.float64()))})
    return rd.from_arrow(t).repartition(parts)


def _collect(ds):
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.to_pandas()


def test_kmeans_matches_brute_and_partition_invariant(ray_session):
    from osm_cut_ray.stages.kmeans import (kmeans_assign, kmeans_fit,
                                           kmeans_fit_brute)

    ids, mat, labels = _blobs()
    exp = kmeans_fit_brute(ids, mat, k=3, n_iter=6, seed=2)

    for parts in (3, 17):
        got = kmeans_fit(_ds(ids, mat, parts), k=3, n_iter=6, seed=2)
        assert np.array_equal(got["centroids"], exp["centroids"])
        assert np.array_equal(got["counts"], exp["counts"])
        assert got["inertia"] == exp["inertia"]
        assert got["n"] == len(ids)

    # assignments recover the planted partition exactly
    a = _collect(kmeans_assign(_ds(ids, mat, 5), exp["centroids"])) \
        .set_index("id").loc[ids, "cluster"].to_numpy()
    for c in np.unique(labels):
        assert len(np.unique(a[labels == c])) == 1
    assert len(np.unique(a)) == 3
    # Lloyd improves (quantized, so allow exact-equality plateaus)
    assert exp["inertia"][-1] <= exp["inertia"][0]


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    from osm_cut_ray.stages.kmeans import kmeans_fit, kmeans_fit_brute

    # two EXACT piles, k=3: two seeds coincide, ties go to the lower
    # cluster index, so one centroid must go empty and stay put
    ids = np.arange(40, dtype=np.int64)
    mat = np.concatenate([
        np.full((20, 4), 0.0), np.full((20, 4), 9.0)])
    exp = kmeans_fit_brute(ids, mat, k=3, n_iter=5, seed=0)
    got = kmeans_fit(_ds(ids, mat, 4), k=3, n_iter=5, seed=0)
    assert np.array_equal(got["centroids"], exp["centroids"])
    assert (got["counts"] == 0).sum() >= 1
    assert np.array_equal(got["counts"], exp["counts"])


def test_kmeans_guards(ray_session):
    from osm_cut_ray.stages.kmeans import kmeans_fit

    ids = np.arange(3, dtype=np.int64)
    mat = np.eye(3, 4)
    with pytest.raises(ValueError, match="need >= k"):
        kmeans_fit(_ds(ids, mat, 2), k=5, n_iter=2)
    big = mat * 1e9
    with pytest.raises(ValueError, match="scale_bits"):
        kmeans_fit(_ds(ids, big, 2), k=2, n_iter=1, scale_bits=40)


def test_kmeans_on_testdata_embeddings(ray_session):
    import ray.data as rd

    from osm_cut_ray.sources.tables import read_table
    from osm_cut_ray.stages.kmeans import kmeans_assign, kmeans_fit

    emb = read_table("/root/testdata/sf0.001/embeddings.parquet",
                     columns=["vec_id", "embedding"])
    fit = kmeans_fit(emb, k=4, n_iter=4, seed=2)
    assert fit["counts"].sum() == emb.count()
    a = _collect(kmeans_assign(emb, fit["centroids"]))
    assert len(a) == emb.count()
    assert set(a["cluster"]).issubset(set(range(4)))

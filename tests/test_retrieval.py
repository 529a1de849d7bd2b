import numpy as np
import pyarrow as pa


def _corpus(n=300):
    import ray.data as rd

    from osm_cut_ray.sources.images import images_batch_from_keys

    def synth(t):
        return images_batch_from_keys(
            t["id"].to_numpy(zero_copy_only=False), with_bytes=True)

    return rd.range(n).map_batches(synth, batch_format="pyarrow") \
        .repartition(4)


def test_retrieval_recall_matches_brute(ray_session):
    from osm_cut_ray.stages.image_embed import image_embeddings
    from osm_cut_ray.stages.retrieval import retrieval_recall

    ds = _corpus(200)
    emb = image_embeddings(ds).materialize()
    rows = emb.to_pandas()
    ids = rows["vec_id"].to_numpy(np.int64)
    mat = np.stack(rows["embedding"].to_numpy()).astype(np.float64)

    rng = np.random.default_rng(71)
    qi = rng.choice(len(ids), 25, replace=False)
    queries = mat[qi] + rng.normal(0, 0.01, (25, mat.shape[1]))
    expected = ids[qi]
    ks = (1, 3, 10)
    got = retrieval_recall(emb, queries, expected, ks=ks)

    # brute: exact cosine ranks with knn_brute's rounding + tie rule
    def brute_recall(k):
        hits = 0
        qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        for i in range(len(qi)):
            sims = np.round(mn @ qn[i], 6)
            order = np.lexsort((ids, -sims))[:k]
            if expected[i] in ids[order]:
                hits += 1
        return hits / len(qi)

    for k in ks:
        assert abs(got[f"recall@{k}"] - brute_recall(k)) < 1e-12
    assert got["n_queries"] == 25
    assert got["recall@1"] > 0.9  # tiny perturbation retrieves itself


def test_image_query_recall_high_and_deterministic(ray_session):
    from osm_cut_ray.stages.retrieval import image_query_recall

    ds = _corpus(300).materialize()
    got = image_query_recall(ds, n_queries=32, noise=2, seed=3)
    assert got["n_queries"] == 32
    # +/-2 uint8 jitter barely moves an 8x8 mean-centered thumbnail,
    # but the synthetic corpus holds true embedding near-dups (keys
    # differing by an intensity shift), so @1 is high, @10 perfect
    assert got["recall@1"] >= 0.8
    assert got["recall@10"] == 1.0
    assert got["recall@10"] >= got["recall@5"] >= got["recall@1"]
    again = image_query_recall(ds, n_queries=32, noise=2, seed=3)
    assert again == got  # fully deterministic

    empty = _corpus(0)
    z = image_query_recall(empty, n_queries=8)
    assert z["n_queries"] == 0 and z["recall@1"] == 0.0

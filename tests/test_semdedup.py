"""SemDeDup pinned against a driver brute force that shares ONLY the
trained centroids (assignment, ordering and the strict-upper-triangle
dup rule are all re-derived independently in numpy)."""

import numpy as np
import pytest

from osm_cut_ray.stages.knn import _normalize, deterministic_centroids
from osm_cut_ray.stages.semdedup import semdedup, semdedup_flags


def _mk_corpus(n=120, d=16, n_groups=10, seed=3):
    """Clustered corpus with planted near-duplicate pairs: each group
    is a direction; some members are tiny perturbations of another."""
    rng = np.random.default_rng(seed)
    dirs = _normalize(rng.normal(size=(n_groups, d)))
    ids = np.arange(n, dtype=np.int64)
    vecs = np.empty((n, d))
    for i in range(n):
        g = i % n_groups
        if i % 4 == 0 and i >= n_groups:
            vecs[i] = vecs[i - n_groups] + rng.normal(scale=1e-3, size=d)
        else:
            vecs[i] = dirs[g] + rng.normal(scale=0.25, size=d)
    return ids, _normalize(vecs)


def _emb_ds(ids, vecs, parts=4):
    import ray
    return ray.data.from_items(
        [{"vec_id": int(i), "embedding": list(map(float, v))}
         for i, v in zip(ids, vecs)]).repartition(parts)


def _brute(ids, vecs, cents, eps, keep="low"):
    """Independent numpy re-derivation of the full pipeline."""
    sims = vecs @ cents.T
    cl = sims.argmax(axis=1)
    cs = np.round(sims[np.arange(len(ids)), cl], 6)
    is_dup = np.zeros(len(ids), bool)
    dup_of = np.full(len(ids), -1, np.int64)
    for c in np.unique(cl):
        m = np.flatnonzero(cl == c)
        sign = 1.0 if keep == "low" else -1.0
        order = m[np.lexsort((ids[m], sign * cs[m]))]
        for pos, i in enumerate(order):
            best, best_s = -1, -np.inf
            for j in order[:pos]:
                sij = float(vecs[i] @ vecs[j])
                if sij > best_s:
                    best, best_s = j, sij
            if best_s > eps:
                is_dup[i] = True
                dup_of[i] = ids[best]
    return cl.astype(np.int64), cs, is_dup, dup_of


@pytest.mark.parametrize("keep", ["low", "high"])
def test_flags_match_brute(ray_session, keep):
    ids, vecs = _mk_corpus()
    ds = _emb_ds(ids, vecs)
    cents = deterministic_centroids(ds, 8)
    got = semdedup_flags(ds, eps=0.97, n_clusters=8, keep=keep,
                         centroids=cents).to_pandas()\
        .sort_values("vec_id").reset_index(drop=True)
    cl, cs, is_dup, dup_of = _brute(ids, vecs, cents, 0.97, keep)
    assert (got.vec_id.to_numpy() == ids).all()
    assert (got.cluster.to_numpy() == cl).all()
    assert np.allclose(got.cent_sim.to_numpy(), cs, atol=1e-9)
    assert (got.is_dup.to_numpy() == is_dup).all()
    assert (got.dup_of.to_numpy() == dup_of).all()
    assert is_dup.sum() > 0  # the plants are exercised


def test_partitioning_invariance_and_keep_rule(ray_session):
    ids, vecs = _mk_corpus(seed=11)
    cents = deterministic_centroids(_emb_ds(ids, vecs, 4), 8)
    a = semdedup_flags(_emb_ds(ids, vecs, 2), eps=0.97,
                       centroids=cents).to_pandas()\
        .sort_values("vec_id").reset_index(drop=True)
    b = semdedup_flags(_emb_ds(ids, vecs, 9), eps=0.97,
                       centroids=cents).to_pandas()\
        .sort_values("vec_id").reset_index(drop=True)
    assert a.equals(b)
    # keep="low": within every dup pair the survivor has the LOWER
    # (cent_sim, id) ordering key than the flagged point
    key = dict(zip(a.vec_id, zip(a.cent_sim, a.vec_id)))
    for r in a[a.is_dup].itertuples():
        assert key[r.dup_of] < key[r.vec_id]


def test_semdedup_filter_and_identity_dups(ray_session):
    # exact duplicate vectors: one survivor per identical group
    base = _normalize(np.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]]))
    ids = np.arange(9, dtype=np.int64)
    vecs = np.vstack([base, base, base])
    ds = _emb_ds(ids, vecs, 3)
    kept, flags = semdedup(ds, eps=0.999, n_clusters=3)
    kdf = kept.to_pandas().sort_values("vec_id")
    fdf = flags.to_pandas()
    assert len(kdf) == 3  # one per direction
    assert set(kdf.vec_id) == set(fdf[~fdf.is_dup].vec_id)
    # input schema preserved through the anti-join
    assert list(kdf.columns) == ["vec_id", "embedding"]


def test_cluster_cap_raises(ray_session):
    ids, vecs = _mk_corpus(n=40)
    ds = _emb_ds(ids, vecs)
    with pytest.raises(ValueError, match="max_cluster_size"):
        semdedup_flags(ds, n_clusters=1, max_cluster_size=5)\
            .materialize()


def test_eps_one_flags_nothing(ray_session):
    ids, vecs = _mk_corpus(n=60)
    ds = _emb_ds(ids, vecs)
    flags = semdedup_flags(ds, eps=1.01, n_clusters=4).to_pandas()
    assert not flags.is_dup.any()
    assert (flags.dup_of == -1).all()


def test_bucketed_anti_join_complements_semi(ray_session):
    import ray
    from osm_cut_ray.stages.join import bucketed_semi_join
    payload = ray.data.from_items(
        [{"k": i, "v": [float(i)] * 2} for i in range(20)]).repartition(3)
    keys = ray.data.from_items([{"id": i} for i in (2, 5, 7, 99)])
    semi = bucketed_semi_join(payload, "k", keys, "id").to_pandas()
    anti = bucketed_semi_join(payload, "k", keys, "id",
                              mode="anti").to_pandas()
    assert sorted(semi.k) == [2, 5, 7]
    assert sorted(anti.k) == sorted(set(range(20)) - {2, 5, 7})
    assert len(anti.v.iloc[0]) == 2  # list payloads survive
    with pytest.raises(ValueError, match="semi|anti"):
        bucketed_semi_join(payload, "k", keys, "id", mode="left")

"""kNN join (two-table embedding top-k) — brute-pinned.

The broadcast engine must match an independent numpy replay of the
documented rule BIT-for-bit (round(sim,6) desc, b_id asc, top-k per
anchor); chunked scoring and every partitioning must not change a
byte. The IVF engine is approximate by design: recall >= 0.9 pinned
on clustered data, exact on a single-cell corpus.
"""

import numpy as np
import pandas as pd
import pytest

import ray

from osm_cut_ray.stages.knn_join import (
    hard_negatives, knn_join, knn_join_broadcast, knn_join_ivf)


def _mk(n, d, seed, n_labels=4):
    rng = np.random.RandomState(seed)
    return (np.arange(n, dtype=np.int64) + 1,
            rng.randn(n, d),
            rng.randint(0, n_labels, n).astype(np.int64))


def _ds(ids, vecs, labels, parts=3):
    import pyarrow as pa
    t = pa.table({"vec_id": ids, "embedding": [v for v in vecs],
                  "label": labels})
    return ray.data.from_arrow(t).repartition(parts)


def _brute(a, b, k, *, exclude_same_id=True, cross_label=False):
    """Independent replay: per anchor, (round(cos,6) desc, b_id asc)
    top-k."""
    a_ids, a_vecs, a_lab = a
    b_ids, b_vecs, b_lab = b

    def norm(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1
        return m / n

    an, bn = norm(a_vecs.astype(np.float64)), norm(b_vecs.astype(np.float64))
    rows = []
    for i, aid in enumerate(a_ids):
        sims = np.round(bn @ an[i], 6)
        mask = np.ones(len(b_ids), bool)
        if exclude_same_id:
            mask &= b_ids != aid
        if cross_label:
            mask &= b_lab != a_lab[i]
        cid, cs = b_ids[mask], sims[mask]
        order = np.lexsort((cid, -cs))[:k]
        for j in order:
            rows.append((int(aid), int(cid[j]), float(cs[j])))
    return sorted(rows)


def _got(res_ds):
    df = res_ds.to_pandas()
    return sorted((int(r.a_id), int(r.b_id), float(r.sim))
                  for r in df.itertuples())


def test_broadcast_matches_brute(ray_session):
    a, b = _mk(40, 8, 1), _mk(70, 8, 2)
    got = _got(knn_join_broadcast(_ds(*a), _ds(*b), k=5))
    assert got == _brute(a, b, 5)


def test_broadcast_chunked_and_partition_invariant(ray_session):
    a, b = _mk(30, 6, 3), _mk(90, 6, 4)
    base = _got(knn_join_broadcast(_ds(*a, parts=1), _ds(*b, parts=1),
                                   k=4))
    # forced tiny column chunks exercise the running-merge path
    chunked = _got(knn_join_broadcast(_ds(*a, parts=5), _ds(*b, parts=7),
                                      k=4, chunk_cols=13))
    assert chunked == base == _brute(a, b, 4)


def test_cross_label_hard_negatives(ray_session):
    e = _mk(60, 8, 5, n_labels=3)
    got = _got(hard_negatives(_ds(*e), k=3, engine="broadcast"))
    assert got == _brute(e, e, 3, cross_label=True)
    # no same-label or self pair survives
    lab = dict(zip(e[0].tolist(), e[2].tolist()))
    for aid, bid, _ in got:
        assert aid != bid and lab[aid] != lab[bid]


def test_self_join_excludes_self(ray_session):
    e = _mk(25, 5, 6)
    got = _got(knn_join(_ds(*e), _ds(*e), k=3, engine="broadcast"))
    assert got == _brute(e, e, 3)
    assert all(aid != bid for aid, bid, _ in got)


def _blobs(n, d, n_blobs, seed):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_blobs, d) * 8
    which = rng.randint(0, n_blobs, n)
    vecs = centers[which] + rng.randn(n, d) * 0.3
    return (np.arange(n, dtype=np.int64) + 1, vecs,
            which.astype(np.int64))


def test_ivf_recall_on_clustered_data(ray_session):
    a, b = _blobs(80, 8, 4, 7), _blobs(300, 8, 4, 8)
    exact = set(map(tuple, np.array(
        [(r[0], r[1]) for r in _brute(a, b, 5)], np.int64)))
    got = _got(knn_join_ivf(_ds(*a), _ds(*b), k=5, n_centroids=8,
                            nprobe=3))
    hits = sum((aid, bid) in exact for aid, bid, _ in got)
    assert hits / len(exact) >= 0.9
    # per-anchor at most k rows, anchors all covered
    cnt = pd.Series([aid for aid, _, _ in got]).value_counts()
    assert cnt.max() <= 5 and len(cnt) == 80


def test_ivf_single_cell_is_exact(ray_session):
    a, b = _mk(20, 6, 9), _mk(50, 6, 10)
    got = _got(knn_join_ivf(_ds(*a), _ds(*b), k=4, n_centroids=1,
                            nprobe=1))
    assert got == _brute(a, b, 4)


def test_auto_engine_and_cap(ray_session):
    a, b = _mk(10, 4, 11), _mk(30, 4, 12)
    got = _got(knn_join(_ds(*a), _ds(*b), k=2))  # auto -> broadcast
    assert got == _brute(a, b, 2)
    with pytest.raises(RuntimeError, match="max_broadcast_rows"):
        knn_join(_ds(*a), _ds(*b), k=2, engine="broadcast",
                 max_broadcast_rows=5).materialize()
    with pytest.raises(ValueError):
        knn_join(_ds(*a), _ds(*b), engine="nope")
    with pytest.raises(ValueError, match="label_col"):
        knn_join_broadcast(_ds(*a), _ds(*b), mode="cross_label")


def test_embeddings_table_e2e(ray_session):
    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet").limit(200)
    res = hard_negatives(ds, k=3, engine="broadcast").to_pandas()
    assert len(res) > 0 and (res["a_id"] != res["b_id"]).all()
    assert set(res.columns) == {"a_id", "b_id", "sim"}

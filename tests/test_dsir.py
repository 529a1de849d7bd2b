"""DSIR pinned against a pure-Python reference: blake2b token hashes,
Counter feature counts, add-alpha log-ratio weights, and the
splitmix64 Gumbel keys re-derived independently."""

import hashlib
import math
from collections import Counter

import numpy as np
import pytest

from osm_cut_ray.stages.dsir import (HashedNgramModel, dsir_select,
                                     dsir_weights, fit_hashed_ngrams)

M0, M1 = 0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F
MASK = (1 << 64) - 1


def _tok_hashes(text):
    return [int.from_bytes(
        hashlib.blake2b(w.encode(), digest_size=8).digest(), "little")
        for w in text.lower().split()]


def _brute_counts(texts, dim):
    """Unigram + bigram hashed feature counts, shared slot space."""
    c = Counter()
    for t in texts:
        hs = _tok_hashes(t)
        for h in hs:
            c[h % dim] += 1
        for a, b in zip(hs, hs[1:]):
            c[((a * M0) ^ (b * M1)) % (1 << 64) % dim] += 1
    return c


def _brute_weight(text, delta, dim):
    hs = _tok_hashes(text)
    w = 0.0
    for h in hs:
        w += delta[h % dim]
    for a, b in zip(hs, hs[1:]):
        w += delta[((a * M0) ^ (b * M1)) % (1 << 64) % dim]
    return w


def _brute_gumbel(i, seed):
    """Independent splitmix64 re-derivation in pure ints."""
    z = (i + seed * 0x9E3779B97F4A7C15) & MASK
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK
    z = z ^ (z >> 31)
    u = ((z >> 11) + 0.5) / float(1 << 53)
    return -math.log(-math.log(u))


TGT_WORDS = ["theorem", "proof", "lemma", "integral", "matrix", "prime"]
JUNK_WORDS = ["click", "buy", "free", "winner", "offer", "casino"]


def _mk_docs(n, words, seed, start_id=0):
    rng = np.random.default_rng(seed)
    return [{"doc_id": int(start_id + i),
             "text": " ".join(words[int(j)] for j in
                              rng.integers(0, len(words),
                                           int(rng.integers(3, 12))))}
            for i in range(n)]


def _ds(docs, parts=4):
    import ray
    return ray.data.from_items(docs).repartition(parts)


def test_fit_counts_match_brute(ray_session):
    dim = 512
    docs = _mk_docs(40, TGT_WORDS + JUNK_WORDS, seed=1)
    m = fit_hashed_ngrams(_ds(docs), dim=dim)
    want = _brute_counts([d["text"] for d in docs], dim)
    assert m.total == sum(want.values())
    for s in range(dim):
        assert m.counts[s] == want.get(s, 0), s
    # bit-deterministic under repartitioning
    m2 = fit_hashed_ngrams(_ds(docs, 9), dim=dim)
    assert (m.counts == m2.counts).all() and m.total == m2.total


def test_weights_match_brute(ray_session):
    dim, alpha = 512, 1e-3
    tgt_docs = _mk_docs(30, TGT_WORDS, seed=2)
    raw_docs = (_mk_docs(25, TGT_WORDS, seed=3)
                + _mk_docs(25, JUNK_WORDS, seed=4, start_id=25)
                + [{"doc_id": 50, "text": ""}])  # zero-feature doc
    tgt = fit_hashed_ngrams(_ds(tgt_docs), dim=dim)
    raw = fit_hashed_ngrams(_ds(raw_docs), dim=dim)
    got = dsir_weights(_ds(raw_docs), tgt, raw, alpha=alpha)\
        .to_pandas().sort_values("doc_id").reset_index(drop=True)

    def theta(m):
        return {s: math.log((m.counts[s] + alpha)
                            / (m.total + alpha * dim))
                for s in range(dim)}
    lt, lr = theta(tgt), theta(raw)
    delta = {s: lt[s] - lr[s] for s in range(dim)}
    for d in raw_docs:
        w = _brute_weight(d["text"], delta, dim)
        assert got.loc[d["doc_id"], "dsir_logw"] == pytest.approx(
            w, abs=1e-9), d["doc_id"]
    assert got.loc[50, "dsir_logw"] == 0.0


def test_select_matches_brute_and_enriches(ray_session):
    dim, alpha, k, seed = 512, 1e-3, 20, 7
    tgt_docs = _mk_docs(30, TGT_WORDS, seed=5)
    raw_docs = (_mk_docs(40, TGT_WORDS, seed=6)
                + _mk_docs(40, JUNK_WORDS, seed=7, start_id=40))
    tgt = fit_hashed_ngrams(_ds(tgt_docs), dim=dim)
    raw = fit_hashed_ngrams(_ds(raw_docs), dim=dim)
    kept, winners = dsir_select(_ds(raw_docs, 5), tgt, raw,
                                k=k, seed=seed, alpha=alpha)
    kdf = kept.to_pandas().sort_values("doc_id")
    wdf = winners.to_pandas()

    # brute: weight + gumbel, global top-k
    wmap = dict(zip(
        dsir_weights(_ds(raw_docs), tgt, raw, alpha=alpha)
        .to_pandas().doc_id,
        dsir_weights(_ds(raw_docs), tgt, raw, alpha=alpha)
        .to_pandas().dsir_logw))
    keys = sorted(((wmap[d["doc_id"]]
                    + _brute_gumbel(d["doc_id"], seed), -d["doc_id"])
                   for d in raw_docs), reverse=True)
    want_ids = sorted(-i for _, i in keys[:k])
    assert sorted(kdf.doc_id) == want_ids
    assert sorted(wdf.doc_id) == want_ids
    np.testing.assert_allclose(
        np.sort(wdf.dsir_key.to_numpy()),
        np.sort([kk for kk, _ in keys[:k]]), atol=1e-9)
    # payload schema preserved
    assert list(kdf.columns) == ["doc_id", "text"]
    # enrichment: most winners come from the target-like half
    assert sum(1 for i in want_ids if i < 40) > k * 0.7

    # partitioning invariance
    kept2, _ = dsir_select(_ds(raw_docs, 11), tgt, raw,
                           k=k, seed=seed, alpha=alpha)
    assert sorted(kept2.to_pandas().doc_id) == want_ids


def test_select_edge_cases(ray_session):
    dim = 128
    docs = _mk_docs(10, TGT_WORDS, seed=8)
    m = fit_hashed_ngrams(_ds(docs), dim=dim)
    # k >= n keeps everything
    kept, _ = dsir_select(_ds(docs, 3), m, m, k=100)
    assert sorted(kept.to_pandas().doc_id) == list(range(10))
    with pytest.raises(ValueError, match="positive"):
        dsir_select(_ds(docs), m, m, k=0)
    with pytest.raises(ValueError, match="dims differ"):
        dsir_select(_ds(docs), m,
                    HashedNgramModel(64, np.zeros(64, np.int64), 0),
                    k=1)

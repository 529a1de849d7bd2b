"""BM25 ranked retrieval pinned against a pure-Python brute force
(Counter-based tf/df, the same Lucene idf formula re-derived
independently), plus partitioning invariance and cap behavior."""

import math
from collections import Counter

import numpy as np
import pytest

from osm_cut_ray.stages.bm25 import bm25_topk


WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
         "golf", "hotel", "india", "juliet", "kilo", "lima"]


def _mk_corpus(n=200, seed=7):
    rng = np.random.default_rng(seed)
    docs = []
    for i in range(n):
        ln = int(rng.integers(3, 25))
        toks = [WORDS[int(j)] for j in rng.integers(0, len(WORDS), ln)]
        docs.append({"doc_id": int(i), "text": " ".join(toks)})
    return docs


def _docs_ds(docs, parts=5):
    import ray
    return ray.data.from_items(docs).repartition(parts)


def _brute(docs, queries, k=10, k1=1.2, b=0.75):
    """Independent per-doc Counter BM25."""
    tfs = [Counter(d["text"].split()) for d in docs]
    lens = [sum(c.values()) for c in tfs]
    n = len(docs)
    avgdl = sum(lens) / n
    out = {}
    for qid, q in queries.items():
        terms = sorted(set(q.split()))
        scored = []
        for d, tf, dl in zip(docs, tfs, lens):
            s = 0.0
            for t in terms:
                f = tf.get(t, 0)
                if not f:
                    continue
                df = sum(1 for c in tfs if t in c)
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                s += idf * f * (k1 + 1) / (f + k1 * (1 - b + b * dl / avgdl))
            s = round(s, 6)
            if s > 0.0:
                scored.append((-s, d["doc_id"]))
        scored.sort()
        out[qid] = [(did, -ns) for ns, did in scored[:k]]
    return out


def test_bm25_matches_brute(ray_session):
    docs = _mk_corpus()
    queries = {1: "alpha bravo", 2: "kilo", 3: "echo echo delta",
               4: "zulu"}  # q4: term absent from every doc
    got = bm25_topk(_docs_ds(docs), queries, k=10).to_pandas()
    want = _brute(docs, queries, k=10)
    assert list(got.columns) == ["query_id", "doc_id", "score"]
    for qid in queries:
        g = got[got.query_id == qid]
        w = want[qid]
        assert list(zip(g.doc_id, np.round(g.score, 6))) == [
            (d, round(s, 6)) for d, s in w], f"query {qid}"
    assert len(got[got.query_id == 4]) == 0  # no hits -> no rows


def test_bm25_partitioning_invariance(ray_session):
    docs = _mk_corpus(n=150, seed=13)
    queries = {0: "golf hotel", 1: "alpha lima india"}
    a = bm25_topk(_docs_ds(docs, 2), queries, k=7).to_pandas()
    b = bm25_topk(_docs_ds(docs, 11), queries, k=7).to_pandas()
    assert a.equals(b)


def test_bm25_lowercase_and_k1_b_params(ray_session):
    docs = [{"doc_id": 0, "text": "Alpha ALPHA bravo"},
            {"doc_id": 1, "text": "alpha charlie"},
            {"doc_id": 2, "text": "bravo bravo"}]
    # without lowercase, "Alpha"/"ALPHA" don't match the query term
    raw = bm25_topk(_docs_ds(docs, 2), {0: "alpha"}, k=3).to_pandas()
    assert list(raw.doc_id) == [1]
    low = bm25_topk(_docs_ds(docs, 2), {0: "alpha"}, k=3,
                    lowercase=True).to_pandas()
    assert set(low.doc_id) == {0, 1}
    # doc 0 has tf=2 -> higher score under lowercase
    assert low.iloc[0].doc_id == 0
    # b=0 removes length normalization; brute agrees
    got = bm25_topk(_docs_ds(docs, 2), {0: "bravo"}, k=3,
                    k1=2.0, b=0.0).to_pandas()
    want = _brute(docs, {0: "bravo"}, k=3, k1=2.0, b=0.0)
    assert list(zip(got.doc_id, np.round(got.score, 6))) == [
        (d, round(s, 6)) for d, s in want[0]]


def test_bm25_query_term_cap_raises(ray_session):
    docs = _mk_corpus(n=10)
    with pytest.raises(ValueError, match="max_query_terms"):
        bm25_topk(_docs_ds(docs, 2), {0: "a b c d e"},
                  max_query_terms=3)


# --------------------------------------------- inverted-index path

def test_indexed_matches_broadcast(ray_session):
    from osm_cut_ray.stages.bm25 import bm25_topk_indexed
    docs = _mk_corpus(n=180, seed=21)
    queries = {1: "alpha bravo", 2: "kilo lima golf", 3: "echo",
               4: "zulu", 5: "delta hotel india juliet"}
    want = bm25_topk(_docs_ds(docs, 4), queries, k=9).to_pandas()
    got = bm25_topk_indexed(_docs_ds(docs, 4), queries, k=9)\
        .to_pandas()
    assert got.equals(want)
    # partitioning invariance of the indexed path
    got2 = bm25_topk_indexed(_docs_ds(docs, 13), queries, k=9,
                             num_buckets=7).to_pandas()
    assert got2.equals(want)


def test_indexed_params_and_lowercase(ray_session):
    from osm_cut_ray.stages.bm25 import bm25_topk_indexed
    docs = [{"doc_id": 0, "text": "Alpha ALPHA bravo"},
            {"doc_id": 1, "text": "alpha charlie"},
            {"doc_id": 2, "text": "bravo bravo delta"}]
    for kw in ({"lowercase": True}, {"k1": 2.0, "b": 0.0}):
        want = bm25_topk(_docs_ds(docs, 2), {0: "alpha bravo"},
                         k=3, **kw).to_pandas()
        got = bm25_topk_indexed(_docs_ds(docs, 2), {0: "alpha bravo"},
                                k=3, **kw).to_pandas()
        assert got.equals(want), kw


def test_inverted_index_postings(ray_session):
    import hashlib
    from osm_cut_ray.stages.bm25 import build_inverted_index
    docs = [{"doc_id": 7, "text": "a b a a"},
            {"doc_id": 9, "text": "b"},
            {"doc_id": 11, "text": ""}]
    post = build_inverted_index(_docs_ds(docs, 2)).to_pandas()

    def h(w):
        return int.from_bytes(hashlib.blake2b(
            w.encode(), digest_size=8).digest(), "little")
    got = {(int(r.term) & ((1 << 64) - 1), r.doc_id): (r.tf, r.dl)
           for r in post.itertuples()}
    assert got == {(h("a"), 7): (3, 4), (h("b"), 7): (1, 4),
                   (h("b"), 9): (1, 1)}


def test_indexed_empty_cases(ray_session):
    from osm_cut_ray.stages.bm25 import bm25_topk_indexed
    docs = _mk_corpus(n=20, seed=3)
    # no query terms at all
    out = bm25_topk_indexed(_docs_ds(docs, 2), {1: ""})
    assert len(out) == 0
    assert out.column_names == ["query_id", "doc_id", "score"]
    # all-miss query set, both paths
    out2 = bm25_topk_indexed(_docs_ds(docs, 2), {1: "zulu yankee"})
    assert len(out2) == 0
    out3 = bm25_topk(_docs_ds(docs, 2), {1: "zulu yankee"})
    assert len(out3) == 0
    assert out3.column_names == ["query_id", "doc_id", "score"]

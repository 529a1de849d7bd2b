"""RAKE keyword extraction vs an independent reimplementation
(stages/keywords.py)."""

from collections import Counter, defaultdict

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from osm_cut_ray.stages.keywords import (DEFAULT_STOPWORDS,
                                         corpus_keywords, rake_doc,
                                         rake_keywords)


def brute_rake(text, stop=DEFAULT_STOPWORDS, max_len=4):
    import re
    words = [w for w in re.split(r"[^\w]+", text.lower()) if w]
    phrases, cur = [], []
    for w in words + ["the"]:  # sentinel stopword flushes the tail
        if w in stop or w.isdigit():
            if cur:
                if len(cur) <= max_len:
                    phrases.append(tuple(cur))
                cur = []
        else:
            cur.append(w)
    freq, deg = Counter(), Counter()
    for p in phrases:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    out = {}
    for p in phrases:
        key = " ".join(p)
        out.setdefault(key,
                       sum(deg[w] / freq[w] for w in p))
    return sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))


DOC = ("Compatibility of systems of linear constraints over the set "
       "of natural numbers. Criteria of compatibility of a system "
       "of linear Diophantine equations, strict inequations, and "
       "nonstrict inequations are considered.")


def test_rake_doc_matches_brute():
    assert rake_doc(DOC) == brute_rake(DOC)
    # multiword technical phrases outrank lone words
    top = rake_doc(DOC)[0][0]
    assert " " in top
    rng = np.random.default_rng(5)
    vocab = ["alpha", "beta", "gamma", "the", "of", "data", "x9",
             "12", "spatial", "index,", "Fast."]
    for _ in range(30):
        doc = " ".join(rng.choice(vocab, rng.integers(1, 60)))
        assert rake_doc(doc) == brute_rake(doc)


def test_rake_keywords_dataset():
    docs = [DOC, "", "plain boring text", DOC + " extra topic"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(4)), pa.int64()),
        "text": pa.array(docs)})).repartition(3)
    out = rake_keywords(ds, top_k=5).take_all()
    by_doc = defaultdict(list)
    for r in out:
        by_doc[r["doc_id"]].append(r)
    assert 1 not in by_doc        # empty doc emits nothing
    for did in (0, 2, 3):
        got = sorted(by_doc[did], key=lambda r: r["rank"])
        want = brute_rake(docs[did])[:5]
        assert [(r["phrase"], r["score"]) for r in got] == \
            [(p, pytest.approx(s)) for p, s in want]


def test_corpus_keywords_matches_driver():
    rng = np.random.default_rng(9)
    topics = ["spatial index tuning", "vector tile cache",
              "graph routing engine"]
    docs, ids = [], []
    for i in range(200):
        t = topics[i % 3]
        filler = " ".join(rng.choice(
            ["the", "of", "and", "data", "fast", "query"],
            rng.integers(3, 10)))
        docs.append(f"{t} is the {filler}")
        ids.append(i)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(docs)}))
    got = corpus_keywords(ds, top_k=5, per_doc_k=10).to_pylist()
    # driver recompute from per-doc results
    agg = defaultdict(lambda: [0, 0.0])
    for i, d in zip(ids, docs):
        for p, s in brute_rake(d)[:10]:
            agg[p][0] += 1
            agg[p][1] += s
    want = sorted(agg.items(),
                  key=lambda kv: (-kv[1][1], kv[0]))[:5]
    assert [(r["phrase"], r["n_docs"]) for r in got] == \
        [(p, n) for p, (n, _) in want]
    for r, (_, (_, s)) in zip(got, want):
        assert np.isclose(r["total_score"], s)
    assert got[0]["phrase"] in topics
    with pytest.raises(ValueError):
        rake_keywords(ds, top_k=0)

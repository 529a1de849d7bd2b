"""RAKE keyword extraction (Rose et al. 2010) — unsupervised
per-document keyphrases for corpus exploration, topic labeling and
search-index enrichment.

Definition used (pinned by tests/test_keywords.py): candidate phrases
are maximal runs of non-stopword tokens between stopwords /
punctuation / digits-only tokens, length-capped; word scores are
deg(w)/freq(w) where, per occurrence of w in a phrase of length L,
freq(w) += 1 and deg(w) += L (degree INCLUDES self co-occurrence, the
rake-nltk convention); a phrase scores the sum of its words' scores.
Ties rank by (score desc, phrase asc) — deterministic.

Ray-Data shape: `rake_keywords` is PURE MAP-SIDE (each document
scores against its own co-occurrence graph — zero shuffles, the
whole corpus streams). `corpus_keywords` folds per-doc phrases into
corpus-wide totals through one slim (phrase-hash) bucket pass and a
driver top-k on the already-aggregated tail.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from .join import bucketed_group_apply

# compact public English stopword list (SMART-list core)
DEFAULT_STOPWORDS = frozenset("""
a about above after again all also an and any are as at be because
been before being below between both but by could did do does doing
down during each few for from further had has have having he her
here hers him his how i if in into is it its just me more most my
no nor not now of off on once only or other our out over own s same
she should so some such t than that the their them then there these
they this those through to too under until up very was we were what
when where which while who whom why will with you your
""".split())

_PHRASE_SPLIT = re.compile(r"[^\w]+", re.UNICODE)


def _doc_phrases(text: str, stop: frozenset, max_len: int):
    """-> list of tuples of words (lowercased candidate phrases)."""
    words = [w for w in _PHRASE_SPLIT.split(text.lower()) if w]
    phrases, cur = [], []
    for w in words:
        if w in stop or w.isdigit():
            if cur:
                phrases.append(tuple(cur))
                cur = []
        else:
            cur.append(w)
    if cur:
        phrases.append(tuple(cur))
    return [p for p in phrases if len(p) <= max_len]


def rake_doc(text: str, stop: frozenset = DEFAULT_STOPWORDS,
             max_phrase_len: int = 4):
    """-> list of (phrase string, score), all candidate phrases of
    one document, deduplicated, sorted (score desc, phrase asc)."""
    phrases = _doc_phrases(text, stop, max_phrase_len)
    freq: dict = {}
    deg: dict = {}
    for p in phrases:
        for w in p:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(p)
    scored: dict = {}
    for p in phrases:
        s = sum(deg[w] / freq[w] for w in p)
        key = " ".join(p)
        if key not in scored:
            scored[key] = s
    return sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))


def rake_keywords(docs_ds, *, top_k: int = 10,
                  stopwords=None, max_phrase_len: int = 4,
                  id_col: str = "doc_id", text_col: str = "text"):
    """-> Dataset (doc_id, phrase, score, rank): each document's
    top_k RAKE phrases (rank 0-based). Zero shuffles."""
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    stop = frozenset(w.lower() for w in stopwords) \
        if stopwords is not None else DEFAULT_STOPWORDS

    def fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "phrase": pa.array([], pa.string()),
                          "score": pa.array([], pa.float64()),
                          "rank": pa.array([], pa.int32())})
        if len(t) == 0:
            return empty
        ids = t[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        o_id, o_p, o_s, o_r = [], [], [], []
        for i, text in enumerate(t[text_col].to_pylist()):
            if not text:
                continue
            for r, (p, s) in enumerate(
                    rake_doc(text, stop, max_phrase_len)[:top_k]):
                o_id.append(ids[i])
                o_p.append(p)
                o_s.append(s)
                o_r.append(r)
        if not o_id:
            return empty
        return pa.table({
            "doc_id": pa.array(np.asarray(o_id, np.int64)),
            "phrase": pa.array(o_p, pa.string()),
            "score": pa.array(np.asarray(o_s, np.float64)),
            "rank": pa.array(np.asarray(o_r, np.int32))})

    return docs_ds.map_batches(fn, batch_format="pyarrow")


def corpus_keywords(docs_ds, *, top_k: int = 50,
                    per_doc_k: int = 10, stopwords=None,
                    max_phrase_len: int = 4, id_col: str = "doc_id",
                    text_col: str = "text") -> pa.Table:
    """-> pa.Table (phrase, n_docs, total_score), the corpus top_k
    phrases by summed per-doc RAKE score (ties by (score desc,
    phrase asc)). Phrase strings shuffle once, pre-aggregated per
    batch."""
    kw = rake_keywords(docs_ds, top_k=per_doc_k,
                       stopwords=stopwords,
                       max_phrase_len=max_phrase_len,
                       id_col=id_col, text_col=text_col)

    def combine(t: pa.Table) -> pa.Table:
        empty = pa.table({"ph": pa.array([], pa.int64()),
                          "phrase": pa.array([], pa.string()),
                          "n_docs": pa.array([], pa.int64()),
                          "total_score": pa.array([], pa.float64())})
        if len(t) == 0:
            return empty
        df = pd.DataFrame({
            "phrase": t["phrase"].to_pylist(),
            "score": t["score"].to_numpy(zero_copy_only=False)})
        agg = df.groupby("phrase", as_index=False) \
            .agg(n_docs=("score", "size"),
                 total_score=("score", "sum"))
        import hashlib
        ph = np.array([int.from_bytes(
            hashlib.blake2b(p.encode(), digest_size=8).digest(),
            "big", signed=True) for p in agg["phrase"]], np.int64)
        return pa.table({
            "ph": pa.array(ph),
            "phrase": pa.array(agg["phrase"].tolist(), pa.string()),
            "n_docs": pa.array(agg["n_docs"].to_numpy(np.int64)),
            "total_score": pa.array(
                agg["total_score"].to_numpy(np.float64))})

    def fold(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"phrase": pa.array([], pa.string()),
                          "n_docs": pa.array([], pa.int64()),
                          "total_score": pa.array([], pa.float64())})
        if len(g) == 0:
            return empty
        agg = g.groupby("phrase", as_index=False) \
            .agg(n_docs=("n_docs", "sum"),
                 total_score=("total_score", "sum"))
        # local prune: keep each bucket's top_k — safe because the
        # global top_k is a subset of the union of bucket top_ks
        agg = agg.sort_values(["total_score", "phrase"],
                              ascending=[False, True]).head(top_k)
        return pa.table({
            "phrase": pa.array(agg["phrase"].tolist(), pa.string()),
            "n_docs": pa.array(agg["n_docs"].to_numpy(np.int64)),
            "total_score": pa.array(
                agg["total_score"].to_numpy(np.float64))})

    parts = bucketed_group_apply(
        kw.map_batches(combine, batch_format="pyarrow"), "ph", fold)
    rows = [p for p in parts.iter_batches(batch_size=None,
                                          batch_format="pyarrow")
            if p.num_rows]
    if not rows:
        return pa.table({"phrase": pa.array([], pa.string()),
                         "n_docs": pa.array([], pa.int64()),
                         "total_score": pa.array([], pa.float64())})
    df = pa.concat_tables(rows).to_pandas() \
        .sort_values(["total_score", "phrase"],
                     ascending=[False, True]).head(top_k)
    return pa.table({
        "phrase": pa.array(df["phrase"].tolist(), pa.string()),
        "n_docs": pa.array(df["n_docs"].to_numpy(np.int64)),
        "total_score": pa.array(
            df["total_score"].to_numpy(np.float64))})

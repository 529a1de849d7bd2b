"""BM25 ranked retrieval over a document corpus (Robertson/Walker
Okapi BM25 with the Lucene idf variant: idf = ln(1 + (N - df + 0.5) /
(df + 0.5)), score = sum_t idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b
+ b * dl / avgdl))).

Ray-Data shape — the query set is the SMALL side, so nothing about
the corpus is ever indexed or shuffled:

1. **Corpus stats** (one streaming pass): per-batch (n_docs,
   total_len) partials plus per-batch document frequencies FILTERED
   to the query-term set (broadcast once) — slim (term_idx, df) rows
   into one Sum aggregate; the reduced table is bounded by the number
   of distinct query terms.
2. **Scoring pass** (map-side, zero shuffles): idf and the per-query
   term lists are `ray.put` once; each batch tokenizes via the
   factorize trick (one vocabulary probe per UNIQUE batch token),
   accumulates tf for query terms only with one `np.add.at` over
   (doc, term_idx), scores every query vectorized, and emits its own
   top-k candidates.
3. **Merge**: a tiny groupby(query_id) over n_batches * k candidate
   rows keeps the global top-k. Scores round to 6 dp with doc-id
   tie-breaks (the repo determinism rule), so results are
   bit-identical under any partitioning.

At 100 TB this is the honest streaming-scoring plan for a bounded
query set; for query sets past `max_query_terms` build a real
inverted index instead (RAISES with that advice).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ray.data.aggregate import Sum


def _tokenize(texts: list, lowercase: bool) -> tuple[np.ndarray, np.ndarray]:
    """-> (flat object tokens, per-doc lengths)."""
    toks, lens = [], []
    for x in texts:
        s = "" if x is None else str(x)
        if lowercase:
            s = s.lower()
        ws = s.split()
        toks.extend(ws)
        lens.append(len(ws))
    return np.array(toks, dtype=object), np.array(lens, np.int64)


def _query_vocab(queries: dict[int, str], lowercase: bool):
    """-> (sorted unique term array, {qid: term-idx array})."""
    per_q = {}
    vocab = set()
    for qid, text in queries.items():
        s = str(text).lower() if lowercase else str(text)
        ts = sorted(set(s.split()))
        per_q[int(qid)] = ts
        vocab.update(ts)
    terms = np.array(sorted(vocab), dtype=object)
    qterms = {qid: np.searchsorted(terms, np.array(ts, dtype=object))
              for qid, ts in per_q.items()}
    return terms, qterms


def corpus_term_stats(docs_ds, terms: np.ndarray, *,
                      text_col: str = "text", lowercase: bool = False):
    """-> (n_docs, avgdl, df int64 array aligned with `terms`).
    One pass: slim (term_idx, df) + (n, total_len) partials."""
    tref = ray.put(terms)

    def partial(t: pa.Table) -> pa.Table:
        # term_idx -1 carries the (n_docs, total_len) partial
        if len(t) == 0:
            return pa.table({"ti": pa.array([], pa.int64()),
                             "df": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "dl": pa.array([], pa.int64())})
        tv = ray.get(tref)
        flat, lens = _tokenize(t[text_col].to_pylist(), lowercase)
        rows_ti = [np.array([-1], np.int64)]
        rows_df = [np.array([0], np.int64)]
        if len(flat) and len(tv):
            inv, uniq = pd.factorize(flat)
            pos = np.searchsorted(tv, uniq)
            posc = np.clip(pos, 0, len(tv) - 1)
            umask = tv[posc] == uniq        # unique batch token in vocab
            tok_ti = np.where(umask[inv], posc[inv], -1)
            didx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
            hit = tok_ti >= 0
            if hit.any():
                # document frequency: count DISTINCT (doc, term) pairs
                pairs = didx[hit] * np.int64(len(tv)) + tok_ti[hit]
                upairs = np.unique(pairs)
                ti = (upairs % len(tv)).astype(np.int64)
                uti, cnt = np.unique(ti, return_counts=True)
                rows_ti.append(uti)
                rows_df.append(cnt.astype(np.int64))
        ti = np.concatenate(rows_ti)
        df = np.concatenate(rows_df)
        n = np.zeros(len(ti), np.int64)
        dl = np.zeros(len(ti), np.int64)
        n[0] = len(t)
        dl[0] = int(lens.sum())
        return pa.table({"ti": pa.array(ti), "df": pa.array(df),
                         "n": pa.array(n), "dl": pa.array(dl)})

    agg = docs_ds.map_batches(partial, batch_format="pyarrow")\
        .groupby("ti").aggregate(Sum("df", alias_name="df"),
                                 Sum("n", alias_name="n"),
                                 Sum("dl", alias_name="dl"))
    tbl = pa.concat_tables(list(
        agg.iter_batches(batch_size=None, batch_format="pyarrow")))
    ti = tbl["ti"].to_numpy(zero_copy_only=False).astype(np.int64)
    dfv = tbl["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_docs = int(tbl["n"].to_numpy(zero_copy_only=False).sum())
    total_len = int(tbl["dl"].to_numpy(zero_copy_only=False).sum())
    df = np.zeros(len(terms), np.int64)
    m = ti >= 0
    df[ti[m]] = dfv[m]
    avgdl = (total_len / n_docs) if n_docs else 0.0
    return n_docs, avgdl, df


def bm25_topk(docs_ds, queries: dict[int, str], *, k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id",
              lowercase: bool = False,
              max_query_terms: int = 100_000) -> pa.Table:
    """-> pa.Table (query_id, doc_id, score) — global top-k per query,
    score desc with doc-id tie-break, scores rounded to 6 dp."""
    terms, qterms = _query_vocab(queries, lowercase)
    if len(terms) > max_query_terms:
        raise ValueError(
            f"{len(terms)} distinct query terms exceed max_query_terms="
            f"{max_query_terms}; a broadcast-scoring plan stops paying "
            "off there -- build an inverted index instead")
    n_docs, avgdl, df = corpus_term_stats(
        docs_ds, terms, text_col=text_col, lowercase=lowercase)
    idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    sref = ray.put((terms, idf, qterms, float(avgdl)))

    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      "doc_id": pa.array([], pa.int64()),
                      "score": pa.array([], pa.float64())})

    def score_batch(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        tv, idfv, qt, ad = ray.get(sref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, lens = _tokenize(t[text_col].to_pylist(), lowercase)
        nd, nt = len(ids), len(tv)
        tf = np.zeros((nd, nt))
        if len(flat) and nt:
            inv, uniq = pd.factorize(flat)
            pos = np.searchsorted(tv, uniq)
            posc = np.clip(pos, 0, nt - 1)
            umask = tv[posc] == uniq
            tok_ti = np.where(umask[inv], posc[inv], -1)
            didx = np.repeat(np.arange(nd, dtype=np.int64), lens)
            hit = tok_ti >= 0
            np.add.at(tf, (didx[hit], tok_ti[hit]), 1.0)
        norm = k1 * (1.0 - b + b * (lens / ad if ad else 0.0))
        contrib = idfv[None, :] * tf * (k1 + 1.0) \
            / (tf + norm[:, None] + 1e-300)          # (docs, terms)
        contrib[tf == 0.0] = 0.0
        out = []
        for qid, tidx in qt.items():
            s = np.round(contrib[:, tidx].sum(axis=1), 6)
            nz = np.flatnonzero(s > 0.0)
            if len(nz) == 0:
                continue
            top = nz[np.lexsort((ids[nz], -s[nz]))[:k]]
            out.append(pa.table({
                "query_id": pa.array(np.full(len(top), qid, np.int64)),
                "doc_id": pa.array(ids[top]),
                "score": pa.array(s[top])}))
        return pa.concat_tables(out) if out else empty

    partial = docs_ds.map_batches(score_batch, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        s = g["score"].to_numpy()
        order = np.lexsort((g["doc_id"].to_numpy(), -s))[:k]
        return g.iloc[order]

    res = partial.groupby("query_id").map_groups(
        merge, batch_format="pandas")
    tbl = pa.concat_tables(list(
        res.iter_batches(batch_size=None, batch_format="pyarrow")),
        promote_options="default")
    if len(tbl) == 0:
        return empty
    d = tbl.to_pandas().sort_values(
        ["query_id", "score", "doc_id"],
        ascending=[True, False, True], kind="mergesort")
    return pa.Table.from_pandas(d, preserve_index=False)\
        .replace_schema_metadata(None)

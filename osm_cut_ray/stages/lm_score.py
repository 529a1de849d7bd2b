"""Hashed bigram language-model perplexity scoring (the CCNet-style
LM quality filter): train token-bigram counts over an in-domain
corpus, score every document by cross-entropy under that LM, and gate
on the score. Complements the supervised classifier (stages/
classify.py) — this one needs no labels, only a clean reference
corpus.

Ray-Data shape:

- **Fit** — one streaming pass: each `map_batches` task tokenizes its
  batch (shared dedup tokenizer: one blake2b per UNIQUE batch token),
  buckets unigrams and bigrams into a fixed `dim`-slot hash space,
  and emits ONE slim sparse partial-count table (int64 slot, int64
  count). A `groupby("slot").sum()` reduces them exactly — integer
  sums are order-independent, so the fitted model is bit-deterministic
  under any partitioning. The dense count arrays land on the driver:
  cardinality is bounded by 2*dim (16 MB at dim=2^20), never by the
  corpus.
- **Score** — pure map-side: the two count arrays are `ray.put` once
  and read zero-copy per task; per-batch scoring is one vectorized
  add-alpha log-probability kernel over the flat token-hash run
  (doc-boundary bigrams masked), per-doc means via `np.add.at`.
  Zero shuffles; the corpus streams.

Model: p(w2 | w1) = (C(w1 w2) + a) / (C(w1) + a * dim), cross-entropy
in nats per bigram; docs with < 2 tokens score NaN (no evidence).
Hash-bucket collisions smear mass (standard hashed-LM trade); the
brute-force test reference applies the identical bucketing so the
kernel is pinned exactly.

At 100 TB: fit moves only per-batch unique (slot, count) rows; serve
moves nothing but the documents themselves. Both compose into
`curate_documents`-style rewrites without changing partitioning.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray

from .dedup import _SHINGLE_MULS, _token_hashes_batch

_M0, _M1 = _SHINGLE_MULS[0], _SHINGLE_MULS[1]


def _flat_bigrams(th: np.ndarray, offs: np.ndarray):
    """Bigram hashes over the flat token run + validity mask that
    zeroes doc-boundary-crossing windows. Identity matches
    `_combine_shingles(..., 2)` per doc."""
    if len(th) < 2:
        return np.array([], np.uint64), np.array([], bool)
    with np.errstate(over="ignore"):
        bh = (th[:-1] * _M0) ^ (th[1:] * _M1)
    valid = np.ones(len(th) - 1, bool)
    inner = offs[1:-1]
    valid[inner[(inner > 0) & (inner <= len(th) - 1)] - 1] = False
    return bh, valid


@dataclass
class BigramLM:
    dim: int
    alpha: float
    uni: np.ndarray   # int64[dim] unigram counts
    big: np.ndarray   # int64[dim] bigram counts

    def save(self, path: str) -> None:
        """Persist to .npz (fit once on the reference corpus, reuse
        across curation runs)."""
        np.savez_compressed(path, dim=np.int64(self.dim),
                            alpha=np.float64(self.alpha),
                            uni=self.uni, big=self.big)

    @classmethod
    def load(cls, path: str) -> "BigramLM":
        z = np.load(path)
        return cls(dim=int(z["dim"]), alpha=float(z["alpha"]),
                   uni=z["uni"].astype(np.int64),
                   big=z["big"].astype(np.int64))


def fit_bigram_lm(docs_ds, *, dim: int = 1 << 20, alpha: float = 0.1,
                  text_col: str = "text") -> BigramLM:
    """Train hashed bigram counts over a reference corpus (one pass)."""

    def _partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"slot": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64())})
        if len(t) == 0 or text_col not in t.column_names:
            return empty
        texts = [str(x) for x in t[text_col].to_pylist()]
        th, offs = _token_hashes_batch(texts)
        if len(th) == 0:
            return empty
        ub = (th % np.uint64(dim)).astype(np.int64)
        bh, valid = _flat_bigrams(th, offs)
        bb = (bh[valid] % np.uint64(dim)).astype(np.int64) + np.int64(dim)
        slots, cnt = np.unique(np.concatenate([ub, bb]),
                               return_counts=True)
        return pa.table({"slot": slots, "c": cnt.astype(np.int64)})

    agg = docs_ds.map_batches(_partial, batch_format="pyarrow") \
                 .groupby("slot").sum("c")
    uni = np.zeros(dim, np.int64)
    big = np.zeros(dim, np.int64)
    # driver collect bounded by 2*dim rows, never by corpus size
    for b in agg.iter_batches(batch_format="pyarrow"):
        s = b["slot"].to_numpy(zero_copy_only=False)
        c = b["sum(c)"].to_numpy(zero_copy_only=False)
        lo = s < dim
        uni[s[lo]] = c[lo]
        big[s[~lo] - dim] = c[~lo]
    return BigramLM(dim=dim, alpha=alpha, uni=uni, big=big)


def _xent_kernel(texts, uni, big, dim: int, alpha: float):
    """Per-doc (n_bigrams, sum log p) under the hashed bigram LM."""
    n = len(texts)
    th, offs = _token_hashes_batch(texts)
    nb = np.zeros(n, np.int64)
    s = np.zeros(n, np.float64)
    if len(th) >= 2:
        bh, valid = _flat_bigrams(th, offs)
        didx = np.repeat(np.arange(n, dtype=np.int64),
                         np.diff(offs))[:-1][valid]
        bb = (bh[valid] % np.uint64(dim)).astype(np.int64)
        pb = (th[:-1][valid] % np.uint64(dim)).astype(np.int64)
        logp = (np.log(big[bb] + alpha)
                - np.log(uni[pb] + alpha * dim))
        nb = np.bincount(didx, minlength=n)
        np.add.at(s, didx, logp)
    return nb, s


def lm_cross_entropy(docs_ds, lm: BigramLM, *, text_col: str = "text",
                     id_col: str = "doc_id"):
    """Score documents: (id, n_bigrams, lm_xent) — nats/bigram under
    the broadcast LM; NaN when the doc has < 2 tokens."""
    ref = ray.put((lm.uni, lm.big))
    dim, alpha = lm.dim, lm.alpha

    def _score(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "n_bigrams": pa.array([], pa.int64()),
                          "lm_xent": pa.array([], pa.float64())})
        if len(t) == 0 or text_col not in t.column_names:
            return empty
        uni, big = ray.get(ref)  # zero-copy plasma views
        texts = [str(x) for x in t[text_col].to_pylist()]
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        nb, s = _xent_kernel(texts, uni, big, dim, alpha)
        xent = np.where(nb > 0, -s / np.maximum(nb, 1), np.nan)
        return pa.table({id_col: ids,
                         "n_bigrams": nb.astype(np.int64),
                         "lm_xent": xent})

    return docs_ds.map_batches(_score, batch_format="pyarrow")


def lm_filter(docs_ds, lm: BigramLM, *, max_xent: float,
              text_col: str = "text", id_col: str = "doc_id"):
    """Keep documents whose LM cross-entropy is <= max_xent (NaN-score
    docs are kept: no evidence is not evidence of junk). Map-side
    gate; all input columns pass through."""
    ref = ray.put((lm.uni, lm.big))
    dim, alpha = lm.dim, lm.alpha

    def _gate(t: pa.Table) -> pa.Table:
        if len(t) == 0 or text_col not in t.column_names:
            return t
        uni, big = ray.get(ref)
        texts = [str(x) for x in t[text_col].to_pylist()]
        nb, s = _xent_kernel(texts, uni, big, dim, alpha)
        keep = (nb == 0) | (-s / np.maximum(nb, 1) <= max_xent)
        return t.filter(pa.array(keep))

    return docs_ds.map_batches(_gate, batch_format="pyarrow")

"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
pick the k raw-corpus documents whose hashed n-gram features look most
like a target corpus, by importance weight log p_target(z(d)) -
log p_raw(z(d)) under bag-of-ngrams multinomials, sampled without
replacement via the Gumbel-top-k trick.

Feature space: the repo's shared hashed token machinery
(`dedup._token_hashes_batch` — one blake2b per UNIQUE batch token —
and `lm_score._flat_bigrams`); unigram AND bigram hashes bucket into
the SAME `dim`-slot space, as in the paper's hashed n-gram generative
model. theta = (counts + alpha) / (total + alpha * dim).

Ray-Data shape:

- **Fit** (`fit_hashed_ngrams`, once per corpus): per-batch slim
  sparse (slot, count) partials -> exact `groupby("slot").sum()` —
  integer sums commute, so the model is bit-deterministic under any
  partitioning; the driver collect is bounded by `dim` rows, never by
  the corpus.
- **Weights** (`dsir_weights`, pure map-side): the per-slot log-ratio
  vector delta = log theta_tgt - log theta_raw is computed ONCE on
  the driver and `ray.put` once; each batch accumulates per-doc
  w = sum_f c_f(d) * delta[f] with one `np.add.at`. Zero shuffles.
- **Select** (`dsir_select`): Gumbel keys g(doc_id, seed) are a pure
  splitmix64 hash of the id — no RNG state, bit-deterministic under
  any partitioning. Each batch prunes to its LOCAL top-k slim
  (doc_id, key) rows (the global top-k is a subset of the union of
  per-batch top-ks), then one slim sort + limit(k) and a distributed
  `bucketed_semi_join` back to the full-width payload. Document text
  never transits the shuffle.

At 100 TB: two streaming count passes + one map-side scoring pass +
a sort over at most k + (k per input block) 16-byte rows.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray

from .dedup import _token_hashes_batch
from .join import bucketed_semi_join
from .lm_score import _flat_bigrams


@dataclass
class HashedNgramModel:
    """Bag-of-hashed-ngrams multinomial (unigrams + bigrams share the
    slot space)."""
    dim: int
    counts: np.ndarray   # int64[dim]
    total: int

    def log_theta(self, alpha: float) -> np.ndarray:
        return (np.log(self.counts + alpha)
                - np.log(self.total + alpha * self.dim))

    def save(self, path: str) -> None:
        np.savez_compressed(path, dim=np.int64(self.dim),
                            counts=self.counts,
                            total=np.int64(self.total))

    @classmethod
    def load(cls, path: str) -> "HashedNgramModel":
        z = np.load(path)
        return cls(dim=int(z["dim"]),
                   counts=z["counts"].astype(np.int64),
                   total=int(z["total"]))


def _batch_slots(texts: list, dim: int) -> np.ndarray:
    """Flat per-occurrence feature slots (unigrams then bigrams are
    interleaved per doc via the flat run) + the doc index of each."""
    th, offs = _token_hashes_batch(texts)
    uslots = (th % np.uint64(dim)).astype(np.int64)
    udoc = np.repeat(np.arange(len(texts), dtype=np.int64),
                     np.diff(offs))
    bh, valid = _flat_bigrams(th, offs)
    if len(bh):
        bslots = (bh[valid] % np.uint64(dim)).astype(np.int64)
        bdoc = udoc[:-1][valid]
    else:
        bslots = np.array([], np.int64)
        bdoc = np.array([], np.int64)
    return np.concatenate([uslots, bslots]), np.concatenate([udoc, bdoc])


def fit_hashed_ngrams(docs_ds, *, dim: int = 1 << 16,
                      text_col: str = "text") -> HashedNgramModel:
    """One streaming pass -> hashed unigram+bigram count vector."""

    def _partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"slot": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64())})
        if len(t) == 0 or text_col not in t.column_names:
            return empty
        texts = [str(x) for x in t[text_col].to_pylist()]
        slots, _ = _batch_slots(texts, dim)
        if len(slots) == 0:
            return empty
        us, cnt = np.unique(slots, return_counts=True)
        return pa.table({"slot": us, "c": cnt.astype(np.int64)})

    agg = docs_ds.map_batches(_partial, batch_format="pyarrow") \
                 .groupby("slot").sum("c")
    counts = np.zeros(dim, np.int64)
    for b in agg.iter_batches(batch_format="pyarrow"):
        s = b["slot"].to_numpy(zero_copy_only=False)
        c = b["sum(c)"].to_numpy(zero_copy_only=False)
        counts[s] = c
    return HashedNgramModel(dim=dim, counts=counts,
                            total=int(counts.sum()))


def dsir_weights(docs_ds, target: HashedNgramModel,
                 raw: HashedNgramModel, *, alpha: float = 1e-4,
                 text_col: str = "text", id_col: str = "doc_id"):
    """-> Dataset (id_col, dsir_logw): per-doc importance log-weight
    sum_f c_f(d) * (log theta_tgt[f] - log theta_raw[f]). Docs with
    zero features score 0.0."""
    if target.dim != raw.dim:
        raise ValueError(
            f"model dims differ ({target.dim} vs {raw.dim}); fit both "
            "models in the same hashed feature space")
    delta = target.log_theta(alpha) - raw.log_theta(alpha)
    dref = ray.put(delta)
    dim = target.dim

    def _score(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "dsir_logw": pa.array([], pa.float64())})
        if len(t) == 0 or text_col not in t.column_names:
            return empty
        d = ray.get(dref)  # zero-copy plasma view
        texts = [str(x) for x in t[text_col].to_pylist()]
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        slots, didx = _batch_slots(texts, dim)
        w = np.zeros(len(ids), np.float64)
        # all of doc i's features are contiguous in doc-token order,
        # so float accumulation order is batch-independent
        np.add.at(w, didx, d[slots])
        return pa.table({id_col: ids, "dsir_logw": pa.array(w)})

    return docs_ds.map_batches(_score, batch_format="pyarrow")


_SM1 = np.uint64(0xBF58476D1CE4E5B9)
_SM2 = np.uint64(0x94D049BB133111EB)


def gumbel_keys(ids: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic per-id standard Gumbel noise: splitmix64
    finalizer over (id + seed) -> uniform (0,1) -> -log(-log(u))."""
    z = ids.astype(np.uint64) + np.uint64(seed) * np.uint64(
        0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        z = (z ^ (z >> np.uint64(30))) * _SM1
        z = (z ^ (z >> np.uint64(27))) * _SM2
        z = z ^ (z >> np.uint64(31))
    u = ((z >> np.uint64(11)).astype(np.float64) + 0.5) / float(1 << 53)
    return -np.log(-np.log(u))


def dsir_select(docs_ds, target: HashedNgramModel,
                raw: HashedNgramModel, *, k: int, seed: int = 0,
                alpha: float = 1e-4, text_col: str = "text",
                id_col: str = "doc_id"):
    """Gumbel-top-k importance resampling WITHOUT replacement: keep
    the k docs maximizing dsir_logw + Gumbel(doc_id, seed). Returns
    (selected payload Dataset with the input schema, slim winners
    Dataset (id_col, dsir_key, dsir_logw))."""
    if k <= 0:
        raise ValueError(f"k={k} must be positive")
    scores = dsir_weights(docs_ds, target, raw, alpha=alpha,
                          text_col=text_col, id_col=id_col)

    def _key_prune(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "dsir_key": pa.array([], pa.float64()),
                          "dsir_logw": pa.array([], pa.float64())})
        if len(t) == 0:
            return empty
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t["dsir_logw"].to_numpy(zero_copy_only=False)
        key = w + gumbel_keys(ids, seed)
        # local top-k is a sound prune: every global winner is a
        # local winner of its own batch
        top = np.lexsort((ids, -key))[:k]
        return pa.table({id_col: pa.array(ids[top]),
                         "dsir_key": pa.array(key[top]),
                         "dsir_logw": pa.array(w[top])})

    winners = scores.map_batches(_key_prune, batch_format="pyarrow") \
        .sort(["dsir_key", id_col], descending=[True, False]) \
        .limit(k).materialize()
    kept = bucketed_semi_join(docs_ds, id_col, winners, id_col)
    return kept, winners

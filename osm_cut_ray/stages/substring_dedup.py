"""Exact repeated-substring deduplication (the ExactSubstr family of
"Deduplicating Training Data Makes Language Models Better", Lee et
al. 2022): find every token window of length `window` that occurs
more than once ANYWHERE in the corpus (across or within documents)
and strip all but one canonical occurrence.

Semantics (pinned by tests/test_substring_dedup.py against a
token-tuple brute force):

* tokens = ``text.split()`` (whitespace), matching the token-count
  convention in `stages/text.py`.
* a window hash is "hot" when its total occurrence count across the
  corpus is >= `min_count` (default 2 — Lee et al.'s repeat rule).
* the OWNER of a hot window is its lexicographically smallest
  (doc_id, position) occurrence; every other occurrence marks its
  `window` tokens for removal. A token is removed when ANY non-owned
  hot window covers it (owned windows do not protect tokens that a
  different non-owned window covers — same coverage rule as the
  reference implementation's span union).
* documents with fewer than `window` tokens are never touched; a
  document with zero removals keeps its ORIGINAL text byte-for-byte
  (only edited documents are re-joined with single spaces).

Scale shape: the candidate pass ships one slim (hash, count,
min_key) row per token occurrence into a Sum/Min aggregate — the
honest cost of exact substring dedup (a distributed suffix array
moves the same order of data); the hot set that comes back is only
the REPEATED windows (tiny for natural corpora, `ray.put` once,
RAISES past `max_broadcast_spans`). Window hashes are 64-bit
position-independent polynomial hashes over per-token blake2b,
computed vectorized per document via the odd-multiplier modular
inverse in the 2^64 ring (no Python loop over positions); one blake2b
per UNIQUE batch token (the SimHash factorize trick,
`stages/dedup.py:403`). At ~2^32 corpus windows 64-bit collisions
become plausible — collisions only ever REMOVE a non-repeated span
(false positive), never corrupt counts structurally; widen to two
independent multipliers if that matters.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

_A = np.uint64(0x9E3779B97F4A7C15)          # odd => invertible mod 2^64
_AINV = np.uint64(pow(0x9E3779B97F4A7C15, -1, 1 << 64))
_POS_BITS = 21                               # <= 2M tokens per doc
_POS_SCALE = np.int64(1 << _POS_BITS)


def _token_hashes(tok_lists: list[list[str]]) -> tuple[np.ndarray, np.ndarray]:
    """-> (flat uint64 token hashes, per-doc lengths); one blake2b per
    UNIQUE token in the batch."""
    counts = np.array([len(ts) for ts in tok_lists], np.int64)
    flat = np.array([t for ts in tok_lists for t in ts], dtype=object)
    if len(flat) == 0:
        return np.empty(0, np.uint64), counts
    inv, uniq = pd.factorize(flat)
    hs = np.fromiter(
        (int.from_bytes(hashlib.blake2b(
            t.encode("utf-8"), digest_size=8).digest(), "little")
         for t in uniq), np.uint64, len(uniq))
    return hs[inv], counts


def _powers(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(a^k, a^-k) for k in [0, n] in the 2^64 ring."""
    pw = np.empty(n + 1, np.uint64)
    pw[0] = 1
    if n:
        pw[1:] = _A
        np.multiply.accumulate(pw, out=pw)
    ipw = np.empty(n + 1, np.uint64)
    ipw[0] = 1
    if n:
        ipw[1:] = _AINV
        np.multiply.accumulate(ipw, out=ipw)
    return pw, ipw


def _window_hashes(th: np.ndarray, window: int, pw: np.ndarray,
                   ipw: np.ndarray) -> np.ndarray:
    """Position-independent rolling hash of every `window`-token
    window: w[i] = sum_j th[i+j] * a^(window-1-j)  (mod 2^64),
    vectorized via g[k] = th[k]*a^-k, w[i] = (G[i+L]-G[i]) *
    a^(i+L-1)."""
    n = len(th)
    if n < window:
        return np.empty(0, np.uint64)
    g = th * ipw[:n]
    big_g = np.concatenate([np.zeros(1, np.uint64), np.cumsum(g, dtype=np.uint64)])
    i = np.arange(n - window + 1)
    return (big_g[i + window] - big_g[i]) * pw[i + window - 1]


def _split_docs(t: pa.Table, text_col: str, id_col: str):
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    toks = [str(x).split() if x is not None else []
            for x in t[text_col].to_pylist()]
    return ids, toks


def repeated_window_index(docs_ds, *, window: int = 50,
                          min_count: int = 2,
                          text_col: str = "text",
                          id_col: str = "doc_id",
                          max_broadcast_spans: int = 20_000_000):
    """-> (sorted int64-view window hashes, aligned owner keys) for
    every window repeated >= min_count times corpus-wide. Owner key =
    doc_id * 2^21 + position (RAISES past either packing bound)."""
    from ray.data.aggregate import Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"h": pa.array([], pa.int64()),
                          "cnt": pa.array([], pa.int64()),
                          "key": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        ids, toks = _split_docs(t, text_col, id_col)
        maxlen = max((len(ts) for ts in toks), default=0)
        if maxlen >= (1 << _POS_BITS):
            raise ValueError(
                f"a document holds {maxlen} tokens >= 2^{_POS_BITS}; "
                "the owner-key packing needs chunked documents")
        if ids.size and np.abs(ids).max() >= (1 << (62 - _POS_BITS)):
            raise ValueError("doc ids exceed the owner-key packing")
        pw, ipw = _powers(maxlen)
        th_flat, counts = _token_hashes(toks)
        offs = np.concatenate([[0], np.cumsum(counts)])
        hs, keys = [], []
        for d in range(len(ids)):
            th = th_flat[offs[d]:offs[d + 1]]
            w = _window_hashes(th, window, pw, ipw)
            if len(w) == 0:
                continue
            hs.append(w.view(np.int64))
            keys.append(ids[d] * _POS_SCALE
                        + np.arange(len(w), dtype=np.int64))
        if not hs:
            return empty
        h = np.concatenate(hs)
        k = np.concatenate(keys)
        uh, inv = np.unique(h, return_inverse=True)
        cnt = np.zeros(len(uh), np.int64)
        np.add.at(cnt, inv, 1)
        mk = np.full(len(uh), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mk, inv, k)
        return pa.table({"h": pa.array(uh), "cnt": pa.array(cnt),
                         "key": pa.array(mk)})

    agg = docs_ds.map_batches(partial, batch_format="pyarrow")\
        .groupby("h").aggregate(Sum("cnt", alias_name="cnt"),
                                Min("key", alias_name="key"))\
        .filter(expr=f"cnt >= {int(min_count)}").materialize()
    n_hot = agg.count()
    if n_hot > max_broadcast_spans:
        raise ValueError(
            f"{n_hot} repeated windows exceed max_broadcast_spans; "
            "raise the cap or pre-shard the corpus")
    if n_hot == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    tbl = pa.concat_tables(list(
        agg.iter_batches(batch_size=None, batch_format="pyarrow")))
    h = tbl["h"].to_numpy(zero_copy_only=False).astype(np.int64)
    k = tbl["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(h, kind="stable")
    return h[order], k[order]


class _StripSpans:
    """Actor-pool removal stage: hot-window set rehydrated once per
    actor from the object store."""

    def __init__(self, ref, window: int, text_col: str, id_col: str):
        self._hot, self._owner = ray.get(ref)
        self._window = window
        self._text_col = text_col
        self._id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            (self._id_col, pa.int64()), (self._text_col, pa.string()),
            ("n_tokens", pa.int64()), ("n_removed", pa.int64())])
        if len(t) == 0:
            return out_schema.empty_table()
        ids, toks = _split_docs(t, self._text_col, self._id_col)
        texts = t[self._text_col].to_pylist()
        maxlen = max((len(ts) for ts in toks), default=0)
        pw, ipw = _powers(maxlen)
        th_flat, counts = _token_hashes(toks)
        offs = np.concatenate([[0], np.cumsum(counts)])
        L = self._window
        out_text, n_tok, n_rm = [], [], []
        for d in range(len(ids)):
            ts = toks[d]
            th = th_flat[offs[d]:offs[d + 1]]
            w = _window_hashes(th, L, pw, ipw).view(np.int64)
            n_tok.append(len(ts))
            if len(w) == 0 or len(self._hot) == 0:
                out_text.append(texts[d])
                n_rm.append(0)
                continue
            pos = np.searchsorted(self._hot, w)
            pos_c = np.clip(pos, 0, len(self._hot) - 1)
            hit = self._hot[pos_c] == w
            keys = ids[d] * _POS_SCALE + np.arange(len(w), dtype=np.int64)
            strip = hit & (self._owner[pos_c] != keys)
            if not strip.any():
                out_text.append(texts[d])
                n_rm.append(0)
                continue
            cover = np.zeros(len(ts) + 1, np.int64)
            starts = np.flatnonzero(strip)
            np.add.at(cover, starts, 1)
            np.add.at(cover, starts + L, -1)
            covered = np.cumsum(cover[:-1]) > 0
            kept = [tk for tk, c in zip(ts, covered) if not c]
            out_text.append(" ".join(kept))
            n_rm.append(int(covered.sum()))
        return pa.table({
            self._id_col: pa.array(ids),
            self._text_col: pa.array(out_text, pa.string()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_removed": pa.array(n_rm, pa.int64())})


def dedup_substrings(docs_ds, *, window: int = 50, min_count: int = 2,
                     text_col: str = "text", id_col: str = "doc_id",
                     max_broadcast_spans: int = 20_000_000,
                     concurrency=None):
    """-> Dataset (id, text, n_tokens, n_removed): the corpus with
    every repeated `window`-token span stripped down to its single
    owner occurrence. Two passes: a Sum/Min window aggregate, then a
    broadcast actor-pool rewrite (payload text never shuffles).

    `concurrency` defaults to the autoscaling `default_pool_size()`
    bounds — a FIXED pool equal to the cluster CPU count deadlocks
    the upstream stage (verified on a 4-CPU test cluster)."""
    from osm_cut_ray.stages.pip import default_pool_size

    if concurrency is None:
        concurrency = default_pool_size()
    hot, owner = repeated_window_index(
        docs_ds, window=window, min_count=min_count,
        text_col=text_col, id_col=id_col,
        max_broadcast_spans=max_broadcast_spans)
    ref = ray.put((hot, owner))
    return docs_ds.map_batches(
        _StripSpans, batch_format="pyarrow",
        concurrency=concurrency,
        fn_constructor_args=(ref, window, text_col, id_col))

"""Distributed BPE tokenizer training + encoding (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units";
the merge-application order follows the standard rank-greedy scheme
every production BPE encoder uses).

Ray-Data shape — the same split every real tokenizer trainer makes:

- **Word-count pass** (distributed): `map_batches` emits one slim
  (word, count) partial per UNIQUE batch word, `groupby("word").sum`
  reduces exactly. Only the unique-word table ever reaches the
  driver: bounded by vocabulary (Heaps' law — tens of millions at
  100 TB, not trillions of tokens), capped by `max_unique_words`
  which RAISES rather than truncating (prune with `min_word_count`
  or `lowercase` instead — a truncated vocab silently changes the
  fitted merges).
- **Merge loop** (driver, bounded): classic incremental pair-count
  maintenance over the unique-word table — pair counts and a
  pair -> word-index inverted index are updated only for the words
  containing the merged pair, so each round costs O(affected words),
  not O(vocab). Deterministic: ties broken by (count desc, pair
  lexicographic asc); integer counts from the exact groupby make the
  fitted merges bit-identical under any partitioning.
- **Encode pass** (map-side, zero shuffles): the merge-rank dict is
  `ray.put` once; each batch factorizes to unique words and encodes
  each unique word ONCE (the stages/dedup.py unique-token trick),
  then scatters token lists back through the inverse index.

Tokens use the end-of-word marker as a SEPARATE trailing symbol
(`eow="</w>"`), consistently in fit and encode, so "est" mid-word and
"est</w>" word-final stay distinct merge targets exactly as in the
paper's worked example.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

EOW = "</w>"


@dataclass
class BPEModel:
    """Fitted merge list in rank order + the derived vocab: base
    symbols (sorted) first, then merge outputs in rank order."""

    merges: list[tuple[str, str]]
    base_symbols: list[str]
    eow: str = EOW
    _ranks: dict = field(default=None, repr=False, compare=False)

    @property
    def ranks(self) -> dict[tuple[str, str], int]:
        if self._ranks is None:
            self._ranks = {tuple(m): r for r, m in enumerate(self.merges)}
        return self._ranks

    def vocab(self) -> dict[str, int]:
        """token -> id; base symbols sorted, merge outputs appended in
        rank order (first occurrence wins on collision)."""
        v = {}
        for s in sorted(self.base_symbols):
            v.setdefault(s, len(v))
        for a, b in self.merges:
            v.setdefault(a + b, len(v))
        return v

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"merges": [list(m) for m in self.merges],
                       "base_symbols": self.base_symbols,
                       "eow": self.eow}, f)

    @classmethod
    def load(cls, path: str) -> "BPEModel":
        with open(path) as f:
            d = json.load(f)
        return cls(merges=[tuple(m) for m in d["merges"]],
                   base_symbols=list(d["base_symbols"]), eow=d["eow"])


def _word_symbols(word: str, eow: str) -> tuple[str, ...]:
    return tuple(word) + (eow,)


def encode_word(word: str, ranks: dict, eow: str = EOW) -> list[str]:
    """Rank-greedy BPE: repeatedly merge ALL occurrences of the
    best-ranked (lowest rank) adjacent pair present in the word."""
    syms = list(_word_symbols(word, eow))
    while len(syms) > 1:
        best, best_rank = None, None
        for pair in zip(syms[:-1], syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = pair, r
        if best is None:
            break
        merged, i = [], 0
        while i < len(syms):
            if (i < len(syms) - 1
                    and (syms[i], syms[i + 1]) == best):
                merged.append(syms[i] + syms[i + 1])
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        syms = merged
    return syms


def word_counts(docs_ds, *, text_col: str = "text",
                lowercase: bool = False, min_word_count: int = 1,
                max_unique_words: int = 20_000_000):
    """-> (words object ndarray, counts int64 ndarray), sorted by word.
    One slim (word, count) shuffle; RAISES past `max_unique_words`."""
    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"word": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        toks = []
        for x in t[text_col].to_pylist():
            if x is None:
                continue
            s = str(x).lower() if lowercase else str(x)
            toks.extend(s.split())
        if not toks:
            return empty
        inv, uniq = pd.factorize(np.array(toks, dtype=object))
        cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table({"word": pa.array(uniq, pa.string()),
                         "cnt": pa.array(cnt)})

    agg = docs_ds.map_batches(partial, batch_format="pyarrow")\
        .groupby("word").aggregate(
            ray.data.aggregate.Sum("cnt", alias_name="cnt"))
    if min_word_count > 1:
        agg = agg.filter(expr=f"cnt >= {int(min_word_count)}")
    agg = agg.materialize()
    n = agg.count()
    if n > max_unique_words:
        raise ValueError(
            f"{n} unique words exceed max_unique_words="
            f"{max_unique_words}; raise the cap or prune with "
            "min_word_count/lowercase (truncation would corrupt the fit)")
    if n == 0:
        return np.empty(0, object), np.empty(0, np.int64)
    tbl = pa.concat_tables(list(
        agg.iter_batches(batch_size=None, batch_format="pyarrow")))
    words = np.array(tbl["word"].to_pylist(), dtype=object)
    counts = tbl["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(words, kind="stable")
    return words[order], counts[order]


def fit_bpe(docs_ds, *, num_merges: int = 200, text_col: str = "text",
            lowercase: bool = False, min_pair_count: int = 2,
            min_word_count: int = 1,
            max_unique_words: int = 20_000_000) -> BPEModel:
    """Fit `num_merges` BPE merges over the corpus word counts.
    Stops early when the best pair's count drops below
    `min_pair_count`. Bit-deterministic under any partitioning."""
    words, counts = word_counts(
        docs_ds, text_col=text_col, lowercase=lowercase,
        min_word_count=min_word_count,
        max_unique_words=max_unique_words)
    syms = [list(_word_symbols(w, EOW)) for w in words]
    base = sorted({s for ws in syms for s in ws})

    # pair -> total count; pair -> set of word indexes containing it
    pair_cnt: dict = {}
    pair_words: dict = {}
    for wi, ws in enumerate(syms):
        c = int(counts[wi])
        for p in zip(ws[:-1], ws[1:]):
            pair_cnt[p] = pair_cnt.get(p, 0) + c
            pair_words.setdefault(p, set()).add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_cnt:
            break
        # deterministic argmax: count desc, pair lexicographic asc
        best = min(pair_cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_cnt[best] < min_pair_count:
            break
        merges.append(best)
        for wi in sorted(pair_words.get(best, ())):
            ws, c = syms[wi], int(counts[wi])
            # retract this word's pair contributions
            for p in zip(ws[:-1], ws[1:]):
                pair_cnt[p] -= c
                if pair_cnt[p] <= 0:
                    del pair_cnt[p]
                s = pair_words.get(p)
                if s is not None:
                    s.discard(wi)
                    if not s:
                        del pair_words[p]
            merged, i = [], 0
            while i < len(ws):
                if i < len(ws) - 1 and (ws[i], ws[i + 1]) == best:
                    merged.append(ws[i] + ws[i + 1])
                    i += 2
                else:
                    merged.append(ws[i])
                    i += 1
            syms[wi] = merged
            for p in zip(merged[:-1], merged[1:]):
                pair_cnt[p] = pair_cnt.get(p, 0) + c
                pair_words.setdefault(p, set()).add(wi)
    return BPEModel(merges=merges, base_symbols=base)


def bpe_encode(docs_ds, model: BPEModel, *, text_col: str = "text",
               id_col: str = "doc_id", emit_ids: bool = False):
    """-> Dataset (id, tokens list<string> [, token_ids list<int32>],
    n_bpe_tokens). Map-side only: ranks broadcast once, each unique
    batch word encoded once. Unknown characters stay as singleton
    base symbols (ids = -1 when `emit_ids`)."""
    ref = ray.put((model.ranks, model.vocab() if emit_ids else None,
                   model.eow))

    def _encode(t: pa.Table) -> pa.Table:
        fields = [(id_col, pa.int64()),
                  ("tokens", pa.list_(pa.string()))]
        if emit_ids:
            fields.append(("token_ids", pa.list_(pa.int32())))
        fields.append(("n_bpe_tokens", pa.int64()))
        schema = pa.schema(fields)
        if len(t) == 0:
            return schema.empty_table()
        ranks, vocab, eow = ray.get(ref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = [str(x) if x is not None else "" for x in
                 t[text_col].to_pylist()]
        words_per_doc = [s.split() for s in texts]
        flat = np.array([w for ws in words_per_doc for w in ws],
                        dtype=object)
        memo: dict[str, list[str]] = {}
        if len(flat):
            inv, uniq = pd.factorize(flat)
            for w in uniq:
                memo[w] = encode_word(w, ranks, eow)
        toks, tok_ids, n = [], [], []
        for ws in words_per_doc:
            dt = [s for w in ws for s in memo[w]]
            toks.append(dt)
            n.append(len(dt))
            if emit_ids:
                tok_ids.append([vocab.get(s, -1) for s in dt])
        cols = {id_col: pa.array(ids),
                "tokens": pa.array(toks, pa.list_(pa.string()))}
        if emit_ids:
            cols["token_ids"] = pa.array(tok_ids, pa.list_(pa.int32()))
        cols["n_bpe_tokens"] = pa.array(n, pa.int64())
        return pa.table(cols)

    return docs_ds.map_batches(_encode, batch_format="pyarrow")

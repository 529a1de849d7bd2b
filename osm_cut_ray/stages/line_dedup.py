"""Corpus-level duplicated-line removal (the C4 / RefinedWeb
boilerplate pass): find lines that repeat across MANY documents
(nav bars, cookie banners, license footers) and strip them from every
document.

This is a different axis from the within-document `repetition_stats`
(stages/text.py) and from whole-document dedup (stages/dedup.py):
the unit is the LINE, and the signal is corpus-wide document
frequency.

Ray-Data shape (two streaming passes over the corpus, one slim
aggregate between them):

1. **Count pass** — `map_batches` emits per-batch partial
   (line-hash, doc-frequency) counts: lines are split/factorized/
   hashed ONCE per unique line per batch (the repetition_stats
   factorize/bincount pattern), per-doc duplicates collapse on packed
   (doc, code) keys so df counts documents, not occurrences. Only
   (int64 hash, int64 count) rows leave the mappers.
2. **Aggregate** — `groupby("h").sum()` over the slim count table,
   then a map-side filter keeps hashes with df >= min_df. The hot set
   is collected to the driver: its cardinality is bounded by
   corpus_lines / min_df and in practice by the amount of true
   boilerplate; `max_hot_lines` raises (never truncates silently) if
   a corpus breaks the bound.
3. **Rewrite pass** — the sorted hot-hash array is `ray.put` once and
   probed map-side via `np.searchsorted`; each document is rebuilt
   from its kept lines. Zero shuffles; the corpus streams.

Hash collisions: a blake2b-64 collision between a hot and a cold line
could drop an innocent line; at 2^64 and boilerplate-set sizes (~1e6)
the probability is ~1e-7 per corpus — the standard accepted trade of
every hash-based dedup in this repo.

At 100 TB: pass 1's shuffle payload is the slim per-batch unique
(hash, count) table (bounded by unique lines per batch, not rows);
pass 2's broadcast is 8 B per hot line; pass 3 is pure map. Reference
semantics for tests: brute-force Counter over exact line strings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .dedup import _adaptive_parts, _hash64


def _split_and_hash(texts: list[str]):
    """Split a batch of texts into lines; hash each UNIQUE line once.

    Returns (flat line array, per-doc line counts, flat uint64 hashes,
    flat char lengths)."""
    lines_per_doc = [s.split("\n") for s in texts]
    lens = np.fromiter((len(ls) for ls in lines_per_doc), np.int64,
                       len(texts))
    flat = np.array([ln for ls in lines_per_doc for ln in ls],
                    dtype=object)
    if len(flat) == 0:
        z = np.array([], np.int64)
        return flat, lens, np.array([], np.uint64), z
    codes, uniq = pd.factorize(flat)
    uh = _hash64((u.encode() for u in uniq))
    nchars = pd.Series(flat, dtype=object).str.len().to_numpy(np.int64)
    return flat, lens, uh[codes], nchars


def _partial_line_df(t: pa.Table, min_line_chars: int) -> pa.Table:
    """Per-batch partial document-frequency counts per line hash."""
    empty = pa.table({"h": pa.array([], pa.int64()),
                      "c": pa.array([], pa.int64())})
    if len(t) == 0:
        return empty
    texts = [str(x) for x in t["text"].to_pylist()]
    flat, lens, h, nchars = _split_and_hash(texts)
    keep = nchars >= min_line_chars
    if not keep.any():
        return empty
    # df semantics: count DOCUMENTS containing the line, so collapse
    # per-doc repeats on packed (doc, line-code) keys first.
    codes, uniq_h = pd.factorize(h[keep])
    didx = np.repeat(np.arange(len(texts), dtype=np.int64), lens)[keep]
    packed = (didx << np.int64(32)) | codes.astype(np.int64)
    ucodes = (np.unique(packed) & np.int64(0xFFFFFFFF)).astype(np.int64)
    hc, cnt = np.unique(ucodes, return_counts=True)
    return pa.table({"h": uniq_h[hc].view(np.int64),
                     "c": cnt.astype(np.int64)})


def hot_line_hashes(docs_ds, *, min_df: int = 4, min_line_chars: int = 8,
                    max_hot_lines: int = 5_000_000) -> np.ndarray:
    """Sorted uint64 hashes of lines appearing in >= min_df documents.

    Raises if the hot set exceeds `max_hot_lines` (a corpus whose
    boilerplate set doesn't fit one broadcast needs a bigger cap or a
    higher min_df — never a silent truncation)."""
    partial = docs_ds.map_batches(
        lambda t: _partial_line_df(t, min_line_chars),
        batch_format="pyarrow")
    agg = partial.groupby("h").sum("c")

    def _hot(t: pa.Table) -> pa.Table:
        c = t["sum(c)"].to_numpy(zero_copy_only=False)
        return t.select(["h"]).filter(pa.array(c >= min_df))

    hot = agg.map_batches(_hot, batch_format="pyarrow")
    n = hot.count()
    if n > max_hot_lines:
        raise ValueError(
            f"hot-line set {n} exceeds max_hot_lines={max_hot_lines}; "
            f"raise the cap or min_df")
    if n == 0:
        return np.array([], np.uint64)
    arr = np.concatenate(
        [b["h"].to_numpy(zero_copy_only=False)
         for b in hot.iter_batches(batch_format="pyarrow")]).view(np.uint64)
    arr.sort()
    return arr


def drop_hot_lines(docs_ds, hot_sorted, *, min_line_chars: int = 8):
    """Rewrite documents with corpus-hot lines removed (map-side).

    Lines shorter than `min_line_chars` are never dropped (they were
    never counted). Adds `n_lines_removed`; recomputes `n_chars` when
    the input carries it. Output keeps the input column set.
    `hot_sorted` may be the sorted uint64 array or an ObjectRef to it
    (so a multi-shard caller broadcasts once)."""
    ref = hot_sorted if isinstance(hot_sorted, ray.ObjectRef) \
        else ray.put(np.ascontiguousarray(hot_sorted.view(np.uint64)))

    def _rewrite(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column(
                "n_lines_removed", pa.array([], pa.int64()))
        hot = ray.get(ref)  # zero-copy plasma view
        texts = [str(x) for x in t["text"].to_pylist()]
        flat, lens, h, nchars = _split_and_hash(texts)
        droppable = nchars >= min_line_chars
        if len(hot) and len(flat):
            idx = np.searchsorted(hot, h)
            idx[idx == len(hot)] = 0
            is_hot = (hot[idx] == h) & droppable
        else:
            is_hot = np.zeros(len(flat), bool)
        didx = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
        removed = np.bincount(didx[is_hot], minlength=len(texts))
        kept = pd.Series(flat[~is_hot], dtype=object)
        new_texts = kept.groupby(didx[~is_hot]).agg("\n".join)
        out = new_texts.reindex(range(len(texts)), fill_value="")
        cols = {name: t[name] for name in t.column_names}
        cols["text"] = pa.array(out.to_numpy(dtype=object), pa.string())
        if "n_chars" in cols:
            cols["n_chars"] = pa.array(
                out.str.len().to_numpy(np.int64), pa.int64())
        cols["n_lines_removed"] = pa.array(removed.astype(np.int64))
        return pa.table(cols)

    return docs_ds.map_batches(_rewrite, batch_format="pyarrow")


def dedup_lines(docs_ds, *, min_df: int = 4, min_line_chars: int = 8,
                max_hot_lines: int = 5_000_000):
    """Composed corpus line dedup: count -> hot set -> rewrite.

    Materializes the input once so the two passes share the scan."""
    docs_ds = docs_ds.materialize()
    hot = hot_line_hashes(docs_ds, min_df=min_df,
                          min_line_chars=min_line_chars,
                          max_hot_lines=max_hot_lines)
    return drop_hot_lines(docs_ds, hot, min_line_chars=min_line_chars), hot

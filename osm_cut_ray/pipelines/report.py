"""Corpus datasheet: ONE streaming pass over a documents table
producing the summary a data curator reads before any training run —
row/token totals, language mix, duplicate-rate estimate, length
quantiles. The "datasheets for datasets" diagnostic, engine-shaped:

- every statistic is a MERGEABLE partial: int64 count vectors
  (exact), an HLL sketch over content hashes (distinct-doc estimate →
  dup rate), a KLL sketch over token counts (length quantiles);
- each `map_batches` task emits ONE slim row (a few KB of sketch
  blobs + count columns); the driver merges #batches rows;
- the corpus streams — no shuffle, no materialization, memory O(1).

At 100 TB this runs at read bandwidth and is the cheap pre-flight
before the expensive curation passes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hll import HyperLogLog
from ..functions.sketch import KLL
from ..stages.text import CJK_RE, LANG_RES

_LANGS = ("en", "de", "fr", "es")


def _partial(t: pa.Table) -> pa.Table:
    empty = pa.table({
        "n": pa.array([], pa.int64()),
        "n_tokens": pa.array([], pa.int64()),
        "n_chars": pa.array([], pa.int64()),
        "n_empty": pa.array([], pa.int64()),
        "lang": pa.array([], pa.large_list(pa.int64())),
        "hll": pa.array([], pa.binary()),
        "kll": pa.array([], pa.binary())})
    if len(t) == 0 or "text" not in t.column_names:
        return empty
    s = pd.Series(t["text"].to_pylist()).astype(str)
    low = s.str.lower()
    n_tok = s.str.count(r"\S+").to_numpy(np.int64)
    n_chr = s.str.len().to_numpy(np.int64)
    counts = {k: low.str.count(v).to_numpy()
              for k, v in LANG_RES.items()}
    c_zh = s.str.count(CJK_RE).to_numpy()
    en, de, fr, es = (counts["en"], counts["de"], counts["fr"],
                      counts["es"])
    lang = np.select(
        [c_zh > 0,
         (en >= de) & (en >= fr) & (en >= es),
         (de >= fr) & (de >= es),
         fr >= es],
        [4, 0, 1, 2], default=3)  # en de fr es zh == stages.text.LangId
    lang_counts = np.bincount(lang, minlength=5).astype(np.int64)
    hs = np.fromiter(
        (int.from_bytes(hashlib.md5(x.encode()).digest()[8:], "little")
         for x in s), np.uint64, len(s))
    hll = HyperLogLog().add_int64(hs.view(np.int64))
    kll = KLL(k=200)
    kll.add(n_tok.astype(np.float64))
    return pa.table({
        "n": pa.array([len(s)], pa.int64()),
        "n_tokens": pa.array([int(n_tok.sum())], pa.int64()),
        "n_chars": pa.array([int(n_chr.sum())], pa.int64()),
        "n_empty": pa.array([int((n_tok == 0).sum())], pa.int64()),
        "lang": pa.array([lang_counts.tolist()],
                         pa.large_list(pa.int64())),
        "hll": pa.array([hll.to_bytes()], pa.binary()),
        "kll": pa.array([kll.to_bytes()], pa.binary())})


def corpus_report(docs_ds) -> dict:
    """documents Dataset -> datasheet dict (exact counts, estimated
    distinct/dup-rate, p10/p50/p90/p99 token-length quantiles)."""
    n = n_tok = n_chr = n_empty = 0
    lang = np.zeros(5, np.int64)
    hll: HyperLogLog | None = None
    kll: KLL | None = None
    for b in docs_ds.map_batches(_partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        for i in range(b.num_rows):
            n += int(b["n"][i].as_py())
            n_tok += int(b["n_tokens"][i].as_py())
            n_chr += int(b["n_chars"][i].as_py())
            n_empty += int(b["n_empty"][i].as_py())
            lang += np.asarray(b["lang"][i].as_py(), np.int64)
            h = HyperLogLog.from_bytes(bytes(b["hll"][i].as_py()))
            hll = h if hll is None else hll.merge(h)
            q = KLL.from_bytes(bytes(b["kll"][i].as_py()))
            kll = q if kll is None else kll.merge(q)
    distinct = float(hll.estimate()) if hll is not None else 0.0
    report = {
        "n_docs": n,
        "n_tokens": n_tok,
        "n_chars": n_chr,
        "n_empty_docs": n_empty,
        "mean_tokens": n_tok / n if n else 0.0,
        "lang_counts": {k: int(v) for k, v in
                        zip((*_LANGS, "zh"), lang)},
        "distinct_docs_est": distinct,
        "dup_rate_est": max(0.0, 1.0 - distinct / n) if n else 0.0,
    }
    if kll is not None and n:
        report["token_quantiles"] = {
            f"p{int(q * 100)}": float(kll.quantile(q))
            for q in (0.1, 0.5, 0.9, 0.99)}
    return report

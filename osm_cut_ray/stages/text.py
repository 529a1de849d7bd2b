"""Text-analysis stages for the documents table (graft additions:
language-ID, quality scoring, token counting, fingerprinting).

All are pandas/numpy-vectorized `map_batches` bodies; regexes are
compiled once per actor in `__init__` (stateful stage pattern). Every
heuristic is mirrored in the DuckDB oracle SQL — the chosen stopword
regex counts + deterministic argmax priority are identical on both
sides, so value hashes match.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

TOKEN_RE = r"\S+"
STOP_RE = r"\b(?:the|and|of|to|a)\b"
PUNCT_RE = r"[.,!?;:]"

# language stopword heuristics; priority order en > de > fr > es, zh by
# CJK presence — mirrored in the SQL CASE expression.
LANG_RES = {
    "en": r"\b(?:the|and|of|to|in|is)\b",
    "de": r"\b(?:der|die|und|das|ist|nicht)\b",
    "fr": r"\b(?:le|la|et|les|des|un)\b",
    "es": r"\b(?:el|los|las|una|por|que)\b",
}
CJK_RE = "[一-鿿]"


class TextStats:
    """Token count + quality scores (length/punct/stopword ratios)."""

    def __init__(self):
        self.token = re.compile(TOKEN_RE)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].astype(str)
        n_chars = text.str.len().astype(np.int64)
        n_tokens = text.str.count(TOKEN_RE).astype(np.int64)
        n_stop = text.str.lower().str.count(STOP_RE).astype(np.int64)
        n_punct = text.str.count(PUNCT_RE).astype(np.int64)
        out = pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_chars_calc": n_chars,
            "n_tokens": n_tokens,
            "n_stop": n_stop,
            "n_punct": n_punct,
            # single exact-int divisions — deterministic across engines
            "stop_ratio": np.where(n_tokens > 0,
                                   n_stop.to_numpy() / np.maximum(n_tokens, 1),
                                   0.0),
            "punct_ratio": np.where(n_chars > 0,
                                    n_punct.to_numpy() / np.maximum(n_chars, 1),
                                    0.0),
        })
        return out


class LangId:
    """n-gram/stopword-count language ID with deterministic priority."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        low = df["text"].astype(str).str.lower()
        counts = {k: low.str.count(v).to_numpy() for k, v in LANG_RES.items()}
        c_zh = df["text"].astype(str).str.count(CJK_RE).to_numpy()
        en, de, fr, es = counts["en"], counts["de"], counts["fr"], counts["es"]
        lang = np.select(
            [c_zh > 0,
             (en >= de) & (en >= fr) & (en >= es),
             (de >= fr) & (de >= es),
             fr >= es],
            ["zh", "en", "de", "fr"], default="es")
        return pd.DataFrame({"doc_id": df["doc_id"], "lang_pred": lang})


def md5_fingerprint(df: pd.DataFrame, col: str = "text",
                    out: str = "fp") -> pd.DataFrame:
    """Document fingerprint (md5 hex — matches SQL md5())."""
    fp = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in df[col]]
    return pd.DataFrame({"doc_id": df["doc_id"], out: fp})


def rolling_fingerprint(text: str, window: int = 8,
                        mod: int = 1 << 61) -> int:
    """Rabin-style rolling hash fingerprint over bytes — the
    content-defined fingerprint variant (no SQL oracle; pinned by unit
    tests for determinism/shift-sensitivity)."""
    b = text.encode("utf-8")
    base = 257
    h = 0
    power = pow(base, window - 1, mod)
    acc = 0
    for i, ch in enumerate(b):
        acc = (acc * base + ch) % mod
        if i >= window:
            acc = (acc - b[i - window] * power * base) % mod
        if i >= window - 1:
            h ^= acc
    return h


def repetition_stats(t):
    """Gopher-style within-document repetition signals (public
    Rae et al. quality-filter family), one row per doc:

      dup_line_frac   — 1 - unique_lines/lines (copy-paste detector)
      top_bigram_frac — tokens covered by the most frequent token
                        bigram (2*max_count/n_tokens, capped at 1)

    Batch-vectorized via the factorize/bincount pattern: lines and
    bigrams across the WHOLE batch are factorized once (hash-based, no
    string sorts), per-(doc, code) collapse happens on packed int64
    keys, and per-doc maxima use np.maximum.at — no per-doc Python in
    the hot loop. Accepts a pyarrow Table (doc_id, text).
    """
    import pyarrow as pa

    from .dedup import _combine_shingles, _token_hashes_batch

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "dup_line_frac": pa.array([], pa.float64()),
                      "top_bigram_frac": pa.array([], pa.float64())})
    if len(t) == 0 or "doc_id" not in t.column_names:
        return empty
    texts = [str(x) for x in t["text"].to_pylist()]
    n = len(texts)
    doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)

    # ---- duplicate-line fraction
    lines_per_doc = [s.split("\n") for s in texts]
    lens = np.fromiter((len(ls) for ls in lines_per_doc), np.int64, n)
    flat = np.array([ln for ls in lines_per_doc for ln in ls],
                    dtype=object)
    codes, _ = pd.factorize(flat)
    didx = np.repeat(np.arange(n, dtype=np.int64), lens)
    packed = (didx << np.int64(32)) | codes.astype(np.int64)
    uniq_per_doc = np.bincount(
        (np.unique(packed) >> np.int64(32)).astype(np.int64),
        minlength=n)
    dup_line_frac = 1.0 - uniq_per_doc / np.maximum(lens, 1)

    # ---- top-bigram token coverage
    th, offs = _token_hashes_batch(texts)
    n_tok = np.diff(offs)
    big_per_doc = [_combine_shingles(th[offs[i]:offs[i + 1]], 2)
                   if n_tok[i] >= 2 else np.array([], np.uint64)
                   for i in range(n)]
    blens = np.fromiter((len(b) for b in big_per_doc), np.int64, n)
    top = np.zeros(n, np.int64)
    if blens.sum():
        bflat = np.concatenate([b for b in big_per_doc if len(b)])
        bdidx = np.repeat(np.arange(n, dtype=np.int64), blens)
        bcodes, _ = pd.factorize(bflat)
        bpacked = (bdidx << np.int64(32)) | bcodes.astype(np.int64)
        upacked, ucnt = np.unique(bpacked, return_counts=True)
        np.maximum.at(top, (upacked >> np.int64(32)).astype(np.int64),
                      ucnt)
    top_bigram_frac = np.minimum(
        2.0 * top / np.maximum(n_tok, 1), 1.0)
    return pa.table({"doc_id": doc_ids,
                     "dup_line_frac": dup_line_frac,
                     "top_bigram_frac": top_bigram_frac})


# GPT-2-style pre-tokenizer pattern (the public BPE split regex,
# minus the \p{L}/\p{N} unicode classes the re module lacks —
# ASCII letter/digit runs + punctuation runs + contractions). Token
# COUNTS under this pattern track real BPE pre-tokenization far more
# closely than whitespace splitting (punctuation and contractions
# count separately), which is what sizing a training mix needs.
BPE_RE = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
    r"| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+")


def bpe_token_count(t):
    """(doc_id, text) pyarrow batch -> (doc_id, n_bpe_tokens): counts
    under the BPE-ish split — one vectorized pandas str.count pass."""
    import pyarrow as pa
    if len(t) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_bpe_tokens": pa.array([], pa.int64())})
    s = pd.Series(t["text"].to_pylist()).astype(str)
    n = s.str.count(BPE_RE).to_numpy(np.int64)
    return pa.table({"doc_id": t["doc_id"],
                     "n_bpe_tokens": pa.array(n)})


# Unicode-lite canonicalization used before dedup/fingerprinting by
# the public pipelines (C4/RefinedWeb normalize before hashing so
# trivially-different bytes dedup together). All rules are vectorized
# pandas .str kernels; NFC itself needs unicodedata per string, which
# IS available in the stdlib and C-speed per call.
_QUOTES = {"‘": "'", "’": "'", "“": '"', "”": '"',
           "–": "-", "—": "-", " ": " "}
_CTRL_RE = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")


def normalize_text(t, *, lower: bool = False, text_col: str = "text"):
    """(.., text) pyarrow batch -> same batch with text canonicalized:
    NFC unicode form, smart quotes/dashes/nbsp -> ASCII, control chars
    stripped, whitespace runs collapsed, edges trimmed (optionally
    lowercased). Adds nothing; composes in front of any dedup or
    fingerprint stage."""
    import unicodedata

    import pyarrow as pa
    if len(t) == 0:
        return t
    s = pd.Series(t[text_col].to_pylist()).astype(str)
    s = s.map(lambda x: unicodedata.normalize("NFC", x))
    for k, v in _QUOTES.items():
        s = s.str.replace(k, v, regex=False)
    s = s.str.replace(_CTRL_RE, " ", regex=True)
    s = s.str.replace(r"\s+", " ", regex=True).str.strip()
    if lower:
        s = s.str.lower()
    cols = {name: t[name] for name in t.column_names}
    cols[text_col] = pa.array(s.to_numpy(dtype=object), pa.string())
    return pa.table(cols)


def compression_stats(t, *, text_col: str = "text",
                      id_col: str = "doc_id", level: int = 6):
    """zlib compression-ratio quality signal, one row per doc
    (doc_id, compress_ratio): compressed_bytes / raw_bytes of the
    UTF-8 text. The public quality-filter family (RefinedWeb /
    MassiveText hygiene) drops both tails: very LOW ratios are
    boilerplate/repetition (compressible), ratios near or above 1 are
    random-looking bytes (already-compressed or encoded junk). Empty
    docs get ratio 1.0 (no evidence).

    Per-row zlib is inherent (the codec is per-document, like the
    image stub's per-row encode); everything else is batch columnar.
    Accepts a pyarrow Table; compose as a map_batches over
    (doc_id, text).
    """
    import zlib

    import pyarrow as pa

    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "compress_ratio": pa.array([], pa.float64())})
    if len(t) == 0 or id_col not in t.column_names:
        return empty
    ratios = np.empty(len(t), np.float64)
    for i, x in enumerate(t[text_col].to_pylist()):
        raw = (x or "").encode("utf-8", "ignore")
        ratios[i] = (len(zlib.compress(raw, level)) / len(raw)
                     if raw else 1.0)
    return pa.table({id_col: t[id_col],
                     "compress_ratio": pa.array(ratios)})

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

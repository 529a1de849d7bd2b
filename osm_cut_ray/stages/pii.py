"""PII detection and redaction over the documents table.

A training-data pipeline must strip personally identifiable
information (emails, phone numbers, IP addresses, SSNs, card numbers)
before a corpus ships — the scrubbing pass described in the public
C4 / Dolma / FineWeb writeups. Ray-Data shape: a pure map-side
`map_batches` stage (zero shuffles, streams with backpressure);
the regexes are compiled once per worker process via the shared
per-process stage memo, and every count/replace is a vectorized
pandas `.str` kernel over the whole batch — no per-row Python.

Semantics are sequential-redaction semantics: categories are applied
in the fixed `PII_ORDER`, and category i is counted/replaced on the
text AFTER categories < i were redacted. This makes overlapping
matches well-defined (an SSN never double-counts as a phone number)
and makes `pii_stats` counts exactly the replacements `redact_pii`
performs.

At 100 TB: nothing leaves the mappers but the rewritten text and the
slim count columns; there is no driver state and no shuffle, so the
stage composes into any corpus rewrite (e.g. `curate_documents`)
without changing its partitioning.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# category -> (regex, replacement token). Order is semantic (see
# module docstring): more-specific digit shapes before generic ones.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(?:\.[A-Za-z0-9-]+)*\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "ccard": r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b|\b\d{13,16}\b",
    "phone": r"(?:\+?1[-. ])?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b",
}
PII_ORDER = ("email", "ipv4", "ssn", "ccard", "phone")


def _redact_token(cat: str) -> str:
    return f"[{cat.upper()}]"


class PiiScrub:
    """(doc_id, text) batch -> redacted text + per-category counts.

    Compiled once per worker process (`_cached_stage` memo in the
    query layer / `fn_constructor` in actor mode); `__call__` is
    vectorized pandas over the batch. Emits doc_id, text (redacted),
    n_<cat> for every category, and n_pii (total replacements).
    """

    def __init__(self):
        self.res = {c: re.compile(PII_PATTERNS[c]) for c in PII_ORDER}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].astype(str)
        out = {"doc_id": df["doc_id"].to_numpy()}
        total = np.zeros(len(df), np.int64)
        for cat in PII_ORDER:
            rex = self.res[cat]
            n = text.str.count(rex).to_numpy().astype(np.int64)
            out[f"n_{cat}"] = n
            total += n
            if n.any():  # skip the replace pass on clean batches
                text = text.str.replace(rex, _redact_token(cat),
                                        regex=True)
        out["n_pii"] = total
        out["text"] = text
        return pd.DataFrame(out)


def scrub_pii_brute(text: str) -> tuple[str, dict[str, int]]:
    """Single-string reference implementation (tests pin the
    vectorized stage against this)."""
    counts = {}
    for cat in PII_ORDER:
        rex = re.compile(PII_PATTERNS[cat])
        counts[cat] = len(rex.findall(text))
        text = rex.sub(_redact_token(cat), text)
    return text, counts


def pii_stats(docs_ds):
    """Per-document PII counts (doc_id, n_email, ..., n_pii) —
    detection only; the redacted text is dropped map-side so only
    slim count columns flow downstream."""
    from .pip import default_pool_size
    ds = docs_ds.map_batches(PiiScrub, batch_format="pandas",
                             concurrency=default_pool_size())
    return ds.drop_columns(["text"])


def redact_pii(docs_ds):
    """Rewrite the corpus with PII replaced by `[CATEGORY]` tokens.
    Output keeps the input's (doc_id, text) shape plus the count
    columns, so it composes with every downstream text stage."""
    from .pip import default_pool_size
    return docs_ds.map_batches(PiiScrub, batch_format="pandas",
                               concurrency=default_pool_size())

"""Document chunking: split each document into overlapping
token-window chunks — the retrieval/pretraining preprocessing step
between raw documents and embedding or packing (`stages/seq_pack.py`
concatenates ACROSS documents; this splits WITHIN them, preserving
the original text of every chunk).

Pure map-side (flat emission per batch, no shuffle, no state).
Tokens are whitespace-delimited runs (the repo's n_tokens
convention); a chunk's text is the ORIGINAL substring from its first
token's start to its last token's end, so internal whitespace
survives and chunks re-embed identically to the source.

Chunk rule (pinned by tests/test_chunk.py): chunk k starts at token
k*stride and spans up to `window` tokens; chunks are emitted while
the PREVIOUS chunk did not already reach the document's end (so a
short document yields exactly one chunk and no chunk is a suffix
subset of its predecessor). Empty/whitespace-only documents emit
nothing.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_TOKEN_RE = re.compile(r"\S+")


def chunk_spans(n_tokens: int, window: int, stride: int) -> list[int]:
    """Chunk start ordinals for a doc with `n_tokens` tokens."""
    if n_tokens <= 0:
        return []
    starts = [0]
    while starts[-1] + window < n_tokens:
        starts.append(starts[-1] + stride)
    return starts


def chunk_documents(docs_ds, *, window: int = 256, stride: int = 192,
                    doc_col: str = "doc_id", text_col: str = "text"):
    """-> Dataset (doc_id, chunk_ord, n_chunks, text, n_tokens): one
    row per chunk (module docstring). stride < window gives the
    overlap; stride == window is disjoint chunking."""
    if not (0 < stride <= window):
        raise ValueError("need 0 < stride <= window")

    def fn(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "chunk_ord": pa.array([], pa.int64()),
            "n_chunks": pa.array([], pa.int64()),
            "text": pa.array([], pa.string()),
            "n_tokens": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        ids = t[doc_col].to_numpy(zero_copy_only=False)
        out_id, out_ord, out_nc, out_txt, out_nt = [], [], [], [], []
        for i, txt in enumerate(t[text_col].to_pylist()):
            if txt is None:
                continue
            spans = [(m.start(), m.end())
                     for m in _TOKEN_RE.finditer(txt)]
            n = len(spans)
            if n == 0:
                continue
            starts = chunk_spans(n, window, stride)
            a = np.array([s for s, _ in spans], np.int64)
            b = np.array([e for _, e in spans], np.int64)
            for k, s0 in enumerate(starts):
                e0 = min(s0 + window, n)
                out_id.append(int(ids[i]))
                out_ord.append(k)
                out_nc.append(len(starts))
                out_txt.append(txt[a[s0]:b[e0 - 1]])
                out_nt.append(e0 - s0)
        if not out_id:
            return empty
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "chunk_ord": pa.array(out_ord, pa.int64()),
            "n_chunks": pa.array(out_nc, pa.int64()),
            "text": pa.array(out_txt, pa.string()),
            "n_tokens": pa.array(out_nt, pa.int64())})

    return docs_ds.map_batches(fn, batch_format="pyarrow")

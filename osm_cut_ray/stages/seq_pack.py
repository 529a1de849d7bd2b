"""Token-sequence packing for LM training: assign every document a
set of (sequence, position) spans under GPT-style concat-and-chunk —
the global token stream (docs in a deterministic order, optional EOS
between docs) is cut into fixed-length training sequences, and each
document learns exactly where its tokens land.

The engine-shape problem mirrors `stages/batching.py` (image batch
packing): a GLOBALLY consistent assignment, bit-deterministic under
any partitioning, computed without shuffling text. The extra twist is
that ranks are measured in TOKENS, not rows, so the exact-offset pass
sums per-doc token counts instead of counting rows.

Ray-Data shape (two slim passes, one bucketed shuffle):

1. Slim projection map: (hb, doc_id, h, n_tok). Order is
   (sample_hash(doc_id), doc_id) — the repo's standard deterministic
   hash order; hb = top hash bits, so hb ranges partition the order.
2. Exact int64 reduce of token totals per hb -> global token OFFSET
   per hb bucket, broadcast once.
3. One bucketed-group shuffle of the slim rows: sort each hb group by
   (h, doc_id), prefix-sum n_tok, add the broadcast offset = each
   doc's global token offset; emit one row per (doc, sequence) SPAN
   (all vectorized — np.repeat over per-doc span counts).

Output columns (one row per span):
  doc_id, seq_id, seq_start (position inside the sequence),
  doc_start (which token of the doc begins the span), n_span.
Every position of every kept sequence is covered exactly once, so a
loader can materialize packed sequences with a single bucketed join
of this table against the tokenized docs.

At 100 TB: text never transits — the shuffle carries (int64 x 4) per
doc; the driver holds one int64 per hb bucket (64 values).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .geo_sample import sample_hash

_HB_BITS = 6
_HB_SHIFT = 32 - _HB_BITS


def pack_token_sequences(docs_ds, *, seq_len: int, add_eos: bool = True,
                         drop_last: bool = True,
                         text_col: str = "text",
                         id_col: str = "doc_id"):
    """documents Dataset -> span assignment Dataset (doc_id, seq_id,
    seq_start, doc_start, n_span).

    Tokens are whitespace runs (the repo tokenizer); `add_eos` counts
    one EOS token after every document. With `drop_last` the final
    partial sequence is dropped, so every kept seq_id has exactly
    `seq_len` tokens."""
    from .dedup import _spread
    from .join import bucketed_group_apply

    def slim(t: pa.Table) -> pa.Table:
        empty = pa.table({"hb": pa.array([], pa.int64()),
                          "doc_id": pa.array([], pa.int64()),
                          "h": pa.array([], pa.int64()),
                          "n_tok": pa.array([], pa.int64())})
        if len(t) == 0 or id_col not in t.column_names:
            return empty
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n_tok = pd.Series(t[text_col].to_pylist()).astype(str) \
            .str.count(r"\S+").to_numpy(np.int64)
        if add_eos:
            n_tok = n_tok + 1
        hv = sample_hash(ids)
        hb = (hv >> np.int64(_HB_SHIFT)).astype(np.int64)
        return pa.table({"hb": hb, "doc_id": ids, "h": hv,
                         "n_tok": n_tok})

    slim_ds = _spread(docs_ds).map_batches(
        slim, batch_format="pyarrow").materialize()

    # ---- pass 2: exact token totals per hb -> global token offsets
    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"hb": pa.array([], pa.int64()),
                          "tok": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        hb = t["hb"].to_numpy(zero_copy_only=False)
        tok = np.bincount(hb, weights=t["n_tok"].to_numpy(
            zero_copy_only=False), minlength=1 << _HB_BITS)
        nz = np.flatnonzero(tok)
        return pa.table({"hb": nz.astype(np.int64),
                         "tok": tok[nz].astype(np.int64)})

    totals = np.zeros(1 << _HB_BITS, np.int64)
    for b in slim_ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        np.add.at(totals, b["hb"].to_numpy(zero_copy_only=False),
                  b["tok"].to_numpy(zero_copy_only=False))
    offsets = np.concatenate(([0], np.cumsum(totals)))[:-1]
    grand_total = int(totals.sum())
    n_seq = grand_total // seq_len if drop_last \
        else -(-grand_total // seq_len)
    ref = ray.put(offsets)

    # ---- pass 3: per-hb prefix sums -> vectorized span emission
    def assign(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "doc_id": pd.Series(dtype=np.int64),
            "seq_id": pd.Series(dtype=np.int64),
            "seq_start": pd.Series(dtype=np.int64),
            "doc_start": pd.Series(dtype=np.int64),
            "n_span": pd.Series(dtype=np.int64)})
        if len(g) == 0:
            return empty
        off = ray.get(ref)  # zero-copy plasma view
        # a bucket holds SEVERAL hb keys: per-hb prefix sums via one
        # global cumsum minus each hb group's base
        g = g.sort_values(["hb", "h", "doc_id"], kind="mergesort")
        n = g["n_tok"].to_numpy(np.int64)
        ids = g["doc_id"].to_numpy(np.int64)
        hbv = g["hb"].to_numpy(np.int64)
        csum = np.cumsum(n) - n
        start = np.concatenate(([True], hbv[1:] != hbv[:-1]))
        base = np.zeros(len(n), np.int64)
        base[start] = csum[start]
        base = np.maximum.accumulate(base)
        o = off[hbv] + (csum - base)
        nz = n > 0
        o, n, ids = o[nz], n[nz], ids[nz]
        if len(n) == 0:
            return empty
        first = o // seq_len
        last = (o + n - 1) // seq_len
        nspan = last - first + 1
        didx = np.repeat(np.arange(len(n), dtype=np.int64), nspan)
        cum0 = np.concatenate(([0], np.cumsum(nspan)))[:-1]
        sidx = np.arange(nspan.sum(), dtype=np.int64) - cum0[didx]
        seq_id = first[didx] + sidx
        s_tok = np.maximum(seq_id * seq_len, o[didx])
        e_tok = np.minimum((seq_id + 1) * seq_len, (o + n)[didx])
        keep = seq_id < n_seq
        return pd.DataFrame({
            "doc_id": ids[didx][keep],
            "seq_id": seq_id[keep],
            "seq_start": (s_tok - seq_id * seq_len)[keep],
            "doc_start": (s_tok - o[didx])[keep],
            "n_span": (e_tok - s_tok)[keep]})

    return bucketed_group_apply(slim_ds, "hb", assign)

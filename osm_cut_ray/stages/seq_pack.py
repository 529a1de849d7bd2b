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

    # data-sized bucket count: the hb key space is only 64 values, and
    # small corpora shouldn't pay a 128-bucket sort shuffle
    nb = _size_buckets(slim_ds.count())
    return bucketed_group_apply(slim_ds, "hb", assign, num_buckets=nb)


def _size_buckets(n_rows: int, rows_per_bucket: int = 100_000) -> int:
    """Bucket count proportional to data volume, capped at the
    cluster-adaptive default (join.default_bucket_count)."""
    from .join import default_bucket_count
    return int(min(default_bucket_count(),
                   max(4, n_rows // rows_per_bucket + 1)))


EOS_TOKEN = np.int64(-1)   # sentinel; a real pipeline maps its own id


def tokenize_docs(docs_ds, *, add_eos: bool = True,
                  text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, tokens list<int64>): hashed whitespace tokens (the
    shared dedup tokenizer — tokenizer-agnostic: any int64 id scheme
    with the same counts works) plus the EOS sentinel per doc."""
    from .dedup import _token_hashes_batch

    def fn(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "tokens": pa.array([], pa.list_(pa.int64()))})
        if len(t) == 0 or id_col not in t.column_names:
            return empty
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = [str(x) for x in t[text_col].to_pylist()]
        th, offs = _token_hashes_batch(texts)
        th = th.view(np.int64)
        n = len(texts)
        lens = np.diff(offs)
        if add_eos:
            # splice one EOS after each doc's run (vectorized: token
            # at flat position p of doc i lands at p + i)
            total = int(lens.sum()) + n
            vals = np.empty(total, np.int64)
            new_offs = offs + np.arange(n + 1, dtype=np.int64)
            didx_tok = np.repeat(np.arange(n, dtype=np.int64), lens)
            vals[np.arange(len(th), dtype=np.int64) + didx_tok] = th
            vals[new_offs[1:] - 1] = EOS_TOKEN
            th, offs = vals, new_offs
        arr = pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                       pa.array(th, pa.int64()))
        return pa.table({id_col: ids, "tokens": arr})

    return docs_ds.map_batches(fn, batch_format="pyarrow")


def materialize_packed_sequences(docs_ds, spans_ds, *, seq_len: int,
                                 add_eos: bool = True,
                                 text_col: str = "text",
                                 id_col: str = "doc_id"):
    """Assemble the actual packed training sequences:
    (seq_id, tokens list<int64> of exactly seq_len) from a span
    assignment (`pack_token_sequences` output) plus the documents.

    Two bucketed shuffles: attach each span's doc token list by
    doc_id, slice map-side (only span-sized token runs survive), then
    group by seq_id and concatenate in seq_start order."""
    from .join import bucketed_attach_column, bucketed_group_apply

    # materialize: bucketed_attach_column peeks schema() (an execution
    # of a lazy upstream) and then executes again for the join
    toks = tokenize_docs(docs_ds, add_eos=add_eos, text_col=text_col,
                         id_col=id_col).materialize()
    # pack_token_sequences ends in a pandas map_groups; re-block to
    # Arrow so the attach join sees an Arrow schema
    spans_arrow = spans_ds.map_batches(lambda t: t,
                                       batch_format="pyarrow") \
        .materialize()
    nb = _size_buckets(spans_arrow.count())
    spans = bucketed_attach_column(spans_arrow, "doc_id", toks, id_col,
                                   "tokens", num_buckets=nb)

    def slice_spans(t: pa.Table) -> pa.Table:
        empty = pa.table({"seq_id": pa.array([], pa.int64()),
                          "seq_start": pa.array([], pa.int64()),
                          "piece": pa.array([], pa.list_(pa.int64()))})
        if len(t) == 0:
            return empty
        col = t["tokens"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vals = col.values.to_numpy(zero_copy_only=False)
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        ds_ = t["doc_start"].to_numpy(zero_copy_only=False)
        ns = t["n_span"].to_numpy(zero_copy_only=False)
        starts = offs[:-1] + ds_
        # vectorized ragged gather: one index run per span
        cum = np.concatenate(([0], np.cumsum(ns)))
        idx = np.repeat(starts - cum[:-1], ns) \
            + np.arange(int(cum[-1]), dtype=np.int64)
        out = pa.ListArray.from_arrays(
            pa.array(cum, pa.int32()), pa.array(vals[idx], pa.int64()))
        return pa.table({"seq_id": t["seq_id"],
                         "seq_start": t["seq_start"],
                         "piece": out})

    sliced = spans.map_batches(slice_spans, batch_format="pyarrow")

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"seq_id": pd.Series(dtype=np.int64),
                              "tokens": pd.Series(dtype=object)})
        if len(g) == 0:
            return empty
        g = g.sort_values(["seq_id", "seq_start"], kind="mergesort")
        seqs, toks_out = [], []
        for sid, grp in g.groupby("seq_id", sort=False):
            cat = np.concatenate([np.asarray(p, np.int64)
                                  for p in grp["piece"]])
            seqs.append(int(sid))
            toks_out.append(cat)
        return pd.DataFrame({"seq_id": np.array(seqs, np.int64),
                             "tokens": pd.Series(toks_out, dtype=object)})

    return bucketed_group_apply(sliced, "seq_id", assemble,
                                num_buckets=nb)

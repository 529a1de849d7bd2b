"""Distributed NMF topic modeling (Lee & Seung 2001 multiplicative
updates) over hashed bag-of-words features — the unsupervised
domain-discovery pass of corpus assembly: factor the docs x vocab
count matrix X ~= W H (W: doc-topic, H: topic-term), read per-doc
topic mixtures off W to design mixture rates / stratified splits,
and inspect H's top hashed terms per topic.

Ray-Data shape (ZERO shuffles):
- featurize once: tokens hash into `v_dim` slots via the shared
  tokenizer (`dedup._token_hashes_batch`, one blake2b per UNIQUE
  batch token); docs become slim (id, idxs, cnts) list rows.
- W lives WITH the doc rows (a list<float64> column, one row per
  doc); H (k x v_dim, ~2 MB at defaults) is `ray.put` once per
  iteration.
- per iteration: pass A updates W map-side (X H^T via one flat
  gather + per-doc scatter-add; H H^T is k x k, computed per task);
  pass B re-reads only (W, X) and emits ONE int64 partial blob per
  block — the exact quantized W^T X (k x v_dim) and W^T W (k x k)
  sums — merged driver-side; H's multiplicative update runs on the
  exact integer totals.

Determinism contract (repo rule): every cross-block float sum is
int64-quantized per (doc, entry) contribution BEFORE summation
(scale 2**quant_bits), so W and H are BIT-IDENTICAL under any
partitioning and equal to a single-process numpy replay of the same
documented rule (both pinned in tests/test_nmf.py). Guards: partial
magnitudes past 2**62 RAISE (quantization overflow); v_dim * k
partial rows are driver-merged, capped by `max_partial_bytes`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .dedup import _token_hashes_batch
from .wsample import uniform_hash

_EPS = 1e-12


def featurize_docs(ds, *, text_col: str = "text",
                   id_col: str = "doc_id", v_dim: int = 1 << 14):
    """-> Dataset (id, idxs list<int64>, cnts list<float64>): hashed
    unigram counts per doc (unique slots, ascending)."""
    def feat(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "id": pa.array([], pa.int64()),
            "idxs": pa.array([], pa.list_(pa.int64())),
            "cnts": pa.array([], pa.list_(pa.float64()))})
        if t.num_rows == 0 or text_col not in t.column_names:
            return empty
        texts = [x if x is not None else ""
                 for x in t[text_col].to_pylist()]
        th, offs = _token_hashes_batch(texts)
        slots = (th % np.uint64(v_dim)).astype(np.int64)
        doc = np.repeat(np.arange(len(texts), dtype=np.int64),
                        np.diff(offs))
        # unique (doc, slot) with counts, ascending slot within doc
        key = doc * np.int64(v_dim) + slots
        uk, cnt = np.unique(key, return_counts=True)
        udoc = uk // v_dim
        uslot = uk % v_dim
        doc_lens = np.bincount(udoc, minlength=len(texts)) \
            .astype(np.int64)
        off2 = np.concatenate(([0], np.cumsum(doc_lens)))
        return pa.table({
            "id": pa.array(t[id_col].to_numpy(zero_copy_only=False)
                           .astype(np.int64)),
            "idxs": pa.ListArray.from_arrays(
                pa.array(off2, pa.int32()), pa.array(uslot)),
            "cnts": pa.ListArray.from_arrays(
                pa.array(off2, pa.int32()),
                pa.array(cnt.astype(np.float64)))})

    return ds.map_batches(feat, batch_format="pyarrow")


def _flat(t: pa.Table):
    """doc rows -> (ids, flat_idx, flat_cnt, flat_doc, m)."""
    ids = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    la = t["idxs"].combine_chunks()
    ca = t["cnts"].combine_chunks()
    flat_idx = la.flatten().to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    flat_cnt = ca.flatten().to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    offs = la.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offs)
    flat_doc = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
    return ids, flat_idx, flat_cnt, flat_doc, len(ids)


def _w_init(ids: np.ndarray, k: int, seed: int) -> np.ndarray:
    """(m, k) in [0.1, 1.1): splitmix64 of (id, component, seed)."""
    return np.stack(
        [0.1 + uniform_hash(ids, seed * 1_000_003 + j + 1)
         for j in range(k)], axis=1)


def _h_init(k: int, v_dim: int, seed: int) -> np.ndarray:
    cols = np.arange(v_dim, dtype=np.int64)
    return np.stack(
        [0.1 + uniform_hash(cols, seed * 2_000_003 + j + 1)
         for j in range(k)], axis=0)


def _w_table(t: pa.Table, w: np.ndarray) -> pa.Table:
    m, k = w.shape
    off = pa.array(np.arange(m + 1, dtype=np.int64) * k, pa.int32())
    wcol = pa.ListArray.from_arrays(off, pa.array(w.ravel()))
    if "w" in t.column_names:
        return t.set_column(t.schema.get_field_index("w"), "w", wcol)
    return t.append_column("w", wcol)


def _w_matrix(t: pa.Table, k: int) -> np.ndarray:
    wa = t["w"].combine_chunks()
    return wa.flatten().to_numpy(zero_copy_only=False) \
        .astype(np.float64).reshape(-1, k)


def nmf_fit(docs_ds, *, text_col: str = "text",
            id_col: str = "doc_id", k: int = 8,
            v_dim: int = 1 << 14, n_iter: int = 15, seed: int = 0,
            quant_bits: int = 24,
            max_partial_bytes: int = 256 << 20):
    """-> (doc_topics Dataset (id, topic:int64, w list<float64>),
    H (k, v_dim) float64 ndarray).

    Bit-deterministic under any partitioning (module docstring).
    `topic` = argmax of the doc's W row, lowest index on ties."""
    if k <= 0 or n_iter < 0:
        raise ValueError("k must be >= 1, n_iter >= 0")
    if (v_dim * k + k * k) * 8 > max_partial_bytes:
        raise ValueError(
            f"v_dim*k partial matrix exceeds max_partial_bytes="
            f"{max_partial_bytes}; lower v_dim/k or raise the cap")
    S = np.float64(1 << quant_bits)

    docs = featurize_docs(docs_ds, text_col=text_col, id_col=id_col,
                          v_dim=v_dim)
    docs = docs.map_batches(
        lambda t: _w_table(t, _w_init(
            t["id"].to_numpy(zero_copy_only=False).astype(np.int64),
            k, seed))
        if t.num_rows else _w_table(t, np.zeros((0, k))),
        batch_format="pyarrow").materialize()
    h = _h_init(k, v_dim, seed)

    for _ in range(n_iter):
        href = ray.put(h)

        def update_w(t: pa.Table, _href=href) -> pa.Table:
            if t.num_rows == 0:
                return t
            hh = ray.get(_href)
            ids, fi, fc, fd, m = _flat(t)
            w = _w_matrix(t, k)
            # X H^T: gather H columns at every nonzero, scatter-add
            # per doc (np.add.at handles empty docs exactly)
            contrib = hh[:, fi] * fc           # (k, nnz)
            xht = np.zeros((m, k), np.float64)
            np.add.at(xht, fd, contrib.T)
            hht = hh @ hh.T                    # (k, k)
            w_new = w * xht / (w @ hht + _EPS)
            return _w_table(t, w_new)

        docs = docs.map_batches(update_w,
                                batch_format="pyarrow").materialize()

        def partial(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"blob": pa.array([], pa.binary())})
            ids, fi, fc, fd, m = _flat(t)
            w = _w_matrix(t, k)
            # exact quantized W^T X: per-nonzero contribution
            # round(w[d, j] * x / S) summed in int64
            wtx = np.zeros((k, v_dim), np.int64)
            q = np.round(w[fd] * fc[:, None] * S).astype(np.int64)
            np.add.at(wtx.T, fi, q)            # (v_dim, k) view
            # exact quantized W^T W: per-doc outer products
            p = np.round(w[:, :, None] * w[:, None, :] * S) \
                .astype(np.int64)
            wtw = p.sum(axis=0)
            return pa.table({"blob": pa.array(
                [wtx.tobytes() + wtw.tobytes()], pa.binary())})

        wtx = np.zeros((k, v_dim), np.int64)
        wtw = np.zeros((k, k), np.int64)
        for b in docs.map_batches(
                partial, batch_format="pyarrow",
                batch_size=4096).iter_batches(batch_format="pyarrow"):
            for blob in b["blob"].to_pylist():
                arr = np.frombuffer(blob, np.int64)
                wtx += arr[:k * v_dim].reshape(k, v_dim)
                wtw += arr[k * v_dim:].reshape(k, k)
        if max(np.abs(wtx).max(initial=0),
               np.abs(wtw).max(initial=0)) > (1 << 62):
            raise RuntimeError(
                "nmf: quantized partial sums approach the int64 "
                "bound — lower quant_bits or shard the corpus")
        h = h * (wtx / S) / ((wtw / S) @ h + _EPS)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "id": pa.array([], pa.int64()),
                "topic": pa.array([], pa.int64()),
                "w": pa.array([], pa.list_(pa.float64()))})
        w = _w_matrix(t, k)
        return pa.table({
            "id": t["id"],
            "topic": pa.array(np.argmax(w, axis=1)
                              .astype(np.int64)),
            "w": t["w"]})

    return docs.map_batches(finish, batch_format="pyarrow"), h


def topic_top_terms(h: np.ndarray, top: int = 10) -> np.ndarray:
    """(k, v_dim) -> (k, top) hashed-slot ids, weight-descending
    (slot-ascending on ties — deterministic)."""
    order = np.argsort(-h, axis=1, kind="stable")  # ties: slot asc
    return order[:, :top].astype(np.int64)

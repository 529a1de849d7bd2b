"""Two-table embedding top-k join (kNN join) + hard-negative mining.

`knn_brute`/`knn_ivf` (stages/knn.py) answer a BOUNDED driver-side
query set against one corpus. This module joins two unbounded
Datasets: for every row of A (the anchors), the top-k cosine
neighbors among the rows of B (the index side) — the shape behind
cross-modal retrieval joins (captions x images), contrastive-pair
mining, and nearest-prototype labeling at corpus scale.

Two engines, auto-selected on B's row count:

- broadcast: B materialized once behind `max_broadcast_rows`
  (RAISES past it), `ray.put` once, then ONE map pass over A —
  exact, zero shuffles, partition-invariant trivially (each A batch
  sees all of B). B is scored in COLUMN CHUNKS with a running
  per-anchor top-k, so peak memory is O(n_a * chunk), never
  O(n_a * |B|).
- ivf: the 100-TB shape. Deterministic sampled-Lloyd centroids from
  B (`knn.deterministic_centroids`), B assigned to its nearest cell
  (one map pass), A replicated to its `nprobe` nearest cells (one
  map pass), ONE cell-bucket shuffle co-locates both sides, each
  bucket scores its cells' A x B blocks exactly, then ONE a-bucket
  fold merges per-anchor partials to the global top-k. Approximate
  by design (recall pinned >= 0.9 vs broadcast on clustered data in
  tests); both sides' vectors ride exactly one shuffle each.

Determinism: every truncation point uses ONE integer sort key —
round(sim, round_to) as an exact int, ties to the SMALLER b_id (the
knn.py total order) — so results are bit-identical under any
partitioning and chunking. The whole kernel is vectorized across
anchors (argpartition + take_along_axis); no per-row Python loop.

Hard negatives (`mode="cross_label"`): same-label pairs are masked
INSIDE the scoring kernels (exact — not a post-filter that could
under-deliver k), yielding each anchor's k nearest OTHER-label rows,
the standard contrastive hard-negative set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from .knn import _normalize, deterministic_centroids


_EMPTY = pa.table({"a_id": pa.array([], pa.int64()),
                   "b_id": pa.array([], pa.int64()),
                   "sim": pa.array([], pa.float64())})
_SENT = np.int64(np.iinfo(np.int64).min)


def _batch_vecs(df: pd.DataFrame, id_col: str, emb_col: str):
    ids = df[id_col].to_numpy().astype(np.int64)
    vecs = _normalize(np.stack(df[emb_col].to_numpy()).astype(np.float64))
    return ids, vecs


def _chunk_keys(sims: np.ndarray, pos: np.ndarray, stride: np.int64,
                round_to: int) -> np.ndarray:
    """(n_a, m) sims -> int64 sort keys: rounded-sim major (desc =
    larger key), GLOBAL b-position minor (asc wins). Exact: cosines
    lie in [-1, 1] so the rounded int has <= round_to+1 digits."""
    r_int = np.rint(np.round(sims, round_to)
                    * (10.0 ** round_to)).astype(np.int64)
    return r_int * stride + (stride - 1 - pos[None, :])


def _row_topk(keys: np.ndarray, cols: np.ndarray, k: int):
    """Per-row top-k of (keys desc) -> (sel_keys, sel_cols), both
    (n_a, k), SENT-padded. `cols` carries each column's global
    B position; fully vectorized."""
    n_a, m = keys.shape
    # NOTE: never sort on -keys — negating the int64-min SENT
    # overflows to itself and masked entries would win every
    # descending sort. Keys are distinct (position minor term), so
    # ascending argsort reversed IS the exact descending order.
    if m > k:
        idx = np.argpartition(keys, m - k, axis=1)[:, m - k:]
    else:
        idx = np.broadcast_to(np.arange(m), (n_a, m)).copy()
        if m < k:
            pad = np.zeros((n_a, k - m), np.intp)
            idx = np.concatenate([idx, pad], axis=1)
    sel = np.take_along_axis(keys, idx, axis=1)
    if m < k:  # padded duplicate columns must not survive
        sel[:, m:] = _SENT
    order = np.argsort(sel, axis=1, kind="stable")[:, ::-1]
    sel = np.take_along_axis(sel, order, axis=1)
    sel_cols = np.take_along_axis(
        np.broadcast_to(cols, (n_a, len(cols))) if cols.ndim == 1
        else cols, np.take_along_axis(idx, order, axis=1), axis=1)
    return sel, sel_cols


def _score_block(a_ids, a_lab, a_vecs, b_ids, b_lab, b_mat_t, k,
                 round_to, exclude_same_id, mode,
                 chunk_cols: int = 65536):
    """Exact per-anchor top-k of A x B, column-chunked. b_ids MUST be
    ascending (makes position tie-break == b_id tie-break).
    -> (a_idx, b_pos, r_int) flat arrays or None."""
    n_a, n_b = len(a_ids), len(b_ids)
    if n_a == 0 or n_b == 0:
        return None
    stride = np.int64(n_b + 1)
    if int(stride) * (10 ** round_to) >= (1 << 62):
        raise ValueError("knn_join: n_b * 10**round_to overflows the "
                         "int64 sort key; lower round_to or chunk B")
    run_keys = np.full((n_a, k), _SENT, np.int64)
    run_cols = np.zeros((n_a, k), np.int64)
    for lo in range(0, n_b, chunk_cols):
        hi = min(lo + chunk_cols, n_b)
        sims = a_vecs @ b_mat_t[:, lo:hi]
        pos = np.arange(lo, hi, dtype=np.int64)
        keys = _chunk_keys(sims, pos, stride, round_to)
        if exclude_same_id:
            keys[b_ids[None, lo:hi] == a_ids[:, None]] = _SENT
        if mode == "cross_label":
            keys[b_lab[None, lo:hi] == a_lab[:, None]] = _SENT
        ck, cc = _row_topk(keys, pos, k)
        merged = np.concatenate([run_keys, ck], axis=1)
        mcols = np.concatenate([run_cols, cc], axis=1)
        order = np.argsort(merged, axis=1,
                           kind="stable")[:, ::-1][:, :k]
        run_keys = np.take_along_axis(merged, order, axis=1)
        run_cols = np.take_along_axis(mcols, order, axis=1)
    valid = run_keys != _SENT
    if not valid.any():
        return None
    a_idx = np.repeat(np.arange(n_a), k)[valid.ravel()]
    b_pos = run_cols.ravel()[valid.ravel()]
    r_int = ((run_keys.ravel()[valid.ravel()]
              - (stride - 1 - b_pos)) // stride)
    return a_idx, b_pos, r_int


def _result_table(a_ids, a_idx, b_ids, b_pos, r_int, round_to):
    return pa.table({
        "a_id": a_ids[a_idx],
        "b_id": b_ids[b_pos],
        "sim": r_int.astype(np.float64) / (10.0 ** round_to)})


def _collect_b(b_ds, id_col, emb_col, label_col, max_broadcast_rows):
    rows_ids, rows_vec, rows_lab = [], [], []
    total = 0
    for t in b_ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        if t.num_rows == 0:
            continue
        total += t.num_rows
        if total > max_broadcast_rows:
            raise RuntimeError(
                f"knn_join: B side exceeds max_broadcast_rows="
                f"{max_broadcast_rows}; use engine='ivf' (the scale "
                "path) or raise the cap")
        rows_ids.append(t[id_col].to_numpy(zero_copy_only=False)
                        .astype(np.int64))
        rows_vec.append(np.stack(
            t[emb_col].to_pylist()).astype(np.float64))
        if label_col is not None:
            rows_lab.append(t[label_col].to_numpy(zero_copy_only=False)
                            .astype(np.int64))
    if not rows_ids:
        return (np.zeros(0, np.int64), np.zeros((0, 1), np.float64),
                np.zeros(0, np.int64))
    ids = np.concatenate(rows_ids)
    mat = _normalize(np.concatenate(rows_vec))
    lab = np.concatenate(rows_lab) if rows_lab \
        else np.zeros(len(ids), np.int64)
    order = np.argsort(ids, kind="stable")  # id-sorted: partition-proof
    return ids[order], mat[order], lab[order]


def knn_join_broadcast(a_ds, b_ds, *, k: int = 5,
                       id_col: str = "vec_id",
                       emb_col: str = "embedding",
                       label_col: str | None = None,
                       mode: str = "any",
                       exclude_same_id: bool = True,
                       round_to: int = 6,
                       max_broadcast_rows: int = 2_000_000,
                       chunk_cols: int = 65536):
    """Exact kNN join, B broadcast. -> Dataset (a_id, b_id, sim)."""
    if mode not in ("any", "cross_label"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "cross_label" and label_col is None:
        raise ValueError("mode='cross_label' needs label_col")
    b_ids, b_mat, b_lab = _collect_b(
        b_ds, id_col, emb_col, label_col, max_broadcast_rows)
    ref = ray.put((b_ids, b_mat.T.copy(), b_lab))

    def score(df: pd.DataFrame) -> pa.Table:
        ids_b, mat_t, lab_b = ray.get(ref)
        if len(df) == 0 or len(ids_b) == 0:
            return _EMPTY
        a_ids, a_vecs = _batch_vecs(df, id_col, emb_col)
        a_lab = (df[label_col].to_numpy().astype(np.int64)
                 if label_col is not None
                 else np.zeros(len(a_ids), np.int64))
        res = _score_block(a_ids, a_lab, a_vecs, ids_b, lab_b, mat_t,
                           k, round_to, exclude_same_id, mode,
                           chunk_cols=chunk_cols)
        if res is None:
            return _EMPTY
        return _result_table(a_ids, res[0], ids_b, res[1], res[2],
                             round_to)

    return a_ds.map_batches(score, batch_format="pandas")


def _side_empty() -> pa.Table:
    return pa.table({"cell": pa.array([], pa.int64()),
                     "side": pa.array([], pa.int8()),
                     "rid": pa.array([], pa.int64()),
                     "lab": pa.array([], pa.int64()),
                     "vec": pa.array([], pa.list_(pa.float64()))})


def knn_join_ivf(a_ds, b_ds, *, k: int = 5, n_centroids: int = 16,
                 nprobe: int = 4, id_col: str = "vec_id",
                 emb_col: str = "embedding",
                 label_col: str | None = None, mode: str = "any",
                 exclude_same_id: bool = True, round_to: int = 6,
                 num_buckets: int | None = None):
    """IVF-bucketed kNN join — the scale path. -> Dataset
    (a_id, b_id, sim), per-anchor recall < 1 by design."""
    from .join import bucketed_group_apply, default_bucket_count
    if mode not in ("any", "cross_label"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "cross_label" and label_col is None:
        raise ValueError("mode='cross_label' needs label_col")
    if num_buckets is None:
        num_buckets = default_bucket_count()
    cents = deterministic_centroids(b_ds, n_centroids)
    cref = ray.put(cents.T.copy())
    nprobe = min(nprobe, len(cents))
    use_label = label_col is not None

    def tag_b(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return _side_empty()
        ids, vecs = _batch_vecs(df, id_col, emb_col)
        cell = (vecs @ ray.get(cref)).argmax(axis=1).astype(np.int64)
        lab = (df[label_col].to_numpy().astype(np.int64) if use_label
               else np.zeros(len(ids), np.int64))
        return pa.table({"cell": cell,
                         "side": np.zeros(len(ids), np.int8),
                         "rid": ids, "lab": lab,
                         "vec": [v for v in vecs]})

    def tag_a(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return _side_empty()
        ids, vecs = _batch_vecs(df, id_col, emb_col)
        cells = np.argsort(-(vecs @ ray.get(cref)),
                           axis=1)[:, :nprobe].astype(np.int64)
        rep = np.repeat(np.arange(len(ids)), nprobe)
        return pa.table({
            "cell": cells.ravel(),
            "side": np.ones(len(rep), np.int8),
            "rid": ids[rep],
            "lab": (df[label_col].to_numpy().astype(np.int64)[rep]
                    if use_label else np.zeros(len(rep), np.int64)),
            "vec": [v for v in vecs[rep]]})

    both = b_ds.map_batches(tag_b, batch_format="pandas").union(
        a_ds.map_batches(tag_a, batch_format="pandas"))

    def score_bucket(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return _EMPTY
        parts = []
        for _, cg in g.groupby("cell", sort=True):
            bsel = cg["side"].to_numpy() == 0
            if not bsel.any() or bsel.all():
                continue
            b_ids = cg["rid"].to_numpy()[bsel].astype(np.int64)
            b_lab = cg["lab"].to_numpy()[bsel].astype(np.int64)
            b_mat = np.stack(cg["vec"].to_numpy()[bsel])
            # id-sort B: scoring order never depends on shuffle
            # arrival order
            o = np.argsort(b_ids, kind="stable")
            b_ids, b_lab, b_mat = b_ids[o], b_lab[o], b_mat[o]
            a_ids = cg["rid"].to_numpy()[~bsel].astype(np.int64)
            a_lab = cg["lab"].to_numpy()[~bsel].astype(np.int64)
            a_mat = np.stack(cg["vec"].to_numpy()[~bsel])
            res = _score_block(a_ids, a_lab, a_mat, b_ids, b_lab,
                               b_mat.T, k, round_to, exclude_same_id,
                               mode)
            if res is not None:
                parts.append(_result_table(a_ids, res[0], b_ids,
                                           res[1], res[2], round_to))
        return pa.concat_tables(parts) if parts else _EMPTY

    partial = bucketed_group_apply(both, "cell", score_bucket,
                                   num_buckets=num_buckets)

    def merge_bucket(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return _EMPTY
        # a (a,b) pair can arrive from up to nprobe probed cells with
        # identical rounded sims — dedup before the top-k cut; then
        # one lexsort over the whole bucket, reduceat-free per-anchor
        # head-k via cumcount
        g = g.drop_duplicates(["a_id", "b_id"])
        a = g["a_id"].to_numpy().astype(np.int64)
        b = g["b_id"].to_numpy().astype(np.int64)
        s = np.round(g["sim"].to_numpy(), round_to)
        order = np.lexsort((b, -s, a))
        a, b, s = a[order], b[order], s[order]
        new = np.concatenate(([True], a[1:] != a[:-1]))
        starts = np.flatnonzero(new)
        rank = np.arange(len(a)) - np.repeat(starts, np.diff(
            np.concatenate((starts, [len(a)]))))
        keep = rank < k
        return pa.table({"a_id": a[keep], "b_id": b[keep],
                         "sim": s[keep]})

    return bucketed_group_apply(partial, "a_id", merge_bucket,
                                num_buckets=num_buckets)


def knn_join(a_ds, b_ds, *, k: int = 5, engine: str = "auto",
             max_broadcast_rows: int = 2_000_000, **kw):
    """Auto-select: broadcast while B fits the cap, else IVF."""
    if engine not in ("auto", "broadcast", "ivf"):
        raise ValueError(f"unknown engine {engine!r}")
    if engine == "broadcast":
        return knn_join_broadcast(a_ds, b_ds, k=k,
                                  max_broadcast_rows=max_broadcast_rows,
                                  **kw)
    if engine == "ivf":
        return knn_join_ivf(a_ds, b_ds, k=k, **kw)
    if b_ds.count() <= max_broadcast_rows:
        return knn_join_broadcast(a_ds, b_ds, k=k,
                                  max_broadcast_rows=max_broadcast_rows,
                                  **kw)
    return knn_join_ivf(a_ds, b_ds, k=k, **kw)


def hard_negatives(emb_ds, *, k: int = 5, label_col: str = "label",
                   engine: str = "auto", **kw):
    """Each row's k nearest OTHER-label rows (contrastive hard
    negatives) — the self-join special case of the cross-label kNN
    join. -> Dataset (a_id, b_id, sim)."""
    return knn_join(emb_ds, emb_ds, k=k, engine=engine,
                    label_col=label_col, mode="cross_label",
                    exclude_same_id=True, **kw)

"""Model-based quality scoring: a hashed bag-of-tokens linear
classifier trained AND served distributed.

The fasttext-style quality filter of the public CCNet / FineWeb-Edu
writeups, re-expressed Ray-Data-first:

- **Features** — hashed bag of tokens (`_token_hashes_batch` from the
  dedup family: one blake2b per UNIQUE batch token), bucketed to a
  fixed dim by `hash % dim`, plus a bias slot. The same featurizer is
  used for training and serving, so train/serve skew is impossible.
- **Training** — full-batch logistic regression by distributed
  gradient descent. Each epoch broadcasts the weight vector once
  (`ray.put`), every `map_batches` task emits ONE slim gradient row
  (int64-quantized, `GRAD_SCALE`), and the driver reduces exact
  integer sums. Integer summation is order-independent, so the fitted
  weights are bit-deterministic regardless of partitioning or task
  scheduling order (the repo-wide int64-quantize-before-sum rule).
  Per-epoch shuffle cost: ZERO — only (dim+2) int64s per task move.
- **Serving** — `LinearScorer`, a stateful actor-pool stage: weights
  are rehydrated zero-copy from the object store once per actor in
  `__init__` (the model-load pattern), scoring is a segment-sum
  matmul per batch.

At 100 TB: the corpus streams through both phases; the only driver
state is the (dim+1)-float weight vector and the per-task gradient
rows (32 KB each at the default dim), far below any materialization
threshold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .dedup import _token_hashes_batch

GRAD_SCALE = float(1 << 20)  # int64 quantization for exact gradient sums


def _featurize(texts, dim: int):
    """Batch -> CSR-ish (doc_idx, feat_idx, count) triples.

    Token hashes come from the shared dedup tokenizer (one blake2b per
    unique token); per-doc duplicate features collapse to counts via
    one lexsort over packed (doc, feat) keys — no per-doc Python."""
    th, offs = _token_hashes_batch(texts)
    n = len(texts)
    if len(th) == 0:
        return (np.array([], np.int64), np.array([], np.int64),
                np.array([], np.float64), np.zeros(n, np.int64))
    feat = (th % np.uint64(dim)).astype(np.int64)
    didx = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
    packed = (didx << np.int64(32)) | feat
    upacked, cnt = np.unique(packed, return_counts=True)
    u_doc = (upacked >> np.int64(32)).astype(np.int64)
    u_feat = (upacked & np.int64(0xFFFFFFFF)).astype(np.int64)
    n_tok = np.diff(offs)
    # log-scaled counts, l2-normalized per doc: standard linear-text
    # featurization, keeps long docs from dominating the gradient
    val = np.log1p(cnt.astype(np.float64))
    sq = np.zeros(n, np.float64)
    np.add.at(sq, u_doc, val * val)
    norm = np.sqrt(np.maximum(sq, 1e-12))
    val = val / norm[u_doc]
    return u_doc, u_feat, val, n_tok


def _scores_from_triples(u_doc, u_feat, val, n, w):
    """z = X w + b via segment sum (one np.add.at per batch)."""
    z = np.full(n, w[-1], np.float64)  # bias slot = last weight
    if len(u_doc):
        np.add.at(z, u_doc, val * w[u_feat])
    return z


def fit_linear_classifier(labeled_ds, *, dim: int = 4096,
                          epochs: int = 30, lr: float = 2.0,
                          l2: float = 1e-4,
                          text_col: str = "text",
                          label_col: str = "label"):
    """Distributed logistic regression over (text, label∈{0,1}) rows.

    Returns (weights: float64[dim+1] (last = bias), report dict).
    Deterministic: per-task gradients are int64-quantized before the
    exact integer reduce, so weights are independent of partitioning
    and scheduling order."""
    n_total = labeled_ds.count()
    if n_total == 0:
        raise ValueError("empty training set")
    w = np.zeros(dim + 1, np.float64)
    losses = []
    for _ep in range(epochs):
        ref = ray.put(w)

        def grad_batch(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "grad": pa.array([], pa.large_list(pa.int64())),
                "loss_q": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())})
            if len(t) == 0 or text_col not in t.column_names:
                return empty
            wv = ray.get(ref)  # zero-copy plasma view
            texts = [str(x) for x in t[text_col].to_pylist()]
            y = t[label_col].to_numpy(zero_copy_only=False)
            y = y.astype(np.float64)
            u_doc, u_feat, val, _ = _featurize(texts, dim)
            z = _scores_from_triples(u_doc, u_feat, val, len(texts), wv)
            p = 1.0 / (1.0 + np.exp(-z))
            err = p - y
            # quantize per TRIPLE / per DOC before the integer sums:
            # every contribution depends only on (doc text, weights),
            # never on which batch the doc landed in — so the epoch's
            # total gradient is bit-identical under any partitioning.
            gq = np.zeros(dim + 1, np.int64)
            if len(u_doc):
                tq = np.round(val * err[u_doc] * GRAD_SCALE)
                np.add.at(gq, u_feat, tq.astype(np.int64))
            gq[-1] = np.round(err * GRAD_SCALE).astype(np.int64).sum()
            # clipped log-loss for the report (same per-doc quantize)
            eps = 1e-12
            loss_q_arr = np.round(
                -(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps))
                * GRAD_SCALE).astype(np.int64)
            return pa.table({
                "grad": pa.array([gq], pa.large_list(pa.int64())),
                "loss_q": pa.array([int(loss_q_arr.sum())], pa.int64()),
                "n": pa.array([len(texts)], pa.int64())})

        grads = labeled_ds.map_batches(grad_batch, batch_format="pyarrow")
        g_sum = np.zeros(dim + 1, np.int64)
        loss_q = 0
        n_seen = 0
        for b in grads.iter_batches(batch_size=None,
                                    batch_format="pyarrow"):
            for i in range(b.num_rows):
                g_sum += np.asarray(b["grad"][i].as_py(), np.int64)
            loss_q += int(pa.compute.sum(b["loss_q"]).as_py() or 0)
            n_seen += int(pa.compute.sum(b["n"]).as_py() or 0)
        g = g_sum.astype(np.float64) / GRAD_SCALE / max(n_seen, 1)
        w = w - lr * (g + l2 * w)
        losses.append(loss_q / GRAD_SCALE / max(n_seen, 1))
    report = {"dim": dim, "epochs": epochs, "lr": lr, "l2": l2,
              "n_rows": int(n_total), "loss_first": losses[0],
              "loss_last": losses[-1]}
    return w, report


class LinearScorer:
    """Actor-pool scoring stage: weights hydrate once per actor."""

    def __init__(self, weights_ref, dim: int, text_col: str = "text",
                 id_col: str = "doc_id"):
        self.w = ray.get(weights_ref)   # zero-copy numpy plasma view
        self.dim = dim
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        empty = pa.table({self.id_col: pa.array([], pa.int64()),
                          "score": pa.array([], pa.float64())})
        if len(t) == 0 or self.text_col not in t.column_names:
            return empty
        texts = [str(x) for x in t[self.text_col].to_pylist()]
        u_doc, u_feat, val, _ = _featurize(texts, self.dim)
        z = _scores_from_triples(u_doc, u_feat, val, len(texts), self.w)
        p = 1.0 / (1.0 + np.exp(-z))
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        return pa.table({self.id_col: ids.astype(np.int64),
                         "score": np.round(p, 9)})


def score_quality(docs_ds, weights: np.ndarray, *, dim: int | None = None,
                  text_col: str = "text", id_col: str = "doc_id",
                  concurrency=None):
    """Score every document with a fitted classifier; returns a
    streamed (id, score) Dataset. `round(,9)` pins cross-run float
    determinism at the output boundary."""
    from .pip import default_pool_size
    if dim is None:
        dim = len(weights) - 1
    if concurrency is None:
        concurrency = default_pool_size()
    ref = ray.put(np.asarray(weights, np.float64))
    return docs_ds.map_batches(
        LinearScorer,
        fn_constructor_kwargs={"weights_ref": ref, "dim": dim,
                               "text_col": text_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=concurrency)


def quality_filter(docs_ds, weights: np.ndarray, *,
                   min_score: float = 0.5, id_col: str = "doc_id",
                   **kw):
    """Keep documents the classifier scores >= min_score (broadcast
    kept-id semi-join, same discipline as decontaminate)."""
    import pyarrow.compute as pc

    from .join import broadcast_is_in
    scores = score_quality(docs_ds, weights, id_col=id_col, **kw)
    bad = scores.map_batches(
        lambda t: t.filter(pc.less(t["score"], min_score))
        .select([id_col]) if len(t)
        else pa.table({id_col: pa.array([], pa.int64())}),
        batch_format="pyarrow")
    bad_l = [b[id_col].to_numpy(zero_copy_only=False)
             for b in bad.iter_batches(batch_size=None,
                                       batch_format="pyarrow")
             if b.num_rows]
    bad_ids = np.concatenate(bad_l).astype(np.int64) \
        if bad_l else np.array([], np.int64)
    kept = broadcast_is_in(docs_ds, id_col, bad_ids, mode="anti") \
        if len(bad_ids) else docs_ds
    return kept, {"n_dropped": int(len(bad_ids)),
                  "min_score": min_score}

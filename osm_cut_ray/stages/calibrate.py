"""Per-key isotonic regression (PAVA — pool adjacent violators,
Ayer et al. 1955; Barlow & Brunk 1972) and score calibration — the
classic monotone calibration pass for classifier scores (quality
classifiers, dedup verifiers, CLIP filters) before thresholding.

Semantics (pinned by the brute minimax-identity test): within each
key, rows are sorted by score; equal scores are pre-pooled
(weighted mean label, summed weight — vectorized); PAVA then merges
adjacent violating pools left-to-right. The fitted curve is the
unique L2 projection onto monotone non-decreasing sequences, equal to
the classical minimax identity fitted[i] = max_{j<=i} min_{k>=i}
wmean(y[j..k]) that the test replays independently.

Execution shape:
- `isotonic_fit`: one bucketed shuffle of slim (key, score, label,
  weight) rows; each key is fitted in ONE task — tie-pooling is
  vectorized, the PAVA stack walk is O(unique scores) bounded by
  `max_unique_scores` (RAISE — repo cap contract). The model is one
  row per key: pool start scores + fitted values as list columns.
  Partition-invariant by construction (whole key in one task,
  deterministic sort).
- `isotonic_apply`: the model is broadcast once (`ray.put`, capped by
  `max_model_pools`); scoring is a zero-shuffle map_batches with one
  searchsorted per (batch, key) group. Prediction is the step rule:
  value of the last pool whose start <= score (scores below the first
  pool clamp to the first value) — the standard right-continuous
  calibration step function.

Reference scope note: the reference engine has no model-calibration
ops; this pairs with stages/classify.py (quality scores) and
stages/retrieval.py (eval) as the score-postprocessing member of the
curation family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from . import join as J
from .join import bucketed_group_apply


def _pava(scores: np.ndarray, labels: np.ndarray,
          weights: np.ndarray):
    """PAVA over tie-pooled points sorted by score. Returns
    (pool_start_scores, pool_values). Tie pooling is vectorized;
    the merge walk is O(n) over unique scores."""
    order = np.argsort(scores, kind="stable")
    s, y, w = scores[order], labels[order], weights[order]
    starts = np.concatenate(
        ([0], np.flatnonzero(s[1:] != s[:-1]) + 1))
    ends = np.concatenate((starts[1:], [len(s)]))
    cw = np.concatenate(([0.0], np.cumsum(w)))
    cwy = np.concatenate(([0.0], np.cumsum(w * y)))
    pw = cw[ends] - cw[starts]
    pwy = cwy[ends] - cwy[starts]
    px = s[starts]
    # stack walk: (x, wy, w) pools; merge while last two violate
    xs: list = []
    wys: list = []
    ws: list = []
    for i in range(len(px)):
        xs.append(px[i])
        wys.append(pwy[i])
        ws.append(pw[i])
        while len(ws) >= 2 and (wys[-2] * ws[-1]
                                >= wys[-1] * ws[-2]):
            # means compared cross-multiplied (weights > 0):
            # v[-2] >= v[-1] -> merge
            wys[-2] += wys[-1]
            ws[-2] += ws[-1]
            wys.pop()
            ws.pop()
            xs.pop()
    vals = np.array(wys) / np.array(ws)
    return np.array(xs, np.float64), vals


def isotonic_fit(ds, *, key_col: str | None, score_col: str,
                 label_col: str, weight_col: str | None = None,
                 max_unique_scores: int = 100_000):
    """-> Dataset (key int64, starts list<float64>,
    values list<float64>, n_points int64). key_col=None fits one
    global curve under key 0."""
    def slim(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "key": pa.array([], pa.int64()),
            "s": pa.array([], pa.float64()),
            "y": pa.array([], pa.float64()),
            "w": pa.array([], pa.float64())})
        if len(t) == 0 or score_col not in t.column_names:
            return empty
        key = (pa.compute.cast(t[key_col], pa.int64())
               if key_col else
               pa.array(np.zeros(len(t), np.int64)))
        w = (pa.compute.cast(t[weight_col], pa.float64())
             if weight_col else
             pa.array(np.ones(len(t), np.float64)))
        return pa.table({
            "key": key,
            "s": pa.compute.cast(t[score_col], pa.float64()),
            "y": pa.compute.cast(t[label_col], pa.float64()),
            "w": w})

    rows = ds.map_batches(slim, batch_format="pyarrow")

    def fit(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({
            "key": pa.array([], pa.int64()),
            "starts": pa.array([], pa.list_(pa.float64())),
            "values": pa.array([], pa.list_(pa.float64())),
            "n_points": pa.array([], pa.int64())})
        if len(g) == 0:
            return empty
        keys_out, starts_out, vals_out, n_out = [], [], [], []
        for key, sub in g.groupby("key", sort=True):
            s = sub["s"].to_numpy(np.float64)
            y = sub["y"].to_numpy(np.float64)
            w = sub["w"].to_numpy(np.float64)
            nu = len(np.unique(s))
            if nu > max_unique_scores:
                raise RuntimeError(
                    f"key {key}: {nu} unique scores exceed "
                    f"max_unique_scores={max_unique_scores}; "
                    "quantize scores or raise the cap")
            xs, vv = _pava(s, y, w)
            keys_out.append(int(key))
            starts_out.append(xs.tolist())
            vals_out.append(vv.tolist())
            n_out.append(len(s))
        return pa.table({
            "key": pa.array(keys_out, pa.int64()),
            "starts": pa.array(starts_out, pa.list_(pa.float64())),
            "values": pa.array(vals_out, pa.list_(pa.float64())),
            "n_points": pa.array(n_out, pa.int64())})

    out, _ = J.solidify(bucketed_group_apply(rows, "key", fit))
    return out


def isotonic_apply(ds, model_ds, *, key_col: str | None,
                   score_col: str, out_col: str = "calibrated",
                   max_model_pools: int = 10_000_000):
    """Attach `out_col` = step-function calibration of `score_col`
    under the per-key isotonic model. Zero shuffles: the model is
    broadcast once. Rows whose key has no model get NaN."""
    tbls = [pa.table(b) for b in model_ds.iter_batches(
        batch_format="pyarrow")]
    model: dict = {}
    n_pools = 0
    for t in tbls:
        for k, xs, vv in zip(t["key"].to_pylist(),
                             t["starts"].to_pylist(),
                             t["values"].to_pylist()):
            model[int(k)] = (np.asarray(xs, np.float64),
                             np.asarray(vv, np.float64))
            n_pools += len(xs)
    if n_pools > max_model_pools:
        raise RuntimeError(
            f"{n_pools} model pools exceed max_model_pools="
            f"{max_model_pools}")
    mref = ray.put(model)

    def apply(t: pa.Table, _m=mref) -> pa.Table:
        if len(t) == 0 or score_col not in t.column_names:
            return t
        m = ray.get(_m)
        s = t[score_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        key = (t[key_col].to_numpy(zero_copy_only=False)
               .astype(np.int64) if key_col
               else np.zeros(len(t), np.int64))
        out = np.full(len(t), np.nan, np.float64)
        for k in np.unique(key):
            cur = m.get(int(k))
            if cur is None:
                continue
            xs, vv = cur
            mask = key == k
            pos = np.searchsorted(xs, s[mask], side="right") - 1
            pos = np.maximum(pos, 0)
            out[mask] = vv[pos]
        return t.append_column(out_col, pa.array(out))

    return ds.map_batches(apply, batch_format="pyarrow")

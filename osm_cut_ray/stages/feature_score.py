"""Feature-label association scoring: per-feature chi-square and
mutual information against a categorical label — the classic
feature-selection pass over (feature, label) occurrence rows (Yang &
Pedersen 1997; sklearn's chi2 uses the same presence/absence
contingency).

Each input row is one feature occurrence carrying its document's
label (for presence semantics, dedupe (doc, feature) upstream).
For every feature the 2 x C contingency table is
  present:  n_fc            (this feature with class c)
  absent:   n_c - n_fc      (class c rows without it)
and the scores are
  chi2 = sum (O - E)^2 / E  over all 2C cells, E = row*col/N
  mi   = sum p ln(p / (p_row p_col))  (nats, 0 ln 0 = 0)

Ray-Data shape: one slim aggregate for the class marginals
(driver-held, `max_classes` RAISES — labels are enum-small by
definition), then ONE bucketed per-feature fold of (feature, label)
rows with the marginals broadcast. All counts are exact ints; floats
appear once in the final formulas — bit-deterministic under any
partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from . import join as J
from .join import bucketed_group_apply


def feature_label_scores(ds, *, feature_col: str, label_col: str,
                         max_classes: int = 10_000):
    """-> Dataset (feature, n, chi2, mi): n = total occurrences of
    the feature, scored against the label distribution."""
    import ray.data as rd

    empty = pa.table({
        "feature": pa.array([], pa.int64()),
        "n": pa.array([], pa.int64()),
        "chi2": pa.array([], pa.float64()),
        "mi": pa.array([], pa.float64())})

    def slim(t: pa.Table) -> pa.Table:
        if len(t) == 0 or feature_col not in t.column_names:
            return pa.table({"feature": pa.array([], pa.int64()),
                             "label": pa.array([], pa.int64())})
        return pa.table({
            "feature": pa.compute.cast(t[feature_col], pa.int64()),
            "label": pa.compute.cast(t[label_col], pa.int64())})

    rows = ds.map_batches(slim, batch_format="pyarrow") \
        .materialize()

    # class marginals: per-batch partial counts, driver merge
    def cls_part(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "label" not in t.column_names:
            return pa.table({"label": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        lab = t["label"].to_numpy(zero_copy_only=False)
        uk, cnt = np.unique(lab, return_counts=True)
        return pa.table({"label": pa.array(uk),
                         "c": pa.array(cnt.astype(np.int64))})

    marg: dict[int, int] = {}
    for b in rows.map_batches(cls_part, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for lb, c in zip(b["label"].to_pylist(), b["c"].to_pylist()):
            marg[lb] = marg.get(lb, 0) + c
            if len(marg) > max_classes:
                raise ValueError(
                    f"more than max_classes={max_classes} distinct "
                    f"labels — {label_col} does not look "
                    "categorical; bin it or raise the cap")
    if not marg:
        return rd.from_arrow(empty)
    classes = np.array(sorted(marg), np.int64)
    n_c = np.array([marg[c] for c in classes.tolist()], np.int64)
    N = int(n_c.sum())
    ref = ray.put((classes, n_c))

    def fold(g: pd.DataFrame, _ref=ref) -> pa.Table:
        if len(g) == 0:
            return empty
        classes, n_c = ray.get(_ref)
        C = len(classes)
        feat = g["feature"].to_numpy(np.int64)
        lab = g["label"].to_numpy(np.int64)
        li = np.searchsorted(classes, lab)
        order = np.lexsort((li, feat))
        feat, li = feat[order], li[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(feat[1:] != feat[:-1]) + 1,
             [len(feat)]))
        n_feat = len(starts) - 1
        out_f = feat[starts[:-1]]
        out_n = np.diff(starts)
        col = n_c.astype(np.float64)

        # all features at once: joint counts via one bincount on the
        # composite (feature-segment, class) index
        seg = np.zeros(len(feat), np.int64)
        seg[starts[1:-1]] = 1
        seg_id = np.cumsum(seg)
        joint = np.bincount(seg_id * C + li,
                            minlength=n_feat * C) \
            .reshape(n_feat, C).astype(np.float64)
        n_f = out_n.astype(np.float64)[:, None]
        Op, Oa = joint, col[None, :] - joint
        Ep = n_f * col[None, :] / N
        Ea = (N - n_f) * col[None, :] / N
        with np.errstate(divide="ignore", invalid="ignore"):
            c2 = np.where(Ep > 0, (Op - Ep) ** 2 / Ep, 0.0) \
                + np.where(Ea > 0, (Oa - Ea) ** 2 / Ea, 0.0)
            tp = np.where(Op > 0, Op / N * np.log(Op / Ep), 0.0)
            ta = np.where(Oa > 0, Oa / N * np.log(Oa / Ea), 0.0)
        chi2 = c2.sum(axis=1)
        mi = (tp + ta).sum(axis=1)
        return pa.table({
            "feature": pa.array(out_f),
            "n": pa.array(out_n.astype(np.int64)),
            "chi2": pa.array(chi2),
            "mi": pa.array(mi)})

    out, n = J.solidify(bucketed_group_apply(rows, "feature", fold))
    if n == 0:
        return rd.from_arrow(empty)
    return out

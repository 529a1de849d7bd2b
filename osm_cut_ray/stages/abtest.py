"""A/B experiment readout: per-experiment Welch two-sample t
statistics over a metric column — the batch analytics step after
`split_by_hash` assigns variants (stages/geo_sample.py).

Moments are exact at any scale: metric values int64-quantize
map-side and each batch emits one partial row per unique
(experiment, variant) with the quantized sum and sum-of-squares as
Arrow decimal128(38, 0) (the stages/regression.py pattern — squared
sums pass 2^63 long before corpus scale, so int64/float64 partials
would break bit-determinism). ONE bucketed fold sums the decimals as
exact Python ints; only per-(experiment, variant) moment rows (tiny,
bounded by the experiment count) reach the driver, where the Welch
formula runs once per experiment:

  mean_g = sq_g / n_g / scale
  var_g  = (n_g * sqq_g - sq_g^2) / (n_g * (n_g - 1)) / scale^2
  t      = (mean_a - mean_b) / sqrt(var_a/n_a + var_b/n_b)
  df     = Welch-Satterthwaite

p-values need no scipy: the table carries t and df; tests pin t/df
against a brute replay and check the large-df normal approximation.
"""

from __future__ import annotations

import decimal

import numpy as np
import pandas as pd
import pyarrow as pa

from .join import bucketed_group_apply

_DEC = pa.decimal128(38, 0)
_SCALE = 1 << 20


def welch_t(exp_ds, *, exp_col: str = "exp_id",
            variant_col: str = "variant", metric_col: str = "metric",
            scale: int = _SCALE) -> pa.Table:
    """-> pa.Table (exp_id, n_a, n_b, mean_a, mean_b, t, df) sorted
    by exp_id: Welch two-sample t per experiment between variant 0
    (A) and variant 1 (B). Experiments missing a variant or with a
    variant of <2 samples are dropped (no statistic exists)."""

    def dec(vals) -> pa.Array:
        return pa.array([decimal.Decimal(int(v)) for v in vals], _DEC)

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "sq": pa.array([], _DEC),
                             "sqq": pa.array([], _DEC)})
        e = t[exp_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[variant_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if ((v < 0) | (v > 1)).any():
            bad = np.unique(v[(v < 0) | (v > 1)])[:5].tolist()
            raise ValueError(
                f"welch_t: variant values must be 0 (A) or 1 (B); "
                f"got {bad} — a multi-arm experiment would silently "
                "merge arms into the wrong group (ADVICE r4)")
        q = np.rint(t[metric_col].to_numpy(zero_copy_only=False)
                    .astype(np.float64) * scale).astype(np.int64)
        key = e * 2 + v
        order = np.argsort(key, kind="stable")
        key, q = key[order], q[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(key[1:] != key[:-1]) + 1))
        n = np.diff(np.concatenate((starts, [len(key)])))
        qo = q.astype(object)
        red = np.add.reduceat
        return pa.table({
            "k": pa.array(key[starts]),
            "n": pa.array(n.astype(np.int64)),
            "sq": dec(red(qo, starts)),
            "sqq": dec(red(qo * qo, starts))})

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "sq": pa.array([], _DEC),
                             "sqq": pa.array([], _DEC)})
        agg = g.groupby("k", as_index=False).agg(
            n=("n", "sum"), sq=("sq", "sum"), sqq=("sqq", "sum"))
        return pa.table({
            "k": pa.array(agg["k"].to_numpy(np.int64)),
            "n": pa.array(agg["n"].to_numpy(np.int64)),
            "sq": dec(agg["sq"]), "sqq": dec(agg["sqq"])})

    parts = exp_ds.map_batches(partial, batch_format="pyarrow")
    folded = bucketed_group_apply(parts, "k", fold)
    rows = [b for b in folded.iter_batches(batch_size=None,
                                           batch_format="pyarrow")
            if b.num_rows]
    empty = pa.table({"exp_id": pa.array([], pa.int64()),
                      "n_a": pa.array([], pa.int64()),
                      "n_b": pa.array([], pa.int64()),
                      "mean_a": pa.array([], pa.float64()),
                      "mean_b": pa.array([], pa.float64()),
                      "t": pa.array([], pa.float64()),
                      "df": pa.array([], pa.float64())})
    if not rows:
        return empty
    tab = pa.concat_tables(rows)
    mom: dict[int, tuple[int, int, int]] = {}
    for i in range(tab.num_rows):
        mom[int(tab["k"][i].as_py())] = (
            int(tab["n"][i].as_py()), int(tab["sq"][i].as_py()),
            int(tab["sqq"][i].as_py()))
    out = {"exp_id": [], "n_a": [], "n_b": [], "mean_a": [],
           "mean_b": [], "t": [], "df": []}
    for ka in sorted(mom):
        if ka & 1:
            continue
        exp = ka >> 1
        kb = ka | 1
        if kb not in mom:
            continue
        na, sqa, sqqa = mom[ka]
        nb, sqb, sqqb = mom[kb]
        if na < 2 or nb < 2:
            continue
        mean_a = sqa / na / scale
        mean_b = sqb / nb / scale
        # exact integer numerators, one float conversion each
        va = max(na * sqqa - sqa * sqa, 0) / (na * (na - 1)) \
            / float(scale) ** 2
        vb = max(nb * sqqb - sqb * sqb, 0) / (nb * (nb - 1)) \
            / float(scale) ** 2
        se2 = va / na + vb / nb
        if se2 > 0:
            tstat = (mean_a - mean_b) / np.sqrt(se2)
            df = se2 ** 2 / (va ** 2 / (na ** 2 * (na - 1))
                             + vb ** 2 / (nb ** 2 * (nb - 1)))
        else:
            tstat, df = 0.0, float(na + nb - 2)
        out["exp_id"].append(exp)
        out["n_a"].append(na)
        out["n_b"].append(nb)
        out["mean_a"].append(mean_a)
        out["mean_b"].append(mean_b)
        out["t"].append(float(tstat))
        out["df"].append(float(df))
    if not out["exp_id"]:
        return empty
    return pa.table({
        "exp_id": pa.array(out["exp_id"], pa.int64()),
        "n_a": pa.array(out["n_a"], pa.int64()),
        "n_b": pa.array(out["n_b"], pa.int64()),
        "mean_a": pa.array(out["mean_a"], pa.float64()),
        "mean_b": pa.array(out["mean_b"], pa.float64()),
        "t": pa.array(out["t"], pa.float64()),
        "df": pa.array(out["df"], pa.float64())})


def normal_p(t: np.ndarray) -> np.ndarray:
    """Two-sided normal-approximation p-value for Welch t (valid for
    large df; no scipy in this container — the t-distribution tail
    converges to the normal's at the experiment sizes A/B readouts
    have). p = erfc(|t| / sqrt(2))."""
    import math
    t = np.asarray(t, np.float64)
    return np.array([math.erfc(abs(x) / math.sqrt(2.0)) for x in t])


def bh_adjust(p: np.ndarray) -> np.ndarray:
    """Benjamini-Hochberg adjusted p-values (step-up FDR): sort
    ascending, q_(i) = min over j >= i of p_(j) * m / j, clipped to
    1 — the standard published procedure."""
    p = np.asarray(p, np.float64)
    m = len(p)
    if m == 0:
        return p.copy()
    order = np.argsort(p, kind="stable")
    ranked = p[order] * m / np.arange(1, m + 1)
    q = np.minimum.accumulate(ranked[::-1])[::-1]
    out = np.empty(m)
    out[order] = np.clip(q, 0.0, 1.0)
    return out


def welch_t_adjusted(exp_ds, **kw) -> pa.Table:
    """`welch_t` plus `p` (normal approximation) and `p_bh`
    (Benjamini-Hochberg across the experiment family)."""
    tab = welch_t(exp_ds, **kw)
    p = normal_p(tab["t"].to_numpy(zero_copy_only=False)) \
        if tab.num_rows else np.zeros(0)
    return tab.append_column("p", pa.array(p, pa.float64())) \
        .append_column("p_bh", pa.array(bh_adjust(p), pa.float64()))

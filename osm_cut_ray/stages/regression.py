"""Per-key simple linear regression (OLS y = a + b*x): slope,
intercept, Pearson r, r^2 and count for every key — the grouped
`regr_slope`/`regr_intercept`/`corr` aggregate family, computed from
the five classic partial sums (n, Sx, Sy, Sxx, Sxy, Syy).

Determinism: x and y are int64-quantized at `scale` (default 1e-6)
map-side, and every partial sum is carried as an EXACT integer —
Arrow decimal128(38, 0) columns, summed as Python ints in the fold —
so the statistics are bit-deterministic under any partitioning (the
repo's float-sum rule; quantized products reach ~1e24, far past
float64's 2^53 exact range, hence decimals rather than doubles).
Floats appear only once, at the final formula evaluation.

Ray-Data shape: map-side per-batch partial sums (one row per key per
batch — the combiner that keeps the wide groupby tiny), ONE bucketed
fold over the partials. Payload never shuffles; the shuffle moves 7
numbers per (key, batch).

Degenerate keys: n < 2 or zero x-variance emit NULL slope/
intercept/r; zero y-variance emits a valid slope with NULL r.
"""

from __future__ import annotations

import decimal

import numpy as np
import pandas as pd
import pyarrow as pa

from . import join as J
from .join import bucketed_group_apply

_DEC = pa.decimal128(38, 0)


def _empty_partial() -> pa.Table:
    return pa.table({
        "key": pa.array([], pa.int64()),
        "n": pa.array([], pa.int64()),
        "sx": pa.array([], _DEC),
        "sy": pa.array([], _DEC),
        "sxx": pa.array([], _DEC),
        "sxy": pa.array([], _DEC),
        "syy": pa.array([], _DEC)})


def _empty_out() -> pa.Table:
    return pa.table({
        "key": pa.array([], pa.int64()),
        "n": pa.array([], pa.int64()),
        "slope": pa.array([], pa.float64()),
        "intercept": pa.array([], pa.float64()),
        "r": pa.array([], pa.float64()),
        "r2": pa.array([], pa.float64())})


def linreg_per_key(ds, *, key_col: str, x_col: str, y_col: str,
                   scale: float = 1e-6):
    """-> Dataset (key, n, slope, intercept, r, r2)."""
    import ray.data as rd

    inv = 1.0 / scale

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0 or key_col not in t.column_names:
            return _empty_partial()
        key = t[key_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        x = np.round(t[x_col].to_numpy(zero_copy_only=False)
                     .astype(np.float64) * inv).astype(np.int64)
        y = np.round(t[y_col].to_numpy(zero_copy_only=False)
                     .astype(np.float64) * inv).astype(np.int64)
        order = np.argsort(key, kind="stable")
        key, x, y = key[order], x[order], y[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(key[1:] != key[:-1]) + 1))
        n = np.diff(np.concatenate((starts, [len(key)])))
        xo = x.astype(object)
        yo = y.astype(object)
        red = np.add.reduceat

        def dec(vals) -> pa.Array:
            return pa.array([decimal.Decimal(int(v)) for v in vals],
                            _DEC)

        return pa.table({
            "key": pa.array(key[starts]),
            "n": pa.array(n.astype(np.int64)),
            "sx": dec(red(xo, starts)),
            "sy": dec(red(yo, starts)),
            "sxx": dec(red(xo * xo, starts)),
            "sxy": dec(red(xo * yo, starts)),
            "syy": dec(red(yo * yo, starts))})

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return _empty_out()
        agg = g.groupby("key", as_index=False).agg(
            n=("n", "sum"), sx=("sx", "sum"), sy=("sy", "sum"),
            sxx=("sxx", "sum"), sxy=("sxy", "sum"),
            syy=("syy", "sum"))
        keys = agg["key"].to_numpy(np.int64)
        ns = agg["n"].to_numpy(np.int64)
        slope_l, icept_l, r_l, r2_l = [], [], [], []
        for i in range(len(agg)):
            n = int(ns[i])
            sx = int(agg["sx"].iloc[i])
            sy = int(agg["sy"].iloc[i])
            sxx = int(agg["sxx"].iloc[i])
            sxy = int(agg["sxy"].iloc[i])
            syy = int(agg["syy"].iloc[i])
            vx = n * sxx - sx * sx      # exact python ints
            vy = n * syy - sy * sy
            cov = n * sxy - sx * sy
            if n < 2 or vx <= 0:
                slope_l.append(None)
                icept_l.append(None)
                r_l.append(None)
                r2_l.append(None)
                continue
            slope = cov / vx
            icept = (sy - slope * sx) / n / inv
            slope_l.append(float(slope))
            icept_l.append(float(icept))
            if vy <= 0:
                r_l.append(None)
                r2_l.append(None)
            else:
                r = cov / np.sqrt(float(vx) * float(vy))
                r_l.append(float(r))
                r2_l.append(float(r * r))
        return pa.table({
            "key": pa.array(keys),
            "n": pa.array(ns),
            "slope": pa.array(slope_l, pa.float64()),
            "intercept": pa.array(icept_l, pa.float64()),
            "r": pa.array(r_l, pa.float64()),
            "r2": pa.array(r2_l, pa.float64())})

    out, n = J.solidify(bucketed_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        "key", fold))
    if n == 0:
        return rd.from_arrow(_empty_out())
    return out

"""Spatial hotspot detection: Getis-Ord Gi* z-scores over hex-cell
point counts — the standard local spatial statistic (crime/incident
hotspots, demand surging, coverage anomalies).

Definition used (pinned by tests/test_hotspot.py): the cell universe
is the NON-EMPTY cells (an infinite plane has no all-cells universe);
weights are w = 1 over ring-1 neighbors plus self (Gi*), restricted
to non-empty cells. With n = |universe|, x-bar and S the universe
mean/std (population std), Wi = number of non-empty cells in i's
ring+self:

  Gi* = (sum_j x_j - x_bar * Wi) / (S * sqrt((n*Wi - Wi^2) / (n-1)))

Ray-Data shape: ONE groupby builds the (cell, n) count table
(per-batch Arrow combiner first); each count row then emits itself to
its 7 ring keys (hex_neighbors is antimeridian-correct), a second
small groupby folds (sum_j x_j, Wi) per cell, and the z-score is a
map-side pass with the broadcast (n, x_bar, S) globals — shuffles
touch count rows only, never points.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..geometry.cells import hex_cell, hex_neighbors


def _bucket_sums(rows_ds, cols: tuple[str, ...]):
    """(cell, *int64 cols) rows -> per-cell sums via the bucket-hash
    pattern (sort key cardinality = bucket count, not cell count —
    measured ~4x faster than a raw groupby(cell) sort-shuffle here)."""
    from .join import bucketed_group_apply

    def per_bucket(g) -> pa.Table:
        if len(g) == 0:
            return pa.table({"cell": pa.array([], pa.int64()),
                             **{c: pa.array([], pa.int64())
                                for c in cols}})
        out = g.groupby("cell", as_index=False)[list(cols)].sum()
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    return bucketed_group_apply(rows_ds, "cell", per_bucket)


def cell_counts(points_ds, *, res: int = 7, x_col: str = "lon",
                y_col: str = "lat"):
    """points -> Dataset (cell, n) over non-empty hex cells."""

    def combine(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        c = hex_cell(
            t[x_col].to_numpy(zero_copy_only=False).astype(np.float64),
            t[y_col].to_numpy(zero_copy_only=False).astype(np.float64),
            res)
        uc, cnt = np.unique(c, return_counts=True)
        return pa.table({"cell": pa.array(uc),
                         "n": pa.array(cnt.astype(np.int64))})

    partial = points_ds.map_batches(combine, batch_format="pyarrow")
    return _bucket_sums(partial, ("n",))


def emerging_hotspots(points_ds, *, t0: float, t1: float,
                      interval: float, res: int = 7,
                      x_col: str = "lon", y_col: str = "lat",
                      ts_col: str = "ts"):
    """Space-time trend per cell: bin events into (hex cell, time
    bin), then score each cell's COMPLETE bin series (zeros included
    over [t0, t1)) with the Mann-Kendall trend statistic

      S = sum_{i<j} sign(x_j - x_i),
      var = (B(B-1)(2B+5) - sum_t t(t-1)(2t+5)) / 18   (tie-corrected)
      z = (S -/+ 1) / sqrt(var)  (continuity-corrected, 0 when S = 0)

    -> Dataset (cell, n_events, mk_s, mk_z): positive z = growing
    activity (emerging), negative = fading. Events outside [t0, t1)
    are ignored. One slim (cell, tbin) shuffle; the O(B^2) pair scan
    runs vectorized across every cell of a bucket at once (B = bin
    count, small by construction)."""
    from .join import bucketed_group_apply
    n_bins = int(np.ceil((t1 - t0) / interval))
    if n_bins < 2:
        raise ValueError("need >= 2 time bins")

    def slim(t: pa.Table) -> pa.Table:
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ts = t[ts_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = (ts >= t0) & (ts < t1)
        c = hex_cell(x[ok], y[ok], res)
        b = ((ts[ok] - t0) / interval).astype(np.int64)
        # per-batch combine: (cell, bin) counts
        key = c * np.int64(n_bins) + b
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"cell": pa.array(uk // n_bins),
                         "tbin": pa.array(uk % n_bins),
                         "n": pa.array(cnt.astype(np.int64))})

    def per_bucket(g) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.int64()),
                          "n_events": pa.array([], pa.int64()),
                          "mk_s": pa.array([], pa.int64()),
                          "mk_z": pa.array([], pa.float64())})
        if len(g) == 0:
            return empty
        agg = g.groupby(["cell", "tbin"], as_index=False)["n"].sum()
        cl = agg["cell"].to_numpy(np.int64)
        tb = agg["tbin"].to_numpy(np.int64)
        nn = agg["n"].to_numpy(np.int64)
        cells, inv = np.unique(cl, return_inverse=True)
        mat = np.zeros((len(cells), n_bins), np.int64)
        mat[inv, tb] = nn
        # S over all bin pairs, vectorized across cells
        d = np.sign(mat[:, None, :] - mat[:, :, None])
        iu, ju = np.triu_indices(n_bins, k=1)
        S = d[:, iu, ju].sum(axis=1)
        # tie correction: group sizes per distinct value per cell
        var = np.full(len(cells),
                      n_bins * (n_bins - 1) * (2 * n_bins + 5) / 18.0)
        for i in range(len(cells)):
            _, tcnt = np.unique(mat[i], return_counts=True)
            var[i] -= (tcnt * (tcnt - 1) * (2 * tcnt + 5)).sum() / 18.0
        with np.errstate(invalid="ignore", divide="ignore"):
            z = np.where(S > 0, (S - 1) / np.sqrt(var),
                         np.where(S < 0, (S + 1) / np.sqrt(var), 0.0))
        z = np.where(var > 0, z, 0.0)
        return pa.table({"cell": pa.array(cells),
                         "n_events": pa.array(mat.sum(axis=1)),
                         "mk_s": pa.array(S.astype(np.int64)),
                         "mk_z": pa.array(z)})

    rows = points_ds.map_batches(slim, batch_format="pyarrow")
    return bucketed_group_apply(rows, "cell", per_bucket)


def morans_i(points_ds, *, res: int = 7, x_col: str = "lon",
             y_col: str = "lat") -> dict:
    """Global Moran's I spatial autocorrelation of hex-cell point
    counts — the corpus-level companion to the local Gi* below. Same
    universe rule: non-empty cells, binary ring-1 weights (no self),
    restricted to non-empty neighbors.

      I = (n / S0) * sum_ij w_ij z_i z_j / sum_i z_i^2,  z = x - xbar

    plus the normality null E[I] = -1/(n-1) and variance
    Var(I) = (n^2 S1 - n S2 + 3 S0^2) / ((n^2-1) S0^2) - E[I]^2 with
    S1 = 2 S0 and S2 = 4 sum_i deg_i^2 (binary symmetric W), giving
    z_norm = (I - E[I]) / sqrt(Var).

    Bit-deterministic under any partitioning: the cross term expands
    into PURE INT64 aggregates (sum x_i*nbrsum_i, sum deg_i*x_i,
    sum nbrsum_i, sum deg_i, sum deg_i^2, sum x, sum x^2) — the repo's
    int64-quantize-before-float-sums rule — and the float algebra
    happens once on the driver. Shuffles touch count rows only.

    -> dict(n_cells, s0, morans_i, e_i, var_i, z_norm); degenerate
    universes (n < 2, S0 = 0 or zero variance) return NaN statistics.
    """
    import ray.data
    from .join import bucketed_attach_column

    counts = cell_counts(points_ds, res=res, x_col=x_col,
                         y_col=y_col).materialize()
    base = counts.aggregate(
        ray.data.aggregate.Count(alias_name="n_cells"),
        ray.data.aggregate.Sum("n", alias_name="sx"))
    n_cells = int(base["n_cells"] or 0)
    out_nan = {"n_cells": n_cells, "s0": 0, "morans_i": float("nan"),
               "e_i": float("nan"), "var_i": float("nan"),
               "z_norm": float("nan")}
    if n_cells < 2:
        return out_nan
    sx = int(base["sx"])

    def spread_nbrs(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "sx": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        c = t["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        nbr = hex_neighbors(c)                      # (m, 6), no self
        targets = np.concatenate([nbr[:, j] for j in range(6)])
        return pa.table({"cell": pa.array(targets),
                         "sx": pa.array(np.tile(x, 6)),
                         "w": pa.array(np.ones(6 * len(c), np.int64))})

    folded = _bucket_sums(
        counts.map_batches(spread_nbrs, batch_format="pyarrow"),
        ("sx", "w")).map_batches(
            lambda t: t.rename_columns(["cell", "nbrsum", "deg"]),
            batch_format="pyarrow")
    # inner attach of the own count drops targets outside the universe
    folded = bucketed_attach_column(
        folded.materialize(), "cell", counts, "cell", "n")

    def int_partials(t: pa.Table) -> pa.Table:
        cols = ["a", "b", "c", "d", "e"]
        if len(t) == 0:
            return pa.table({k: pa.array([], pa.int64()) for k in cols})
        ns = t["nbrsum"].to_numpy(zero_copy_only=False).astype(np.int64)
        dg = t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"a": pa.array(x * ns), "b": pa.array(dg * x),
                         "c": pa.array(ns), "d": pa.array(dg),
                         "e": pa.array(dg * dg)})

    agg = folded.map_batches(int_partials, batch_format="pyarrow")\
        .aggregate(*[ray.data.aggregate.Sum(k, alias_name=k)
                     for k in ("a", "b", "c", "d", "e")])
    A = int(agg["a"] or 0)
    B = int(agg["b"] or 0)
    C = int(agg["c"] or 0)
    S0 = int(agg["d"] or 0)
    sum_deg2 = int(agg["e"] or 0)

    sq = counts.map_batches(
        lambda t: pa.table({"x2": pc_square(t["n"])}),
        batch_format="pyarrow").aggregate(
            ray.data.aggregate.Sum("x2", alias_name="x2"))
    sx2 = int(sq["x2"] or 0)

    n = n_cells
    xbar = sx / n
    cross = A - xbar * B - xbar * C + xbar * xbar * S0
    denom = sx2 - n * xbar * xbar
    if S0 == 0 or denom <= 0:
        out_nan["s0"] = S0
        return out_nan
    i_val = (n / S0) * cross / denom
    e_i = -1.0 / (n - 1)
    s1 = 2.0 * S0
    s2 = 4.0 * sum_deg2
    var_i = ((n * n * s1 - n * s2 + 3.0 * S0 * S0)
             / ((n * n - 1.0) * S0 * S0)) - e_i * e_i
    z = (i_val - e_i) / np.sqrt(var_i) if var_i > 0 else float("nan")
    return {"n_cells": n, "s0": S0, "morans_i": float(i_val),
            "e_i": float(e_i), "var_i": float(var_i),
            "z_norm": float(z)}


def pc_square(arr: pa.ChunkedArray) -> pa.Array:
    x = arr.to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.array(x * x)


def getis_ord_gi(points_ds, *, res: int = 7, x_col: str = "lon",
                 y_col: str = "lat"):
    """-> Dataset (cell, n, gi_z): Gi* z-score per non-empty cell
    (module docstring). Deterministic given the point set."""
    import ray.data

    counts = cell_counts(points_ds, res=res, x_col=x_col,
                         y_col=y_col).materialize()
    # universe globals: one tiny aggregate over the count table
    gstats = counts.aggregate(
        ray.data.aggregate.Count(alias_name="n_cells"),
        ray.data.aggregate.Sum("n", alias_name="sx"),
        ray.data.aggregate.Mean("n", alias_name="xbar"),
        ray.data.aggregate.Std("n", ddof=0, alias_name="s"))
    n_cells = int(gstats["n_cells"])
    if n_cells == 0:
        return ray.data.from_arrow(pa.table({
            "cell": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "gi_z": pa.array([], pa.float64())}))
    xbar = float(gstats["xbar"])
    s = float(gstats["s"] or 0.0)
    glob = ray.put((n_cells, xbar, s))

    def spread(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "sx": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        c = t["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        nbr = hex_neighbors(c)                       # (m, 6)
        targets = np.concatenate([c] + [nbr[:, j] for j in range(6)])
        vals = np.tile(x, 7)
        return pa.table({"cell": pa.array(targets),
                         "sx": pa.array(vals),
                         "w": pa.array(np.ones(len(vals), np.int64))})

    folded = _bucket_sums(
        counts.map_batches(spread, batch_format="pyarrow"),
        ("sx", "w")).map_batches(
            lambda t: t.rename_columns(["cell", "sum_x", "wi"]),
            batch_format="pyarrow")
    # keep only cells of the universe: attach own count (inner join)
    from .join import bucketed_attach_column
    folded = bucketed_attach_column(
        folded.materialize(), "cell", counts, "cell", "n")

    def score(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "gi_z": pa.array([], pa.float64())})
        nc, xb, sd = ray.get(glob)
        sx = t["sum_x"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        wi = t["wi"].to_numpy(zero_copy_only=False).astype(np.float64)
        if nc > 1 and sd > 0:
            den = sd * np.sqrt((nc * wi - wi * wi) / (nc - 1))
        else:
            den = np.zeros(len(wi))
        with np.errstate(invalid="ignore", divide="ignore"):
            z = np.where(den > 0, (sx - xb * wi) / den, 0.0)
        return pa.table({
            "cell": t["cell"].cast(pa.int64()),
            "n": t["n"].cast(pa.int64()),
            "gi_z": pa.array(z)})

    return folded.map_batches(score, batch_format="pyarrow")

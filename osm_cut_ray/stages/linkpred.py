"""Link-prediction features over a graph: for every node pair at
distance 2, the classic neighborhood scores (Liben-Nowell & Kleinberg
2003) — common-neighbor count, Adamic-Adar, resource allocation, and
Jaccard — plus an `is_edge` flag so callers can keep or drop pairs
that are already connected.

Formulation: every pair (a, b) with a common neighbor w is a WEDGE
through apex w, so the scores are wedge folds:
  cn(a,b) = #wedges, aa = sum_w 1/log(deg w), ra = sum_w 1/deg w,
  jaccard = cn / (deg a + deg b - cn).
Pairs with no common neighbor never appear (all their scores are 0).

Ray-Data shape: canonical edges + degree attach (reused from
graph_stats), per-apex wedge emission (one bucket pass, vectorized
triu), one bucketed pair fold, then two degree attaches for the
Jaccard denominator and one edge-key attach for `is_edge`. Every
shuffled row is <= 4 int64s.

Determinism: the aa/ra float sums are int64-quantized at 1e-12
before the fold (the repo's bit-determinism rule for float
aggregation) and divided back at finish — results are identical
under any partitioning.

Hub safety: unoriented wedge emission is O(deg^2) per apex; an apex
whose degree exceeds `max_apex_degree` RAISES (the repo cap
contract). At planet scale exclude hub apexes first (they contribute
~0 to aa/ra anyway) or raise the cap deliberately.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import join as J
from .graph_stats import _GOLD, _MIX, _canon_edges
from .join import bucketed_group_apply

_Q = 1_000_000_000_000  # 1e-12 quantization for aa/ra sums


def _pair_key(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    return ((lo.view(np.uint64) * _GOLD)
            ^ (hi.view(np.uint64) * _MIX)).view(np.int64)


def link_features(edges_ds, *, src_col: str = "src",
                  dst_col: str = "dst",
                  max_apex_degree: int = 10_000):
    """-> Dataset (a, b, cn, aa, ra, jaccard, is_edge) with a < b,
    one row per node pair sharing >= 1 common neighbor."""
    import ray.data as rd

    empty_out = rd.from_arrow(pa.table({
        "a": pa.array([], pa.int64()),
        "b": pa.array([], pa.int64()),
        "cn": pa.array([], pa.int64()),
        "aa": pa.array([], pa.float64()),
        "ra": pa.array([], pa.float64()),
        "jaccard": pa.array([], pa.float64()),
        "is_edge": pa.array([], pa.int8())}))

    edges, n_edges = J.solidify(_canon_edges(edges_ds, src_col,
                                             dst_col))
    if n_edges == 0:
        return empty_out

    def both(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "lo" not in t.column_names:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        lo = t["lo"].to_numpy(zero_copy_only=False)
        hi = t["hi"].to_numpy(zero_copy_only=False)
        return pa.table({
            "u": pa.array(np.concatenate([lo, hi])),
            "v": pa.array(np.concatenate([hi, lo]))})

    adj, _ = J.solidify(edges.map_batches(both,
                                          batch_format="pyarrow"))
    adj = adj.materialize()

    def deg_fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "degree": pa.array([], pa.int64())})
        agg = g.groupby("u", as_index=False).size()
        return pa.table({
            "node": pa.array(agg["u"].to_numpy(np.int64)),
            "degree": pa.array(agg["size"].to_numpy(np.int64))})

    degrees, _ = J.solidify(bucketed_group_apply(adj, "u", deg_fold))
    degrees = degrees.materialize()

    # wedges through each apex: apex degree rides along, quantized
    def wedges(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"lo": pa.array([], pa.int64()),
                          "hi": pa.array([], pa.int64()),
                          "pk": pa.array([], pa.int64()),
                          "aa_q": pa.array([], pa.int64()),
                          "ra_q": pa.array([], pa.int64())})
        if len(g) == 0:
            return empty
        u = g["u"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(u[1:] != u[:-1]) + 1, [len(u)]))
        out_lo, out_hi, out_aa, out_ra = [], [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            k = e - s
            if k > max_apex_degree:
                raise ValueError(
                    f"apex {u[s]} has degree {k} > max_apex_degree="
                    f"{max_apex_degree}: wedge emission is O(deg^2);"
                    " exclude hub apexes or raise the cap")
            if k < 2:
                continue
            nb = v[s:e]
            ai, bi = np.triu_indices(k, k=1)
            a, b = nb[ai], nb[bi]
            out_lo.append(np.minimum(a, b))
            out_hi.append(np.maximum(a, b))
            aa_q = np.int64(round(_Q / np.log(k))) if k >= 2 else 0
            out_aa.append(np.full(len(a), aa_q, np.int64))
            out_ra.append(np.full(len(a), _Q // k, np.int64))
        if not out_lo:
            return empty
        lo = np.concatenate(out_lo)
        hi = np.concatenate(out_hi)
        return pa.table({
            "lo": pa.array(lo), "hi": pa.array(hi),
            "pk": pa.array(_pair_key(lo, hi)),
            "aa_q": pa.array(np.concatenate(out_aa)),
            "ra_q": pa.array(np.concatenate(out_ra)),
            "ed": pa.array(np.zeros(len(lo), np.int8))})

    wedge_rows, n_w = J.solidify(
        bucketed_group_apply(adj, "u", wedges))
    if n_w == 0:
        return empty_out

    # marker rows for existing edges ride the same pair fold, so
    # is_edge costs zero extra joins and nothing reaches the driver
    def edge_marks(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "lo" not in t.column_names:
            return pa.table({
                "lo": pa.array([], pa.int64()),
                "hi": pa.array([], pa.int64()),
                "pk": pa.array([], pa.int64()),
                "aa_q": pa.array([], pa.int64()),
                "ra_q": pa.array([], pa.int64()),
                "ed": pa.array([], pa.int8())})
        lo = t["lo"].to_numpy(zero_copy_only=False)
        hi = t["hi"].to_numpy(zero_copy_only=False)
        z = np.zeros(len(lo), np.int64)
        return pa.table({
            "lo": pa.array(lo), "hi": pa.array(hi),
            "pk": pa.array(_pair_key(lo, hi)),
            "aa_q": pa.array(z), "ra_q": pa.array(z),
            "ed": pa.array(np.ones(len(lo), np.int8))})

    def pair_fold(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "cn": pa.array([], pa.int64()),
                          "aa_q": pa.array([], pa.int64()),
                          "ra_q": pa.array([], pa.int64()),
                          "is_edge": pa.array([], pa.int8())})
        if len(g) == 0:
            return empty
        g = g.assign(w=(g["ed"].to_numpy(np.int8) == 0)
                     .astype(np.int64))
        agg = g.groupby(["lo", "hi"], as_index=False).agg(
            cn=("w", "sum"), aa_q=("aa_q", "sum"),
            ra_q=("ra_q", "sum"), is_edge=("ed", "max"))
        # edge-only groups (no common neighbor) don't emit
        agg = agg[agg["cn"] > 0]
        if len(agg) == 0:
            return empty
        return pa.table({
            "a": pa.array(agg["lo"].to_numpy(np.int64)),
            "b": pa.array(agg["hi"].to_numpy(np.int64)),
            "cn": pa.array(agg["cn"].to_numpy(np.int64)),
            "aa_q": pa.array(agg["aa_q"].to_numpy(np.int64)),
            "ra_q": pa.array(agg["ra_q"].to_numpy(np.int64)),
            "is_edge": pa.array(
                agg["is_edge"].to_numpy(np.int8))})

    pairs, n_pairs = J.solidify(bucketed_group_apply(
        wedge_rows.union(edges.map_batches(
            edge_marks, batch_format="pyarrow")),
        "pk", pair_fold))
    if n_pairs == 0:
        return empty_out

    da = degrees.map_batches(
        lambda t: t.rename_columns(["node", "deg_a"]),
        batch_format="pyarrow")
    db = degrees.map_batches(
        lambda t: t.rename_columns(["node", "deg_b"]),
        batch_format="pyarrow")
    with_a, _ = J.solidify(J.bucketed_attach_column(
        pairs, "a", da, "node", "deg_a"))
    with_ab, _ = J.solidify(J.bucketed_attach_column(
        with_a, "b", db, "node", "deg_b"))

    def finish(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "cn": pa.array([], pa.int64()),
            "aa": pa.array([], pa.float64()),
            "ra": pa.array([], pa.float64()),
            "jaccard": pa.array([], pa.float64()),
            "is_edge": pa.array([], pa.int8())})
        if len(t) == 0 or "a" not in t.column_names:
            return empty
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        cn = t["cn"].to_numpy(zero_copy_only=False).astype(np.int64)
        aa = t["aa_q"].to_numpy(zero_copy_only=False) \
            .astype(np.int64) / _Q
        ra = t["ra_q"].to_numpy(zero_copy_only=False) \
            .astype(np.int64) / _Q
        dega = t["deg_a"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        degb = t["deg_b"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        denom = dega + degb - cn
        jac = np.where(denom > 0, cn / np.maximum(denom, 1), 0.0)
        is_e = t["is_edge"].to_numpy(zero_copy_only=False) \
            .astype(np.int8)
        return pa.table({
            "a": pa.array(a), "b": pa.array(b),
            "cn": pa.array(cn), "aa": pa.array(aa),
            "ra": pa.array(ra), "jaccard": pa.array(jac),
            "is_edge": pa.array(is_e)})

    return with_ab.map_batches(finish, batch_format="pyarrow")

"""Distributed (bucketed-shuffle) score-vector fixpoints: the
planet-scale fallback for `stages/route.py:pagerank` and
`stages/hits.py:hits` past `max_broadcast_nodes` (round-4 verdict
item #1 — the last RAISE that blocked a whole op family at scale).

The broadcast engines keep the whole score vector on the driver and
`ray.put` it per iteration (~16 B/node); past ~50M nodes that vector
no longer fits comfortably. Here the scores STAY a Dataset — one row
per node — and each half-step is:

  1. ONE `bucketed_attach_column` of the per-node share/score onto
     the slim (src, dst) edge list (the only big shuffle: 16 B/edge),
  2. a map-side unique-dst partial combine,
  3. ONE bucketed fold to per-node inflow, with a zero row per node
     unioned in so nodes without inflow keep their row (and carry
     the node's global index + the untouched companion column),
  4. tiny driver-scalar Sum aggregates that reproduce the integer
     renormalization EXACTLY.

Everything stays in the same int64 fixed point as the broadcast
engines, and the truncation-residue spread ("+1 to the r smallest
node ids") is reproduced via a precomputed exact global node index
(`stages/rank.py:global_rank` with id tie-breaks, so it is exact
even for ids past 2^53) — the shuffle results are therefore
BIT-FOR-BIT equal to the broadcast results, which the tests pin
(kcore's `stages/kcore.py:_shuffle_loop` is the template; same
auto-select contract as `stages/snap.py:build_segment_grid_auto`).

Reference anchor: the reference engine holds its working sets in a
single-process store (src/osm_set.erl:29-63); this module is the
scale-out dual for iterative score state, as stages/join.py is for
membership state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from . import join as J
from .join import bucketed_attach_column, bucketed_group_apply


def _sum_col(ds, col: str) -> int:
    """Exact int64 driver-scalar sum of one column (one scan)."""
    from ray.data.aggregate import Sum
    agg = ds.aggregate(Sum(col, alias_name="__s"))
    return int(agg["__s"] or 0)


def _slim_edges(edges_ds, src_col: str, dst_col: str):
    """(src, dst) int64 projection, solidified. -> (ds, n_edges)."""
    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or src_col not in t.column_names:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        return pa.table({"src": pc.cast(t[src_col], pa.int64()),
                         "dst": pc.cast(t[dst_col], pa.int64())})

    ds, n = J.solidify(edges_ds.map_batches(slim,
                                            batch_format="pyarrow"))
    return (ds.materialize() if n else ds), n


def node_state(edges, *, with_outdeg: bool):
    """Node universe as a Dataset with one row per node:
    (node, outdeg, idx) — outdeg is the directed out-degree (0 when
    `with_outdeg` is False), idx the EXACT global rank of the node id
    (0-based, ascending), needed to reproduce the broadcast engines'
    node-id-order residue spread bit-for-bit.

    -> (materialized state, n_nodes). One bucketed fold + one ranked
    shuffle + one attach; never more than one row per node anywhere.
    """
    from .rank import global_rank

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "src" not in t.column_names:
            return pa.table({"node": pa.array([], pa.int64()),
                             "deg": pa.array([], pa.int64())})
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        if with_outdeg:
            u, cnt = np.unique(src, return_counts=True)
            extra = np.setdiff1d(np.unique(dst), u)
            return pa.table({
                "node": pa.array(np.concatenate([u, extra])),
                "deg": pa.array(np.concatenate(
                    [cnt.astype(np.int64),
                     np.zeros(len(extra), np.int64)]))})
        u = np.unique(np.concatenate([src, dst]))
        return pa.table({"node": pa.array(u),
                         "deg": pa.array(np.zeros(len(u), np.int64))})

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "outdeg": pa.array([], pa.int64())})
        agg = g.groupby("node")["deg"].sum()
        return pa.table({
            "node": pa.array(agg.index.to_numpy(np.int64)),
            "outdeg": pa.array(agg.to_numpy(np.int64))})

    parts = edges.map_batches(partial, batch_format="pyarrow")
    state0, n = J.solidify(bucketed_group_apply(parts, "node", fold))
    if n == 0:
        return state0, 0
    state0 = state0.materialize()

    ranked = global_rank(state0, id_col="node", val_col="node")
    idx_ds = ranked.map_batches(
        lambda t: pa.table({
            "node": pc.cast(t["id"], pa.int64()),
            "idx": pc.subtract(pc.cast(t["row_number"], pa.int64()),
                               pa.scalar(1, pa.int64()))})
        if t.num_rows else pa.table({
            "node": pa.array([], pa.int64()),
            "idx": pa.array([], pa.int64())}),
        batch_format="pyarrow")
    state, n2 = J.solidify(bucketed_attach_column(
        state0, "node", idx_ds, "node", "idx"))
    assert n2 == n, "global_rank must cover every node exactly once"
    return state.materialize(), n


def _np(t: pa.Table, col: str) -> np.ndarray:
    return t[col].to_numpy(zero_copy_only=False).astype(np.int64)


def _pull(edges, state, n: int, *, score_col: str, from_col: str,
          to_col: str, carry_col: str):
    """One distributed half-step pull: raw[to] = Σ_edges score[from].

    Attaches `score_col` from `state` onto the edges by `from_col`,
    combines map-side per unique `to_col`, and folds ONE bucketed
    sum per node — a zero row per node (unioned in from `state`)
    guarantees every node keeps a row and carries (idx, carry_col)
    through the fold untouched. -> materialized Dataset
    (node, idx, carry, raw), exactly n rows.
    """
    shares = state.map_batches(
        lambda t: pa.table({"node": t["node"], "__s": t[score_col]})
        if t.num_rows else pa.table({
            "node": pa.array([], pa.int64()),
            "__s": pa.array([], pa.int64())}),
        batch_format="pyarrow")
    attached = bucketed_attach_column(edges, from_col, shares,
                                      "node", "__s")

    empty = pa.table({"to": pa.array([], pa.int64()),
                      "c": pa.array([], pa.int64()),
                      "idx": pa.array([], pa.int64()),
                      "carry": pa.array([], pa.int64())})

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or to_col not in t.column_names:
            return empty
        dst = _np(t, to_col)
        c = _np(t, "__s")
        u, inv = np.unique(dst, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, c)
        neg = np.full(len(u), -1, np.int64)
        return pa.table({"to": pa.array(u), "c": pa.array(s),
                         "idx": pa.array(neg), "carry": pa.array(neg)})

    def zero_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        return pa.table({"to": t["node"],
                         "c": pa.array(np.zeros(len(t), np.int64)),
                         "idx": t["idx"], "carry": t[carry_col]})

    contribs = attached.map_batches(combine, batch_format="pyarrow")
    zeros_ds = state.map_batches(zero_rows, batch_format="pyarrow")

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "idx": pa.array([], pa.int64()),
                             "carry": pa.array([], pa.int64()),
                             "raw": pa.array([], pa.int64())})
        agg = g.groupby("to").agg(
            raw=("c", "sum"), idx=("idx", "max"),
            carry=("carry", "max"))
        return pa.table({
            "node": pa.array(agg.index.to_numpy(np.int64)),
            "idx": pa.array(agg["idx"].to_numpy(np.int64)),
            "carry": pa.array(agg["carry"].to_numpy(np.int64)),
            "raw": pa.array(agg["raw"].to_numpy(np.int64))})

    folded, n2 = J.solidify(bucketed_group_apply(
        contribs.union(zeros_ds), "to", fold))
    assert n2 == n, "pull fold must keep exactly one row per node"
    return folded.materialize()


def _flat(ds, scale: int, n: int, out_col: str):
    """Uniform mass: scale//n everywhere, +1 to the r smallest node
    ids — identical to the broadcast engines' flat init/restart."""
    q, r = divmod(scale, n)

    def fn(t: pa.Table) -> pa.Table:
        idx = _np(t, "idx")
        return t.append_column(
            out_col, pa.array(q + (idx < r).astype(np.int64)))

    return ds.map_batches(fn, batch_format="pyarrow")


# ------------------------------------------------------------ pagerank

def pagerank_shuffle(edges_ds, *, damping: float, n_iter: int,
                     src_col: str = "src", dst_col: str = "dst",
                     scale: int, seeds=None):
    """All-shuffle PageRank, bit-for-bit equal to
    `stages/route.py:pagerank`'s broadcast loop (pinned in
    tests/test_score_flow.py). Per iteration: ONE edge attach + ONE
    node fold + one scalar Sum; shuffled rows are 2-4 int64s."""
    import ray.data as rd

    edges, n_e = _slim_edges(edges_ds, src_col, dst_col)
    if n_e == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "rank": pa.array([], pa.float64())}))
    state, n = node_state(edges, with_outdeg=True)
    return _pagerank_loop(edges, state, n, damping=damping,
                          n_iter=n_iter, scale=scale, seeds=seeds)


def quantize_seeds(seeds: dict) -> tuple[np.ndarray, np.ndarray]:
    """Personalization dict -> (sorted seed node ids, int64 weight
    quanta). Weights quantize to round(w * 1e9) (RAISES on
    non-positive); both engines allocate residual mass from these
    SAME integers, which is what keeps them bit-for-bit equal."""
    if not seeds:
        raise ValueError("pagerank: empty seeds dict")
    nodes = np.array(sorted(int(k) for k in seeds), np.int64)
    wq = np.array([int(round(float(seeds[int(k)]) * 1_000_000_000))
                   for k in nodes], np.int64)
    if (wq <= 0).any():
        raise ValueError("pagerank: seed weights must be positive")
    return nodes, wq


def seed_allocation(residual: int, wq: np.ndarray) -> np.ndarray:
    """Exact largest-remainder split of `residual` rank quanta over
    the seed weights (python-int products — residual * wq overflows
    int64). Deterministic: remainder goes to the first seeds in
    node-id order."""
    if residual < 0:
        raise RuntimeError("pagerank: negative residual mass")
    total = int(wq.sum())
    base = [residual * int(w) // total for w in wq]
    out = np.array(base, np.int64)
    out[: residual - sum(base)] += 1
    return out


def _pagerank_loop(edges, state, n: int, *, damping: float,
                   n_iter: int, scale: int, seeds=None):
    damp_num, damp_den = int(round(damping * 1000)), 1000
    state = _flat(state, scale, n, "rank").materialize()
    if seeds is not None:
        seed_nodes, seed_wq = seeds
        sref_check = state.map_batches(
            lambda t: pa.table({"n": pa.array([int(np.isin(
                _np(t, "node"), seed_nodes).sum())])}),
            batch_format="pyarrow")
        matched = sum(r["n"] for r in sref_check.take_all())
        if matched != len(seed_nodes):
            raise ValueError(
                f"pagerank: {len(seed_nodes) - matched} seed "
                "node(s) not present in the graph")

    for _ in range(n_iter):
        def to_share(t: pa.Table) -> pa.Table:
            rank = _np(t, "rank")
            outdeg = _np(t, "outdeg")
            share = np.where(outdeg > 0,
                             rank // np.maximum(outdeg, 1), 0)
            return pa.table({"node": t["node"], "outdeg": t["outdeg"],
                             "idx": t["idx"],
                             "share": pa.array(share)})

        shared = state.map_batches(to_share, batch_format="pyarrow")
        folded = _pull(edges, shared, n, score_col="share",
                       from_col="src", to_col="dst",
                       carry_col="outdeg")

        def pre_map(t: pa.Table) -> pa.Table:
            raw = _np(t, "raw")
            pre = (raw * np.int64(damp_num)) // np.int64(damp_den)
            return pa.table({"node": t["node"], "idx": t["idx"],
                             "outdeg": t["carry"],
                             "pre": pa.array(pre)})

        pre_ds = folded.map_batches(pre_map,
                                    batch_format="pyarrow") \
            .materialize()
        residual = scale - _sum_col(pre_ds, "pre")
        if seeds is None:
            q, r = divmod(residual, n)

            def finish(t: pa.Table) -> pa.Table:
                idx = _np(t, "idx")
                rank = _np(t, "pre") + q \
                    + (idx < r).astype(np.int64)
                return pa.table({"node": t["node"],
                                 "outdeg": t["outdeg"],
                                 "idx": t["idx"],
                                 "rank": pa.array(rank)})
        else:
            alloc = seed_allocation(residual, seed_wq)

            def finish(t: pa.Table) -> pa.Table:
                node = _np(t, "node")
                pos = np.searchsorted(seed_nodes, node)
                pos = np.minimum(pos, len(seed_nodes) - 1)
                hit = seed_nodes[pos] == node
                add = np.where(hit, alloc[pos], 0)
                return pa.table({"node": t["node"],
                                 "outdeg": t["outdeg"],
                                 "idx": t["idx"],
                                 "rank": pa.array(_np(t, "pre")
                                                  + add)})

        state = pre_ds.map_batches(finish,
                                   batch_format="pyarrow") \
            .materialize()

    return state.map_batches(
        lambda t: pa.table({
            "node": t["node"],
            "rank": pa.array(
                _np(t, "rank").astype(np.float64) / scale)}),
        batch_format="pyarrow")


# ------------------------------------------------------------ HITS

def _renorm_ds(folded, n: int, scale: int, out_col: str):
    """Distributed replay of `stages/hits.py:_renorm` — same integer
    pre-divide + residue spread, driven by three scalar Sums over the
    materialized n-row fold instead of one driver vector."""
    s = _sum_col(folded, "raw")
    if s == 0:
        return _flat(folded, scale, n, out_col)
    if s > 2 ** 62:
        raise RuntimeError(
            "hits: total raw inflow exceeds the int64 bound "
            "(super-node in-degree ~> 9.2e9) — salt the hot node or "
            "shard the graph by component first")
    d = s // scale + 1

    red_ds = folded.map_batches(
        lambda t: t.append_column(
            "__red", pa.array(_np(t, "raw") // np.int64(d))),
        batch_format="pyarrow").materialize()
    rs = _sum_col(red_ds, "__red")
    if rs == 0:  # every entry rounded away: degenerate, restart flat
        return _flat(folded, scale, n, out_col)

    out_ds = red_ds.map_batches(
        lambda t: t.append_column(
            "__out", pa.array((_np(t, "__red") * np.int64(scale))
                              // np.int64(rs))),
        batch_format="pyarrow").materialize()
    resid = scale - _sum_col(out_ds, "__out")

    def spread(t: pa.Table) -> pa.Table:
        idx = _np(t, "idx")
        v = _np(t, "__out") + (idx < resid).astype(np.int64)
        return t.drop_columns(["__red", "__out"]) \
            .append_column(out_col, pa.array(v))

    return out_ds.map_batches(spread, batch_format="pyarrow")


def hits_shuffle(edges_ds, *, n_iter: int, src_col: str = "src",
                 dst_col: str = "dst", scale: int):
    """All-shuffle HITS, bit-for-bit equal to `stages/hits.py:hits`'s
    broadcast loop (pinned in tests/test_score_flow.py). Two
    half-steps per iteration, each ONE edge attach + ONE node fold +
    three scalar Sums (the integer renorm)."""
    import ray.data as rd

    edges, n_e = _slim_edges(edges_ds, src_col, dst_col)
    if n_e == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "authority": pa.array([], pa.float64()),
            "hub": pa.array([], pa.float64())}))
    state, n = node_state(edges, with_outdeg=False)
    state = state.map_batches(
        lambda t: t.drop_columns(["outdeg"]), batch_format="pyarrow")
    state = _flat(state, scale, n, "hub")
    state = _flat(state, scale, n, "auth").materialize()

    for _ in range(n_iter):
        # auth half-step: pull hub along src -> dst, carry hub
        folded = _pull(edges, state, n, score_col="hub",
                       from_col="src", to_col="dst", carry_col="hub")
        state = _renorm_ds(folded, n, scale, "auth").map_batches(
            lambda t: pa.table({"node": t["node"], "idx": t["idx"],
                                "hub": t["carry"],
                                "auth": t["auth"]}),
            batch_format="pyarrow").materialize()
        # hub half-step: pull auth along dst -> src, carry auth
        folded = _pull(edges, state, n, score_col="auth",
                       from_col="dst", to_col="src", carry_col="auth")
        state = _renorm_ds(folded, n, scale, "hub").map_batches(
            lambda t: pa.table({"node": t["node"], "idx": t["idx"],
                                "auth": t["carry"],
                                "hub": t["hub"]}),
            batch_format="pyarrow").materialize()

    return state.map_batches(
        lambda t: pa.table({
            "node": t["node"],
            "authority": pa.array(
                _np(t, "auth").astype(np.float64) / scale),
            "hub": pa.array(
                _np(t, "hub").astype(np.float64) / scale)}),
        batch_format="pyarrow")


# ----------------------------------------- capped driver collection

def merge_partials_capped(parts_iter, cap: int,
                          compact_rows: int = 8_000_000):
    """Merge (node, value) int64 partial batches driver-side with an
    incremental distinct-count guard: returns (nodes, sums) sorted by
    node, or None as soon as the distinct count provably exceeds
    `cap` — the auto-engine signal to fall to the shuffle path
    WITHOUT ever holding more than cap + compact_rows rows on the
    driver (the old collect-then-check shape held the whole concat).
    """
    nodes = np.array([], np.int64)
    sums = np.array([], np.int64)
    buf_n: list[np.ndarray] = []
    buf_v: list[np.ndarray] = []
    buffered = 0

    def compact():
        nonlocal nodes, sums, buf_n, buf_v, buffered
        k = np.concatenate([nodes] + buf_n)
        v = np.concatenate([sums] + buf_v)
        nodes, inv = np.unique(k, return_inverse=True)
        sums = np.zeros(len(nodes), np.int64)
        np.add.at(sums, inv, v)
        buf_n, buf_v, buffered = [], [], 0

    for k, v in parts_iter:
        if len(k) == 0:
            continue
        buf_n.append(np.asarray(k, np.int64))
        buf_v.append(np.asarray(v, np.int64))
        buffered += len(k)
        if buffered >= compact_rows:
            compact()
            if len(nodes) > cap:
                return None
    if buffered:
        compact()
    if len(nodes) > cap:
        return None
    return nodes, sums

"""Budgeted top-rank selection — the "fill the token budget with the
best documents" primitive of training-data assembly: take rows in
(score DESC, id ASC) order until the cumulative weight (token count,
bytes, duration) would exceed `budget`; the crossing row is excluded.

Exact and deterministic at scale without streaming the corpus
through the driver:

1. ONE slim sort shuffle orders (score, id, weight) projections.
2. A summary pass emits one row per sorted block (bounds + weight
   sum); the tiny summary table locates the budget-crossing block on
   the driver.
3. Only THAT block's rows are pulled (bounded by block size) to
   refine the exact cutoff pair (score, id).
4. The full-schema input filters map-side against the broadcast
   cutoff pair — payloads never shuffle at all.

Negative weights RAISE (the prefix-sum argument needs monotone
cumulative weight).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def select_by_budget(ds, *, score_col: str, weight_col: str,
                     budget: float, id_col: str = "id"):
    """-> (selected Dataset, report dict): rows in (score desc, id
    asc) order while cumulative weight <= budget. Report carries
    kept_weight and the cutoff pair (None = everything kept)."""
    import ray
    import ray.data

    def slim(t: pa.Table) -> pa.Table:
        w = t[weight_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        if len(w) and w.min() < 0:
            raise RuntimeError(
                "select_by_budget: negative weights break the "
                "prefix-sum cutoff — clamp upstream")
        return pa.table({
            "id": t[id_col].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "score": t[score_col].to_numpy(zero_copy_only=False)
            .astype(np.float64),
            "w": pa.array(w)})

    ordered = ds.map_batches(slim, batch_format="pyarrow") \
        .sort(["score", "id"], descending=[True, False]).materialize()

    def summarize(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"s0": pa.array([], pa.float64()),
                             "i0": pa.array([], pa.int64()),
                             "s1": pa.array([], pa.float64()),
                             "i1": pa.array([], pa.int64()),
                             "wsum": pa.array([], pa.float64())})
        s = t["score"].to_numpy(zero_copy_only=False)
        i = t["id"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        return pa.table({"s0": pa.array([float(s[0])]),
                         "i0": pa.array([int(i[0])], pa.int64()),
                         "s1": pa.array([float(s[-1])]),
                         "i1": pa.array([int(i[-1])], pa.int64()),
                         "wsum": pa.array([float(w.sum())])})

    summaries = [b for b in ordered.map_batches(
        summarize, batch_size=None, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows]
    if not summaries:
        return ds, {"kept_weight": 0.0, "cutoff": None}
    summ = pa.concat_tables(summaries).to_pandas()
    # blocks of a sorted dataset are range-ordered; order summaries
    # by their first key (desc score, asc id)
    summ = summ.sort_values(["s0", "i0"],
                            ascending=[False, True]) \
        .reset_index(drop=True)
    cum = summ["wsum"].cumsum()
    total = float(cum.iloc[-1])
    if total <= budget:
        return ds, {"kept_weight": total, "cutoff": None}
    k = int(np.searchsorted(cum.to_numpy(), budget, side="right"))
    spent = float(cum.iloc[k - 1]) if k > 0 else 0.0
    blk = summ.iloc[k]

    # pull ONLY the crossing block's rows (its (score, id) range)
    def in_block(t: pa.Table) -> pa.Table:
        s = t["score"].to_numpy(zero_copy_only=False)
        i = t["id"].to_numpy(zero_copy_only=False)
        ge = (s < blk["s0"]) | ((s == blk["s0"]) & (i >= blk["i0"]))
        le = (s > blk["s1"]) | ((s == blk["s1"]) & (i <= blk["i1"]))
        return t.filter(pa.array(ge & le))

    rows = pa.concat_tables([b for b in ordered.map_batches(
        in_block, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow") if b.num_rows]) \
        .to_pandas().sort_values(["score", "id"],
                                 ascending=[False, True])
    cw = spent + rows["w"].cumsum()
    keep = rows[cw <= budget]
    kept_weight = float(keep["w"].sum()) + spent
    if len(keep) == 0:
        if k == 0:  # budget smaller than the very first row
            cutoff = None
            empty = ds.map_batches(lambda t: t.slice(0, 0),
                                   batch_format="pyarrow")
            return empty, {"kept_weight": 0.0,
                           "cutoff": (np.inf, -1)}
        cutoff = (float(summ.iloc[k - 1]["s1"]),
                  int(summ.iloc[k - 1]["i1"]))
    else:
        cutoff = (float(keep["score"].iloc[-1]),
                  int(keep["id"].iloc[-1]))
    ref = ray.put(cutoff)

    def final(t: pa.Table) -> pa.Table:
        cs, ci = ray.get(ref)
        s = t[score_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        i = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array((s > cs) | ((s == cs) & (i <= ci))))

    return (ds.map_batches(final, batch_format="pyarrow"),
            {"kept_weight": kept_weight, "cutoff": cutoff})

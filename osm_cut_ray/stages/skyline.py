"""Distributed skyline (Pareto frontier) query — the multi-criteria
"best rows" operator (Börzsönyi, Kossmann, Stocker 2001, "The
Skyline Operator"). A row is in the skyline iff no other row is >=
as good on every criterion and strictly better on at least one.
Identical rows do not dominate each other (both survive).

Distributed shape: the global skyline is a subset of the union of
per-block skylines (a globally undominated row is locally
undominated), so the pipeline is: per-block vectorized BNL skyline
(map_batches, no shuffle) -> shrink rounds (repartition + local
skyline again while the candidate set is above the driver cap) ->
one final exact merge. Every shrink round strictly filters, and the
final merge sees only candidates. `max_rounds` RAISES if the
candidate set refuses to shrink below `max_driver_rows` (adversarial
anti-correlated data where the true skyline is huge — the repo cap
contract: surface, never silently truncate).

The per-block kernel sorts lexicographically and checks each row
only against the kept frontier (vectorized) — the frontier is small
on real data, so the pass is ~O(n * |skyline|) with numpy bodies.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import join as J


def _local_skyline_idx(X: np.ndarray) -> np.ndarray:
    """Indices of the skyline rows of X (all criteria MINIMIZED).
    Deterministic; duplicates all kept."""
    n = len(X)
    if n == 0:
        return np.empty(0, np.int64)
    order = np.lexsort(X.T[::-1])
    Xs = X[order]
    kept_rows = np.empty((0, X.shape[1]))
    kept_idx: list[int] = []
    for i in range(n):
        x = Xs[i]
        if len(kept_idx):
            dom = np.all(kept_rows <= x, axis=1) \
                & np.any(kept_rows < x, axis=1)
            if dom.any():
                continue
        kept_rows = np.vstack([kept_rows, x])
        kept_idx.append(int(order[i]))
    return np.asarray(kept_idx, np.int64)


def _crit_matrix(t: pa.Table, criteria: dict[str, str]) -> np.ndarray:
    cols = []
    for c, d in criteria.items():
        v = t[c].to_numpy(zero_copy_only=False).astype(np.float64)
        cols.append(v if d == "min" else -v)
    return np.column_stack(cols)


def skyline(ds, criteria: dict[str, str], *,
            max_driver_rows: int = 2_000_000,
            max_rounds: int = 8):
    """-> Dataset of the input rows on the Pareto frontier.
    criteria: {column: "min" | "max"}."""
    for c, d in criteria.items():
        if d not in ("min", "max"):
            raise ValueError(f"criteria[{c!r}] must be min or max")

    def local(t: pa.Table) -> pa.Table:
        if len(t) == 0 or any(c not in t.column_names
                              for c in criteria):
            return t.slice(0, 0) if t.num_columns else t
        idx = _local_skyline_idx(_crit_matrix(t, criteria))
        return t.take(pa.array(np.sort(idx)))

    cand, n = J.solidify(ds.map_batches(local,
                                        batch_format="pyarrow"))
    for _ in range(max_rounds):
        if n <= max_driver_rows:
            t = pa.concat_tables([
                pa.table(b) for b in cand.iter_batches(
                    batch_format="pyarrow")])
            idx = _local_skyline_idx(_crit_matrix(t, criteria))
            import ray.data as rd
            return rd.from_arrow(t.take(pa.array(np.sort(idx))))
        shrunk = cand.repartition(
            max(1, min(J.cluster_parts(),
                       n // max(1, max_driver_rows) + 1))) \
            .map_batches(local, batch_format="pyarrow")
        cand2, n2 = J.solidify(shrunk)
        if n2 == n:
            break  # no progress — candidate set IS the skyline work
        cand, n = cand2, n2
    raise RuntimeError(
        f"skyline candidates ({n}) will not shrink below "
        f"max_driver_rows={max_driver_rows} within {max_rounds} "
        "rounds — the frontier itself is that large "
        "(anti-correlated criteria); raise the cap or reduce "
        "criteria")

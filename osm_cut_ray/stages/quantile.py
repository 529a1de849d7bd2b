"""EXACT distributed quantiles / k-th smallest over a float column —
the complement of the mergeable KLL sketch (functions/sketch.py):
when the answer must be exact (SLA thresholds, billing cutoffs), a
sketch's epsilon isn't acceptable and a full sort is a corpus-wide
shuffle. This is the classic distributed radix selection: map every
float64 to its order-preserving uint64 key (IEEE-754 total-order
trick: flip the sign bit for positives, invert all bits for
negatives), then locate each requested rank's exact bit pattern in
FOUR refinement rounds of 16 bits each (65,536-bucket histograms).

Each round is ONE shuffle-free map_batches pass emitting per-batch
partial histograms for the ranks' current prefixes (driver-merged
int64 counts, <= 65,536 x #distinct-prefixes ints). After round 4
the full 64-bit pattern is known and decodes back to the exact
value present in the data. No value ever leaves the workers, no
shuffle, bit-deterministic (integer counts only).

Rank semantics: `kth_smallest(k)` is the exact k-th smallest
(1-based, duplicates counted). `quantiles(qs)` returns the element
at index floor(q * (n-1)) (numpy `method='lower'`); NaNs and nulls
are dropped first.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _order_key(v: np.ndarray) -> np.ndarray:
    bits = v.astype(np.float64).view(np.uint64)
    neg = bits >> np.uint64(63) == 1
    out = np.where(neg, ~bits, bits | np.uint64(1 << 63))
    return out.astype(np.uint64)


def _decode_key(k: int) -> float:
    k = np.uint64(k)
    if k >> np.uint64(63) == 1:
        bits = k & np.uint64((1 << 63) - 1)
    else:
        bits = ~k
    return float(np.array([bits], np.uint64).view(np.float64)[0])


def _ranks_to_values(ds, col: str, ranks: list[int]) -> list[float]:
    """Exact values at the given 1-based ranks among the non-NaN
    values of ds[col]."""
    # state per rank: (prefix so far, remaining rank within prefix)
    states = [(0, r) for r in ranks]
    for rnd in range(4):
        shift = np.uint64(64 - 16 * rnd)        # known-bits shift
        sub = np.uint64(64 - 16 * (rnd + 1))    # this round's bits
        prefixes = sorted({p for p, _ in states})
        pidx = {p: i for i, p in enumerate(prefixes)}
        n_p = len(prefixes)

        def hist(t: pa.Table, _prefixes=tuple(prefixes),
                 _rnd=rnd) -> pa.Table:
            counts = np.zeros(n_p * 65536, np.int64)
            if len(t) and col in t.column_names:
                v = t[col].to_numpy(zero_copy_only=False) \
                    .astype(np.float64)
                v = v[~np.isnan(v)]
                u = _order_key(v)
                for j, p in enumerate(_prefixes):
                    if _rnd == 0:
                        m = np.ones(len(u), bool)
                    else:
                        m = (u >> shift) == np.uint64(p)
                    b = ((u[m] >> sub)
                         & np.uint64(0xFFFF)).astype(np.int64)
                    counts[j * 65536:(j + 1) * 65536] += \
                        np.bincount(b, minlength=65536)
            return pa.table({"h": pa.array([counts.tobytes()],
                                           pa.binary())})

        merged = np.zeros(n_p * 65536, np.int64)
        for b in ds.map_batches(hist, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow"):
            for blob in b["h"].to_pylist():
                merged += np.frombuffer(blob, np.int64)

        new_states = []
        for (p, r) in states:
            c = merged[pidx[p] * 65536:(pidx[p] + 1) * 65536]
            cum = np.cumsum(c)
            b = int(np.searchsorted(cum, r))
            prev = int(cum[b - 1]) if b > 0 else 0
            new_states.append(((p << 16) | b, r - prev))
        states = new_states
    return [_decode_key(p) for p, _ in states]


def _count_valid(ds, col: str) -> int:
    import ray.data as rd

    def part(t: pa.Table) -> pa.Table:
        if len(t) == 0 or col not in t.column_names:
            return pa.table({"n": pa.array([0], pa.int64())})
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"n": pa.array([int((~np.isnan(v)).sum())],
                                       pa.int64())})

    agg = ds.map_batches(part, batch_format="pyarrow").aggregate(
        rd.aggregate.Sum("n", alias_name="n"))
    return int(agg["n"] or 0)


def kth_smallest(ds, col: str, k: int) -> float:
    """Exact k-th smallest (1-based) non-NaN value."""
    n = _count_valid(ds, col)
    if not 1 <= k <= n:
        raise ValueError(f"k={k} out of range for {n} valid rows")
    return _ranks_to_values(ds, col, [k])[0]


def quantiles(ds, col: str, qs: list[float]):
    """-> pyarrow Table (q, value): exact lower quantiles (the
    element at index floor(q*(n-1))), one 4-round radix selection
    shared across ALL requested q."""
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"q={q} out of [0, 1]")
    n = _count_valid(ds, col)
    if n == 0:
        raise ValueError(f"no valid rows in column {col!r}")
    ranks = [int(np.floor(q * (n - 1))) + 1 for q in qs]
    vals = _ranks_to_values(ds, col, ranks)
    return pa.table({"q": pa.array(list(map(float, qs))),
                     "value": pa.array(vals)})

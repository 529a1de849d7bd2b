"""Item co-occurrence counts + PMI over user histories — the
classic co-view/co-purchase statistic behind item-item recommenders,
negative-sampling tables and embedding pretraining.

Semantics (pinned by tests/test_cooccur.py): items are DISTINCT per
user (a user contributes each unordered pair {a, b} once, a < b);
n_a = number of users who touched item a; with U = distinct users,
pmi = ln(n_ab * U / (n_a * n_b)).

Ray-Data shape:
1. slim (user, item) projection with per-batch dedup;
2. ONE user-bucket shuffle; inside each bucket, pair emission is
   vectorized PER DISTINCT USER DEGREE (one `triu_indices(k)` per
   distinct k, broadcast across all users with that k — no per-user
   Python), emitting per-bucket PRE-SUMMED (a, b, n) partials;
3. the SAME bucket pass also emits per-item distinct-user partials
   (pk = -(item+1)) and a distinct-user sentinel — every user lives
   wholly in one bucket, so the per-bucket partials sum exactly; one
   Sum aggregate over packed (a << 32 | b) int64 pair keys (items
   must fit int32 — RAISES otherwise) reduces all three row kinds;
4. the (item -> n_users) marginal rows (bounded by the distinct item
   count, cap RAISES) are pulled once and broadcast; PMI is computed
   map-side — a pure function of int64 counts, bit-deterministic
   under any partitioning.

A user with more than `max_items_per_user` distinct items RAISES
(quadratic pair blowup — the funnel-family giant-key rule): sample or
segment such users upstream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ray.data.aggregate import Sum


_EMPTY_UI = pa.table({"user": pa.array([], pa.int64()),
                      "item": pa.array([], pa.int64())})
_EMPTY_PAIR = pa.table({"pk": pa.array([], pa.int64()),
                        "n": pa.array([], pa.int64())})
_U_KEY = np.int64(-(1 << 62))   # sentinel pk carrying the user total


def _dedup_sorted(u: np.ndarray, it: np.ndarray):
    """(user, item) pairs -> deduped, sorted by (user, item). lexsort
    (not int packing) so FULL-RANGE 64-bit user ids stay exact."""
    order = np.lexsort((it, u))
    us, its = u[order], it[order]
    keep = np.ones(len(us), bool)
    keep[1:] = (us[1:] != us[:-1]) | (its[1:] != its[:-1])
    return us[keep], its[keep]


def cooccurrence(events_ds, *, user_col: str = "user_id",
                 item_col: str = "item", min_pair_count: int = 1,
                 max_items_per_user: int = 10_000,
                 max_distinct_items: int = 50_000_000):
    """-> Dataset (a, b, n_ab, n_a, n_b, pmi), a < b, one row per
    co-occurring item pair with n_ab >= min_pair_count."""
    from .join import bucketed_group_apply

    def slim(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _EMPTY_UI
        u = t[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        it = t[item_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(it) and (it.min() < 0 or it.max() >= (1 << 31)):
            raise ValueError(
                "item ids must fit int32 for pair-key packing; "
                "factorize items upstream")
        # per-batch (user, item) dedup
        us, its = _dedup_sorted(u, it)
        return pa.table({"user": pa.array(us), "item": pa.array(its)})

    ui = events_ds.map_batches(slim, batch_format="pyarrow")

    def pairs_per_bucket(g) -> pa.Table:
        """Emits THREE row kinds into one (pk, n) table (every user
        lives wholly in one bucket, so per-bucket partials sum to the
        exact global statistic): pk >= 0 packed (a, b) pair counts;
        pk = -(item+1) per-item distinct-user counts; pk = _U_KEY the
        bucket's distinct-user count."""
        if len(g) == 0:
            return _EMPTY_PAIR
        # bucket-level RE-dedup (cross-batch repeats), then sort by
        # (user, item) so each user's items form a sorted run
        u, it = _dedup_sorted(g["user"].to_numpy(np.int64),
                              g["item"].to_numpy(np.int64))
        starts = np.flatnonzero(np.concatenate(
            ([True], u[1:] != u[:-1])))
        lens = np.diff(np.append(starts, len(u)))
        if lens.max(initial=0) > max_items_per_user:
            raise ValueError(
                f"a user has {int(lens.max())} distinct items "
                f"> max_items_per_user={max_items_per_user}: pair "
                "emission is quadratic — sample or segment upstream")
        rows_pk = [_U_KEY * np.ones(1, np.int64), -(np.unique(it) + 1)]
        rows_n = [np.array([len(starts)], np.int64)]
        # distinct users per item: it is (user, item)-deduped already
        uit, ucnt = np.unique(it, return_counts=True)
        rows_n.append(ucnt.astype(np.int64))
        out_a, out_b = [], []
        for k_deg in np.unique(lens):
            if k_deg < 2:
                continue
            s = starts[lens == k_deg]                 # users of degree k
            ii, jj = np.triu_indices(int(k_deg), k=1)
            a = it[(s[:, None] + ii[None, :]).ravel()]
            b = it[(s[:, None] + jj[None, :]).ravel()]
            out_a.append(a)
            out_b.append(b)
        if out_a:
            a = np.concatenate(out_a)
            b = np.concatenate(out_b)
            # items are sorted within a user run, so a < b already
            pk, n = np.unique((a << np.int64(32)) | b,
                              return_counts=True)
            rows_pk.append(pk)
            rows_n.append(n.astype(np.int64))
        return pa.table({"pk": pa.array(np.concatenate(rows_pk)),
                         "n": pa.array(np.concatenate(rows_n))})

    counts_ds = bucketed_group_apply(ui, "user", pairs_per_bucket)\
        .groupby("pk").aggregate(Sum("n", alias_name="n_ab"))\
        .materialize()

    # pull the (bounded) marginal rows + user total to the driver
    import pyarrow.compute as pc
    items_l, counts_l = [], []
    n_users = 0
    for b in counts_ds.iter_batches(batch_size=None,
                                    batch_format="pyarrow"):
        neg = b.filter(pc.less(b["pk"], 0))
        if neg.num_rows:
            k = neg["pk"].to_numpy(zero_copy_only=False)
            n = neg["n_ab"].to_numpy(zero_copy_only=False)
            um = k == _U_KEY
            n_users += int(n[um].sum())
            items_l.append(-(k[~um]) - 1)
            counts_l.append(n[~um].astype(np.int64))
    n_items = sum(len(x) for x in items_l)
    if n_items > max_distinct_items:
        raise ValueError(f"{n_items} distinct items exceed "
                         f"max_distinct_items={max_distinct_items}")
    if n_items == 0:
        return ray.data.from_arrow(pa.table({
            "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
            "n_ab": pa.array([], pa.int64()),
            "n_a": pa.array([], pa.int64()),
            "n_b": pa.array([], pa.int64()),
            "pmi": pa.array([], pa.float64())}))
    items = np.concatenate(items_l).astype(np.int64)
    counts = np.concatenate(counts_l).astype(np.int64)
    order = np.argsort(items)
    items, counts = items[order], counts[order]
    mref = ray.put((items, counts, n_users))

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
            "n_ab": pa.array([], pa.int64()),
            "n_a": pa.array([], pa.int64()),
            "n_b": pa.array([], pa.int64()),
            "pmi": pa.array([], pa.float64())})
        if len(t) == 0:
            return empty
        it, cnt, nu = ray.get(mref)
        pk = t["pk"].to_numpy(zero_copy_only=False)
        n_ab = t["n_ab"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (pk >= 0) & (n_ab >= min_pair_count)
        pk, n_ab = pk[keep], n_ab[keep]
        a = pk >> np.int64(32)
        b = pk & np.int64(0x7FFFFFFF)
        n_a = cnt[np.searchsorted(it, a)]
        n_b = cnt[np.searchsorted(it, b)]
        pmi = np.log(n_ab.astype(np.float64) * nu
                     / (n_a.astype(np.float64) * n_b))
        return pa.table({"a": pa.array(a), "b": pa.array(b),
                         "n_ab": pa.array(n_ab),
                         "n_a": pa.array(n_a), "n_b": pa.array(n_b),
                         "pmi": pa.array(pmi)})

    return counts_ds.map_batches(finalize, batch_format="pyarrow")

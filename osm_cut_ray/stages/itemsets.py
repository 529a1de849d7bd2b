"""Frequent-itemset mining + association rules via the SON two-phase
algorithm (Savasere, Omiecinski, Navathe 1995 — the classic exact
distributed formulation, also Leskovec/Rajaraman/Ullman MMDS ch. 6):

- Phase 1 (candidate generation, one map over packed baskets): each
  block runs an EXACT local Apriori at the fractional threshold
  (count_i >= frac * n_i, i.e. ceil(frac * n_i)). SON guarantee: any
  globally frequent itemset is locally frequent in at least one block
  (if count_i < frac*n_i for all i, summing gives count < frac*n —
  contradiction), so the candidate union has NO false negatives.
- Phase 2 (exact verification, one map + one slim fold): candidate
  keys are broadcast (`ray.put`), every block counts exact candidate
  containment, per-block unique (key, cnt) partials flow through ONE
  bucketed sum fold, then the global threshold filters. Exact — false
  positives from phase 1 die here.

Everything is vectorized with the repo's per-shape-group idiom:
baskets are grouped by length and each length class becomes ONE
(n_baskets, l) matrix; k-subsets are gathered with a precomputed
C(l, k) index array and counted via packed int64 keys + np.unique.
No per-basket Python loop.

Caps (RAISE, repo contract): `max_basket_items` (k-subset explosion
is C(l, k)), `max_candidates` (the driver holds the candidate union
and the frequent output for rule generation), dense-vocab width for
k=3 packing (U^3 must fit int64).

`association_rules` derives A -> B rules driver-side from the
(capped) frequent table — every subset of a frequent itemset is
frequent (Apriori monotonicity), so all antecedent supports are
present by construction. Confidence/lift are single float divisions
of exact int64 supports (deterministic).

Reference scope note: the reference engine has no itemset mining;
this is the co-occurrence/bundle operator a corpus-curation pipeline
uses for tag-combination censuses and template detection.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from . import join as J
from .join import bucketed_group_apply


def _pack_baskets(ds, basket_col: str, item_col: str,
                  max_basket_items: int):
    """One (basket, items list<int64>) row per basket; items sorted
    unique within each list. One bucketed shuffle."""
    def pack(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({
                "basket": pa.array([], pa.int64()),
                "items": pa.array([], pa.list_(pa.int64()))})
        b = g["b"].to_numpy(np.int64)
        x = g["x"].to_numpy(np.int64)
        bx = np.stack([b, x], axis=1)
        bx = np.unique(bx, axis=0)
        b, x = bx[:, 0], bx[:, 1]
        starts = np.concatenate(
            ([0], np.flatnonzero(b[1:] != b[:-1]) + 1))
        lens = np.diff(np.concatenate((starts, [len(b)])))
        if lens.max(initial=0) > max_basket_items:
            big = int(b[starts[int(np.argmax(lens))]])
            raise RuntimeError(
                f"basket {big} has {int(lens.max())} distinct items "
                f"> max_basket_items={max_basket_items}; raise the "
                "cap (k-subset growth is C(l, k)) or pre-filter "
                "items")
        offs = np.concatenate((starts, [len(b)])).astype(np.int32)
        lst = pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                       pa.array(x))
        return pa.table({"basket": pa.array(b[starts]),
                         "items": lst})

    slim = ds.map_batches(
        lambda t: pa.table({
            "b": pa.compute.cast(t[basket_col], pa.int64()),
            "x": pa.compute.cast(t[item_col], pa.int64())})
        if len(t) and basket_col in t.column_names
        else pa.table({"b": pa.array([], pa.int64()),
                       "x": pa.array([], pa.int64())}),
        batch_format="pyarrow")
    packed, n = J.solidify(bucketed_group_apply(slim, "b", pack))
    return packed.materialize(), n


_COMBO_IDX: dict = {}


def _combo_idx(l: int, k: int) -> np.ndarray:
    key = (l, k)
    if key not in _COMBO_IDX:
        _COMBO_IDX[key] = np.array(
            list(combinations(range(l), k)), dtype=np.int64
        ).reshape(-1, k)
    return _COMBO_IDX[key]


def _length_groups(row: np.ndarray, item: np.ndarray):
    """Yield (l, mat) where mat is the (n_segments_of_len_l, l)
    matrix of sorted items per basket segment."""
    if len(row) == 0:
        return
    order = np.lexsort((item, row))
    r, x = row[order], item[order]
    starts = np.concatenate(
        ([0], np.flatnonzero(r[1:] != r[:-1]) + 1))
    lens = np.diff(np.concatenate((starts, [len(r)])))
    for l in np.unique(lens):
        if l == 0:
            continue
        s = starts[lens == l]
        idx = s[:, None] + np.arange(int(l), dtype=np.int64)[None, :]
        yield int(l), x[idx]


def _k_subset_keys(row: np.ndarray, item: np.ndarray, k: int,
                   u: int) -> np.ndarray:
    """All k-subsets of every basket segment as packed int64 keys
    (items are dense ids < u; key = sum items[i] * u^(k-1-i))."""
    out = []
    mults = u ** np.arange(k - 1, -1, -1, dtype=np.int64)
    for l, mat in _length_groups(row, item):
        if l < k:
            continue
        ci = _combo_idx(l, k)
        sub = mat[:, ci]                      # (n, C, k)
        out.append((sub * mults).sum(axis=2).ravel())
    if not out:
        return np.zeros(0, np.int64)
    return np.concatenate(out)


def _check_vocab_width(u: int, k: int):
    if k >= 2 and u > 3_000_000_000:
        raise RuntimeError(f"dense vocab {u} too wide to pack pairs")
    if k >= 3 and u > 2_000_000:
        raise RuntimeError(
            f"dense vocab {u} too wide to pack triples into int64; "
            "pre-filter items or lower max_len")


def _batch_rows(t: pa.Table):
    col = t["items"].combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0)
    flat = col.flatten().to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    offs = col.offsets.to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    lens = np.diff(offs)
    row = np.repeat(np.arange(len(t), dtype=np.int64), lens)
    return row, flat


def frequent_itemsets(ds, *, basket_col: str, item_col: str,
                      min_support, max_len: int = 3,
                      max_basket_items: int = 64,
                      max_candidates: int = 5_000_000):
    """-> Dataset (items list<int64> sorted, k int64, support int64).
    min_support: int (absolute basket count) or float in (0,1)
    (fraction of baskets). Exact — SON two-phase, no approximation."""
    if max_len < 1 or max_len > 3:
        raise ValueError("max_len must be 1..3")
    packed, n_baskets = _pack_baskets(ds, basket_col, item_col,
                                      max_basket_items)
    import ray.data as rd
    empty = pa.table({"items": pa.array([], pa.list_(pa.int64())),
                      "k": pa.array([], pa.int64()),
                      "support": pa.array([], pa.int64())})
    if n_baskets == 0:
        return rd.from_arrow(empty)
    if isinstance(min_support, float) and 0 < min_support < 1:
        frac = min_support
        s_abs = int(np.ceil(frac * n_baskets))
    else:
        s_abs = int(min_support)
        if s_abs < 1:
            raise ValueError("absolute min_support must be >= 1")
        frac = s_abs / n_baskets

    # ---- phase 1: local Apriori per block at the frac threshold
    def local_pass(t: pa.Table, _frac=frac, _max_len=max_len
                   ) -> pa.Table:
        if len(t) == 0 or "items" not in t.column_names:
            return pa.table({
                "i1": pa.array([], pa.int64()),
                "i2": pa.array([], pa.int64()),
                "i3": pa.array([], pa.int64()),
                "k": pa.array([], pa.int64())})
        row, flat = _batch_rows(t)
        thresh = max(1, int(np.ceil(_frac * len(t))))
        cols = {f"i{j}": [] for j in (1, 2, 3)}
        ks = []
        # L1
        u1, c1 = np.unique(flat, return_counts=True)
        keep1 = u1[c1 >= thresh]
        cols["i1"].append(keep1)
        cols["i2"].append(np.full(len(keep1), -1, np.int64))
        cols["i3"].append(np.full(len(keep1), -1, np.int64))
        ks.append(np.full(len(keep1), 1, np.int64))
        if _max_len >= 2 and len(keep1) >= 2:
            # restrict baskets to locally frequent items, dense ids
            dense = np.searchsorted(keep1, flat)
            ok = (dense < len(keep1))
            ok &= keep1[np.minimum(dense, len(keep1) - 1)] == flat
            r2, d2 = row[ok], dense[ok]
            u = len(keep1)
            for k in range(2, _max_len + 1):
                _check_vocab_width(u, k)
                keys = _k_subset_keys(r2, d2, k, u)
                if len(keys) == 0:
                    break
                uk, ck = np.unique(keys, return_counts=True)
                uk = uk[ck >= thresh]
                if len(uk) == 0:
                    break
                parts = []
                rem = uk
                for j in range(k - 1, -1, -1):
                    parts.append(rem // (u ** j))
                    rem = rem % (u ** j)
                ids = [keep1[p] for p in parts]
                for j in range(3):
                    cols[f"i{j + 1}"].append(
                        ids[j] if j < k
                        else np.full(len(uk), -1, np.int64))
                ks.append(np.full(len(uk), k, np.int64))
        return pa.table({
            "i1": pa.array(np.concatenate(cols["i1"])),
            "i2": pa.array(np.concatenate(cols["i2"])),
            "i3": pa.array(np.concatenate(cols["i3"])),
            "k": pa.array(np.concatenate(ks))})

    cand_parts = packed.map_batches(local_pass,
                                    batch_format="pyarrow")
    cand_tbls = [pa.table(b) for b in cand_parts.iter_batches(
        batch_format="pyarrow")]
    if not cand_tbls:
        return rd.from_arrow(empty)
    cand = pa.concat_tables(cand_tbls)
    arr = np.stack([
        cand["k"].to_numpy(zero_copy_only=False).astype(np.int64),
        cand["i1"].to_numpy(zero_copy_only=False).astype(np.int64),
        cand["i2"].to_numpy(zero_copy_only=False).astype(np.int64),
        cand["i3"].to_numpy(zero_copy_only=False).astype(np.int64)],
        axis=1)
    arr = np.unique(arr, axis=0)
    if len(arr) > max_candidates:
        raise RuntimeError(
            f"{len(arr)} phase-1 candidates exceed max_candidates="
            f"{max_candidates}; raise min_support or the cap")

    # global dense vocab over candidate items only
    vocab = np.unique(arr[:, 1:][arr[:, 1:] >= 0])
    u = len(vocab)
    kmax = int(arr[:, 0].max(initial=1))
    _check_vocab_width(u, kmax)
    mult = {k: u ** np.arange(k - 1, -1, -1, dtype=np.int64)
            for k in range(1, kmax + 1)}
    cand_keys = {}
    for k in range(1, kmax + 1):
        rows = arr[arr[:, 0] == k]
        if len(rows) == 0:
            continue
        dense = np.searchsorted(vocab, rows[:, 1:k + 1])
        cand_keys[k] = np.sort((dense * mult[k]).sum(axis=1))
    vocab_ref = ray.put(vocab)
    keys_ref = ray.put(cand_keys)

    # ---- phase 2: exact global counts of the candidate union
    def count_pass(t: pa.Table, _v=vocab_ref, _kk=keys_ref
                   ) -> pa.Table:
        if len(t) == 0 or "items" not in t.column_names:
            return pa.table({"k": pa.array([], pa.int64()),
                             "key": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        voc = ray.get(_v)
        ckeys = ray.get(_kk)
        if len(voc) == 0 or not ckeys:
            return pa.table({"k": pa.array([], pa.int64()),
                             "key": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        row, flat = _batch_rows(t)
        dense = np.searchsorted(voc, flat)
        ok = dense < len(voc)
        ok &= voc[np.minimum(dense, len(voc) - 1)] == flat
        r2, d2 = row[ok], dense[ok]
        uu = len(voc)
        out_k, out_key, out_cnt = [], [], []
        for k, ck in ckeys.items():
            if k == 1:
                keys = d2
            else:
                keys = _k_subset_keys(r2, d2, k, uu)
            if len(keys) == 0:
                continue
            pos = np.searchsorted(ck, keys)
            hit = pos < len(ck)
            hit &= ck[np.minimum(pos, len(ck) - 1)] == keys
            kk, cc = np.unique(keys[hit], return_counts=True)
            out_k.append(np.full(len(kk), k, np.int64))
            out_key.append(kk)
            out_cnt.append(cc.astype(np.int64))
        if not out_key:
            return pa.table({"k": pa.array([], pa.int64()),
                             "key": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        return pa.table({
            "k": pa.array(np.concatenate(out_k)),
            "key": pa.array(np.concatenate(out_key)),
            "cnt": pa.array(np.concatenate(out_cnt))})

    parts = packed.map_batches(count_pass, batch_format="pyarrow")

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "key": pa.array([], pa.int64()),
                             "support": pa.array([], pa.int64())})
        agg = g.groupby(["k", "key"], as_index=False)["cnt"].sum()
        return pa.table({
            "k": pa.array(agg["k"].to_numpy(np.int64)),
            "key": pa.array(agg["key"].to_numpy(np.int64)),
            "support": pa.array(agg["cnt"].to_numpy(np.int64))})

    summed = bucketed_group_apply(parts, "key", fold)

    def finish(t: pa.Table, _v=vocab_ref, _s=s_abs) -> pa.Table:
        ek = pa.table({"items": pa.array([], pa.list_(pa.int64())),
                       "k": pa.array([], pa.int64()),
                       "support": pa.array([], pa.int64())})
        if len(t) == 0 or "key" not in t.column_names:
            return ek
        voc = ray.get(_v)
        uu = len(voc)
        k = t["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = t["key"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sup = t["support"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = sup >= _s
        k, key, sup = k[keep], key[keep], sup[keep]
        if len(k) == 0:
            return ek
        # deterministic order inside the block: (k, key)
        order = np.lexsort((key, k))
        k, key, sup = k[order], key[order], sup[order]
        flat, offs = [], [0]
        for ki, keyi in zip(k.tolist(), key.tolist()):
            rem, ids = keyi, []
            for j in range(ki - 1, -1, -1):
                ids.append(int(voc[rem // (uu ** j)]))
                rem = rem % (uu ** j)
            flat.extend(ids)
            offs.append(offs[-1] + ki)
        lst = pa.ListArray.from_arrays(
            pa.array(np.array(offs, np.int32)),
            pa.array(np.array(flat, np.int64)))
        return pa.table({"items": lst, "k": pa.array(k),
                         "support": pa.array(sup)})

    out, _ = J.solidify(summed.map_batches(finish,
                                           batch_format="pyarrow"))
    return out


def association_rules(freq_ds, *, n_baskets: int,
                      min_confidence: float = 0.5,
                      max_rules_input: int = 5_000_000):
    """-> Dataset (antecedent list<int64>, consequent list<int64>,
    support int64, confidence float64, lift float64) from a
    `frequent_itemsets` output. Driver-side over the capped frequent
    table (every antecedent's support is present by Apriori
    monotonicity)."""
    import ray.data as rd
    tbls = [pa.table(b) for b in freq_ds.iter_batches(
        batch_format="pyarrow")]
    empty = pa.table({
        "antecedent": pa.array([], pa.list_(pa.int64())),
        "consequent": pa.array([], pa.list_(pa.int64())),
        "support": pa.array([], pa.int64()),
        "confidence": pa.array([], pa.float64()),
        "lift": pa.array([], pa.float64())})
    if not tbls:
        return rd.from_arrow(empty)
    t = pa.concat_tables(tbls)
    if len(t) > max_rules_input:
        raise RuntimeError(
            f"{len(t)} frequent itemsets exceed max_rules_input="
            f"{max_rules_input}")
    items = t["items"].to_pylist()
    sup = t["support"].to_pylist()
    smap = {tuple(s): v for s, v in zip(items, sup)}
    rows = []
    for s, v in sorted(smap.items()):
        if len(s) < 2:
            continue
        for r in range(1, len(s)):
            for ante in combinations(s, r):
                cons = tuple(x for x in s if x not in ante)
                conf = v / smap[ante]
                if conf < min_confidence:
                    continue
                lift = conf / (smap[cons] / n_baskets)
                rows.append((list(ante), list(cons), v, conf, lift))
    if not rows:
        return rd.from_arrow(empty)
    return rd.from_arrow(pa.table({
        "antecedent": pa.array([r[0] for r in rows],
                               pa.list_(pa.int64())),
        "consequent": pa.array([r[1] for r in rows],
                               pa.list_(pa.int64())),
        "support": pa.array([r[2] for r in rows], pa.int64()),
        "confidence": pa.array([r[3] for r in rows], pa.float64()),
        "lift": pa.array([r[4] for r in rows], pa.float64())}))

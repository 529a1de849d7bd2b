"""Bounded edit-distance similarity join — find all pairs of short
strings (names, titles, addresses, OCR tokens) within Levenshtein
distance ``d_max``. The fuzzy-matching sibling of the token-set
joins in stages/dedup.py.

Candidate generation is the public SymSpell deletion-neighborhood
scheme: if ed(a, b) <= d then deleting the <= d characters each
contributes to the optimal alignment yields a COMMON string, so
emitting every variant reachable by 0..d deletions from each side and
grouping on equal variants is a complete candidate filter. Variants
are never materialized as strings: each variant's polynomial rolling
hash (odd-base, 2^64 ring — same family as substring_dedup) is
assembled from prefix-hash arrays, fully vectorized per length group
(d=1: one broadcast; d=2: the i<j deletion grid). Hash collisions
only cost extra candidates — verification is exact.

Verification is a BANDED Levenshtein DP (width 2*d_max+1) vectorized
ACROSS pairs: the i-loop runs to the batch max length, each band cell
is elementwise numpy, and each pair's result is captured at its own
(len_a, len_b) cell, so differing lengths share one DP. Exact for
any pair with |len_a - len_b| <= d (others are rejected by the length
filter first).

Ray-Data shape: map-side variant-hash emission -> ONE key-bucket
shuffle (`pairs_from_key_rows`, hot variants capped with sentinel
rows) -> one pair-dedup bucket pass -> two bucketed text attaches ->
map-side banded DP. Pairs reach the driver only after verification.

Scale note: variant fan-out is L+1 per string at d=1 and O(L^2/2) at
d=2 — intended for SHORT strings (``max_len`` raises past 64 by
default). Whole-document near-dup belongs to MinHash/SimHash, not
edit distance.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import join as J
from .dedup import (_split_cap_sentinels, pairs_from_key_rows)
from .join import bucketed_group_apply

_B = np.uint64(0x9E3779B97F4A7C15)   # odd => invertible mod 2^64
_GOLD = np.uint64(0xBF58476D1CE4E5B9)
_INF = np.int32(1 << 20)


def _codepoints(texts, max_len: int):
    """list[str] -> (list of uint64 arrays, lengths). Codepoint-level
    (+1 so no real char hashes like the empty prefix)."""
    arrs, lens = [], np.empty(len(texts), np.int64)
    for i, s in enumerate(texts):
        a = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32) \
            .astype(np.uint64) + np.uint64(1)
        if len(a) > max_len:
            raise ValueError(
                f"string of length {len(a)} exceeds max_len={max_len}"
                " — edit joins are for short strings; truncate or"
                " normalize upstream, or raise max_len")
        arrs.append(a)
        lens[i] = len(a)
    return arrs, lens


def _bpows(n: int) -> np.ndarray:
    out = np.empty(n + 1, np.uint64)
    out[0] = np.uint64(1)
    with np.errstate(over="ignore"):   # 2^64 ring by design
        for i in range(1, n + 1):
            out[i] = out[i - 1] * _B
    return out


def _variant_hashes(arrs, lens, d_max: int, max_len: int):
    """All 0..d_max-deletion variant hashes per string -> (row_idx,
    vhash) arrays. Vectorized per length group; the variant's length
    is mixed into the key so equal hashes imply equal-length
    variants."""
    pows = _bpows(max_len + 1)
    lens = np.asarray(lens, np.int64)
    order = np.argsort(lens, kind="stable")
    out_rows, out_hash = [], []
    for L in np.unique(lens):
        grp = order[np.searchsorted(lens[order], L):
                    np.searchsorted(lens[order], L, side="right")]
        L = int(L)
        m = len(grp)
        M = np.zeros((m, L), np.uint64)
        for r, gi in enumerate(grp):
            M[r] = arrs[gi]
        # prefix hashes P[:, i] = h(s[:i])
        P = np.zeros((m, L + 1), np.uint64)
        for i in range(1, L + 1):
            P[:, i] = P[:, i - 1] * _B + M[:, i - 1]

        def key(h, vlen):
            return (h * _GOLD + np.uint64(vlen)).view(np.int64)

        out_rows.append(np.repeat(grp, 1))
        out_hash.append(key(P[:, L], L))
        if d_max >= 1 and L >= 1:
            idx = np.arange(L)
            W = pows[L - 1 - idx]
            H1 = (P[:, :L] * W[None, :]
                  + (P[:, L:L + 1] - P[:, 1:L + 1] * W[None, :]))
            out_rows.append(np.repeat(grp, L))
            out_hash.append(key(H1, L - 1).ravel())
        if d_max >= 2 and L >= 2:
            ii, jj = np.triu_indices(L, k=1)
            wm = pows[jj - ii - 1]
            wc = pows[L - jj - 1]
            # chunk rows so the (rows, L^2/2) grid stays bounded
            step = max(1, 32_000_000 // max(1, len(ii)))
            for s in range(0, m, step):
                e = min(m, s + step)
                hA = P[s:e, ii]
                hBm = P[s:e, jj] - P[s:e, ii + 1] * wm[None, :]
                hC = (P[s:e, L:L + 1]
                      - P[s:e, jj + 1] * wc[None, :])
                h2 = (hA * wm[None, :] + hBm) * wc[None, :] + hC
                out_rows.append(np.repeat(grp[s:e], len(ii)))
                out_hash.append(key(h2, L - 2).ravel())
    return (np.concatenate(out_rows) if out_rows
            else np.array([], np.int64),
            np.concatenate(out_hash) if out_hash
            else np.array([], np.int64))


def banded_edit_distances(a_texts, b_texts, d_max: int,
                          max_len: int = 4096) -> np.ndarray:
    """Exact Levenshtein distance per (a, b) pair where the true
    distance is <= d_max; pairs beyond the band report > d_max
    (capped at _INF). Vectorized across pairs."""
    arrs_a, la = _codepoints(a_texts, max_len)
    arrs_b, lb = _codepoints(b_texts, max_len)
    n = len(arrs_a)
    if n == 0:
        return np.array([], np.int32)
    Lmax = int(max(la.max(), lb.max(), 1))
    A = np.full((n, Lmax), np.uint64(0), np.uint64)
    Bm = np.full((n, Lmax), np.uint64(1 << 63), np.uint64)
    for r in range(n):
        A[r, :len(arrs_a[r])] = arrs_a[r]
        Bm[r, :len(arrs_b[r])] = arrs_b[r]
    width = 2 * d_max + 1
    dp = np.full((n, width), _INF, np.int32)
    for k in range(d_max, width):
        dp[:, k] = k - d_max   # D[0][j] = j
    res = np.full(n, _INF, np.int32)
    m0 = la == 0
    if m0.any():
        r0 = lb[m0]
        res[m0] = np.where(r0 <= d_max, r0, _INF).astype(np.int32)
    for i in range(1, Lmax + 1):
        ndp = np.full((n, width), _INF, np.int32)
        ai = A[:, i - 1]
        for k in range(width):
            j = i + k - d_max
            if j < 0 or j > Lmax:
                continue
            if j == 0:
                ndp[:, k] = i
                continue
            sub = dp[:, k] + (ai != Bm[:, j - 1])
            best = np.minimum(sub, dp[:, k + 1] + 1) \
                if k + 1 < width else sub
            if k > 0:
                best = np.minimum(best, ndp[:, k - 1] + 1)
            ndp[:, k] = np.minimum(best, _INF)
        dp = ndp
        hit = la == i
        if hit.any():
            kk = lb[hit] - i + d_max
            ok = (kk >= 0) & (kk < width)
            vals = np.full(int(hit.sum()), _INF, np.int32)
            vals[ok] = np.take_along_axis(
                dp[hit], np.clip(kk, 0, width - 1)[:, None],
                axis=1).ravel()[ok]
            res[hit] = vals
    return res


def edit_distance_pairs(docs_ds, *, d_max: int = 1,
                        id_col: str = "id", text_col: str = "text",
                        max_len: int = 64, max_df: int = 256,
                        lowercase: bool = False):
    """-> pa.Table (a_id, b_id, dist) of all pairs with
    Levenshtein(a, b) <= d_max (a_id < b_id, sorted). Hot deletion
    variants past `max_df` are dropped with printed counts (the
    dedup-family sentinel contract). Duplicate ids must be distinct
    rows (pairs are by id)."""
    if d_max not in (1, 2):
        raise ValueError("d_max must be 1 or 2")

    def emit(t: pa.Table) -> pa.Table:
        empty = pa.table({"sh": pa.array([], pa.int64()),
                          "doc_id": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        texts = t[text_col].to_pylist()
        if lowercase:
            texts = [s.lower() for s in texts]
        ids = t[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        arrs, lens = _codepoints(texts, max_len)
        rows, hashes = _variant_hashes(arrs, lens, d_max, max_len)
        # a string can reach the same variant several ways (deleting
        # either of two equal adjacent chars): dedup (doc, hash)
        # map-side so no key group holds a doc twice (else the pair
        # kernel would emit a self-pair) and shuffle volume shrinks
        rid = ids[rows]
        order = np.lexsort((rid, hashes))
        h, r = hashes[order], rid[order]
        first = np.concatenate(
            ([True], (h[1:] != h[:-1]) | (r[1:] != r[:-1])))
        return pa.table({"sh": pa.array(h[first]),
                         "doc_id": pa.array(r[first])})

    rows = docs_ds.map_batches(emit, batch_format="pyarrow")
    cand = pairs_from_key_rows(rows, key_col="sh", max_df=max_df)

    # split sentinels, then global pair dedup (one bucket pass; a pair
    # can surface from several variants across buckets)
    dropped: list[int] = []

    def split(t: pa.Table) -> pa.Table:
        real, drops = _split_cap_sentinels(t)
        if drops:
            print(f"edit_distance_pairs: {len(drops)} hot variants "
                  f"capped (max_df={max_df}), {sum(drops)} rows "
                  "dropped — raise max_df or normalize inputs")
        return real

    def tag_pk(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"a_id": pa.array([], pa.int64()),
                             "b_id": pa.array([], pa.int64()),
                             "pk": pa.array([], pa.int64())})
        a = t["a_id"].to_numpy(zero_copy_only=False)
        b = t["b_id"].to_numpy(zero_copy_only=False)
        pk = ((a.view(np.uint64) * _GOLD)
              ^ (b.view(np.uint64) * _B)).view(np.int64)
        return t.append_column("pk", pa.array(pk))

    def dedup_bucket(g):
        g = g.drop_duplicates(["a_id", "b_id"])
        return pa.table({"a_id": pa.array(
            g["a_id"].to_numpy(np.int64)),
            "b_id": pa.array(g["b_id"].to_numpy(np.int64))})

    uniq = bucketed_group_apply(
        cand.map_batches(split, batch_format="pyarrow")
        .map_batches(tag_pk, batch_format="pyarrow"),
        "pk", dedup_bucket).materialize()

    # join inputs materialized: bucketed_attach_column's schema peek
    # re-executes lazy upstreams (the seq_pack lesson)
    slim = docs_ds.select_columns([id_col, text_col]).materialize()
    ta = slim.map_batches(
        lambda t: t.rename_columns(["doc_id", "text_a"]),
        batch_format="pyarrow")
    tb = slim.map_batches(
        lambda t: t.rename_columns(["doc_id", "text_b"]),
        batch_format="pyarrow")
    with_a = J.bucketed_attach_column(uniq, "a_id", ta, "doc_id",
                                      "text_a").materialize()
    with_b = J.bucketed_attach_column(with_a, "b_id", tb, "doc_id",
                                      "text_b")

    def verify(t: pa.Table) -> pa.Table:
        empty = pa.table({"a_id": pa.array([], pa.int64()),
                          "b_id": pa.array([], pa.int64()),
                          "dist": pa.array([], pa.int32())})
        if len(t) == 0 or "text_a" not in t.column_names:
            return empty
        at = t["text_a"].to_pylist()
        bt = t["text_b"].to_pylist()
        if lowercase:
            at = [s.lower() for s in at]
            bt = [s.lower() for s in bt]
        d = banded_edit_distances(at, bt, d_max, max_len)
        keep = d <= d_max
        return pa.table({
            "a_id": pc.array_filter(t["a_id"], pa.array(keep)),
            "b_id": pc.array_filter(t["b_id"], pa.array(keep)),
            "dist": pa.array(d[keep])})

    verified = with_b.map_batches(verify, batch_format="pyarrow")
    parts = [p for p in verified.iter_batches(
        batch_size=None, batch_format="pyarrow") if p.num_rows]
    if not parts:
        return pa.table({"a_id": pa.array([], pa.int64()),
                         "b_id": pa.array([], pa.int64()),
                         "dist": pa.array([], pa.int32())})
    df = pa.concat_tables(parts).to_pandas() \
        .drop_duplicates(["a_id", "b_id"]) \
        .sort_values(["a_id", "b_id"])
    return pa.table({"a_id": pa.array(df["a_id"].to_numpy(np.int64)),
                     "b_id": pa.array(df["b_id"].to_numpy(np.int64)),
                     "dist": pa.array(df["dist"].to_numpy(np.int32))})

"""Video near-duplicate detection — the clip-level analog of the
image aHash dedup (`stages/image_dedup.py`) and the trajectory LSH
verify (`stages/traj_dedup.py`): re-uploaded clips differ by
trimming, a few-frame offset, or light re-encode noise, so the
matcher must tolerate both temporal shift and per-frame jitter.

Pipeline (real Ray plumbing over the stub codec, swap decode_video
for libav on a full cluster):

1. Map-side (zero shuffles): decode each clip ONCE -> per-frame
   aHash (vectorized `ahash_stack` over the whole frame stack) ->
   the clip's hash SEQUENCE, plus MinHash band rows over its frame-
   hash k-gram shingles (order-aware recall, same MinHasher as the
   text/trajectory dedups).
2. `pairs_from_key_rows` -> capped candidate pairs (sentinel
   surfacing), cross-band dedup BEFORE the verify.
3. Verify exactly: attach both hash sequences via bucketed Arrow
   joins; `best_shift_similarity` scans every temporal offset and
   scores the best alignment as (frames matching within
   `ham_thr` Hamming bits) / min(len_a, len_b) — trimming shortens
   min-len, shift is scanned, jitter is absorbed by the Hamming
   tolerance. O(n*m) per candidate pair, LSH-pruned.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.media import decode_video
from .dedup import CAP_SENTINEL_ID, MinHasher, _combine_shingles, \
    _STAGE_CACHE
from .image_dedup import ahash_stack
from .join import bucketed_attach_column, solidify

_MIX = np.uint64(0x9E3779B97F4A7C15)


def frame_hashes(buf: bytes) -> np.ndarray:
    """One clip -> (n_frames,) uint64 per-frame aHash."""
    return ahash_stack(decode_video(buf))


def best_shift_similarity(ha: np.ndarray, hb: np.ndarray,
                          ham_thr: int = 6) -> float:
    """Best temporal alignment score: max over integer shifts of
    #(aligned frame pairs with popcount(xor) <= ham_thr) /
    min(len(ha), len(hb))."""
    na, nb = len(ha), len(hb)
    if na == 0 or nb == 0:
        return 0.0
    ha = ha.astype(np.uint64)
    hb = hb.astype(np.uint64)
    best = 0
    for shift in range(-(nb - 1), na):
        s, e = max(0, shift), min(na, nb + shift)
        if e <= s:
            continue
        x = ha[s:e] ^ hb[s - shift:e - shift]
        # vectorized popcount via byte-view LUT-free bit trick
        m = (np.bitwise_count(x) if hasattr(np, "bitwise_count")
             else _popcount64(x))
        best = max(best, int((m <= ham_thr).sum()))
    return best / min(na, nb)


def _popcount64(x: np.ndarray) -> np.ndarray:
    b = x.view(np.uint8).reshape(len(x), 8)
    return np.unpackbits(b, axis=1).sum(axis=1)


def _sequences(videos_ds, *, id_col: str, video_col: str):
    """-> Dataset (vid, hashes list<int64>), map-side single decode."""

    def per_batch(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        seqs = [frame_hashes(buf).view(np.int64)
                for buf in t[video_col].to_pylist()]
        return pa.table({"vid": pa.array(ids),
                         "hashes": pa.array(seqs,
                                            pa.list_(pa.int64()))})

    return videos_ds.map_batches(per_batch, batch_format="pyarrow")


def video_dup_pairs(videos_ds, *, sim_threshold: float = 0.8,
                    ham_thr: int = 6, shingle_k: int = 3,
                    n_perm: int = 64, n_bands: int = 32,
                    seed: int = 42, max_df: int = 256,
                    id_col: str = "video_id",
                    video_col: str = "video") -> pa.Table:
    """-> pa.Table (a_id, b_id, sim), a_id < b_id, sorted: verified
    near-duplicate clip pairs (best-shift similarity >=
    `sim_threshold`). Candidate recall is MinHash-LSH over frame-hash
    shingles (a true pair never colliding in any band can be missed;
    every RETURNED pair is exactly verified). Capped band buckets are
    surfaced via the shared sentinel report."""
    from .dedup import pairs_from_key_rows

    seqs = _sequences(videos_ds, id_col=id_col,
                      video_col=video_col).materialize()
    rows_per_band = n_perm // n_bands

    def band_rows(t: pa.Table) -> pa.Table:
        empty = pa.table({"bkey": pa.array([], pa.int64()),
                          "doc_id": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        key = ("mh", n_perm, seed, shingle_k)
        mh = _STAGE_CACHE.get(key)
        if mh is None:
            mh = _STAGE_CACHE[key] = MinHasher(n_perm, seed, shingle_k)
        ids = t["vid"].to_numpy(zero_copy_only=False)
        out_key, out_doc = [], []
        sig_rows, sig_ids = [], []
        for i, seq in enumerate(t["hashes"].to_pylist()):
            h = np.asarray(seq, np.int64).view(np.uint64) * _MIX
            if len(h) < shingle_k:  # too short to shingle: no bands
                continue
            sig_rows.append(mh.signature(_combine_shingles(h,
                                                           shingle_k)))
            sig_ids.append(ids[i])
        if not sig_rows:
            return empty
        sigs = np.stack(sig_rows)
        ids = np.asarray(sig_ids, np.int64)
        for bnd in range(n_bands):
            seg = sigs[:, bnd * rows_per_band:(bnd + 1) * rows_per_band]
            hk = np.bitwise_xor.reduce(seg * _MIX + np.uint64(bnd),
                                       axis=1)
            out_key.append(hk.view(np.int64))
            out_doc.append(ids)
        return pa.table({"bkey": pa.array(np.concatenate(out_key)),
                         "doc_id": pa.array(np.concatenate(out_doc))})

    rows = seqs.map_batches(band_rows, batch_format="pyarrow")
    cand = pairs_from_key_rows(rows, key_col="bkey",
                               max_df=max_df).materialize()
    empty = pa.table({"a_id": pa.array([], pa.int64()),
                      "b_id": pa.array([], pa.int64()),
                      "sim": pa.array([], pa.float64())})
    if cand.count() == 0:
        return empty
    n_capped = 0

    def drop_sent(t: pa.Table) -> pa.Table:
        nonlocal n_capped
        is_cap = pc.equal(t["a_id"], CAP_SENTINEL_ID)
        n_capped += int(pc.sum(pc.cast(is_cap, pa.int64())).as_py()
                        or 0)
        return t.filter(pc.invert(is_cap))

    cand = cand.map_batches(drop_sent, batch_format="pyarrow") \
        .materialize()
    if n_capped:
        print(f"video_dup_pairs: {n_capped} band buckets over "
              f"max_df={max_df} dropped (raise max_df to include)")
    if cand.count() == 0:
        return empty
    from .join import distinct
    cand = distinct(cand, ["a_id", "b_id"]).materialize()

    def _ren(col):
        return seqs.map_batches(
            lambda t, c=col: pa.table({"vid": t["vid"],
                                       c: t["hashes"]}),
            batch_format="pyarrow")

    cand = bucketed_attach_column(cand, "a_id", _ren("a_h"),
                                  "vid", "a_h").materialize()
    cand = bucketed_attach_column(cand, "b_id", _ren("b_h"),
                                  "vid", "b_h")

    def verify(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        a = t["a_id"].to_numpy(zero_copy_only=False)
        b = t["b_id"].to_numpy(zero_copy_only=False)
        keep = ([], [], [])
        ah = t["a_h"].to_pylist()
        bh = t["b_h"].to_pylist()
        for i in range(len(t)):
            sim = best_shift_similarity(
                np.asarray(ah[i], np.int64).view(np.uint64),
                np.asarray(bh[i], np.int64).view(np.uint64),
                ham_thr=ham_thr)
            if sim >= sim_threshold:
                keep[0].append(int(a[i]))
                keep[1].append(int(b[i]))
                keep[2].append(sim)
        return pa.table({"a_id": pa.array(keep[0], pa.int64()),
                         "b_id": pa.array(keep[1], pa.int64()),
                         "sim": pa.array(keep[2], pa.float64())})

    verified = cand.map_batches(verify, batch_format="pyarrow")
    parts = [p for p in verified.iter_batches(batch_size=None,
                                              batch_format="pyarrow")
             if p.num_rows]
    if not parts:
        return empty
    df = pa.concat_tables(parts).to_pandas() \
        .drop_duplicates(["a_id", "b_id"]).sort_values(["a_id", "b_id"])
    return pa.table({"a_id": df["a_id"].astype(np.int64),
                     "b_id": df["b_id"].astype(np.int64),
                     "sim": df["sim"].astype(np.float64)})

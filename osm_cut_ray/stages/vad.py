"""Energy-based voice-activity detection (VAD) + speech segmentation.

The classic frame-energy VAD (the shape behind every speech-corpus
curation pipeline's "strip the silence" pass): frames of `frame_len`
samples every `hop` samples, per-frame RMS energy in dB, a per-clip
adaptive threshold (the q-th percentile frame energy — the noise
floor estimate — plus `margin_db`), then run-length post-processing:
speech runs separated by silence gaps shorter than `min_gap_s` merge
(the "hangover"), and merged runs shorter than `min_speech_s` drop.

Ray-Data shape: one map pass, zero shuffles — a clip's segmentation
depends on nothing outside the clip. Decode is per-blob (inherent);
EVERYTHING after decode is vectorized across ALL frames of ALL clips
in the batch at once: one concatenated sample buffer, one cumsum of
squares for every frame energy, one lexsort for the per-clip noise
percentile, and run-length merges on flat boundary arrays. No
per-frame Python.

Determinism: energies are exact float64 functions of the int16
samples in fixed order; the percentile is the numpy 'lower' method
(an actual frame's value, no interpolation) — results are
bit-identical under any partitioning (whole clips never split).
Pinned against a per-clip pure-Python replay in tests/test_vad.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.media import decode_audio

_EPS = 1e-12


def _segments_table() -> pa.Table:
    return pa.table({
        "audio_id": pa.array([], pa.int64()),
        "seg_idx": pa.array([], pa.int64()),
        "start_s": pa.array([], pa.float64()),
        "end_s": pa.array([], pa.float64()),
        "mean_db": pa.array([], pa.float64()),
        "n_frames": pa.array([], pa.int64())})


def _vad_kernel(*, frame_len: int = 256, hop: int = 128,
                noise_q: float = 0.1, margin_db: float = 6.0,
                min_speech_s: float = 0.05, min_gap_s: float = 0.05,
                id_col: str = "audio_id", audio_col: str = "audio"):
    """-> the per-batch segmentation kernel (shared by vad_segments
    and strip_silence, which runs it inline to stay one pass)."""
    if not (0.0 <= noise_q <= 1.0):
        raise ValueError("noise_q must be in [0, 1]")
    if hop <= 0 or frame_len <= 0:
        raise ValueError("frame_len and hop must be positive")

    def per_batch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _segments_table()
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        srs = np.empty(len(ids), np.int64)
        # PER-CLIP cumsum of squares (vectorized per clip inside the
        # unavoidable decode loop): a single global cumsum would let
        # earlier clips' float rounding pollute later clips' frame
        # energies, breaking bit-identity across batch compositions
        cs_parts, lens = [], np.empty(len(ids), np.int64)
        for i, buf in enumerate(t[audio_col].to_pylist()):
            pcm, sr = decode_audio(buf)
            srs[i] = sr
            lens[i] = len(pcm)
            xi = pcm.astype(np.float64) / 32768.0
            cs_parts.append(np.concatenate(([0.0], np.cumsum(xi * xi))))
        nf = np.where(lens >= frame_len,
                      1 + (lens - frame_len) // hop, 0)
        if int(nf.sum()) == 0:
            return _segments_table()
        cso = np.concatenate(cs_parts)
        cs_off = np.concatenate(([0], np.cumsum(lens + 1)))[:-1]
        clip_idx = np.repeat(np.arange(len(ids)), nf)
        frame_in_clip = (np.arange(len(clip_idx))
                         - np.repeat(np.concatenate(
                             ([0], np.cumsum(nf)))[:-1], nf))
        starts = cs_off[clip_idx] + frame_in_clip * hop
        energy = (cso[starts + frame_len] - cso[starts]) / frame_len
        db = 10.0 * np.log10(energy + _EPS)
        # per-clip noise floor: numpy 'lower' percentile via lexsort
        order = np.lexsort((db, clip_idx))
        foff = np.concatenate(([0], np.cumsum(nf)))
        present = np.flatnonzero(nf > 0)
        qpos = (foff[present]
                + np.floor(noise_q * (nf[present] - 1)).astype(np.int64))
        floor_db = np.full(len(ids), np.nan)
        floor_db[present] = db[order][qpos]
        speech = db > (floor_db[clip_idx] + margin_db)

        # run-length over (clip, speech): boundaries where either flips
        chg = np.flatnonzero((clip_idx[1:] != clip_idx[:-1])
                             | (speech[1:] != speech[:-1])) + 1
        r_start = np.concatenate(([0], chg))
        r_end = np.concatenate((chg, [len(speech)]))
        r_clip = clip_idx[r_start]
        r_speech = speech[r_start]
        # hangover: a silence run shorter than min_gap frames BETWEEN
        # two speech runs of the same clip becomes speech
        sr_clip = srs[r_clip]
        min_gap_f = np.maximum(
            1, np.ceil(min_gap_s * sr_clip / hop).astype(np.int64))
        n_r = len(r_start)
        interior = np.zeros(n_r, bool)
        if n_r >= 3:
            mid = np.arange(1, n_r - 1)
            interior[mid] = (~r_speech[mid]
                             & r_speech[mid - 1] & r_speech[mid + 1]
                             & (r_clip[mid] == r_clip[mid - 1])
                             & (r_clip[mid] == r_clip[mid + 1])
                             & ((r_end[mid] - r_start[mid])
                                < min_gap_f[mid]))
        r_speech = r_speech | interior
        # merge adjacent same-(clip, speech) runs after the fill
        keep = np.concatenate(([True],
                               (r_clip[1:] != r_clip[:-1])
                               | (r_speech[1:] != r_speech[:-1])))
        g_start = r_start[keep]
        grp = np.cumsum(keep) - 1
        g_end = np.zeros(len(g_start), np.int64)
        np.maximum.at(g_end, grp, r_end)
        g_clip = r_clip[keep]
        g_speech = r_speech[keep]

        sel = np.flatnonzero(g_speech)
        if len(sel) == 0:
            return _segments_table()
        s_clip = g_clip[sel]
        f0 = g_start[sel] - foff[s_clip]      # frame index within clip
        f1 = g_end[sel] - foff[s_clip]
        sr_c = srs[s_clip].astype(np.float64)
        start_s = (f0 * hop) / sr_c
        end_s = ((f1 - 1) * hop + frame_len) / sr_c
        dur_ok = (end_s - start_s) >= min_speech_s
        # mean dB via paired reduceat (left-to-right within each
        # segment only — a global cumsum would leak float rounding
        # across clips); zero guard handles a segment ending at the
        # last frame (the repo's ragged-offsets trick, diff.py)
        db_g = np.concatenate((db, [0.0]))
        pairs = np.stack((g_start[sel], g_end[sel]), axis=1).ravel()
        seg_sum = np.add.reduceat(db_g, pairs)[::2]
        mean_db = seg_sum / (g_end[sel] - g_start[sel])
        sel2 = np.flatnonzero(dur_ok)
        if len(sel2) == 0:
            return _segments_table()
        s_clip = s_clip[sel2]
        # dense per-clip seg_idx in time order
        new_clip = np.concatenate(([True], s_clip[1:] != s_clip[:-1]))
        seg_pos = np.arange(len(s_clip)) \
            - np.repeat(np.flatnonzero(new_clip),
                        np.diff(np.concatenate(
                            (np.flatnonzero(new_clip), [len(s_clip)]))))
        return pa.table({
            "audio_id": ids[s_clip],
            "seg_idx": seg_pos.astype(np.int64),
            "start_s": start_s[sel2],
            "end_s": end_s[sel2],
            "mean_db": mean_db[sel2],
            "n_frames": (g_end[sel] - g_start[sel])[sel2]})

    return per_batch


def vad_segments(audio_ds, **kw):
    """-> Dataset (audio_id, seg_idx, start_s, end_s, mean_db,
    n_frames): detected speech segments per clip, seg_idx dense from
    0 in time order. Clips shorter than one frame emit nothing; a
    constant-energy clip emits nothing (the margin is relative to
    the clip's own noise floor). One map pass, zero shuffles."""
    return audio_ds.map_batches(_vad_kernel(**kw),
                                batch_format="pyarrow")


def strip_silence(audio_ds, *, id_col: str = "audio_id",
                  audio_col: str = "audio", **vad_kw):
    """Rewrite each clip keeping only its detected speech samples —
    the corpus-curation application. Clips with no detected speech
    are DROPPED. -> Dataset (audio_id, audio, kept_s, total_s)."""
    from ..sources.media import encode_audio_from_pcm

    kernel = _vad_kernel(id_col=id_col, audio_col=audio_col, **vad_kw)

    def rewrite(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"audio_id": pa.array([], pa.int64()),
                             audio_col: pa.array([], pa.large_binary()),
                             "kept_s": pa.array([], pa.float64()),
                             "total_s": pa.array([], pa.float64())})
        segs = kernel(t)
        by_clip: dict[int, list[tuple[float, float]]] = {}
        for aid, s0, s1 in zip(segs["audio_id"].to_pylist(),
                               segs["start_s"].to_pylist(),
                               segs["end_s"].to_pylist()):
            by_clip.setdefault(int(aid), []).append((s0, s1))
        out_id, out_buf, out_kept, out_tot = [], [], [], []
        for i, buf in enumerate(t[audio_col].to_pylist()):
            aid = int(t[id_col][i].as_py())
            spans = by_clip.get(aid)
            if not spans:
                continue
            pcm, sr = decode_audio(buf)
            mask = np.zeros(len(pcm), bool)
            for s0, s1 in spans:
                mask[int(round(s0 * sr)):int(round(s1 * sr))] = True
            kept = pcm[mask]
            out_id.append(aid)
            out_buf.append(encode_audio_from_pcm(kept, sr))
            out_kept.append(len(kept) / sr)
            out_tot.append(len(pcm) / sr)
        return pa.table({
            "audio_id": pa.array(out_id, pa.int64()),
            audio_col: pa.array(out_buf, pa.large_binary()),
            "kept_s": pa.array(out_kept, pa.float64()),
            "total_s": pa.array(out_tot, pa.float64())})

    return audio_ds.map_batches(rewrite, batch_format="pyarrow")

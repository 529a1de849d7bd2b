"""Energy VAD — pinned against a per-clip pure-Python replay of the
documented rule (frames, dB, lower-percentile floor + margin,
hangover fill, min-duration drop)."""

import math

import numpy as np
import pyarrow as pa
import pytest

import ray

from osm_cut_ray.sources.media import decode_audio, encode_audio_from_pcm
from osm_cut_ray.stages.vad import strip_silence, vad_segments

SR = 8000


def _clip(spans, total_s=2.0, amp=0.4, noise=1e-3, seed=0):
    """int16 pcm: quiet noise floor + loud tone bursts at `spans`
    (start_s, end_s)."""
    rng = np.random.RandomState(seed)
    n = int(total_s * SR)
    x = rng.randn(n) * noise
    tt = np.arange(n) / SR
    for s0, s1 in spans:
        m = (tt >= s0) & (tt < s1)
        x[m] += amp * np.sin(2 * np.pi * 440 * tt[m])
    return np.clip(x * 32767, -32768, 32767).astype(np.int16)


def _brute(pcm, sr, frame_len=256, hop=128, noise_q=0.1,
           margin_db=6.0, min_speech_s=0.05, min_gap_s=0.05):
    x = pcm.astype(np.float64) / 32768.0
    n = len(x)
    if n < frame_len:
        return []
    nf = 1 + (n - frame_len) // hop
    db = []
    for i in range(nf):
        seg = x[i * hop:i * hop + frame_len]
        e = float(np.sum(seg * seg)) / frame_len
        db.append(10.0 * math.log10(e + 1e-12))
    floor = sorted(db)[int(math.floor(noise_q * (nf - 1)))]
    speech = [d > floor + margin_db for d in db]
    runs, s = [], 0
    for i in range(1, nf + 1):
        if i == nf or speech[i] != speech[i - 1]:
            runs.append([s, i, speech[s]])
            s = i
    min_gap_f = max(1, math.ceil(min_gap_s * sr / hop))
    for j in range(1, len(runs) - 1):
        if (not runs[j][2]) and runs[j - 1][2] and runs[j + 1][2] \
                and (runs[j][1] - runs[j][0]) < min_gap_f:
            runs[j][2] = True
    merged = []
    for r in runs:
        if merged and merged[-1][2] == r[2]:
            merged[-1][1] = r[1]
        else:
            merged.append(list(r))
    out = []
    for s0, e0, sp in merged:
        if not sp:
            continue
        start_s = s0 * hop / sr
        end_s = ((e0 - 1) * hop + frame_len) / sr
        if end_s - start_s < min_speech_s:
            continue
        out.append((start_s, end_s, sum(db[s0:e0]) / (e0 - s0),
                    e0 - s0))
    return out


def _ds(clips, parts=3):
    t = pa.table({
        "audio_id": pa.array([c[0] for c in clips], pa.int64()),
        "audio": pa.array([encode_audio_from_pcm(c[1], SR)
                           for c in clips], pa.large_binary())})
    return ray.data.from_arrow(t).repartition(parts)


CLIPS = [
    (1, _clip([(0.3, 0.8), (1.2, 1.7)], seed=1)),          # two bursts
    (2, _clip([(0.2, 0.5), (0.52, 0.9)], seed=2)),         # short gap -> merge
    (3, _clip([(0.5, 0.503)], seed=3)),                    # too short -> drop
    (4, _clip([], seed=4)),                                # silence only
    (5, _clip([(0.0, 2.0)], noise=1e-4, seed=5)),          # wall-to-wall
    (6, np.zeros(100, np.int16)),                          # < one frame
]


def test_matches_brute_replay(ray_session):
    got = vad_segments(_ds(CLIPS)).to_pandas()
    for aid, pcm in CLIPS:
        exp = _brute(pcm, SR)
        g = got[got.audio_id == aid].sort_values("seg_idx")
        assert list(g.seg_idx) == list(range(len(exp))), aid
        for row, (s0, s1, mdb, nfr) in zip(g.itertuples(), exp):
            assert row.start_s == s0 and row.end_s == s1
            assert row.n_frames == nfr
            assert abs(row.mean_db - mdb) < 1e-9


def test_partition_invariant_bitwise(ray_session):
    a = vad_segments(_ds(CLIPS, parts=1)).to_pandas()
    b = vad_segments(_ds(CLIPS, parts=6)).to_pandas()
    key = ["audio_id", "seg_idx"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.equals(b)  # bit-for-bit, mean_db included


def test_hangover_merges_short_gap(ray_session):
    got = vad_segments(_ds(CLIPS)).to_pandas()
    assert len(got[got.audio_id == 2]) == 1          # gap filled
    assert len(got[got.audio_id == 1]) == 2          # long gap kept


def test_degenerates(ray_session):
    got = vad_segments(_ds(CLIPS)).to_pandas()
    assert len(got[got.audio_id == 3]) == 0          # min duration
    assert len(got[got.audio_id == 4]) == 0          # all noise
    assert len(got[got.audio_id == 6]) == 0          # sub-frame clip
    with pytest.raises(ValueError, match="noise_q"):
        vad_segments(_ds(CLIPS), noise_q=1.5)


def test_strip_silence_rewrites(ray_session):
    out = strip_silence(_ds(CLIPS)).to_pandas().set_index("audio_id")
    segs = vad_segments(_ds(CLIPS)).to_pandas()
    # only clips with detected speech survive
    assert set(out.index) == set(segs.audio_id)
    for aid in out.index:
        pcm, sr = decode_audio(out.loc[aid, "audio"])
        spans = segs[segs.audio_id == aid]
        exp_n = sum(int(round(r.end_s * sr)) - int(round(r.start_s * sr))
                    for r in spans.itertuples())
        assert len(pcm) == exp_n
        assert out.loc[aid, "kept_s"] == exp_n / sr
        orig = dict(CLIPS)[aid]
        assert out.loc[aid, "total_s"] == len(orig) / sr
        # kept samples are exactly the original span samples
        mask = np.zeros(len(orig), bool)
        for r in spans.itertuples():
            mask[int(round(r.start_s * sr)):int(round(r.end_s * sr))] = True
        np.testing.assert_array_equal(pcm, orig[mask])

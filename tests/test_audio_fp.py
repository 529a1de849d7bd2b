import zlib

import numpy as np
import pyarrow as pa

HOP = 256


def _enc(pcm: np.ndarray, sr: int = 8000) -> bytes:
    pcm = pcm.astype(np.int16)
    return (b"FAUD" + sr.to_bytes(4, "little")
            + len(pcm).to_bytes(4, "little")
            + zlib.compress(pcm.tobytes(), 1))


def _tone_mix(rng, n=6000, k=5):
    """Random sum of sines + light noise -> int16 waveform."""
    t = np.arange(n) / 8000.0
    x = np.zeros(n)
    for _ in range(k):
        f = float(rng.uniform(100, 3500))
        x += rng.uniform(0.1, 0.5) * np.sin(2 * np.pi * f * t
                                            + rng.uniform(0, 6.28))
    x += rng.normal(0, 0.01, n)
    return np.clip(x / np.abs(x).max() * 20000, -32768,
                   32767).astype(np.int16)


def test_landmarks_deterministic_and_shift_covariant():
    from osm_cut_ray.stages.audio_fp import landmarks

    rng = np.random.default_rng(2)
    pcm = _tone_mix(rng)
    h1, t1 = landmarks(pcm)
    h2, t2 = landmarks(pcm)
    np.testing.assert_array_equal(h1, h2)
    np.testing.assert_array_equal(t1, t2)
    assert len(h1) > 20
    # a copy trimmed by exactly 4 hops shares hashes with t1 shifted
    trimmed = pcm[4 * HOP:]
    h3, t3 = landmarks(trimmed)
    common = set(h1.tolist()) & set(h3.tolist())
    assert len(common) > 10
    # gain invariance of the landmark SET (peak ranks unchanged)
    h4, _ = landmarks((pcm * 0.5).astype(np.int16))
    inter = len(set(h1.tolist()) & set(h4.tolist()))
    assert inter > 0.7 * len(set(h1.tolist()))
    # too-short input: no landmarks
    assert len(landmarks(pcm[:100])[0]) == 0


def _brute_pairs(clips, *, min_votes, max_df, max_per_track=8):
    """Driver replay of the documented matching semantics."""
    from osm_cut_ray.stages.audio_fp import landmarks

    from collections import defaultdict
    hits = defaultdict(list)  # hash -> [(track, t1)]
    for tid, pcm in clips.items():
        h, t1 = landmarks(pcm)
        per = defaultdict(int)
        order = np.lexsort((t1, h.view(np.int64)))
        for i in order:
            key = int(h[i])
            if per[key] < max_per_track:
                per[key] += 1
                hits[key].append((tid, int(t1[i])))
    votes = defaultdict(int)
    for key, lst in hits.items():
        tracks = {t for t, _ in lst}
        if len(tracks) < 2 or len(tracks) > max_df:
            continue
        lst = sorted(lst)
        for x in range(len(lst)):
            for y in range(x + 1, len(lst)):
                (ta, oa), (tb, ob) = lst[x], lst[y]
                if ta == tb:
                    continue
                a, b, off = (ta, tb, oa - ob) if ta < tb \
                    else (tb, ta, ob - oa)
                votes[(a, b, off)] += 1
    best = {}
    for (a, b, off), v in votes.items():
        best[(a, b)] = max(best.get((a, b), 0), v)
    return {p: v for p, v in best.items() if v >= min_votes}


def test_audio_dup_pairs_matches_brute(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.audio_fp import audio_dup_pairs

    rng = np.random.default_rng(9)
    clips = {}
    planted = []
    tid = 0
    for base in range(10):
        pcm = _tone_mix(rng)
        clips[tid] = pcm
        base_id = tid
        tid += 1
        if base % 2 == 0:  # trimmed + re-gained re-upload
            dup = (pcm[3 * HOP:] * 0.7).astype(np.int16)
            clips[tid] = dup
            planted.append((base_id, tid))
            tid += 1
    ds = rd.from_arrow(pa.table({
        "audio_id": pa.array(sorted(clips), pa.int64()),
        "audio": pa.array([_enc(clips[i]) for i in sorted(clips)],
                          pa.binary())})).repartition(4)
    got = audio_dup_pairs(ds, min_votes=12)
    got_pairs = {(got["a_id"][i].as_py(), got["b_id"][i].as_py()):
                 got["votes"][i].as_py() for i in range(got.num_rows)}
    exp = _brute_pairs(clips, min_votes=12, max_df=64)
    assert got_pairs == exp
    assert set(planted) <= set(exp)


def test_audio_dup_pairs_empty(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.audio_fp import audio_dup_pairs

    rng = np.random.default_rng(1)
    ds = rd.from_arrow(pa.table({
        "audio_id": pa.array([0, 1], pa.int64()),
        "audio": pa.array([_enc(_tone_mix(rng)) for _ in range(2)],
                          pa.binary())}))
    got = audio_dup_pairs(ds, min_votes=12)
    assert got.schema.names == ["a_id", "b_id", "votes"]


def test_landmark_pairing_matches_loop_replay():
    """The vectorized searchsorted-window pairing must be
    bit-identical to a direct replay of the published scan rules
    (for each landmark i: walk j > i in time-major order, skip
    dt < 1, stop past max_dt, keep the first `fanout`) — the r4
    verdict #2 vectorization must not change a single hash."""
    from osm_cut_ray.stages.audio_fp import _HOP, _N_FFT, landmarks

    rng = np.random.default_rng(42)
    pcm = _tone_mix(rng, n=12000, k=7)
    for ppf, fanout, max_dt in ((3, 4, 24), (2, 7, 5), (5, 1, 40)):
        got_h, got_t = landmarks(pcm, peaks_per_frame=ppf,
                                 fanout=fanout, max_dt=max_dt)

        # independent loop replay from the same peak list
        x = pcm.astype(np.float64)
        n_frames = 1 + (len(x) - _N_FFT) // _HOP
        idx = (np.arange(_N_FFT)[None, :]
               + np.arange(n_frames)[:, None] * _HOP)
        mag = np.abs(np.fft.rfft(x[idx] * np.hanning(_N_FFT),
                                 axis=1))
        order = np.lexsort(
            (np.arange(mag.shape[1])[None, :].repeat(n_frames, 0),
             -mag), axis=1)[:, :ppf]
        order.sort(axis=1)
        ts = np.repeat(np.arange(n_frames, dtype=np.int64), ppf)
        fs = order.ravel().astype(np.int64)
        hh, tt = [], []
        for i in range(len(ts)):
            made = 0
            for j in range(i + 1, len(ts)):
                dt = ts[j] - ts[i]
                if dt < 1:
                    continue
                if dt > max_dt:
                    break
                hh.append((np.uint64(fs[i]) << np.uint64(32))
                          | (np.uint64(fs[j]) << np.uint64(12))
                          | np.uint64(dt))
                tt.append(ts[i])
                made += 1
                if made >= fanout:
                    break
        assert got_h.tolist() == [int(h) for h in hh]
        assert got_t.tolist() == tt

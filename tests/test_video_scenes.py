"""Shot-boundary + keyframe pins: detector == independent brute
replay on clips with planted cuts; min-gap greedy rule; keyframe
content identity; single-shot clips."""

import numpy as np
import pyarrow as pa

from osm_cut_ray.sources.images import decode_image, pixels_for_key
from osm_cut_ray.sources.media import (decode_video,
                                       encode_video_from_frames)


def _clip(segment_keys, seg_len=5, w=16):
    """Segments of smoothly-varying frames (consecutive pattern keys)
    with hard jumps between segments."""
    frames = []
    for k in segment_keys:
        for f in range(seg_len):
            frames.append(pixels_for_key(k + f, w, w))
    return np.stack(frames)


def _brute_shots(frames, thr, min_len):
    """Independent loop replay of the documented rule."""
    d = [0.0]
    for f in range(1, len(frames)):
        d.append(float(np.abs(frames[f].astype(int)
                              - frames[f - 1].astype(int)).mean()))
    cuts, last = [], 0
    for f in range(1, len(frames)):
        if d[f] > thr and f - last >= min_len:
            cuts.append(f)
            last = f
    bounds = [0] + cuts + [len(frames)]
    shots = []
    for i in range(len(bounds) - 1):
        s, e = bounds[i], bounds[i + 1]
        var = [float(frames[f].astype(float).var())
               for f in range(s, e)]
        shots.append((s, e, s + int(np.argmax(var))))
    return shots


def test_shot_rows_match_brute():
    from osm_cut_ray.stages.video_scenes import shot_rows

    rng = np.random.default_rng(8)
    for trial in range(4):
        keys = rng.integers(0, 10_000, 4).tolist()
        frames = _clip(keys, seg_len=int(rng.integers(3, 7)))
        starts, ends, kidx = shot_rows(frames, threshold=24.0,
                                       min_shot_len=2)
        exp = _brute_shots(frames, 24.0, 2)
        got = list(zip(starts.tolist(), ends.tolist(),
                       kidx.tolist()))
        assert got == exp, (trial, got, exp)


def test_min_shot_len_suppresses_adjacent_cuts():
    from osm_cut_ray.stages.video_scenes import detect_cuts

    d = np.array([0.0, 50.0, 50.0, 50.0, 0.0, 50.0])
    # min gap 3: accept f=3 (3-0>=3), skip f=1,2; f=5 skipped (5-3<3)
    assert detect_cuts(d, threshold=24.0,
                       min_shot_len=3).tolist() == [3]
    # min gap 1: every candidate accepted
    assert detect_cuts(d, threshold=24.0,
                       min_shot_len=1).tolist() == [1, 2, 3, 5]


def test_stage_rows_and_keyframe_content(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.video_scenes import video_scenes

    clips = {}
    rows = []
    rng = np.random.default_rng(3)
    for i in range(12):
        n_seg = int(rng.integers(1, 4))
        frames = _clip(rng.integers(0, 9999, n_seg).tolist(),
                       seg_len=4)
        vid = f"v{i:03d}"
        clips[vid] = frames
        rows.append({"video_id": vid,
                     "video": encode_video_from_frames(frames)})
    out = video_scenes(rd.from_items(rows).repartition(3),
                       threshold=24.0, min_shot_len=2,
                       concurrency=2)
    got = pa.concat_tables([pa.table(b) for b in
                            out.iter_batches(batch_format="pyarrow")])
    by_vid: dict = {}
    for i in range(got.num_rows):
        by_vid.setdefault(got["video_id"][i].as_py(), []).append(i)
    assert set(by_vid) == set(clips)
    for vid, idxs in by_vid.items():
        frames = clips[vid]
        exp = _brute_shots(frames, 24.0, 2)
        idxs = sorted(idxs, key=lambda i: got["shot_id"][i].as_py())
        assert len(idxs) == len(exp)
        # shots tile the clip exactly
        assert got["start_frame"][idxs[0]].as_py() == 0
        assert got["end_frame"][idxs[-1]].as_py() == len(frames)
        for j, i in enumerate(idxs):
            s, e, k = exp[j]
            assert got["start_frame"][i].as_py() == s
            assert got["end_frame"][i].as_py() == e
            assert got["keyframe_idx"][i].as_py() == k
            px, fmt = decode_image(got["keyframe"][i].as_py())
            assert fmt == "fpng" and (px == frames[k]).all()


def test_roundtrip_encode_from_frames():
    frames = np.stack([pixels_for_key(k, 16, 16)
                       for k in (5, 900, 901)])
    assert (decode_video(encode_video_from_frames(frames))
            == frames).all()

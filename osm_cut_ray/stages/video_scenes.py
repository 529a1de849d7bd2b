"""Shot-boundary detection + keyframe extraction — the video-side
entry point of a multimodal curation pipeline (split clips into
shots, keep one representative frame per shot, feed the keyframes to
the IMAGE stages: dedup / quality / crop / caption gates).

Algorithm (the classical pixel-difference shot detector, Zhang,
Kankanhalli & Smoliar 1993): the inter-frame signal is the mean
absolute pixel difference d[f] = mean|frame_f - frame_{f-1}|; a cut
opens where d[f] > `threshold`, subject to `min_shot_len` (cuts
inside the refractory window of an accepted cut are skipped,
left-to-right — the deterministic greedy rule). The keyframe of each
shot is its sharpest frame (max per-frame pixel variance, earliest
frame on ties).

Vectorization: all frame math (diff signal, per-frame variances) is
stack-vectorized per clip; only the greedy min-gap scan is a Python
loop and it runs over CANDIDATE CUTS (d > threshold), not frames or
pixels — the same bounded-loop class as greedy NMS. Clips decode
once. Actor-pool stage, small batches (wide binary rows), flat
one-row-per-shot output with the keyframe re-encoded as an `fpng`
image so it composes with every input_hint image stage. No shuffles.

The codec is the container's deterministic stub
(`sources/media.py`); swap libav in on a full cluster — the
detector itself only sees (n, h, w) uint8 stacks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.images import encode_image
from ..sources.media import decode_video


def frame_diff_signal(frames: np.ndarray) -> np.ndarray:
    """(n, h, w) uint8 -> (n,) float64; d[0] = 0, d[f] = mean abs
    pixel difference vs the previous frame."""
    f = frames.astype(np.int16)
    d = np.zeros(len(frames), np.float64)
    if len(frames) > 1:
        d[1:] = np.abs(f[1:] - f[:-1]).mean(axis=(1, 2))
    return d


def detect_cuts(d: np.ndarray, *, threshold: float,
                min_shot_len: int) -> np.ndarray:
    """Greedy left-to-right cut selection: frame indices f with
    d[f] > threshold and f - previous_accepted >= min_shot_len
    (shot starts; frame 0 always starts shot 0)."""
    cand = np.flatnonzero(d > threshold)
    cuts = []
    last = 0
    for f in cand:                      # loop over candidates only
        if f - last >= min_shot_len:
            cuts.append(int(f))
            last = f
    return np.asarray(cuts, np.int64)


def shot_rows(frames: np.ndarray, *, threshold: float,
              min_shot_len: int):
    """-> (starts, ends, key_idx): per-shot [start, end) frame ranges
    and the keyframe index (max per-frame variance, earliest on
    ties)."""
    n = len(frames)
    cuts = detect_cuts(frame_diff_signal(frames),
                       threshold=threshold,
                       min_shot_len=min_shot_len)
    starts = np.concatenate(([0], cuts)).astype(np.int64)
    ends = np.concatenate((cuts, [n])).astype(np.int64)
    flat = frames.reshape(n, -1).astype(np.float64)
    var = flat.var(axis=1)
    key_idx = np.empty(len(starts), np.int64)
    for i, (s, e) in enumerate(zip(starts, ends)):  # per shot, few
        key_idx[i] = s + int(np.argmax(var[s:e]))
    return starts, ends, key_idx


class VideoSceneStage:
    """Actor-pool map_batches stage: video rows (video_id, video) ->
    one row per shot: (video_id, shot_id, start_frame, end_frame,
    n_frames, keyframe_idx, keyframe — `fpng`-encoded image bytes)."""

    def __init__(self, threshold: float = 24.0,
                 min_shot_len: int = 2):
        if min_shot_len < 1:
            raise ValueError("min_shot_len must be >= 1")
        self.threshold = float(threshold)
        self.min_shot_len = int(min_shot_len)

    def __call__(self, t: pa.Table) -> pa.Table:
        vids, shot_ids, starts_o, ends_o, keys_o, blobs = \
            [], [], [], [], [], []
        if len(t) and "video" in t.column_names:
            ids = t["video_id"].to_pylist()
            for vid, buf in zip(ids, t["video"].to_pylist()):
                frames = decode_video(buf)
                starts, ends, kidx = shot_rows(
                    frames, threshold=self.threshold,
                    min_shot_len=self.min_shot_len)
                for s_i, (s, e, k) in enumerate(
                        zip(starts, ends, kidx)):
                    vids.append(vid)
                    shot_ids.append(s_i)
                    starts_o.append(int(s))
                    ends_o.append(int(e))
                    keys_o.append(int(k))
                    blobs.append(encode_image(frames[k], "fpng"))
        return pa.table({
            "video_id": pa.array(vids, pa.string()),
            "shot_id": pa.array(shot_ids, pa.int64()),
            "start_frame": pa.array(starts_o, pa.int64()),
            "end_frame": pa.array(ends_o, pa.int64()),
            "keyframe_idx": pa.array(keys_o, pa.int64()),
            "keyframe": pa.array(blobs, pa.binary()),
        })


def video_scenes(ds, *, threshold: float = 24.0,
                 min_shot_len: int = 2, concurrency=None,
                 batch_size: int = 64):
    """Video Dataset (video_id, video) -> shot Dataset (flat, one row
    per shot with its keyframe as image bytes). Small batches — wide
    binary rows (the guide's large-payload rule)."""
    if concurrency is None:
        from .pip import default_pool_size
        concurrency = default_pool_size()
    return ds.map_batches(
        VideoSceneStage,
        fn_constructor_kwargs={"threshold": threshold,
                               "min_shot_len": min_shot_len},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)

"""Fake video/audio containers + multimodal stages (north_star: treat
image/audio/video as opaque binary columns with typed metadata; decode/
feature-extract/frame-sample as actor-pool map_batches stages).

No media libraries exist in this container, so the codecs are
deterministic stand-ins (zlib-packed frames / int16 waveforms) behind
the same API a real libav/soundfile integration would use — the
Ray-side plumbing (binary Arrow columns, batch size, actor signature,
output layout) is real and tested. Swap `encode_*`/`decode_*` for real
codecs on a full cluster.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from .images import pixels_for_key

_VID_MAGIC = b"FVID"
_AUD_MAGIC = b"FAUD"


# ----------------------------------------------------------------- video

def encode_video(key: int, w: int = 16, n_frames: int = 8) -> bytes:
    """Deterministic n-frame clip: frame f = pattern(key + f)."""
    frames = np.stack([pixels_for_key(key + f, w, w)
                       for f in range(n_frames)])
    head = _VID_MAGIC + w.to_bytes(4, "little") \
        + n_frames.to_bytes(4, "little")
    return head + zlib.compress(frames.tobytes(), 1)


def encode_video_from_frames(frames: np.ndarray) -> bytes:
    """(n, w, w) uint8 -> same container as `encode_video` (square
    frames; the stub container carries one edge length)."""
    n, h, w = frames.shape
    if h != w:
        raise ValueError("stub video container is square-frame only")
    head = _VID_MAGIC + w.to_bytes(4, "little") \
        + n.to_bytes(4, "little")
    return head + zlib.compress(
        np.ascontiguousarray(frames, np.uint8).tobytes(), 1)


def decode_video(buf: bytes) -> np.ndarray:
    """-> (n_frames, h, w) uint8."""
    if buf[:4] != _VID_MAGIC:
        raise NotImplementedError("unknown video container")
    w = int.from_bytes(buf[4:8], "little")
    n = int.from_bytes(buf[8:12], "little")
    return np.frombuffer(zlib.decompress(buf[12:]), np.uint8)\
        .reshape(n, w, w)


class VideoFrameSampleStage:
    """Actor stage: decode clips, keep every `stride`-th frame, emit
    per-clip features (frames kept, mean pixel of sampled frames).
    Small batches — video rows are wide (guide: large binary payloads
    need small batches)."""

    def __init__(self, stride: int = 2):
        self.stride = stride

    def __call__(self, t: pa.Table) -> pa.Table:
        n_kept = np.empty(len(t), np.int32)
        mean_px = np.empty(len(t), np.float64)
        for i, buf in enumerate(t["video"].to_pylist()):
            frames = decode_video(buf)[::self.stride]
            n_kept[i] = len(frames)
            mean_px[i] = frames.mean()
        return pa.table({"video_id": t["video_id"],
                         "frames_kept": pa.array(n_kept),
                         "mean_px": pa.array(mean_px)})


# ----------------------------------------------------------------- audio

def encode_audio(key: int, sr: int = 8000, n: int = 4000) -> bytes:
    """Deterministic int16 waveform: two sines + keyed phase."""
    tt = np.arange(n, dtype=np.float64) / sr
    f0 = 100.0 + (key % 37) * 10.0
    wave = 0.5 * np.sin(2 * np.pi * f0 * tt + key % 7) \
        + 0.25 * np.sin(2 * np.pi * 3 * f0 * tt)
    pcm = np.clip(wave * 32767, -32768, 32767).astype(np.int16)
    head = _AUD_MAGIC + sr.to_bytes(4, "little") + n.to_bytes(4, "little")
    return head + zlib.compress(pcm.tobytes(), 1)


def encode_audio_from_pcm(pcm: np.ndarray, sr: int = 8000) -> bytes:
    """int16 waveform -> the deterministic container (round-trips
    through `decode_audio` byte-exactly)."""
    pcm = np.asarray(pcm, np.int16)
    head = _AUD_MAGIC + int(sr).to_bytes(4, "little") \
        + len(pcm).to_bytes(4, "little")
    return head + zlib.compress(pcm.tobytes(), 1)


def decode_audio(buf: bytes) -> tuple[np.ndarray, int]:
    if buf[:4] != _AUD_MAGIC:
        raise NotImplementedError("unknown audio container")
    sr = int.from_bytes(buf[4:8], "little")
    n = int.from_bytes(buf[8:12], "little")
    pcm = np.frombuffer(zlib.decompress(buf[12:]), np.int16)[:n]
    return pcm, sr


class AudioFeatureStage:
    """Actor stage: decode waveforms, emit RMS / zero-crossing rate /
    duration — the batched feature-extraction shape a real audio model
    stage would use."""

    def __call__(self, t: pa.Table) -> pa.Table:
        rms = np.empty(len(t), np.float64)
        zcr = np.empty(len(t), np.float64)
        dur = np.empty(len(t), np.float64)
        for i, buf in enumerate(t["audio"].to_pylist()):
            pcm, sr = decode_audio(buf)
            x = pcm.astype(np.float64) / 32768.0
            rms[i] = float(np.sqrt(np.mean(x * x)))
            zcr[i] = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
            dur[i] = len(x) / sr
        return pa.table({"audio_id": t["audio_id"],
                         "rms": pa.array(rms), "zcr": pa.array(zcr),
                         "duration_s": pa.array(dur)})


def media_batch_from_keys(keys: np.ndarray, kind: str) -> pa.Table:
    keys = np.asarray(keys, np.int64)
    if kind == "video":
        return pa.table({
            "video_id": pa.array([f"vid{k:08d}" for k in keys.tolist()]),
            "video": pa.array([encode_video(int(k)) for k in keys.tolist()],
                              pa.binary())})
    if kind == "audio":
        return pa.table({
            "audio_id": pa.array([f"aud{k:08d}" for k in keys.tolist()]),
            "audio": pa.array([encode_audio(int(k)) for k in keys.tolist()],
                              pa.binary())})
    raise ValueError(kind)

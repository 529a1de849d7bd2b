import zlib

import numpy as np
import pyarrow as pa


def _clip(frames: np.ndarray) -> bytes:
    """Encode an (n, w, w) uint8 stack in the stub container."""
    n, w, _ = frames.shape
    return (b"FVID" + int(w).to_bytes(4, "little")
            + int(n).to_bytes(4, "little")
            + zlib.compress(frames.tobytes(), 1))


def _frames(rng, n=10, w=16):
    return rng.integers(0, 256, (n, w, w)).astype(np.uint8)


def _brute_best_shift(ha, hb, ham_thr):
    na, nb = len(ha), len(hb)
    best = 0
    for shift in range(-(nb - 1), na):
        good = 0
        for i in range(na):
            j = i - shift
            if 0 <= j < nb:
                if bin(int(ha[i]) ^ int(hb[j])).count("1") <= ham_thr:
                    good += 1
        best = max(best, good)
    return best / min(na, nb)


def test_best_shift_similarity_matches_brute():
    from osm_cut_ray.stages.video_dedup import best_shift_similarity

    rng = np.random.default_rng(3)
    for trial in range(25):
        na, nb = rng.integers(1, 12, 2)
        ha = rng.integers(0, 2**63, na).astype(np.uint64)
        hb = rng.integers(0, 2**63, nb).astype(np.uint64)
        if trial % 3 == 0:  # plant an offset copy
            k = min(na, nb)
            hb[:k] = ha[-k:]
        thr = int(rng.integers(0, 10))
        got = best_shift_similarity(ha, hb, ham_thr=thr)
        exp = _brute_best_shift(ha.tolist(), hb.tolist(), thr)
        assert abs(got - exp) < 1e-12, trial


def test_video_dup_pairs_finds_trims_and_shifts(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.video_dedup import (best_shift_similarity,
                                                frame_hashes,
                                                video_dup_pairs)

    rng = np.random.default_rng(11)
    clips = {}
    planted = []
    vid = 0
    for base in range(12):
        frames = _frames(rng, n=12)
        clips[vid] = _clip(frames)
        base_id = vid
        vid += 1
        if base % 3 == 0:  # trimmed re-upload (drop 2 head frames)
            clips[vid] = _clip(frames[2:])
            planted.append((base_id, vid))
            vid += 1
        if base % 4 == 0:  # light jitter on ONE frame
            j = frames.copy()
            j[5] = np.clip(j[5].astype(np.int16)
                           + rng.integers(-1, 2, j[5].shape), 0,
                           255).astype(np.uint8)
            clips[vid] = _clip(j)
            planted.append((base_id, vid))
            vid += 1
    ds = rd.from_arrow(pa.table({
        "video_id": pa.array(sorted(clips), pa.int64()),
        "video": pa.array([clips[i] for i in sorted(clips)],
                          pa.binary())})).repartition(4)
    got = video_dup_pairs(ds, sim_threshold=0.8)
    got_pairs = set(zip(got["a_id"].to_pylist(),
                        got["b_id"].to_pylist()))

    # brute truth over all pairs
    hs = {i: frame_hashes(clips[i]) for i in clips}
    brute = set()
    ids = sorted(clips)
    for x, a in enumerate(ids):
        for b in ids[x + 1:]:
            if best_shift_similarity(hs[a], hs[b], ham_thr=6) >= 0.8:
                brute.add((a, b))
    assert set(planted) <= brute
    assert got_pairs == brute
    assert got.schema.names == ["a_id", "b_id", "sim"]


def test_video_dup_pairs_empty_and_distinct(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.video_dedup import video_dup_pairs

    rng = np.random.default_rng(4)
    ds = rd.from_arrow(pa.table({
        "video_id": pa.array([0, 1, 2], pa.int64()),
        "video": pa.array([_clip(_frames(rng)) for _ in range(3)],
                          pa.binary())}))
    assert video_dup_pairs(ds).num_rows == 0

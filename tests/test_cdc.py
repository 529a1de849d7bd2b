"""Content-defined chunking vs a pure-Python byte-loop
implementation (stages/cdc.py)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from osm_cut_ray.stages.cdc import (blob_overlap_pairs,
                                    cdc_chunk_blobs,
                                    chunk_dedup_stats, cut_points,
                                    gear_table)

MIN, AVG, MAX = 64, 256, 1024


def brute_cuts(data: bytes, min_size, avg_size, max_size, gear):
    """Independent per-byte rolling-hash chunker."""
    n = len(data)
    if n == 0:
        return []
    h = 0
    cand = []
    for i, bt in enumerate(data):
        h = ((h << 1) + int(gear[bt])) & ((1 << 64) - 1)
        if h & (avg_size - 1) == 0:
            cand.append(i + 1)
    cuts, cur = [], 0
    while cur < n:
        if n - cur <= min_size:
            nxt = n
        else:
            nxt = min(cur + max_size, n)
            for c in cand:
                if cur + min_size <= c <= cur + max_size:
                    nxt = c
                    break
        cuts.append(nxt)
        cur = nxt
    return cuts


def test_cut_points_match_brute():
    gear = gear_table(0)
    rng = np.random.default_rng(13)
    for size in (0, 1, 63, 64, 65, 300, 5000, 20000):
        data = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        got = cut_points(data, min_size=MIN, avg_size=AVG,
                         max_size=MAX, gear=gear)
        want = brute_cuts(data, MIN, AVG, MAX, gear)
        assert got == want, size
        if size:
            assert got[-1] == size
            lens = np.diff([0] + got)
            assert (lens <= MAX).all()
    # low-entropy data: zeros never hit the mask -> forced max cuts
    zeros = bytes(5000)
    got = cut_points(zeros, min_size=MIN, avg_size=AVG,
                     max_size=MAX, gear=gear)
    assert got == brute_cuts(zeros, MIN, AVG, MAX, gear)


def test_boundary_shift_resilience():
    """Inserting a prefix realigns quickly: most chunk hashes are
    shared with the original blob."""
    gear = gear_table(0)
    rng = np.random.default_rng(29)
    data = rng.integers(0, 256, 50000, dtype=np.uint8).tobytes()
    shifted = b"XYZ" + data

    def hashes(buf):
        cuts = cut_points(buf, min_size=MIN, avg_size=AVG,
                          max_size=MAX, gear=gear)
        prev, out = 0, set()
        for c in cuts:
            out.add(hashlib.blake2b(buf[prev:c],
                                    digest_size=8).digest())
            prev = c
        return out

    a, b = hashes(data), hashes(shifted)
    assert len(a & b) / len(a) > 0.8


def _blob_ds(blobs):
    return rd.from_arrow(pa.table({
        "id": pa.array(list(range(len(blobs))), pa.int64()),
        "bytes": pa.array(blobs, pa.binary())}))


def test_cdc_chunk_blobs_and_stats():
    gear = gear_table(0)
    rng = np.random.default_rng(41)
    shared = rng.integers(0, 256, 8000, dtype=np.uint8).tobytes()
    blobs = [
        shared,
        shared + rng.integers(0, 256, 3000, dtype=np.uint8).tobytes(),
        rng.integers(0, 256, 4000, dtype=np.uint8).tobytes(),
        b"",  # empty blob: no chunk rows
    ]
    ds = _blob_ds(blobs).repartition(3)
    chunks = cdc_chunk_blobs(ds, min_size=MIN, avg_size=AVG,
                             max_size=MAX).materialize()
    rows = chunks.take_all()
    by_blob = {}
    for r in rows:
        by_blob.setdefault(r["blob_id"], []).append(r)
    assert 3 not in by_blob
    total_bytes = 0
    uniq = {}
    for bid, blob in enumerate(blobs[:3]):
        got = sorted(by_blob[bid], key=lambda r: r["chunk_idx"])
        cuts = brute_cuts(blob, MIN, AVG, MAX, gear)
        assert [r["length"] for r in got] == \
            list(np.diff([0] + cuts))
        assert [r["offset"] for r in got] == [0] + cuts[:-1]
        prev = 0
        for r, c in zip(got, cuts):
            hh = int.from_bytes(
                hashlib.blake2b(blob[prev:c],
                                digest_size=8).digest(),
                "big", signed=True)
            assert r["chunk_hash"] == hh
            uniq[hh] = r["length"]
            total_bytes += r["length"]
            prev = c
    stats = chunk_dedup_stats(chunks)
    assert stats["bytes_total"] == total_bytes
    assert stats["bytes_unique"] == sum(uniq.values())
    assert stats["dedup_ratio"] > 1.2  # the shared prefix dedups
    assert stats["n_unique_chunks"] == len(uniq)


def test_blob_overlap_pairs_matches_brute():
    rng = np.random.default_rng(53)
    shared = rng.integers(0, 256, 6000, dtype=np.uint8).tobytes()
    blobs = [
        shared + rng.integers(0, 256, 1000, dtype=np.uint8).tobytes(),
        shared + rng.integers(0, 256, 1500, dtype=np.uint8).tobytes(),
        rng.integers(0, 256, 6000, dtype=np.uint8).tobytes(),
    ]
    chunks = cdc_chunk_blobs(_blob_ds(blobs), min_size=MIN,
                             avg_size=AVG, max_size=MAX).materialize()
    got = {(r["a_id"], r["b_id"]): r["shared"]
           for r in blob_overlap_pairs(chunks,
                                       min_shared=2).to_pylist()}
    # brute: distinct hash sets per blob
    sets = {}
    for r in chunks.take_all():
        sets.setdefault(r["blob_id"], set()).add(r["chunk_hash"])
    want = {}
    for a in range(3):
        for b in range(a + 1, 3):
            s = len(sets[a] & sets[b])
            if s >= 2:
                want[(a, b)] = s
    assert got == want
    assert (0, 1) in got


def test_cdc_param_validation():
    ds = _blob_ds([b"abc"])
    with pytest.raises(ValueError):
        cdc_chunk_blobs(ds, avg_size=300)  # not a power of two
    with pytest.raises(ValueError):
        cdc_chunk_blobs(ds, min_size=512, avg_size=256)

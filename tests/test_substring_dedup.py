"""Exact repeated-substring dedup pinned against a token-TUPLE brute
force (no hashing at all on the brute side, so a rolling-hash bug
cannot hide)."""

import numpy as np
import pandas as pd
import pytest

from osm_cut_ray.stages.substring_dedup import (_powers, _window_hashes,
                                                dedup_substrings,
                                                repeated_window_index)


def _brute(docs: dict[int, str], window: int, min_count: int = 2):
    """-> {doc_id: (text_out, n_tokens, n_removed)} per the pinned
    semantics: tuple-keyed window counts, min-(doc,pos) owner, union
    coverage by non-owned hot windows, original text when clean."""
    occ = {}
    toks = {d: t.split() for d, t in docs.items()}
    for d in sorted(toks):
        ts = toks[d]
        for i in range(len(ts) - window + 1):
            occ.setdefault(tuple(ts[i:i + window]), []).append((d, i))
    hot = {k: min(v) for k, v in occ.items() if len(v) >= min_count}
    out = {}
    for d in sorted(toks):
        ts = toks[d]
        covered = [False] * len(ts)
        removed_any = False
        for i in range(len(ts) - window + 1):
            key = tuple(ts[i:i + window])
            if key in hot and hot[key] != (d, i):
                removed_any = True
                for j in range(i, i + window):
                    covered[j] = True
        if not removed_any:
            out[d] = (docs[d], len(ts), 0)
        else:
            kept = [t for t, c in zip(ts, covered) if not c]
            out[d] = (" ".join(kept), len(ts), sum(covered))
    return out


def _run(docs: dict[int, str], window: int, **kw):
    import ray
    ds = ray.data.from_items(
        [{"doc_id": d, "text": t} for d, t in sorted(docs.items())])\
        .repartition(4)
    got = dedup_substrings(ds, window=window, **kw).to_pandas()
    return {int(r.doc_id): (r.text, int(r.n_tokens), int(r.n_removed))
            for r in got.itertuples()}


def test_rolling_hash_position_independent_and_exact():
    rng = np.random.default_rng(5)
    th = rng.integers(0, 2 ** 63, 200).astype(np.uint64)
    L = 7
    pw, ipw = _powers(len(th))
    w = _window_hashes(th, L, pw, ipw)
    # brute polynomial per window
    A = np.uint64(0x9E3779B97F4A7C15)
    for i in [0, 3, 100, len(th) - L]:
        acc = np.uint64(0)
        for j in range(L):
            acc = acc * A + th[i + j]
        assert acc == w[i]
    # identical content at different offsets hashes identically
    th2 = np.concatenate([th[50:50 + L], th])
    pw2, ipw2 = _powers(len(th2))
    w2 = _window_hashes(th2, L, pw2, ipw2)
    assert w2[0] == w[50]


def test_planted_cross_doc_repeat_matches_brute(ray_session):
    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(60)]
    boiler = " ".join(rng.choice(vocab, 12))
    docs = {}
    for d in range(20):
        body = " ".join(rng.choice(vocab, int(rng.integers(20, 60))))
        if d % 3 == 0:  # plant the boilerplate mid-doc
            half = body.split()
            body = " ".join(half[:10]) + " " + boiler + " " \
                + " ".join(half[10:])
        docs[d] = body
    got = _run(docs, window=12)
    assert got == _brute(docs, 12)
    # the plant is actually exercised: someone lost tokens
    assert any(v[2] > 0 for v in got.values())
    # and the owner kept its copy: total removals < total plants
    n_planted = sum(1 for d in range(20) if d % 3 == 0)
    assert sum(1 for v in got.values() if v[2] > 0) == n_planted - 1


def test_within_doc_repeat_and_overlap_semantics(ray_session):
    span = "a b c d e"
    docs = {
        1: f"x1 x2 {span} y1 y2 {span} z1",      # self-repeat
        2: f"q1 {span} q2",                       # third copy
        3: "unrelated words only here",
    }
    got = _run(docs, window=5)
    want = _brute(docs, 5)
    assert got == want
    assert got[1][2] == 5          # second in-doc copy stripped
    assert got[2][2] == 5          # doc 2's copy stripped
    assert got[3] == (docs[3], 4, 0)
    assert "a b c d e" in got[1][0]  # owner copy survives in doc 1


def test_short_docs_and_clean_docs_byte_identical(ray_session):
    docs = {1: "one  two   three", 2: "short", 3: "one  two   three"}
    # window longer than every doc: nothing can be hot
    got = _run(docs, window=10)
    assert got == {1: (docs[1], 3, 0), 2: (docs[2], 1, 0),
                   3: (docs[3], 3, 0)}  # original spacing preserved


def test_min_count_three_requires_three_copies(ray_session):
    span = "p q r s"
    docs = {1: f"{span} tail1", 2: f"{span} tail2", 3: "other stuff x"}
    got = _run(docs, window=4, min_count=3)
    assert got == _brute(docs, 4, min_count=3)
    assert all(v[2] == 0 for v in got.values())  # df=2 < 3: untouched
    docs[3] = f"{span} tail3"
    got = _run(docs, window=4, min_count=3)
    assert got == _brute(docs, 4, min_count=3)
    assert got[2][2] == 4 and got[3][2] == 4 and got[1][2] == 0


def test_randomized_corpus_matches_brute(ray_session):
    rng = np.random.default_rng(31)
    vocab = [f"t{i}" for i in range(15)]  # tiny vocab => organic dups
    docs = {d: " ".join(rng.choice(vocab, int(rng.integers(5, 40))))
            for d in range(40)}
    for w in (3, 6):
        assert _run(docs, window=w) == _brute(docs, w)


def test_index_cap_raises(ray_session):
    import ray
    docs = {d: " ".join(["dup"] * 30) for d in range(4)}
    ds = ray.data.from_items(
        [{"doc_id": d, "text": t} for d, t in docs.items()])
    with pytest.raises(ValueError, match="max_broadcast_spans"):
        repeated_window_index(ds, window=3, max_broadcast_spans=0)

"""Edit-distance similarity join vs brute all-pairs Levenshtein
(stages/edit_join.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from osm_cut_ray.stages.edit_join import (banded_edit_distances,
                                          edit_distance_pairs)


def lev(a, b):
    la, lb = len(a), len(b)
    dp = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, lb + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                        prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[lb]


def rand_word(rng, alpha="abcdef", lo=0, hi=12):
    return "".join(rng.choice(list(alpha))
                   for _ in range(rng.randint(lo, hi)))


def test_banded_dp_matches_brute():
    import random
    rng = random.Random(17)
    for d in (1, 2):
        a_list, b_list, want = [], [], []
        for _ in range(500):
            a = rand_word(rng)
            b = rand_word(rng)
            a_list.append(a)
            b_list.append(b)
            want.append(lev(a, b))
        got = banded_edit_distances(a_list, b_list, d)
        for g, w in zip(got, want):
            if w <= d:
                assert g == w
            else:
                assert g > d


def brute_pairs(texts, ids, d):
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            dist = lev(texts[i], texts[j])
            if dist <= d:
                a, b = sorted((ids[i], ids[j]))
                out.add((a, b, dist))
    return out


def corpus(seed=3, n=160):
    import random
    rng = random.Random(seed)
    texts, ids = [], []
    base = [rand_word(rng, lo=3, hi=10) for _ in range(n // 2)]
    for i, w in enumerate(base):
        texts.append(w)
        # planted typo: sub / del / ins
        k = rng.randrange(max(1, len(w)))
        op = rng.randrange(3)
        if op == 0:
            t = w[:k] + rng.choice("abcdef") + w[k + 1:]
        elif op == 1:
            t = w[:k] + w[k + 1:]
        else:
            t = w[:k] + rng.choice("abcdef") + w[k:]
        texts.append(t)
    ids = list(range(1000, 1000 + len(texts)))
    return texts, ids


@pytest.mark.parametrize("d", [1, 2])
def test_edit_join_matches_brute(d):
    texts, ids = corpus()
    ds = rd.from_arrow(pa.table({
        "id": pa.array(ids, pa.int64()),
        "text": pa.array(texts)})).repartition(5)
    got = edit_distance_pairs(ds, d_max=d, max_df=10_000)
    got_set = {(r["a_id"], r["b_id"], r["dist"])
               for r in got.to_pylist()}
    assert got_set == brute_pairs(texts, ids, d)
    assert len(got_set) >= len(texts) // 2  # planted typos found


def test_edit_join_unicode_and_dups():
    texts = ["café", "cafe", "naïve", "naive", "東京", "東京都",
             "zebra", "zebra"]
    ids = list(range(8))
    ds = rd.from_arrow(pa.table({"id": pa.array(ids, pa.int64()),
                                 "text": pa.array(texts)}))
    got = {(r["a_id"], r["b_id"], r["dist"])
           for r in edit_distance_pairs(ds, d_max=1).to_pylist()}
    assert got == brute_pairs(texts, ids, 1)
    assert (0, 1, 1) in got       # café ~ cafe (codepoint sub)
    assert (4, 5, 1) in got       # 東京 ~ 東京都
    assert (6, 7, 0) in got       # exact dup at dist 0


def test_edit_join_lowercase_and_caps():
    texts = ["Foo", "foo", "fOo", "bar"]
    ds = rd.from_arrow(pa.table({
        "id": pa.array(list(range(4)), pa.int64()),
        "text": pa.array(texts)}))
    got = {(r["a_id"], r["b_id"], r["dist"])
           for r in edit_distance_pairs(
               ds, d_max=1, lowercase=True).to_pylist()}
    assert (0, 1, 0) in got and (0, 2, 0) in got and (1, 2, 0) in got
    # max_len guard
    long_ds = rd.from_arrow(pa.table({
        "id": pa.array([0], pa.int64()),
        "text": pa.array(["x" * 100])}))
    with pytest.raises(Exception):
        edit_distance_pairs(long_ds, d_max=1)
    with pytest.raises(ValueError):
        edit_distance_pairs(ds, d_max=3)


def test_edit_join_hot_variant_cap(capsys):
    # 40 strings all within distance 1 of "aaaa" -> hot variants;
    # a tiny max_df drops buckets but surfaces the drops
    texts = ["aaaa"] * 30 + ["aaab", "aaba", "abaa", "baaa"]
    ids = list(range(len(texts)))
    ds = rd.from_arrow(pa.table({"id": pa.array(ids, pa.int64()),
                                 "text": pa.array(texts)}))
    full = edit_distance_pairs(ds, d_max=1, max_df=10_000)
    capped = edit_distance_pairs(ds, d_max=1, max_df=8)
    assert len(capped) < len(full)
    assert len(full) == len(brute_pairs(texts, ids, 1))

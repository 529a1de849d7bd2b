"""Item co-occurrence + PMI pinned against a pure-Python
set/Counter brute force."""

import math
from collections import Counter, defaultdict

import numpy as np
import pyarrow as pa
import pytest

from osm_cut_ray.stages.cooccur import cooccurrence


def _ev_ds(rows, parts=4):
    import ray
    return ray.data.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "item": pa.array([r[1] for r in rows], pa.int64())})) \
        .repartition(parts)


def _brute(rows, min_pair_count=1):
    hist = defaultdict(set)
    for u, i in rows:
        hist[u].add(i)
    n_users = len(hist)
    pair = Counter()
    marg = Counter()
    for items in hist.values():
        s = sorted(items)
        for x in s:
            marg[x] += 1
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                pair[(s[i], s[j])] += 1
    out = {}
    for (a, b), n_ab in pair.items():
        if n_ab < min_pair_count:
            continue
        out[(a, b)] = (n_ab, marg[a], marg[b],
                       math.log(n_ab * n_users / (marg[a] * marg[b])))
    return out


def _rand_rows(n_ev, n_users, n_items, seed, huge_uid=False):
    rng = np.random.default_rng(seed)
    off = (1 << 40) if huge_uid else 0
    return [(int(rng.integers(0, n_users)) + off,
             int(rng.integers(0, n_items)))
            for _ in range(n_ev)]


@pytest.mark.parametrize("huge_uid", [False, True])
def test_cooccurrence_matches_brute(ray_session, huge_uid):
    rows = _rand_rows(800, 60, 25, seed=2, huge_uid=huge_uid)
    got = cooccurrence(_ev_ds(rows)).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    want = _brute(rows)
    assert len(got) == len(want)
    for r in got.itertuples():
        n_ab, n_a, n_b, pmi = want[(r.a, r.b)]
        assert (r.n_ab, r.n_a, r.n_b) == (n_ab, n_a, n_b), (r.a, r.b)
        assert abs(r.pmi - pmi) < 1e-12
    assert (got.a < got.b).all()
    # partitioning invariance (duplicate events too)
    got2 = cooccurrence(_ev_ds(rows + rows[:200], 13)).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    assert got2.equals(got)


def test_cooccurrence_min_count_and_caps(ray_session):
    rows = _rand_rows(500, 40, 15, seed=7)
    got = cooccurrence(_ev_ds(rows), min_pair_count=4).to_pandas()
    want = _brute(rows, min_pair_count=4)
    assert set(zip(got.a, got.b)) == set(want)
    assert (got.n_ab >= 4).all()

    with pytest.raises(ValueError, match="max_items_per_user"):
        cooccurrence(_ev_ds([(1, i) for i in range(30)]),
                     max_items_per_user=10).materialize()
    # plain map_batches raises arrive wrapped (UserCodeException);
    # the message contract is what's pinned
    with pytest.raises(Exception, match="int32"):
        cooccurrence(_ev_ds([(1, 1 << 31), (1, 2)])).materialize()
    with pytest.raises(ValueError, match="max_distinct_items"):
        cooccurrence(_ev_ds(rows), max_distinct_items=3)


def test_cooccurrence_degenerates(ray_session):
    # single-item users contribute marginals but no pairs
    rows = [(u, 0) for u in range(5)] + [(9, 1), (9, 2)]
    got = cooccurrence(_ev_ds(rows, 2)).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r.a, r.b, r.n_ab, r.n_a, r.n_b) == (1, 2, 1, 1, 1)
    assert r.pmi == pytest.approx(math.log(1 * 6 / (1 * 1)))
    # empty input
    import ray
    empty = ray.data.from_arrow(pa.table({
        "user_id": pa.array([], pa.int64()),
        "item": pa.array([], pa.int64())}))
    out = cooccurrence(empty).to_pandas()
    assert len(out) == 0

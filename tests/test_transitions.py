"""Markov transition matrix pinned against a pure-Python brute."""

from collections import Counter, defaultdict

import numpy as np
import pyarrow as pa
import pytest

from osm_cut_ray.stages.transitions import transition_matrix

STATES = ["view", "click", "cart", "buy", "error"]


def _ev_ds(rows, parts=4):
    import ray
    return ray.data.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.float64()),
        "event_type": pa.array([r[3] for r in rows], pa.string())})) \
        .repartition(parts)


def _brute(rows):
    per_user = defaultdict(list)
    for eid, u, ts, st in rows:
        per_user[u].append((ts, eid, st))
    cnt = Counter()
    for seq in per_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            cnt[(a, b)] += 1
    tot = Counter()
    for (a, _), n in cnt.items():
        tot[a] += n
    return {(a, b): (n, n / tot[a]) for (a, b), n in cnt.items()}


def _rand_rows(n, n_users, seed):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        rows.append((i, int(rng.integers(0, n_users)),
                     float(rng.integers(0, 50)),   # many ts ties
                     STATES[int(rng.integers(0, len(STATES)))]))
    return rows


def test_transitions_match_brute(ray_session):
    rows = _rand_rows(900, 40, seed=3)
    got = transition_matrix(_ev_ds(rows)).to_pandas()
    want = _brute(rows)
    assert len(got) == len(want)
    for r in got.itertuples():
        n, p = want[(r.from_state, r.to_state)]
        assert r.n == n, (r.from_state, r.to_state)
        assert r.p == pytest.approx(p, abs=1e-12)
    # sorted output, probabilities sum to 1 per from_state
    assert list(got.from_state) == sorted(got.from_state)
    sums = got.groupby("from_state").p.sum()
    assert np.allclose(sums, 1.0)
    # partitioning invariance (exact)
    got2 = transition_matrix(_ev_ds(rows, 11)).to_pandas()
    assert got2.equals(got)


def test_transitions_tiebreak_and_degenerates(ray_session):
    # two events at the SAME ts: event_id breaks the tie
    rows = [(0, 1, 5.0, "view"), (1, 1, 5.0, "click"),
            (2, 1, 6.0, "buy"),
            (3, 2, 1.0, "view"),            # single-event user
            ]
    got = transition_matrix(_ev_ds(rows, 2)).to_pandas()
    trans = set(zip(got.from_state, got.to_state))
    assert trans == {("view", "click"), ("click", "buy")}
    assert (got.n == 1).all() and (got.p == 1.0).all()

    with pytest.raises(ValueError, match="max_states"):
        transition_matrix(_ev_ds(rows, 2), max_states=1)

    import ray
    empty = ray.data.from_arrow(pa.table({
        "event_id": pa.array([], pa.int64()),
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.float64()),
        "event_type": pa.array([], pa.string())}))
    out = transition_matrix(empty)
    assert len(out) == 0
    assert out.column_names == ["from_state", "to_state", "n", "p"]

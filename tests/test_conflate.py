"""POI conflation — pinned against a pure-Python replay (planar
distance + casefolded Levenshtein + (name_dist, dist, b_id) best)."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from osm_cut_ray.pipelines.conflate import conflate_pois


def _lev(a, b):
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                   prev + (a[i - 1] != b[j - 1]))
    return d[n]


A = [  # id, lon, lat, name
    (1, 0.0000, 0.0000, "Cafe Luna"),
    (2, 0.0100, 0.0000, "Main St Pharmacy"),
    (3, 0.0200, 0.0100, "Blue Bakery"),
    (4, 0.5000, 0.5000, "Lone Diner"),
]
B = [
    (11, 0.0001, 0.0001, "cafe luna"),        # exact match, moved
    (12, 0.0002, -0.0001, "Cafe Lunna"),      # typo twin
    (13, 0.0101, 0.0001, "Main St Farmacy"),  # 2-edit name
    (14, 0.0201, 0.0101, "Red Bakery"),       # >2 edits from Blue
    (15, 0.9000, 0.9000, "Lone Diner"),       # same name, too far
]


def _ds(rows, parts=2):
    return ray.data.from_arrow(pa.table({
        "id": pa.array([r[0] for r in rows], pa.int64()),
        "lon": pa.array([r[1] for r in rows]),
        "lat": pa.array([r[2] for r in rows]),
        "name": pa.array([r[3] for r in rows], pa.large_string())}))\
        .repartition(parts)


def _replay(eps, d_max, best_only):
    out = []
    for aid, ax, ay, an in A:
        cands = []
        for bid, bx, by, bn in B:
            dist = float(np.hypot(ax - bx, ay - by))
            if dist > eps:
                continue
            nd = _lev(an.casefold().strip(), bn.casefold().strip())
            if nd <= d_max:
                cands.append((nd, dist, bid))
        if not cands:
            continue
        if best_only:
            cands = [min(cands)]
        out.extend((aid, bid, nd) for nd, _, bid in cands)
    return sorted(out)


def _got(res):
    return sorted((int(r.a_id), int(r.b_id), int(r.name_dist))
                  for r in res.to_pandas().itertuples())


def test_all_matches_replay(ray_session):
    got = _got(conflate_pois(_ds(A), _ds(B), eps=0.001,
                             name_d_max=2, best_only=False))
    assert got == _replay(0.001, 2, best_only=False)
    # sanity on the planted design
    assert (1, 11, 0) in got and (1, 12, 1) in got
    assert (2, 13, 2) in got
    assert all(a != 3 for a, _, _ in got)   # Blue vs Red: 3 edits
    assert all(a != 4 for a, _, _ in got)   # too far


def test_best_match_selection(ray_session):
    got = _got(conflate_pois(_ds(A), _ds(B), eps=0.001,
                             name_d_max=2))
    assert got == _replay(0.001, 2, best_only=True)
    assert (1, 11, 0) in got and all(
        b != 12 for a, b, _ in got if a == 1)


def test_partition_invariance(ray_session):
    a = _got(conflate_pois(_ds(A, 1), _ds(B, 1), eps=0.001))
    b = _got(conflate_pois(_ds(A, 4), _ds(B, 3), eps=0.001))
    assert a == b

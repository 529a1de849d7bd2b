"""Spatiotemporal co-location join vs brute all-fix-pairs
(stages/colocate.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from osm_cut_ray.stages.colocate import colocation_pairs

EPS, TAU = 0.01, 60.0


def brute(df):
    out = {}
    rows = df.to_records(index=False)
    for i in range(len(rows)):
        for j in range(len(rows)):
            a, b = rows[i], rows[j]
            if a.user_id >= b.user_id:
                continue
            d = np.hypot(a.lon - b.lon, a.lat - b.lat)
            if d <= EPS and abs(a.ts - b.ts) <= TAU:
                k = (a.user_id, b.user_id)
                tm = 0.5 * (a.ts + b.ts)
                n, lo, hi = out.get(k, (0, np.inf, -np.inf))
                out[k] = (n + 1, min(lo, tm), max(hi, tm))
    return out


def fixes_df(seed=7, n_users=25, n_fix=30):
    rng = np.random.default_rng(seed)
    rows = []
    for u in range(n_users):
        # users cluster in 5 venues; some share venue+time
        venue = u % 5
        base_t = (u % 3) * 400.0
        for f in range(n_fix):
            rows.append((
                u * 13 + 1,
                base_t + f * 20.0 + rng.uniform(-5, 5),
                venue * 0.5 + rng.normal(0, 0.008),
                40.0 + venue * 0.3 + rng.normal(0, 0.008)))
    return pd.DataFrame(rows, columns=["user_id", "ts", "lon",
                                       "lat"])


def to_ds(df):
    return rd.from_arrow(pa.Table.from_pandas(
        df, preserve_index=False).replace_schema_metadata(None))


def got_map(ds_out):
    out = {}
    for r in ds_out.take_all():
        assert r["a_id"] != -1, "unexpected sentinel"
        out[(r["a_id"], r["b_id"])] = (r["n_contacts"],
                                       r["t_first"], r["t_last"])
    return out


def test_colocation_matches_brute():
    df = fixes_df()
    want = brute(df)
    got = got_map(colocation_pairs(
        to_ds(df).repartition(7), eps=EPS, tau=TAU))
    assert set(got) == set(want)
    for k, (n, lo, hi) in want.items():
        gn, glo, ghi = got[k]
        assert gn == n
        assert abs(glo - lo) < 1e-9 and abs(ghi - hi) < 1e-9
    assert len(got) > 10


def test_colocation_exact_boundaries_and_negative_coords():
    # fixes exactly eps apart and exactly tau apart, at negative
    # coords spanning cell boundaries
    df = pd.DataFrame({
        "user_id": [1, 2, 3, 4, 5, 6],
        "ts": [0.0, TAU, 0.0, 100.0, 0.0, 0.0],
        "lon": [0.0, EPS, -1.0, -1.0, 5.0, 5.0],
        "lat": [-2.0, -2.0, -2.0, -2.0, 0.0, 0.005]})
    want = brute(df)
    got = got_map(colocation_pairs(to_ds(df), eps=EPS, tau=TAU))
    assert got.keys() == want.keys()
    assert (1, 2) in got          # exact eps AND exact tau: included
    assert (3, 4) not in got      # dt = 100 > tau
    assert (5, 6) in got


def test_colocation_same_user_excluded_and_invariance():
    df = fixes_df(seed=11, n_users=10, n_fix=20)
    a = got_map(colocation_pairs(to_ds(df), eps=EPS, tau=TAU))
    b = got_map(colocation_pairs(to_ds(df).repartition(13),
                                 eps=EPS, tau=TAU))
    assert a == b
    assert all(k[0] != k[1] for k in a)


def test_colocation_cap_sentinel():
    # 60 users all at one point at one time -> 1770 pairs in one cell
    df = pd.DataFrame({
        "user_id": np.arange(60, dtype=np.int64),
        "ts": np.zeros(60),
        "lon": np.zeros(60), "lat": np.zeros(60)})
    out = colocation_pairs(to_ds(df), eps=EPS, tau=TAU,
                           max_cell_pairs=100).take_all()
    sent = [r for r in out if r["a_id"] == -1]
    assert sent and sum(r["b_id"] for r in sent) == 1770
    assert not [r for r in out if r["a_id"] != -1]
    with pytest.raises(ValueError):
        colocation_pairs(to_ds(df), eps=0, tau=TAU)

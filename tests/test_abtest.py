import math

import numpy as np
import pyarrow as pa

SCALE = 1 << 20


def _brute_welch(a_vals, b_vals):
    """Loop replay of the documented quantized Welch formula."""
    qa = [int(round(v * SCALE)) for v in a_vals]
    qb = [int(round(v * SCALE)) for v in b_vals]
    na, nb = len(qa), len(qb)
    sqa, sqb = sum(qa), sum(qb)
    sqqa = sum(q * q for q in qa)
    sqqb = sum(q * q for q in qb)
    mean_a = sqa / na / SCALE
    mean_b = sqb / nb / SCALE
    va = max(na * sqqa - sqa * sqa, 0) / (na * (na - 1)) / SCALE ** 2
    vb = max(nb * sqqb - sqb * sqb, 0) / (nb * (nb - 1)) / SCALE ** 2
    se2 = va / na + vb / nb
    if se2 <= 0:
        return mean_a, mean_b, 0.0, float(na + nb - 2)
    t = (mean_a - mean_b) / math.sqrt(se2)
    df = se2 ** 2 / (va ** 2 / (na ** 2 * (na - 1))
                     + vb ** 2 / (nb ** 2 * (nb - 1)))
    return mean_a, mean_b, t, df


def test_welch_t_matches_brute_any_partitioning(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.abtest import welch_t

    rng = np.random.default_rng(27)
    rows = []
    truth = {}
    for exp in range(8):
        na, nb = int(rng.integers(2, 60)), int(rng.integers(2, 60))
        a = np.round(rng.normal(2.0, 1.0, na), 4)
        b = np.round(rng.normal(2.0 + 0.2 * exp, 1.5, nb), 4)
        truth[exp] = _brute_welch(a.tolist(), b.tolist())
        rows += [(exp, 0, v) for v in a] + [(exp, 1, v) for v in b]
    # an experiment missing variant B, and one with a 1-sample variant
    rows += [(100, 0, v) for v in (1.0, 2.0, 3.0)]
    rows += [(101, 0, 1.0), (101, 0, 2.0), (101, 1, 5.0)]
    arr = np.array(rows)
    ref = None
    for parts in (1, 6):
        ds = rd.from_arrow(pa.table({
            "exp_id": arr[:, 0].astype(np.int64),
            "variant": arr[:, 1].astype(np.int64),
            "metric": arr[:, 2]})).repartition(parts)
        got = welch_t(ds)
        assert got["exp_id"].to_pylist() == sorted(truth)
        for i, exp in enumerate(got["exp_id"].to_pylist()):
            ma, mb, t, df = truth[exp]
            assert got["mean_a"][i].as_py() == ma
            assert got["mean_b"][i].as_py() == mb
            assert got["t"][i].as_py() == t, exp
            assert got["df"][i].as_py() == df
        if ref is None:
            ref = got
        else:
            assert got.equals(ref)  # bit-identical across partitioning


def test_welch_t_detects_planted_effect(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.abtest import welch_t

    rng = np.random.default_rng(5)
    n = 4000
    rows = []
    for i in range(n):
        rows.append((0, 0, float(rng.normal(10.0, 2.0))))
        rows.append((0, 1, float(rng.normal(10.5, 2.0))))  # real lift
        rows.append((1, 0, float(rng.normal(10.0, 2.0))))
        rows.append((1, 1, float(rng.normal(10.0, 2.0))))  # null
    arr = np.array(rows)
    ds = rd.from_arrow(pa.table({
        "exp_id": arr[:, 0].astype(np.int64),
        "variant": arr[:, 1].astype(np.int64),
        "metric": arr[:, 2]})).repartition(8)
    got = welch_t(ds)
    by = {got["exp_id"][i].as_py(): got["t"][i].as_py()
          for i in range(got.num_rows)}
    # z ~ t at df ~ 8000: |t| > 5 for the planted 0.25-sigma lift,
    # |t| < 3 for the null
    assert by[0] < -5.0, by
    assert abs(by[1]) < 3.0, by
    # degenerate: identical constant variants -> t = 0, df fallback
    ds2 = rd.from_arrow(pa.table({
        "exp_id": pa.array([7] * 6, pa.int64()),
        "variant": pa.array([0, 0, 0, 1, 1, 1], pa.int64()),
        "metric": pa.array([2.0] * 6)}))
    g2 = welch_t(ds2)
    assert g2["t"][0].as_py() == 0.0 and g2["df"][0].as_py() == 4.0


def test_normal_p_and_bh_adjust():
    import math

    from osm_cut_ray.stages.abtest import bh_adjust, normal_p

    # published normal two-sided tail values
    got = normal_p(np.array([0.0, 1.959963985, 2.575829304]))
    assert abs(got[0] - 1.0) < 1e-12
    assert abs(got[1] - 0.05) < 1e-9
    assert abs(got[2] - 0.01) < 1e-9
    # BH worked example: the textbook step-up on a known vector
    p = np.array([0.01, 0.04, 0.03, 0.005])
    q = bh_adjust(p)
    # sorted p: .005 .01 .03 .04 -> ranked m/j: .02 .02 .04 .04
    exp = {0.005: 0.02, 0.01: 0.02, 0.03: 0.04, 0.04: 0.04}
    for pi, qi in zip(p, q):
        assert abs(qi - exp[float(pi)]) < 1e-12
    # brute O(m^2) definition on random vectors
    rng = np.random.default_rng(4)
    for _ in range(10):
        p = rng.uniform(0, 1, int(rng.integers(1, 40)))
        q = bh_adjust(p)
        m = len(p)
        order = np.argsort(p, kind="stable")
        for rank0, idx in enumerate(order):
            j = rank0 + 1
            brute = min(min(p[order[k]] * m / (k + 1)
                            for k in range(rank0, m)), 1.0)
            assert abs(q[idx] - brute) < 1e-12


def test_welch_t_adjusted(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.abtest import welch_t_adjusted

    rng = np.random.default_rng(5)
    rows = []
    for i in range(2000):
        rows.append((0, 0, float(rng.normal(10.0, 2.0))))
        rows.append((0, 1, float(rng.normal(11.0, 2.0))))
        rows.append((1, 0, float(rng.normal(10.0, 2.0))))
        rows.append((1, 1, float(rng.normal(10.0, 2.0))))
    arr = np.array(rows)
    ds = rd.from_arrow(pa.table({
        "exp_id": arr[:, 0].astype(np.int64),
        "variant": arr[:, 1].astype(np.int64),
        "metric": arr[:, 2]}))
    got = welch_t_adjusted(ds)
    by = {got["exp_id"][i].as_py():
          (got["p"][i].as_py(), got["p_bh"][i].as_py())
          for i in range(got.num_rows)}
    assert by[0][0] < 1e-6 and by[0][1] < 1e-6   # real lift
    assert by[1][0] > 0.001                      # null survives
    assert by[1][1] >= by[1][0]                  # BH never shrinks


def test_welch_t_rejects_multiarm_variants(ray_session):
    """ADVICE r4: `v & 1` silently folded variant 2 into arm A; the
    stage must raise on any variant outside {0, 1}."""
    import pytest
    import ray

    from osm_cut_ray.stages.abtest import welch_t

    ds = ray.data.from_items(
        [{"exp_id": 1, "variant": v % 3, "metric": float(v)}
         for v in range(30)])
    with pytest.raises(Exception, match="variant values must be"):
        welch_t(ds)

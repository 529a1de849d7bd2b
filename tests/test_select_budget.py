import numpy as np
import pyarrow as pa
import pytest


def _brute(rows, budget):
    """rows = [(id, score, w)] -> kept id set by the documented rule."""
    kept = set()
    c = 0.0
    for rid, s, w in sorted(rows, key=lambda r: (-r[1], r[0])):
        if c + w <= budget:
            c += w
            kept.add(rid)
        else:
            break
    return kept, c


def _ds(rd, rows, parts=6):
    arr = np.array(rows, np.float64)
    return rd.from_arrow(pa.table({
        "id": arr[:, 0].astype(np.int64),
        "score": arr[:, 1],
        "tokens": arr[:, 2],
        "text": pa.array([f"doc{int(i)}" for i in arr[:, 0]])})) \
        .repartition(parts)


def test_select_by_budget_matches_brute(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.select_budget import select_by_budget

    rng = np.random.default_rng(33)
    n = 3000
    rows = [(i, float(np.round(rng.uniform(0, 10), 2)),
             float(rng.integers(1, 500))) for i in range(n)]
    total = sum(r[2] for r in rows)
    for frac in (0.25, 0.7, 1.5):
        budget = total * frac
        sel, rep = select_by_budget(
            _ds(rd, rows), score_col="score", weight_col="tokens",
            budget=budget, id_col="id")
        got = {r["id"] for r in sel.take_all()}
        exp, exp_w = _brute(rows, budget)
        assert got == exp, frac
        assert abs(rep["kept_weight"] - exp_w) < 1e-6
        if frac == 1.5:
            assert rep["cutoff"] is None
    # budget below the single best row: empty selection
    sel, rep = select_by_budget(_ds(rd, rows), score_col="score",
                                weight_col="tokens", budget=0.5)
    assert sel.count() == 0 and rep["kept_weight"] == 0.0
    # full schema survives
    sel, _ = select_by_budget(_ds(rd, rows), score_col="score",
                              weight_col="tokens", budget=total * 0.1)
    got_rows = sel.take_all()
    assert {"id", "score", "tokens", "text"} <= set(got_rows[0])


def test_select_by_budget_tie_determinism(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.select_budget import select_by_budget

    # ALL scores equal: selection must be the lowest ids that fit
    rows = [(i, 5.0, 10.0) for i in range(100)]
    ref = None
    for parts in (1, 4, 13):
        sel, rep = select_by_budget(
            _ds(rd, rows, parts), score_col="score",
            weight_col="tokens", budget=55.0)
        got = sorted(r["id"] for r in sel.take_all())
        assert got == list(range(5))
        if ref is None:
            ref = (got, rep)
        else:
            assert (got, rep) == ref


def test_select_by_budget_rejects_negative_weights(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.select_budget import select_by_budget

    rows = [(0, 1.0, -1.0), (1, 2.0, 3.0)]
    with pytest.raises(Exception, match="negative weights"):
        select_by_budget(_ds(rd, rows, 1), score_col="score",
                         weight_col="tokens", budget=10.0)
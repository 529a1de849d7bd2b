import numpy as np
import pyarrow as pa


def _brute_isotonic(scores, labels, weights):
    """Independent minimax-identity replay: tie-pool equal scores,
    then fitted[i] = max_{j<=i} min_{k>=i} wmean(y[j..k])."""
    order = np.argsort(scores, kind="stable")
    s, y, w = (np.asarray(scores, np.float64)[order],
               np.asarray(labels, np.float64)[order],
               np.asarray(weights, np.float64)[order])
    ux = np.unique(s)
    py = np.array([np.sum(w[s == x] * y[s == x]) / np.sum(w[s == x])
                   for x in ux])
    pw = np.array([np.sum(w[s == x]) for x in ux])
    n = len(ux)
    fit = np.zeros(n)
    for i in range(n):
        best = -np.inf
        for j in range(i + 1):
            worst = np.inf
            for k in range(i, n):
                seg = slice(j, k + 1)
                m = np.sum(py[seg] * pw[seg]) / np.sum(pw[seg])
                worst = min(worst, m)
            best = max(best, worst)
        fit[i] = best
    return ux, fit


def _model_map(ds):
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(
        batch_format="pyarrow")])
    return {k: (np.asarray(xs), np.asarray(vv))
            for k, xs, vv in zip(t["key"].to_pylist(),
                                 t["starts"].to_pylist(),
                                 t["values"].to_pylist())}


def _expand(xs, vv, query):
    pos = np.maximum(
        np.searchsorted(xs, query, side="right") - 1, 0)
    return vv[pos]


def _synth_rows(seed=5, n=300, keys=3):
    rng = np.random.default_rng(seed)
    key = rng.integers(0, keys, n).astype(np.int64)
    # quantized scores force ties
    s = np.round(rng.uniform(0, 1, n), 2)
    y = (s + rng.normal(0, 0.3, n) > 0.5).astype(np.float64)
    w = rng.integers(1, 4, n).astype(np.float64)
    return key, s, y, w


def _to_ds(key, s, y, w, parts=5):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "key": pa.array(key), "score": pa.array(s),
        "label": pa.array(y), "wt": pa.array(w)})).repartition(parts)


def test_isotonic_fit_matches_minimax_brute(ray_session):
    from osm_cut_ray.stages.calibrate import isotonic_fit

    key, s, y, w = _synth_rows()
    model = _model_map(isotonic_fit(
        _to_ds(key, s, y, w), key_col="key", score_col="score",
        label_col="label", weight_col="wt"))
    assert set(model) == {0, 1, 2}
    for k in (0, 1, 2):
        m = key == k
        ux, want = _brute_isotonic(s[m], y[m], w[m])
        xs, vv = model[k]
        got = _expand(xs, vv, ux)
        assert np.allclose(got, want, atol=1e-9)
        # monotone non-decreasing fitted values
        assert np.all(np.diff(vv) > 0)


def test_isotonic_partition_invariant_bitforbit(ray_session):
    from osm_cut_ray.stages.calibrate import isotonic_fit

    key, s, y, w = _synth_rows(seed=9)
    m1 = _model_map(isotonic_fit(
        _to_ds(key, s, y, w, parts=2), key_col="key",
        score_col="score", label_col="label", weight_col="wt"))
    m2 = _model_map(isotonic_fit(
        _to_ds(key, s, y, w, parts=19), key_col="key",
        score_col="score", label_col="label", weight_col="wt"))
    assert set(m1) == set(m2)
    for k in m1:
        assert m1[k][0].tolist() == m2[k][0].tolist()
        assert m1[k][1].tolist() == m2[k][1].tolist()


def test_isotonic_apply_step_rule(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.calibrate import (isotonic_apply,
                                              isotonic_fit)

    key, s, y, w = _synth_rows(seed=2)
    model_ds = isotonic_fit(
        _to_ds(key, s, y, w), key_col="key", score_col="score",
        label_col="label", weight_col="wt")
    model = _model_map(model_ds)

    qk = np.array([0, 1, 2, 7], np.int64)  # key 7 has no model
    qs = np.array([-1.0, 0.31, 0.99, 0.5])
    q = rd.from_arrow(pa.table({"key": pa.array(qk),
                                "score": pa.array(qs)}))
    out = pa.concat_tables([pa.table(b) for b in isotonic_apply(
        q, model_ds, key_col="key", score_col="score"
    ).iter_batches(batch_format="pyarrow")])
    got = dict(zip(out["key"].to_pylist(),
                   out["calibrated"].to_pylist()))
    for k, sc in zip(qk.tolist(), qs.tolist()):
        if k == 7:
            assert np.isnan(got[7])
        else:
            xs, vv = model[k]
            assert got[k] == _expand(xs, vv, np.array([sc]))[0]


def test_isotonic_global_curve_and_cap(ray_session):
    import pytest

    from osm_cut_ray.stages.calibrate import isotonic_fit

    key, s, y, w = _synth_rows(seed=3)
    model = _model_map(isotonic_fit(
        _to_ds(key, s, y, w), key_col=None, score_col="score",
        label_col="label"))
    assert set(model) == {0}
    ux, want = _brute_isotonic(s, y, np.ones_like(w))
    xs, vv = model[0]
    assert np.allclose(_expand(xs, vv, ux), want, atol=1e-9)

    with pytest.raises(RuntimeError, match="max_unique_scores"):
        isotonic_fit(_to_ds(key, s, y, w), key_col=None,
                     score_col="score", label_col="label",
                     max_unique_scores=5)


def test_isotonic_already_monotone_is_identity(ray_session):
    from osm_cut_ray.stages.calibrate import isotonic_fit

    s = np.array([0.1, 0.2, 0.3, 0.4])
    y = np.array([0.0, 0.25, 0.5, 1.0])
    key = np.zeros(4, np.int64)
    w = np.ones(4)
    model = _model_map(isotonic_fit(
        _to_ds(key, s, y, w, parts=1), key_col="key",
        score_col="score", label_col="label"))
    xs, vv = model[0]
    assert xs.tolist() == s.tolist()
    assert vv.tolist() == y.tolist()

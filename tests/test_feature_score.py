import numpy as np
import pyarrow as pa


def _collect(ds):
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.to_pandas().set_index("feature").sort_index()


def _brute(pairs):
    """Independent Counter-based chi2/MI per feature."""
    from collections import Counter
    N = len(pairs)
    n_c = Counter(lab for _, lab in pairs)
    classes = sorted(n_c)
    by_f = {}
    for f, lab in pairs:
        by_f.setdefault(f, Counter())[lab] += 1
    out = {}
    for f, cnt in by_f.items():
        n_f = sum(cnt.values())
        chi2 = 0.0
        mi = 0.0
        for c in classes:
            for o, row in ((cnt.get(c, 0), n_f),
                           (n_c[c] - cnt.get(c, 0), N - n_f)):
                e = row * n_c[c] / N
                if e > 0:
                    chi2 += (o - e) ** 2 / e
                if o > 0:
                    mi += o / N * np.log(o / e)
        out[f] = (n_f, chi2, mi)
    return out


def test_feature_scores_match_brute(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.feature_score import feature_label_scores

    rng = np.random.default_rng(61)
    pairs = []
    # informative features: feature f strongly predicts label f % 3
    for f in range(40):
        for _ in range(int(rng.integers(5, 80))):
            if rng.uniform() < 0.8:
                lab = f % 3
            else:
                lab = int(rng.integers(0, 3))
            pairs.append((f, lab))
    # noise features
    for f in range(100, 120):
        for _ in range(int(rng.integers(5, 40))):
            pairs.append((f, int(rng.integers(0, 3))))

    ds = rd.from_items([{"feat": f, "lab": c} for f, c in pairs]) \
        .repartition(8)
    got = _collect(feature_label_scores(
        ds, feature_col="feat", label_col="lab"))
    exp = _brute(pairs)
    assert set(got.index) == set(exp)
    for f, (n, chi2, mi) in exp.items():
        assert got.loc[f, "n"] == n, f
        assert abs(got.loc[f, "chi2"] - chi2) < 1e-8, f
        assert abs(got.loc[f, "mi"] - mi) < 1e-12, f
    # informative features must outrank noise on both scores
    info = got.loc[[f for f in got.index if f < 40]]
    noise = got.loc[[f for f in got.index if f >= 100]]
    assert info["chi2"].median() > 5 * noise["chi2"].median()
    assert info["mi"].median() > 5 * noise["mi"].median()


def test_feature_scores_class_cap_raises(ray_session):
    import pytest
    import ray.data as rd

    from osm_cut_ray.stages.feature_score import feature_label_scores

    ds = rd.from_items([{"feat": 1, "lab": i} for i in range(50)])
    with pytest.raises(ValueError, match="max_classes"):
        feature_label_scores(ds, feature_col="feat",
                             label_col="lab", max_classes=10)

import numpy as np
import pyarrow as pa
import pytest


def _corr_blobs(seed=9, n=400, d=6):
    rng = np.random.default_rng(seed)
    # anisotropic: variance concentrated along two planted axes
    basis = np.linalg.qr(rng.normal(0, 1, (d, d)))[0]
    scales = np.array([12.0, 6.0, 1.0, 0.5, 0.25, 0.1])[:d]
    mat = rng.normal(0, 1, (n, d)) * scales @ basis.T + rng.normal(
        0, 0.01, d)
    ids = np.arange(n, dtype=np.int64) * 3 + 1
    return ids, mat


def _ds(ids, mat, parts):
    import ray.data as rd
    t = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([row.tolist() for row in mat],
                              pa.list_(pa.float64()))})
    return rd.from_arrow(t).repartition(parts)


def _collect(ds):
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.to_pandas()


def _brute_fit(mat, n_components, scale_bits=20):
    """Same exact-integer covariance path, computed directly."""
    scale = 1 << scale_bits
    xq = np.round(mat * scale).astype(np.int64)
    n, d = xq.shape
    s = [int(v) for v in xq.sum(axis=0)]
    gq = xq.astype(object).T @ xq.astype(object)  # exact Python ints
    denom = float(n) * float(n - 1) * float(scale) * float(scale)
    cov = np.empty((d, d), np.float64)
    for i in range(d):
        for j in range(d):
            cov[i, j] = float(n * int(gq[i, j]) - s[i] * s[j]) / denom
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(-evals, kind="stable")[:n_components]
    comps = evecs[:, order].T
    for r in range(len(comps)):
        lead = int(np.argmax(np.abs(comps[r])))
        if comps[r, lead] < 0:
            comps[r] = -comps[r]
    mean = np.array([float(v) / (n * scale) for v in s])
    return mean, comps, np.maximum(evals[order], 0.0)


def test_pca_matches_brute_and_partition_invariant(ray_session):
    from osm_cut_ray.stages.pca import pca_fit

    ids, mat = _corr_blobs()
    mean_b, comps_b, ev_b = _brute_fit(mat, 3)

    fits = [pca_fit(_ds(ids, mat, parts), n_components=3)
            for parts in (2, 13)]
    for fit in fits:
        # bit-identical to the brute exact-integer path
        assert np.array_equal(fit["mean"], mean_b)
        assert np.array_equal(fit["components"], comps_b)
        assert np.array_equal(fit["explained_var"], ev_b)
        assert fit["n"] == len(ids)
    # planted spectrum recovered: top-2 variances dominate
    assert fits[0]["explained_var"][0] > fits[0]["explained_var"][1]
    assert (fits[0]["explained_var"][:2].sum()
            > 0.9 * (12.0 ** 2 + 6.0 ** 2) * 0.8)


def test_pca_transform_projects_and_reconstructs(ray_session):
    from osm_cut_ray.stages.pca import pca_fit, pca_transform

    ids, mat = _corr_blobs(seed=4, n=300)
    ds = _ds(ids, mat, 5)
    fit = pca_fit(ds, n_components=4)
    out = _collect(pca_transform(ds, fit)).set_index("id")
    proj = np.array(out.loc[ids, "pc"].tolist())
    assert proj.shape == (len(ids), 4)
    # projection equals direct centered matmul
    exp = (mat - fit["mean"]) @ fit["components"].T
    assert np.allclose(proj, exp, atol=1e-12)
    # reconstruction error shrinks as components grow
    errs = []
    for k in (1, 2, 4):
        f = pca_fit(ds, n_components=k)
        p = (mat - f["mean"]) @ f["components"].T
        rec = p @ f["components"] + f["mean"]
        errs.append(float(((mat - rec) ** 2).sum()))
    assert errs[0] > errs[1] > errs[2]
    # explained variance ledger: top-k variances <= total
    assert fit["explained_var"].sum() <= fit["total_var"] + 1e-9


def test_pca_degenerate_inputs(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.pca import pca_fit

    with pytest.raises(ValueError, match="no non-empty|>= 2"):
        t = pa.table({
            "vec_id": pa.array([1], pa.int64()),
            "embedding": pa.array([[0.5, 1.0]],
                                  pa.list_(pa.float64()))})
        pca_fit(rd.from_arrow(t))

    # constant column -> zero variance axis, still well-defined
    ids = np.arange(10, dtype=np.int64)
    mat = np.zeros((10, 3))
    mat[:, 0] = np.arange(10.0)
    fit = pca_fit(_ds(ids, mat, 2), n_components=3)
    assert fit["explained_var"][0] > 0
    assert np.allclose(fit["explained_var"][1:], 0.0, atol=1e-12)

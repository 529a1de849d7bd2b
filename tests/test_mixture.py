import numpy as np
import pyarrow as pa
import pytest


def _ds(rd, n=30_000, parts=5):
    doms = np.array(["web", "code", "papers"], object)
    return rd.from_arrow(pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "domain": pa.array(doms[np.arange(n) % 3].tolist()),
        "text": pa.array([f"d{i}" for i in range(n)])})) \
        .repartition(parts)


def test_mixture_sample_rates_and_determinism(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.mixture import mixture_sample
    from osm_cut_ray.stages.wsample import uniform_hash
    from osm_cut_ray.stages.mixture import _dom_salt

    rates = {"web": 0.5, "code": 0.1}
    ref = None
    for parts in (1, 8):
        out = mixture_sample(_ds(rd, parts=parts), rates=rates,
                             default_rate=0.9, seed=3)
        got = sorted((r["id"], r["domain"]) for r in out.take_all())
        if ref is None:
            ref = got
        else:
            assert got == ref  # identical subset across partitioning
    # exact brute replay of the documented rule
    ids = np.arange(30_000, dtype=np.int64)
    doms = np.array(["web", "code", "papers"], object)[ids % 3]
    exp = []
    for i, d in zip(ids, doms):
        r = rates.get(d, 0.9)
        u = uniform_hash(np.array([i], np.int64)
                         ^ _dom_salt(d, 3), 3)[0]
        if u < r:
            exp.append((int(i), d))
    assert ref == sorted(exp)
    # realized rates are near nominal
    by = {}
    for i, d in ref:
        by[d] = by.get(d, 0) + 1
    assert abs(by["web"] / 10_000 - 0.5) < 0.02
    assert abs(by["code"] / 10_000 - 0.1) < 0.02
    assert abs(by["papers"] / 10_000 - 0.9) < 0.02
    # rate 0 and 1 are exact
    out = mixture_sample(_ds(rd), rates={"web": 1.0, "code": 0.0},
                         default_rate=0.0)
    got = [r["domain"] for r in out.take_all()]
    assert set(got) == {"web"} and len(got) == 10_000


def test_mixture_sample_validates_rates(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.mixture import mixture_sample

    with pytest.raises(ValueError, match="must be in"):
        mixture_sample(_ds(rd), rates={"web": 1.2})

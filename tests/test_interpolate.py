import numpy as np
import pyarrow as pa


def test_idw_matches_brute(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.interpolate import idw_interpolate

    rng = np.random.default_rng(53)
    nq, ns = 250, 600
    qp = rng.uniform(0, 5, (nq, 2))
    sp = rng.uniform(0, 5, (ns, 2))
    sv = rng.uniform(-10, 10, ns)
    # plant exact hits: queries 0..4 sit exactly on samples 0..4;
    # query 5 is far outside every sample's reach
    qp[:5] = sp[:5]
    qp[5] = (400.0, 400.0)
    q = rd.from_arrow(pa.table({
        "id": np.arange(nq, dtype=np.int64),
        "lon": qp[:, 0], "lat": qp[:, 1]})).repartition(3)
    s = rd.from_arrow(pa.table({
        "id": np.arange(ns, dtype=np.int64) + 10_000,
        "lon": sp[:, 0], "lat": sp[:, 1],
        "value": sv})).repartition(4)

    eps, power = 0.4, 2.0
    got = idw_interpolate(q, s, eps=eps, power=power).to_pandas() \
        .sort_values("id").reset_index(drop=True)

    exp = {}
    for i in range(nq):
        cands = []
        for j in range(ns):
            d = float(np.hypot(qp[i, 0] - sp[j, 0], qp[i, 1] - sp[j, 1]))
            if d <= eps:
                cands.append((d, 10_000 + j, sv[j]))
        if not cands:
            continue
        cands.sort()
        if cands[0][0] == 0.0:
            exp[i] = (cands[0][2], len(cands))
            continue
        w = np.array([c[0] ** -power for c in cands])
        v = np.array([c[2] for c in cands])
        exp[i] = (float((w * v).sum() / w.sum()), len(cands))

    assert got["id"].tolist() == sorted(exp)
    for r in got.itertuples():
        ev, en = exp[int(r.id)]
        assert r.n_used == en
        assert abs(r.value - ev) < 1e-12
    # exact hits returned the co-located sample's value verbatim
    for i in range(5):
        assert got[got["id"] == i]["value"].iloc[0] == sv[i]
    # some query had no sample in range (absent from output)
    assert len(got) < nq

    # k-nearest restriction agrees with a truncated brute
    got3 = idw_interpolate(q, s, eps=eps, power=power, k=3) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    for r in got3.itertuples():
        i = int(r.id)
        cands = sorted(
            (float(np.hypot(qp[i, 0] - sp[j, 0], qp[i, 1] - sp[j, 1])),
             10_000 + j, sv[j])
            for j in range(ns)
            if np.hypot(qp[i, 0] - sp[j, 0],
                        qp[i, 1] - sp[j, 1]) <= eps)[:3]
        if cands[0][0] == 0.0:
            assert r.value == cands[0][2]
            continue
        w = np.array([c[0] ** -power for c in cands])
        v = np.array([c[2] for c in cands])
        assert abs(r.value - (w * v).sum() / w.sum()) < 1e-12
        assert r.n_used == len(cands)


def test_idw_empty(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.interpolate import idw_interpolate

    q = rd.from_arrow(pa.table({
        "id": pa.array([1], pa.int64()),
        "lon": pa.array([0.0]), "lat": pa.array([0.0])}))
    s = rd.from_arrow(pa.table({
        "id": pa.array([2], pa.int64()),
        "lon": pa.array([50.0]), "lat": pa.array([50.0]),
        "value": pa.array([3.0])}))
    assert idw_interpolate(q, s, eps=1.0).count() == 0

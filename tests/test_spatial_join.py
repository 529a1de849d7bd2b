import numpy as np
import pyarrow as pa


def _mk(rng, n, span, seed_ids=0):
    pts = rng.uniform(0, span, (n, 2))
    ids = np.arange(seed_ids, seed_ids + n, dtype=np.int64)
    return ids, pts


def _brute_pairs(ida, pa_, idb, pb_, eps):
    out = set()
    d_of = {}
    for i in range(len(ida)):
        for j in range(len(idb)):
            d = float(np.hypot(pa_[i, 0] - pb_[j, 0],
                               pa_[i, 1] - pb_[j, 1]))
            if d <= eps:
                out.add((int(ida[i]), int(idb[j])))
                d_of[(int(ida[i]), int(idb[j]))] = d
    return out, d_of


def test_distance_join_matches_brute(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.spatial_join import distance_join

    rng = np.random.default_rng(29)
    ida, pta = _mk(rng, 300, 6.0)
    idb, ptb = _mk(rng, 400, 6.0)  # OVERLAPPING id spaces on purpose
    a = rd.from_arrow(pa.table({
        "id": ida, "lon": pta[:, 0], "lat": pta[:, 1]})).repartition(4)
    b = rd.from_arrow(pa.table({
        "id": idb, "lon": ptb[:, 0], "lat": ptb[:, 1]})).repartition(3)

    eps = 0.3
    got = distance_join(a, b, eps=eps).to_pandas()
    exp, d_of = _brute_pairs(ida, pta, idb, ptb, eps)
    got_pairs = set(zip(got["a_id"].astype(int), got["b_id"].astype(int)))
    assert got_pairs == exp
    assert len(got) == len(exp)  # no duplicate pair rows
    for r in got.itertuples():
        assert abs(r.dist - d_of[(int(r.a_id), int(r.b_id))]) < 1e-12


def test_knn_join_matches_brute(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.spatial_join import distance_join

    rng = np.random.default_rng(31)
    ida, pta = _mk(rng, 120, 3.0)
    idb, ptb = _mk(rng, 500, 3.0, seed_ids=10_000)
    a = rd.from_arrow(pa.table({
        "id": ida, "lon": pta[:, 0], "lat": pta[:, 1]}))
    b = rd.from_arrow(pa.table({
        "id": idb, "lon": ptb[:, 0], "lat": ptb[:, 1]})).repartition(5)

    eps, k = 0.4, 3
    got = distance_join(a, b, eps=eps, k=k).to_pandas() \
        .sort_values(["a_id", "dist", "b_id"]).reset_index(drop=True)
    # brute: per a, the k nearest within eps by (dist, b_id)
    exp_rows = []
    for i in range(len(ida)):
        cands = []
        for j in range(len(idb)):
            d = float(np.hypot(pta[i, 0] - ptb[j, 0],
                               pta[i, 1] - ptb[j, 1]))
            if d <= eps:
                cands.append((d, int(idb[j])))
        for d, bj in sorted(cands)[:k]:
            exp_rows.append((int(ida[i]), d, bj))
    exp_rows.sort()  # (a, dist, b) — matches got's sort order
    assert len(got) == len(exp_rows)
    for i, (ai, d, bi) in enumerate(exp_rows):
        assert int(got["a_id"][i]) == ai and int(got["b_id"][i]) == bi
        assert abs(got["dist"][i] - d) < 1e-12


def test_distance_join_cap_sentinel(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.spatial_join import distance_join

    # 60 x 60 co-located points in one cell -> 3600 pairs > cap
    n = 60
    a = rd.from_arrow(pa.table({
        "id": np.arange(n, dtype=np.int64),
        "lon": np.full(n, 0.05), "lat": np.full(n, 0.05)}))
    b = rd.from_arrow(pa.table({
        "id": np.arange(n, dtype=np.int64) + 1000,
        "lon": np.full(n, 0.06), "lat": np.full(n, 0.05)}))
    got = distance_join(a, b, eps=0.1, max_cell_pairs=1000).to_pandas()
    sent = got[got["a_id"] == -1]
    assert len(sent) == 1 and int(sent["b_id"].iloc[0]) == n * n
    assert np.isinf(sent["dist"].iloc[0])
    assert len(got[got["a_id"] >= 0]) == 0  # capped cell emits no pairs

    # same corpus under a higher cap: all pairs come back
    full = distance_join(a, b, eps=0.1, max_cell_pairs=10_000) \
        .to_pandas()
    assert len(full) == n * n and (full["a_id"] >= 0).all()

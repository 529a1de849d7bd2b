import numpy as np
import pyarrow as pa


def _dtw_brute(a, b, band=None):
    """Textbook full-matrix DTW DP, independent of the stage's
    streaming-row formulation."""
    n, m = len(a), len(b)
    d = np.empty((n, m))
    for i in range(n):
        for j in range(m):
            d[i, j] = float(np.hypot(a[i][0] - b[j][0],
                                     a[i][1] - b[j][1]))
            if band is not None:
                c = j * (n - 1) / (m - 1) if m > 1 else 0.0
                if abs(i - c) > band:
                    d[i, j] = np.inf
    ca = np.full((n, m), np.inf)
    for i in range(n):
        for j in range(m):
            if i == 0 and j == 0:
                best = 0.0
            elif i == 0:
                best = ca[0, j - 1]
            elif j == 0:
                best = ca[i - 1, 0]
            else:
                best = min(ca[i - 1, j], ca[i - 1, j - 1],
                           ca[i, j - 1])
            ca[i, j] = d[i, j] + best
    return float(ca[n - 1, m - 1])


def test_dtw_matches_brute():
    from osm_cut_ray.stages.dtw import dtw_distance

    rng = np.random.default_rng(5)
    for trial in range(40):
        n, m = rng.integers(1, 14, 2)
        a = rng.uniform(0, 5, (n, 2))
        b = rng.uniform(0, 5, (m, 2))
        band = None if trial % 3 == 0 else float(rng.uniform(0.4, 6))
        got = dtw_distance(a[:, 0], a[:, 1], b[:, 0], b[:, 1],
                           band=band)
        exp = _dtw_brute(a.tolist(), b.tolist(), band=band)
        assert (got == exp == np.inf) or abs(got - exp) < 1e-10, trial
        # thresholded call: exact when <= thr, else inf or the exact
        # (un-abandoned) value — never a wrong accept
        thr = float(rng.uniform(0, 12))
        gt = dtw_distance(a[:, 0], a[:, 1], b[:, 0], b[:, 1],
                          band=band, threshold=thr)
        if exp <= thr:
            assert abs(gt - exp) < 1e-10, trial
        else:
            assert gt == np.inf or abs(gt - exp) < 1e-10, trial


def test_dtw_warp_invariance_and_order():
    from osm_cut_ray.stages.dtw import dtw_distance

    # the defining DTW property Frechet lacks as a sum: a re-drive at
    # different speed (repeated samples) warps on at ZERO extra cost
    a = np.array([[0.0, 0], [1, 0], [2, 0], [3, 0]])
    slow = np.repeat(a, 3, axis=0)  # each fix sampled 3x
    assert dtw_distance(a[:, 0], a[:, 1], slow[:, 0],
                        slow[:, 1]) == 0.0
    # order sensitivity: reverse is NOT distance 0
    rev = a[::-1]
    assert dtw_distance(a[:, 0], a[:, 1], rev[:, 0], rev[:, 1]) > 0
    # a too-tight band makes the warp pay: band=0 forces the diagonal
    assert dtw_distance(a[:, 0], a[:, 1], slow[:, 0], slow[:, 1],
                        band=0.4) > 0


def _routes(rng, n_routes=30, pts_per=25, span=80.0):
    """Well-separated base routes + jittered duplicates of some
    (same corpus shape as tests/test_traj_dedup.py)."""
    rows, planted = [], []
    tid = 0
    for r in range(n_routes):
        ax = (r % 6) * span / 6 + 2.0
        ay = (r // 6) * span / 6 + 2.0
        xs = ax + np.cumsum(rng.uniform(0.05, 0.3, pts_per))
        ys = ay + np.cumsum(rng.uniform(-0.15, 0.15, pts_per))
        base_id = tid
        for i in range(pts_per):
            rows.append((tid, float(i), xs[i], ys[i]))
        tid += 1
        if r % 3 == 0:
            for i in range(pts_per):
                rows.append((tid, float(i),
                             xs[i] + rng.uniform(-0.0005, 0.0005),
                             ys[i] + rng.uniform(-0.0005, 0.0005)))
            planted.append((base_id, tid))
            tid += 1
    return rows, planted


def test_trajectory_dtw_pairs(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.dtw import dtw_distance, trajectory_dtw_pairs

    rng = np.random.default_rng(17)
    rows, planted = _routes(rng)
    arr = np.array(rows)
    ds = rd.from_arrow(pa.table({
        "traj_id": arr[:, 0].astype(np.int64), "ts": arr[:, 1],
        "lon": arr[:, 2], "lat": arr[:, 3]})).repartition(6)

    # jitter sums over 25 fixes: ~25 * 0.0005 * sqrt(2)/2 ~ 0.01;
    # distinct routes are >= 10 deg apart per fix -> DTW >= 250
    thr = 0.05
    got = trajectory_dtw_pairs(ds, dtw_threshold=thr, res=7,
                               n_bands=32)
    got_pairs = list(zip(got["a_id"].to_pylist(),
                         got["b_id"].to_pylist()))

    by_tid = {}
    for t, ts, x, y in rows:
        by_tid.setdefault(int(t), []).append((ts, x, y))
    polys = {t: np.array(sorted(v))[:, 1:] for t, v in by_tid.items()}
    tids = sorted(polys)
    brute = {}
    for i, a in enumerate(tids):
        for b in tids[i + 1:]:
            f = dtw_distance(polys[a][:, 0], polys[a][:, 1],
                             polys[b][:, 0], polys[b][:, 1])
            if f <= thr:
                brute[(a, b)] = f
    assert set(planted) == set(brute)
    assert got_pairs == sorted(brute)
    for a, b, f in zip(got["a_id"].to_pylist(), got["b_id"].to_pylist(),
                       got["dtw"].to_pylist()):
        assert abs(f - brute[(a, b)]) < 1e-10
    assert got.schema.names == ["a_id", "b_id", "dtw"]


def test_frechet_pairs_unchanged_by_refactor(ray_session):
    """The shared scaffold must keep trajectory_dup_pairs' output
    contract (this is the refactor-guard; the full pin lives in
    test_traj_dedup.py)."""
    import ray.data as rd

    from osm_cut_ray.stages.traj_dedup import trajectory_dup_pairs

    rng = np.random.default_rng(17)
    rows, planted = _routes(rng, n_routes=9)
    arr = np.array(rows)
    ds = rd.from_arrow(pa.table({
        "traj_id": arr[:, 0].astype(np.int64), "ts": arr[:, 1],
        "lon": arr[:, 2], "lat": arr[:, 3]})).repartition(4)
    got = trajectory_dup_pairs(ds, frechet_threshold=0.05, res=7,
                               n_bands=32)
    assert got.schema.names == ["a_id", "b_id", "frechet"]
    assert set(zip(got["a_id"].to_pylist(),
                   got["b_id"].to_pylist())) == set(planted)

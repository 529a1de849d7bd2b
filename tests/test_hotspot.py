import numpy as np
import pyarrow as pa


def test_getis_ord_matches_brute(ray_session):
    import ray.data as rd

    from osm_cut_ray.geometry.cells import hex_cell, hex_neighbors
    from osm_cut_ray.stages.hotspot import getis_ord_gi

    rng = np.random.default_rng(73)
    res = 6
    # background + one dense planted blob
    bg = rng.uniform([-5, -5], [5, 5], (3000, 2))
    hot = rng.normal([1.0, 1.0], 0.02, (1500, 2))
    pts = np.vstack([bg, hot])
    ds = rd.from_arrow(pa.table({
        "lon": pts[:, 0], "lat": pts[:, 1]})).repartition(5)

    got = getis_ord_gi(ds, res=res).to_pandas() \
        .sort_values("cell").reset_index(drop=True)

    # brute
    cells = hex_cell(pts[:, 0], pts[:, 1], res)
    uc, cnt = np.unique(cells, return_counts=True)
    count_of = dict(zip(uc.tolist(), cnt.tolist()))
    n = len(uc)
    xbar = cnt.mean()
    s = cnt.std()  # population
    nbrs = hex_neighbors(uc)
    exp = {}
    for i, c in enumerate(uc.tolist()):
        ring = [c] + nbrs[i].tolist()
        xs = [count_of[r] for r in ring if r in count_of]
        wi = len(xs)
        den = s * np.sqrt((n * wi - wi * wi) / (n - 1))
        exp[c] = (float(cnt[i]),
                  float((sum(xs) - xbar * wi) / den) if den > 0 else 0.0)

    assert got["cell"].tolist() == sorted(exp)
    for r in got.itertuples():
        en, ez = exp[int(r.cell)]
        assert r.n == en
        assert abs(r.gi_z - ez) < 1e-9

    # the planted blob's cell is the global hottest and significant
    # (.loc on a mixed row would upcast the int64 cell to float64 and
    # lose precision — index the column directly)
    from osm_cut_ray.geometry.cells import hex_disk
    hot_cell = int(hex_cell(np.array([1.0]), np.array([1.0]), res)[0])
    imax = got["gi_z"].idxmax()
    assert int(got["cell"][imax]) in set(
        hex_disk(hot_cell, 1).tolist())
    assert got["gi_z"][imax] > 5.0
    # background cells hover near zero
    assert np.median(np.abs(got["gi_z"])) < 2.0


def _brute_mk(series):
    B = len(series)
    S = 0
    for i in range(B):
        for j in range(i + 1, B):
            S += int(np.sign(series[j] - series[i]))
    var = B * (B - 1) * (2 * B + 5) / 18.0
    _, tcnt = np.unique(series, return_counts=True)
    var -= (tcnt * (tcnt - 1) * (2 * tcnt + 5)).sum() / 18.0
    if var <= 0:
        return S, 0.0
    if S > 0:
        return S, (S - 1) / np.sqrt(var)
    if S < 0:
        return S, (S + 1) / np.sqrt(var)
    return S, 0.0


def test_emerging_hotspots_match_brute(ray_session):
    import ray.data as rd

    from osm_cut_ray.geometry.cells import hex_cell
    from osm_cut_ray.stages.hotspot import emerging_hotspots

    rng = np.random.default_rng(79)
    res, t0, t1, step = 6, 0.0, 120.0, 10.0  # 12 bins
    rows = []
    # growing blob at (1,1): events per bin ramp 0..11
    for b in range(12):
        for _ in range(b):
            rows.append((rng.normal(1.0, 0.01), rng.normal(1.0, 0.01),
                         t0 + b * step + rng.uniform(0, step)))
    # fading blob at (3,3): ramp down
    for b in range(12):
        for _ in range(11 - b):
            rows.append((rng.normal(3.0, 0.01), rng.normal(3.0, 0.01),
                         t0 + b * step + rng.uniform(0, step)))
    # stationary noise + out-of-range events (must be ignored)
    for _ in range(400):
        rows.append((rng.uniform(-5, 5), rng.uniform(-5, 5),
                     rng.uniform(t0, t1)))
    rows.append((1.0, 1.0, -50.0))
    rows.append((1.0, 1.0, 500.0))
    arr = np.array(rows)
    ds = rd.from_arrow(pa.table({
        "lon": arr[:, 0], "lat": arr[:, 1],
        "ts": arr[:, 2]})).repartition(4)

    got = emerging_hotspots(ds, t0=t0, t1=t1, interval=step,
                            res=res).to_pandas() \
        .sort_values("cell").reset_index(drop=True)

    # brute over the same binning
    ok = (arr[:, 2] >= t0) & (arr[:, 2] < t1)
    cells = hex_cell(arr[ok, 0], arr[ok, 1], res)
    bins = ((arr[ok, 2] - t0) / step).astype(np.int64)
    series = {}
    for c, b in zip(cells.tolist(), bins.tolist()):
        series.setdefault(c, np.zeros(12, np.int64))[b] += 1
    assert got["cell"].tolist() == sorted(series)
    for r in got.itertuples():
        s = series[int(r.cell)]
        es, ez = _brute_mk(s)
        assert int(r.mk_s) == es
        assert abs(r.mk_z - ez) < 1e-12
        assert int(r.n_events) == int(s.sum())

    grow = int(hex_cell(np.array([1.0]), np.array([1.0]), res)[0])
    fade = int(hex_cell(np.array([3.0]), np.array([3.0]), res)[0])
    zmap = {int(r.cell): r.mk_z for r in got.itertuples()}
    assert zmap[grow] > 3.0   # strongly emerging
    assert zmap[fade] < -3.0  # strongly fading


def test_getis_ord_degenerate(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.hotspot import getis_ord_gi

    empty = rd.from_arrow(pa.table({
        "lon": pa.array([], pa.float64()),
        "lat": pa.array([], pa.float64())}))
    assert getis_ord_gi(empty).count() == 0

    # uniform counts (every cell equal) -> S = 0 -> all z = 0
    one = rd.from_arrow(pa.table({
        "lon": pa.array([0.0]), "lat": pa.array([0.0])}))
    df = getis_ord_gi(one).to_pandas()
    assert len(df) == 1 and df["gi_z"][0] == 0.0 and df["n"][0] == 1


def test_morans_i_matches_brute_and_separates(ray_session):
    import ray.data as rd

    from osm_cut_ray.geometry.cells import hex_cell, hex_neighbors
    from osm_cut_ray.stages.hotspot import morans_i

    def brute(pts, res):
        """Textbook Moran's I over the dense W matrix (symmetric
        binary ring-1 weights, non-empty universe)."""
        cells = hex_cell(pts[:, 0], pts[:, 1], res)
        uc, cnt = np.unique(cells, return_counts=True)
        pos = {int(c): i for i, c in enumerate(uc)}
        n = len(uc)
        W = np.zeros((n, n))
        nbrs = hex_neighbors(uc)
        for i in range(n):
            for nb in nbrs[i].tolist():
                j = pos.get(int(nb))
                if j is not None:
                    W[i, j] = 1.0
        assert (W == W.T).all()          # symmetry precondition
        z = cnt - cnt.mean()
        S0 = W.sum()
        I = (n / S0) * (z @ W @ z) / (z @ z)
        EI = -1.0 / (n - 1)
        S1 = 0.5 * ((W + W.T) ** 2).sum()
        S2 = ((W.sum(axis=0) + W.sum(axis=1)) ** 2).sum()
        var = ((n * n * S1 - n * S2 + 3 * S0 * S0)
               / ((n * n - 1) * S0 * S0)) - EI * EI
        return n, S0, I, EI, var, (I - EI) / np.sqrt(var)

    rng = np.random.default_rng(41)
    res = 6
    # clustered corpus: two dense blobs on sparse background
    pts = np.vstack([
        rng.uniform([-5, -5], [5, 5], (1500, 2)),
        rng.normal([1.0, 1.0], 0.05, (1200, 2)),
        rng.normal([-2.0, -2.5], 0.05, (900, 2))])
    ds = rd.from_arrow(pa.table({
        "lon": pts[:, 0], "lat": pts[:, 1]})).repartition(5)
    got = morans_i(ds, res=res)
    n, S0, I, EI, var, z = brute(pts, res)
    assert got["n_cells"] == n and got["s0"] == int(S0)
    assert abs(got["morans_i"] - I) < 1e-9
    assert abs(got["e_i"] - EI) < 1e-12
    assert abs(got["var_i"] - var) < 1e-12
    assert abs(got["z_norm"] - z) < 1e-9
    assert got["morans_i"] > 0.2 and got["z_norm"] > 3.0  # clustered

    # partitioning invariance (exact: int64 aggregates only)
    ds2 = rd.from_arrow(pa.table({
        "lon": pts[:, 0], "lat": pts[:, 1]})).repartition(13)
    got2 = morans_i(ds2, res=res)
    assert got2 == got

    # dispersed (checkerboard-intensity) corpus scores NEGATIVE:
    # alternate hex columns get 10x the points
    from osm_cut_ray.geometry.cells import hex_cell_decode
    base = rng.uniform([-3, -3], [3, 3], (4000, 2))
    cells0 = hex_cell(base[:, 0], base[:, 1], res)
    q = hex_cell_decode(cells0)[1]
    keep = (q % 2 == 0) | (rng.random(len(base)) < 0.1)
    disp = base[keep]
    dds = rd.from_arrow(pa.table({
        "lon": disp[:, 0], "lat": disp[:, 1]})).repartition(4)
    gd = morans_i(dds, res=res)
    bn, bS0, bI, bEI, bvar, bz = brute(disp, res)
    assert abs(gd["morans_i"] - bI) < 1e-9
    assert gd["morans_i"] < 0.0

    # degenerate: single cell -> NaN stats
    one = rd.from_arrow(pa.table({"lon": [0.001, 0.002],
                                  "lat": [0.001, 0.0015]}))
    g1 = morans_i(one, res=2)
    assert g1["n_cells"] <= 1 or np.isnan(g1["morans_i"])

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

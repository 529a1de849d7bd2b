import numpy as np
import pyarrow as pa


def test_geo_corpus_report(ray_session):
    import ray.data as rd

    from osm_cut_ray.geometry.cells import hex_cell
    from osm_cut_ray.pipelines.geo_report import geo_corpus_report
    from osm_cut_ray.stages.network import way_components

    rng = np.random.default_rng(83)
    n = 20_000
    lon = rng.uniform(-30, 45, n)
    lat = rng.uniform(-10, 25, n)
    ids = np.arange(1, n + 1, dtype=np.int64)
    nodes = rd.from_arrow(pa.table({
        "id": ids, "lon": lon, "lat": lat})).repartition(6)
    ways = []
    for w in range(800):
        k = int(rng.integers(2, 30))
        ways.append({"id": 10_000 + w,
                     "refs": rng.choice(ids, k, replace=False).tolist()})
    ways_ds = rd.from_items(ways).repartition(4)
    rels = rd.from_items([{"id": 1, "members": []}] * 7)

    rep = geo_corpus_report(nodes, ways_ds, rels, res=6,
                            include_components=True)
    assert rep["n_nodes"] == n
    bx0, by0, bx1, by1 = rep["bbox"]
    assert (abs(bx0 - lon.min()) < 1e-12 and abs(bx1 - lon.max()) < 1e-12
            and abs(by0 - lat.min()) < 1e-12
            and abs(by1 - lat.max()) < 1e-12)
    exact_cells = len(np.unique(hex_cell(lon, lat, 6)))
    assert abs(rep["distinct_cells_est"] - exact_cells) \
        < 0.1 * exact_cells  # HLL error bound (generous)
    assert abs(rep["points_per_cell_est"]
               - n / rep["distinct_cells_est"]) < 1e-9
    assert rep["n_ways"] == 800
    assert rep["total_refs"] == sum(len(w["refs"]) for w in ways)
    lens = np.array(sorted(len(w["refs"]) for w in ways))
    # KLL rank error: p50 estimate within a few percentile ranks
    p50 = rep["way_refs_p50"]
    rank = np.searchsorted(lens, p50) / len(lens)
    assert 0.4 < rank < 0.6
    assert rep["way_refs_p90"] >= p50
    assert rep["n_relations"] == 7
    comp = way_components(ways_ds).to_pandas()
    assert rep["n_way_components"] == comp["component"].nunique()


def test_geo_corpus_report_empty(ray_session):
    import ray.data as rd

    from osm_cut_ray.pipelines.geo_report import geo_corpus_report

    nodes = rd.from_arrow(pa.table({
        "id": pa.array([], pa.int64()),
        "lon": pa.array([], pa.float64()),
        "lat": pa.array([], pa.float64())}))
    ways = rd.from_arrow(pa.table({
        "id": pa.array([], pa.int64()),
        "refs": pa.array([], pa.list_(pa.int64()))}))
    rep = geo_corpus_report(nodes, ways, include_components=True)
    assert rep["n_nodes"] == 0 and rep["bbox"] is None
    assert rep["n_ways"] == 0 and rep["way_refs_p50"] == 0.0
    assert rep["distinct_cells_est"] == 0.0

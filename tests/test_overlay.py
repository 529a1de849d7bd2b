import numpy as np
import pyarrow as pa


def _brute_crossings(a_segs, b_segs):
    """Proper-crossing reference (independent formulation: solve the
    2x2 linear system, require both params strictly in (0, 1))."""
    out = []
    for aw, as_, ax1, ay1, ax2, ay2 in a_segs:
        for bw, bs_, bx1, by1, bx2, by2 in b_segs:
            r = np.array([ax2 - ax1, ay2 - ay1])
            s = np.array([bx2 - bx1, by2 - by1])
            den = r[0] * s[1] - r[1] * s[0]
            if den == 0:
                continue
            qp = np.array([bx1 - ax1, by1 - ay1])
            t = (qp[0] * s[1] - qp[1] * s[0]) / den
            u = (qp[0] * r[1] - qp[1] * r[0]) / den
            if 0 < t < 1 and 0 < u < 1:
                out.append((aw, as_, bw, bs_,
                            ax1 + t * r[0], ay1 + t * r[1]))
    return out


def _ways_ds(segchains, id0):
    """segchains: list of vertex lists -> (nodes, ways, seg tuples)."""
    import ray.data as rd
    nodes, ways, segs = [], [], []
    nid = id0 * 1000
    for wi, chain in enumerate(segchains):
        wid = id0 + wi
        refs = []
        for (x, y) in chain:
            nid += 1
            nodes.append({"id": nid, "lon": float(x), "lat": float(y)})
            refs.append(nid)
        ways.append({"id": wid, "refs": refs})
        for s in range(len(chain) - 1):
            segs.append((wid, s, *chain[s], *chain[s + 1]))
    return (rd.from_items(nodes), rd.from_items(ways), segs)


def test_way_intersections_match_brute(ray_session):
    from osm_cut_ray.stages.overlay import way_intersections

    rng = np.random.default_rng(43)
    a_chains = []
    for _ in range(12):
        n = int(rng.integers(2, 6))
        pts = rng.uniform(0, 4, (n, 2))
        a_chains.append([tuple(p) for p in pts])
    b_chains = []
    for _ in range(15):
        n = int(rng.integers(2, 5))
        pts = rng.uniform(0, 4, (n, 2))
        b_chains.append([tuple(p) for p in pts])
    a_nodes, a_ways, a_segs = _ways_ds(a_chains, 100)
    b_nodes, b_ways, b_segs = _ways_ds(b_chains, 500)

    got = way_intersections(a_ways, a_nodes, b_ways, b_nodes,
                            cell_deg=0.8).to_pandas() \
        .sort_values(["a_way", "a_seg", "b_way", "b_seg"]) \
        .reset_index(drop=True)
    exp = sorted(_brute_crossings(a_segs, b_segs))
    assert len(got) == len(exp)
    for i, (aw, as_, bw, bs_, x, y) in enumerate(exp):
        assert (int(got["a_way"][i]), int(got["a_seg"][i]),
                int(got["b_way"][i]), int(got["b_seg"][i])) \
            == (aw, as_, bw, bs_)
        assert abs(got["x"][i] - x) < 1e-9
        assert abs(got["y"][i] - y) < 1e-9
    assert len(exp) > 10  # random chains do cross


def test_way_intersections_touch_excluded(ray_session):
    from osm_cut_ray.stages.overlay import way_intersections

    # T-touch (endpoint on interior), shared endpoint, collinear
    # overlap, and one real crossing
    a_nodes, a_ways, _ = _ways_ds(
        [[(0, 0), (2, 0)]], 100)
    b_nodes, b_ways, _ = _ways_ds(
        [[(1, 0), (1, 1)],          # T-touch at (1, 0): excluded
         [(2, 0), (3, 1)],          # shared endpoint: excluded
         [(0.5, 0), (1.5, 0)],      # collinear overlap: excluded
         [(1.5, -1), (1.5, 1)]],    # proper crossing at (1.5, 0)
        500)
    got = way_intersections(a_ways, a_nodes, b_ways, b_nodes,
                            cell_deg=1.0).to_pandas()
    assert len(got) == 1
    assert int(got["b_way"][0]) == 503
    assert abs(got["x"][0] - 1.5) < 1e-12 and abs(got["y"][0]) < 1e-12


def test_overlay_cap_surfaces_dropped_cells(ray_session):
    """Adversarial collinear corpora (both traced along the same
    curve) pile candidate pairs into few cells; `max_cell_pairs`
    drops those cells' pairs and surfaces sentinel rows (a_way =
    b_way = -1, b_seg = dropped pair count) instead of silently
    truncating (the spatial_join.py cap contract)."""
    from osm_cut_ray.stages.overlay import way_intersections

    rng = np.random.default_rng(91)
    # dense hot cell: many A and B segments jittered along y=x inside
    # one grid cell; plus one isolated proper crossing far away
    a_chains, b_chains = [], []
    for i in range(14):
        t0 = rng.uniform(0.1, 0.4)
        a_chains.append([(t0, t0 + rng.uniform(-0.05, 0.05)),
                         (t0 + 0.3, t0 + 0.3 + rng.uniform(-0.05, 0.05))])
        b_chains.append([(t0 + 0.3, t0 + rng.uniform(-0.05, 0.05)),
                         (t0, t0 + 0.3 + rng.uniform(-0.05, 0.05))])
    a_chains.append([(100.0, 0.0), (101.0, 1.0)])
    b_chains.append([(100.0, 1.0), (101.0, 0.0)])
    a_nodes, a_ways, a_segs = _ways_ds(a_chains, 100)
    b_nodes, b_ways, b_segs = _ways_ds(b_chains, 500)

    full = way_intersections(a_ways, a_nodes, b_ways, b_nodes,
                             cell_deg=1.0).to_pandas()
    exp = _brute_crossings(a_segs, b_segs)
    assert len(full) == len(exp) and len(exp) > 10
    assert (full["a_way"] >= 0).all()

    capped = way_intersections(a_ways, a_nodes, b_ways, b_nodes,
                               cell_deg=1.0,
                               max_cell_pairs=10).to_pandas()
    sent = capped[capped["a_way"] < 0]
    real = capped[capped["a_way"] >= 0]
    assert len(sent) >= 1                      # hot cell surfaced
    assert (sent["b_way"] == -1).all()
    assert (sent["b_seg"] > 10).all()          # dropped pair counts
    assert sent["x"].isna().all()
    # the isolated crossing survives; every surviving row is genuine
    assert ((real["a_way"] == 114) & (real["b_way"] == 514)).any()
    fullset = set(zip(full["a_way"], full["a_seg"],
                      full["b_way"], full["b_seg"]))
    assert set(zip(real["a_way"], real["a_seg"],
                   real["b_way"], real["b_seg"])) <= fullset


def test_way_intersections_empty_sides(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.overlay import way_intersections

    a_nodes, a_ways, _ = _ways_ds([[(0, 0), (1, 1)]], 100)
    eways = rd.from_arrow(pa.table({
        "id": pa.array([], pa.int64()),
        "refs": pa.array([], pa.list_(pa.int64()))}))
    enodes = rd.from_arrow(pa.table({
        "id": pa.array([], pa.int64()),
        "lon": pa.array([], pa.float64()),
        "lat": pa.array([], pa.float64())}))
    assert way_intersections(a_ways, a_nodes, eways, enodes).count() == 0
    assert way_intersections(eways, enodes, a_ways, a_nodes).count() == 0

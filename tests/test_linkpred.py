import numpy as np
import pyarrow as pa


def _rows(ds):
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return {(a, b): (cn, aa, ra, jac, ie)
            for a, b, cn, aa, ra, jac, ie in zip(
                t["a"].to_pylist(), t["b"].to_pylist(),
                t["cn"].to_pylist(), t["aa"].to_pylist(),
                t["ra"].to_pylist(), t["jaccard"].to_pylist(),
                t["is_edge"].to_pylist())}


def test_link_features_match_networkx(ray_session):
    import networkx as nx
    import ray.data as rd

    from osm_cut_ray.stages.linkpred import link_features

    rng = np.random.default_rng(515)
    n = 80
    src = rng.integers(0, n, 500).astype(np.int64)
    dst = rng.integers(0, n, 500).astype(np.int64)

    g = nx.Graph()
    for a, b in zip(src.tolist(), dst.tolist()):
        if a != b:
            g.add_edge(a, b)

    ds = rd.from_items(
        [{"src": int(a), "dst": int(b)}
         for a, b in zip(src.tolist(), dst.tolist())])
    got = _rows(link_features(ds))

    # expected pair set: every pair with >= 1 common neighbor
    nodes = sorted(g.nodes)
    expected_pairs = set()
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if set(g[a]) & set(g[b]):
                expected_pairs.add((a, b))
    assert set(got) == expected_pairs

    ebunch = sorted(expected_pairs)
    nx_aa = {(a, b): v for a, b, v in
             nx.adamic_adar_index(g, ebunch)}
    nx_ra = {(a, b): v for a, b, v in
             nx.resource_allocation_index(g, ebunch)}
    nx_jac = {(a, b): v for a, b, v in
              nx.jaccard_coefficient(g, ebunch)}
    for p in ebunch:
        cn, aa, ra, jac, ie = got[p]
        assert cn == len(set(g[p[0]]) & set(g[p[1]])), p
        assert abs(aa - nx_aa[p]) < 1e-6, p
        assert abs(ra - nx_ra[p]) < 1e-6, p
        assert abs(jac - nx_jac[p]) < 1e-9, p
        assert ie == int(g.has_edge(*p)), p


def test_link_features_triangle_vs_path(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.linkpred import link_features

    # triangle 0-1-2 plus pendant 2-3: pair (1,3) via apex 2 only
    ds = rd.from_items([{"src": a, "dst": b} for a, b in
                        [(0, 1), (1, 2), (0, 2), (2, 3)]])
    got = _rows(link_features(ds))
    assert set(got) == {(0, 1), (0, 2), (1, 2), (0, 3), (1, 3)}
    cn, aa, ra, jac, ie = got[(0, 1)]
    assert cn == 1 and ie == 1  # common neighbor 2, already an edge
    assert abs(aa - 1.0 / np.log(3)) < 1e-9  # deg(2) == 3
    cn, aa, ra, jac, ie = got[(1, 3)]
    assert cn == 1 and ie == 0
    # jaccard(1,3) = |{2}| / |{0,2} u {2}| = 1/2
    assert abs(jac - 0.5) < 1e-12


def test_link_features_apex_cap_raises(ray_session):
    import pytest
    import ray.data as rd

    from osm_cut_ray.stages.linkpred import link_features

    ds = rd.from_items([{"src": 0, "dst": i} for i in range(1, 9)])
    with pytest.raises(Exception, match="max_apex_degree"):
        link_features(ds, max_apex_degree=3)

import numpy as np
import pyarrow as pa
import pytest

SCALE = 1_000_000_000


def _brute_int_hits(edges, n_iter=30):
    """Driver replay of the documented integer algorithm (dense
    matrices, independent of the stage's partial-sum path)."""
    nodes = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n), np.int64)  # A[s, d] = edge count
    for s, d in edges:
        A[idx[s], idx[d]] += 1

    def renorm(raw):
        s = int(raw.sum())
        if s == 0:
            out = np.full(n, SCALE // n, np.int64)
            out[: SCALE % n] += 1
            return out
        d = s // SCALE + 1
        red = raw // d
        rs = int(red.sum())
        out = red * SCALE // rs
        out[: SCALE - int(out.sum())] += 1
        return out

    hub = np.full(n, SCALE // n, np.int64)
    hub[: SCALE % n] += 1
    auth = hub.copy()
    for _ in range(n_iter):
        auth = renorm(A.T @ hub)
        hub = renorm(A @ auth)
    return nodes, auth / SCALE, hub / SCALE


def _brute_float_hits(edges, n_iter=200):
    """Textbook float HITS with L1 renormalization."""
    nodes = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for s, d in edges:
        A[idx[s], idx[d]] += 1
    hub = np.full(n, 1.0 / n)
    auth = hub.copy()
    for _ in range(n_iter):
        auth = A.T @ hub
        auth = auth / auth.sum() if auth.sum() else np.full(n, 1.0 / n)
        hub = A @ auth
        hub = hub / hub.sum() if hub.sum() else np.full(n, 1.0 / n)
    return nodes, auth, hub


def _edges_ds(rd, edges, parts):
    arr = np.array(edges, np.int64)
    return rd.from_arrow(pa.table({
        "src": arr[:, 0], "dst": arr[:, 1]})).repartition(parts)


def _rand_graph(rng, n_nodes=40, n_edges=160):
    e = rng.integers(0, n_nodes * 3, (n_edges, 2))  # sparse ids
    return [(int(s), int(d)) for s, d in e if s != d]


def test_hits_matches_integer_brute_any_partitioning(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.hits import hits

    rng = np.random.default_rng(23)
    edges = _rand_graph(rng)
    ref = None
    for parts in (1, 3, 11):
        out = hits(_edges_ds(rd, edges, parts)).take_all()
        got = sorted((r["node"], r["authority"], r["hub"])
                     for r in out)
        if ref is None:
            ref = got
            nodes, auth, hub = _brute_int_hits(edges)
            assert [g[0] for g in got] == nodes
            np.testing.assert_array_equal([g[1] for g in got], auth)
            np.testing.assert_array_equal([g[2] for g in got], hub)
        else:
            assert got == ref  # bit-identical under repartitioning


def test_hits_close_to_float_textbook(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.hits import hits

    rng = np.random.default_rng(4)
    for trial in range(3):
        edges = _rand_graph(rng, n_nodes=25, n_edges=120)
        # same iteration count for both: the compare isolates the
        # integer quantization (~1e-6), not power-iteration
        # convergence rate
        out = hits(_edges_ds(rd, edges, 4), n_iter=60).take_all()
        nodes, auth, hub = _brute_float_hits(edges, n_iter=60)
        got = {r["node"]: (r["authority"], r["hub"]) for r in out}
        for i, u in enumerate(nodes):
            assert abs(got[u][0] - auth[i]) < 1e-5, (trial, u)
            assert abs(got[u][1] - hub[i]) < 1e-5, (trial, u)


def test_hits_star_graph_semantics(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.hits import hits

    # all spokes endorse the center: the center is THE authority,
    # spokes are the (equal) hubs
    edges = [(s, 100) for s in range(1, 8)]
    out = {r["node"]: r for r in
           hits(_edges_ds(rd, edges, 2)).take_all()}
    assert out[100]["authority"] > 0.999
    assert out[100]["hub"] < 1e-6
    spokes = [out[s]["hub"] for s in range(1, 8)]
    assert all(abs(h - spokes[0]) < 2e-6 for h in spokes)
    assert abs(sum(spokes) - 1.0) < 1e-6


def test_hits_empty(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.hits import hits

    ds = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                 "dst": pa.array([], pa.int64())}))
    assert hits(ds).count() == 0

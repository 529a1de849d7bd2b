import numpy as np
import pyarrow as pa


def _core_map(ds):
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return dict(zip(t["node"].to_pylist(), t["core"].to_pylist()))


def test_core_numbers_known_graph(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.kcore import core_numbers

    # K4 clique (core 3) with a pendant path hanging off (core 1)
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges += [(3, 4), (4, 5), (5, 6)]
    ds = rd.from_items([{"src": a, "dst": b} for a, b in edges])
    cores = _core_map(core_numbers(ds))
    assert cores == {0: 3, 1: 3, 2: 3, 3: 3, 4: 1, 5: 1, 6: 1}


def test_core_numbers_match_networkx(ray_session):
    import networkx as nx
    import ray.data as rd

    from osm_cut_ray.stages.kcore import core_numbers

    rng = np.random.default_rng(88)
    n = 150
    src = (rng.zipf(1.7, 1200) % n).astype(np.int64)
    dst = rng.integers(0, n, 1200).astype(np.int64)
    # self-loops and duplicates must be handled
    src = np.concatenate([src, np.arange(12)])
    dst = np.concatenate([dst, np.arange(12)])

    g = nx.Graph()
    for a, b in zip(src.tolist(), dst.tolist()):
        if a != b:
            g.add_edge(a, b)

    ds = rd.from_items(
        [{"src": int(a), "dst": int(b)}
         for a, b in zip(src.tolist(), dst.tolist())])
    cores = _core_map(core_numbers(ds))
    nx_cores = nx.core_number(g)
    assert cores == {int(k): int(v) for k, v in nx_cores.items()}
    # the planet-scale shuffle engine must agree exactly
    cores_sh = _core_map(core_numbers(ds, engine="shuffle"))
    assert cores_sh == cores
    # forcing the driver cap low must auto-select shuffle, same out
    cores_cap = _core_map(core_numbers(ds, max_driver_nodes=10))
    assert cores_cap == cores


def test_core_numbers_raises_on_round_exhaustion(ray_session):
    import pytest
    import ray.data as rd

    from osm_cut_ray.stages.kcore import core_numbers

    # a long path needs several H-index rounds; max_rounds=0 must
    # raise instead of returning the degree estimate silently
    edges = [(i, i + 1) for i in range(30)]
    ds = rd.from_items([{"src": a, "dst": b} for a, b in edges])
    with pytest.raises(RuntimeError, match="did not converge"):
        core_numbers(ds, max_rounds=0)

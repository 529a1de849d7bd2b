import numpy as np
import pyarrow as pa


def _brute_components(ways):
    """Union-find over ways sharing nodes (independent formulation)."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    by_node = {}
    for wid, refs in ways:
        parent.setdefault(wid, wid)
        for r in refs:
            by_node.setdefault(r, []).append(wid)
    for wids in by_node.values():
        for w in wids[1:]:
            ra, rb = find(wids[0]), find(w)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    return {w: find(w) for w, _ in ways}


def test_way_components_match_brute(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.network import way_components

    rng = np.random.default_rng(67)
    # three node pools -> at least three separate islands, plus
    # singleton ways with globally unique nodes
    ways = []
    wid = 100
    for pool_base in (0, 10_000, 20_000):
        for _ in range(25):
            k = int(rng.integers(2, 6))
            refs = (pool_base
                    + rng.integers(0, 60, k)).astype(np.int64).tolist()
            ways.append((wid, refs))
            wid += 1
    for i in range(5):  # singletons
        ways.append((wid, [900_000 + 10 * i, 900_001 + 10 * i]))
        wid += 1
    ds = rd.from_items(
        [{"id": w, "refs": r} for w, r in ways]).repartition(4)

    got = way_components(ds).to_pandas().sort_values("way_id")
    exp = _brute_components(ways)
    assert {int(r.way_id): int(r.component)
            for r in got.itertuples()} == exp
    # sanity: >= 3 multi-way islands and 5 self-labeled singletons
    comp_sizes = got.groupby("component").size()
    assert (comp_sizes == 1).sum() >= 5
    assert (comp_sizes > 1).sum() >= 3
    for w, r in ways[-5:]:
        assert exp[w] == w

    # distributed fixpoint fallback agrees (force it via the knob)
    got2 = way_components(ds, max_driver_edges=0).to_pandas() \
        .sort_values("way_id")
    assert got2["component"].tolist() == got["component"].tolist()


def test_way_components_empty(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.network import way_components

    empty = rd.from_arrow(pa.table({
        "id": pa.array([], pa.int64()),
        "refs": pa.array([], pa.list_(pa.int64()))}))
    assert way_components(empty).count() == 0

"""Distributed score-vector fixpoints (stages/score_flow.py): the
shuffle engines for pagerank and HITS must be BIT-FOR-BIT equal to
the broadcast engines — the integer fixed-point makes that checkable
(round-4 verdict item #1). Also pins the auto-engine fall-through
past a forced-low cap and the capped driver collection."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray


def _graph(seed: int = 7, n_edges: int = 300):
    """Messy directed graph: sparse non-dense ids, duplicate edges,
    self-loops, dst-only (dangling-source) nodes, and an out-degree-0
    sink — every branch of the share/renorm math."""
    rng = np.random.default_rng(seed)
    ids = np.sort(rng.choice(10_000_000, size=50, replace=False)) * 37
    src = ids[rng.integers(0, 40, n_edges)]          # last 10 ids can
    dst = ids[rng.integers(0, 50, n_edges)]          # be dst-only
    src = np.concatenate([src, src[:20]])            # duplicate edges
    dst = np.concatenate([dst, dst[:20]])
    src = np.concatenate([src, ids[:3]])             # self-loops
    dst = np.concatenate([dst, ids[:3]])
    return pa.table({"src": pa.array(src.astype(np.int64)),
                     "dst": pa.array(dst.astype(np.int64))})


def _sorted_df(ds) -> pd.DataFrame:
    return ds.to_pandas().sort_values("node").reset_index(drop=True)


def test_pagerank_shuffle_equals_broadcast_bitwise(ray_session):
    from osm_cut_ray.stages.route import pagerank

    tbl = _graph()
    a = _sorted_df(pagerank(ray.data.from_arrow(tbl),
                            n_iter=5, engine="broadcast"))
    b = _sorted_df(pagerank(
        ray.data.from_arrow(tbl).repartition(7),
        n_iter=5, engine="shuffle"))
    assert list(a["node"]) == list(b["node"])
    # int64 fixed point -> float division: bit-for-bit, not approx
    assert a["rank"].to_numpy().tobytes() == \
        b["rank"].to_numpy().tobytes()
    assert abs(a["rank"].sum() - 1.0) < 1e-9


def test_pagerank_auto_falls_to_shuffle_past_cap(ray_session):
    from osm_cut_ray.stages.route import pagerank

    tbl = _graph(seed=11)
    want = _sorted_df(pagerank(ray.data.from_arrow(tbl),
                               n_iter=3, engine="broadcast"))
    got = _sorted_df(pagerank(ray.data.from_arrow(tbl), n_iter=3,
                              engine="auto", max_broadcast_nodes=5))
    assert want["rank"].to_numpy().tobytes() == \
        got["rank"].to_numpy().tobytes()
    with pytest.raises(ValueError, match="max_broadcast_nodes"):
        pagerank(ray.data.from_arrow(tbl), n_iter=3,
                 engine="broadcast", max_broadcast_nodes=5)


def test_hits_shuffle_equals_broadcast_bitwise(ray_session):
    from osm_cut_ray.stages.hits import hits

    tbl = _graph(seed=3)
    a = _sorted_df(hits(ray.data.from_arrow(tbl), n_iter=3,
                        engine="broadcast"))
    b = _sorted_df(hits(ray.data.from_arrow(tbl).repartition(5),
                        n_iter=3, engine="shuffle"))
    assert list(a["node"]) == list(b["node"])
    for col in ("authority", "hub"):
        assert a[col].to_numpy().tobytes() == \
            b[col].to_numpy().tobytes()
    assert abs(a["authority"].sum() - 1.0) < 1e-9


def test_hits_auto_falls_to_shuffle_past_cap(ray_session):
    from osm_cut_ray.stages.hits import hits

    tbl = _graph(seed=5, n_edges=120)
    want = _sorted_df(hits(ray.data.from_arrow(tbl), n_iter=2,
                           engine="broadcast"))
    got = _sorted_df(hits(ray.data.from_arrow(tbl), n_iter=2,
                          engine="auto", max_broadcast_nodes=5))
    for col in ("authority", "hub"):
        assert want[col].to_numpy().tobytes() == \
            got[col].to_numpy().tobytes()
    with pytest.raises(ValueError, match="max_broadcast_nodes"):
        hits(ray.data.from_arrow(tbl), n_iter=2,
             engine="broadcast", max_broadcast_nodes=5)


def test_shuffle_engines_empty_edges(ray_session):
    from osm_cut_ray.stages.hits import hits
    from osm_cut_ray.stages.route import pagerank

    empty = pa.table({"src": pa.array([], pa.int64()),
                      "dst": pa.array([], pa.int64())})
    pr = pagerank(ray.data.from_arrow(empty), engine="shuffle",
                  n_iter=2)
    # Ray to_pandas drops columns on 0-row datasets; check the schema
    assert pr.count() == 0 and pr.schema().names == ["node", "rank"]
    h = hits(ray.data.from_arrow(empty), engine="shuffle", n_iter=2)
    assert h.count() == 0
    assert h.schema().names == ["node", "authority", "hub"]


def test_merge_partials_capped():
    from osm_cut_ray.stages.score_flow import merge_partials_capped

    parts = [(np.array([5, 1, 5]), np.array([2, 1, 3])),
             (np.array([1, 9]), np.array([4, 7])),
             (np.array([5]), np.array([10]))]
    # compact_rows=2 forces intermediate compactions
    nodes, sums = merge_partials_capped(iter(parts), cap=10,
                                        compact_rows=2)
    assert nodes.tolist() == [1, 5, 9]
    assert sums.tolist() == [5, 15, 7]
    # distinct count 3 > cap 2 -> None (abort signal), detected at an
    # INTERMEDIATE compaction, not only at the end
    assert merge_partials_capped(iter(parts), cap=2,
                                 compact_rows=2) is None
    assert merge_partials_capped(iter([]), cap=1)[0].tolist() == []

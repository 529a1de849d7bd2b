import numpy as np
import pyarrow as pa


def _brute_k_center(ids, X, k, seed_id=None):
    """Independent replay: same ((x-c)^2).sum() float64 expression,
    max distance / min id ties, seed = min id."""
    ids = np.asarray(ids, np.int64)
    X = np.asarray(X, np.float64)
    order = np.argsort(ids)
    ids, X = ids[order], X[order]
    if seed_id is None:
        seed_id = int(ids[0])
    chosen = [(0, seed_id, float("nan"))]
    min_d = np.full(len(ids), np.inf)
    c = X[np.searchsorted(ids, seed_id)]
    for rank in range(1, k):
        d = ((X - c[None, :]) ** 2).sum(axis=1)
        min_d = np.minimum(min_d, d)
        best = np.lexsort((ids, -min_d))[0]
        if min_d[best] <= 0.0:
            break
        chosen.append((rank, int(ids[best]), float(min_d[best])))
        c = X[best]
    return chosen


def _synth(seed=3, n=400, d=8):
    rng = np.random.default_rng(seed)
    X = rng.normal(0, 1, (n, d)).astype(np.float32)
    ids = rng.permutation(n * 3)[:n].astype(np.int64)
    return ids, X


def _to_ds(ids, X, parts=7):
    import ray.data as rd
    t = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([row.tolist() for row in X],
                              pa.list_(pa.float32()))})
    return rd.from_arrow(t).repartition(parts)


def _sel_rows(sel):
    t = pa.concat_tables([pa.table(b) for b in sel.iter_batches(
        batch_format="pyarrow")])
    return list(zip(t["rank"].to_pylist(), t["id"].to_pylist(),
                    t["radius"].to_pylist()))


def test_k_center_matches_brute_bitforbit(ray_session):
    from osm_cut_ray.stages.select_coreset import k_center_greedy

    ids, X = _synth()
    want = _brute_k_center(ids, X.astype(np.float64), 12)
    sel, state = k_center_greedy(_to_ds(ids, X), k=12)
    got = _sel_rows(sel)
    assert got[0][:2] == want[0][:2]
    for g, w in zip(got[1:], want[1:]):
        assert g[0] == w[0] and g[1] == w[1]
        assert g[2] == w[2]  # bit-identical radii
    # radii are non-increasing (Gonzalez invariant)
    radii = [g[2] for g in got[1:]]
    assert all(a >= b for a, b in zip(radii, radii[1:]))
    # final state covers: max min_d == last radius after last pick
    st = pa.concat_tables([pa.table(b) for b in state.iter_batches(
        batch_format="pyarrow")])
    assert st.num_rows == len(ids)


def test_k_center_partition_invariant(ray_session):
    from osm_cut_ray.stages.select_coreset import k_center_greedy

    ids, X = _synth(seed=11)
    sel1, _ = k_center_greedy(_to_ds(ids, X, parts=3), k=8)
    sel2, _ = k_center_greedy(_to_ds(ids, X, parts=23), k=8)
    r1, r2 = _sel_rows(sel1), _sel_rows(sel2)
    assert [r[:2] for r in r1] == [r[:2] for r in r2]
    assert r1[1:] == r2[1:]  # radii bit-equal (seed radius is NaN)


def test_k_center_seed_override_and_duplicates(ray_session):
    from osm_cut_ray.stages.select_coreset import k_center_greedy

    # 3 distinct points, each duplicated: selection must stop at 3
    X = np.array([[0, 0], [0, 0], [5, 0], [5, 0], [0, 7], [0, 7]],
                 np.float32)
    ids = np.arange(6, dtype=np.int64)
    sel, _ = k_center_greedy(_to_ds(ids, X, parts=2), k=6,
                             seed_id=2)
    rows = _sel_rows(sel)
    assert rows[0][1] == 2
    assert len(rows) == 3
    assert sorted(X[r[1]].tolist() for r in rows) == [
        [0.0, 0.0], [0.0, 7.0], [5.0, 0.0]]


def test_k_center_caps_and_empty(ray_session):
    import pytest
    import ray.data as rd

    from osm_cut_ray.stages.select_coreset import k_center_greedy

    ids, X = _synth(seed=5, n=10)
    with pytest.raises(RuntimeError, match="max_k"):
        k_center_greedy(_to_ds(ids, X), k=100, max_k=50)
    # k > n stops at n
    sel, _ = k_center_greedy(_to_ds(ids, X), k=50)
    assert 1 <= sel.count() <= 10
    # empty input
    t = pa.table({"vec_id": pa.array([], pa.int64()),
                  "embedding": pa.array([], pa.list_(pa.float32()))})
    sel, state = k_center_greedy(rd.from_arrow(t), k=3)
    assert sel.count() == 0 and state.count() == 0


def test_k_center_on_real_embeddings_table(ray_session):
    import ray.data as rd

    from osm_cut_ray.sources.tables import strip_schema_metadata
    from osm_cut_ray.stages.select_coreset import k_center_greedy

    ds = strip_schema_metadata(rd.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["vec_id", "embedding"]))
    sel, _ = k_center_greedy(ds, k=10)
    rows = _sel_rows(sel)
    assert len(rows) == 10
    assert len({r[1] for r in rows}) == 10
    radii = [r[2] for r in rows[1:]]
    assert all(a >= b for a, b in zip(radii, radii[1:]))

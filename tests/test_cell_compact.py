"""S2 compact/uncompact — pinned against a recursive driver brute,
with round-trip identity and cross-bucket stitch coverage."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from osm_cut_ray.geometry.cells import s2_cell_id, s2_level, s2_parent
from osm_cut_ray.stages.cell_compact import (_compact_pool, s2_compact,
                                             s2_uncompact)


def _brute_compact(cells):
    cells = set(int(c) for c in cells)
    changed = True
    while changed:
        changed = False
        by_parent = {}
        for c in cells:
            lvl = int(s2_level(np.array([c]))[0])
            if lvl == 0:
                continue
            p = int(s2_parent(np.array([c]), lvl - 1)[0])
            by_parent.setdefault(p, set()).add(c)
        for p, kids in by_parent.items():
            if len(kids) == 4:
                cells -= kids
                cells.add(p)
                changed = True
                break
    return cells


def _ds(cells, parts=4):
    return ray.data.from_arrow(pa.table(
        {"cell": pa.array(np.asarray(cells, np.int64))})) \
        .repartition(parts)


def _cells_of(res):
    out = []
    for t in res.iter_batches(batch_size=None, batch_format="pyarrow"):
        if t.num_rows:
            out.append(t["cell"].to_numpy(zero_copy_only=False))
    return set(np.concatenate(out).astype(np.int64).tolist()) \
        if out else set()


def _point_cells(n, level, seed):
    rng = np.random.RandomState(seed)
    lon = rng.uniform(-30, 30, n)
    lat = rng.uniform(-20, 20, n)
    return np.unique(s2_cell_id(lon, lat, level))


def _dense_cells(seed):
    rng = np.random.RandomState(seed)
    lon = rng.uniform(-4, 4, 4000)
    lat = rng.uniform(-4, 4, 4000)
    return np.unique(s2_cell_id(lon, lat, 7))


def test_matches_brute(ray_session):
    cells = _dense_cells(1)  # dense enough to merge some
    got = _cells_of(s2_compact(_ds(cells)))
    assert got == _brute_compact(cells)
    assert len(got) < len(cells)  # something actually merged


def test_roundtrip_identity(ray_session):
    cells = _point_cells(500, 9, 2)
    compacted = s2_compact(_ds(cells))
    back = _cells_of(s2_uncompact(compacted, 9))
    assert back == set(cells.tolist())


def test_full_subtree_collapses_across_buckets(ray_session):
    # one level-3 cell expanded to level 6 (64 cells) must compact
    # back through the bucket_level=5 boundary via the driver stitch
    root = s2_cell_id(np.array([5.0]), np.array([45.0]), 3)
    kids = _cells_of(s2_uncompact(_ds(root, parts=1), 6))
    assert len(kids) == 64
    got = _cells_of(s2_compact(_ds(sorted(kids), parts=6)))
    assert got == {int(root[0])}


def test_mixed_levels_and_pool_passthrough(ray_session):
    coarse = s2_cell_id(np.array([100.0]), np.array([-30.0]), 4)
    fine = _point_cells(100, 10, 3)
    fine = fine[s2_parent(fine, 4) != int(coarse[0])]
    all_in = np.concatenate([coarse, fine])
    got = _cells_of(s2_compact(_ds(all_in)))
    assert got == _brute_compact(all_in)
    assert int(coarse[0]) in got


def test_invalid_sets_raise(ray_session):
    c10 = _point_cells(50, 10, 4)
    dup = np.concatenate([c10, c10[:1]])
    with pytest.raises(Exception, match="duplicate"):
        s2_compact(_ds(dup)).materialize()
    child = _cells_of(s2_uncompact(_ds(c10[:1], parts=1), 11))
    overlap = np.concatenate([c10[:1], np.array(sorted(child),
                                                np.int64)[:1]])
    with pytest.raises(Exception, match="descendant"):
        s2_compact(_ds(overlap)).materialize()
    # cross-pool overlap: a level-4 cell plus its level-7 descendant
    root = s2_cell_id(np.array([5.0]), np.array([45.0]), 4)
    deep = _cells_of(s2_uncompact(_ds(root, parts=1), 7))
    pair = np.concatenate([root, np.array(sorted(deep),
                                          np.int64)[:1]])
    with pytest.raises(Exception, match="descendant"):
        s2_compact(_ds(pair)).materialize()


def test_uncompact_guards(ray_session):
    c = _point_cells(5, 10, 5)
    with pytest.raises(Exception, match="deeper"):
        s2_uncompact(_ds(c), 8).materialize()
    c0 = _point_cells(2, 1, 6)
    with pytest.raises(Exception, match="max_fanout"):
        s2_uncompact(_ds(c0), 15).materialize()


def test_compact_pool_floor():
    # the in-memory kernel respects the floor: nothing merges above it
    root = s2_cell_id(np.array([5.0]), np.array([45.0]), 5)
    u = root.view(np.uint64)
    lsb6 = np.uint64(1) << np.uint64(2 * (30 - 6))
    lsb5 = np.uint64(1) << np.uint64(2 * (30 - 5))
    kids = ((u - lsb5 + lsb6)
            + np.arange(4, dtype=np.uint64) * np.uint64(2) * lsb6)
    out = _compact_pool(kids.view(np.int64), floor_level=5)
    assert set(out.tolist()) == {int(root[0])}
    out6 = _compact_pool(kids.view(np.int64), floor_level=6)
    assert set(out6.tolist()) == set(kids.view(np.int64).tolist())


def test_cover_set_ops(ray_session):
    from osm_cut_ray.stages.cell_compact import cover_set_op

    a_cells = _dense_cells(10)
    b_cells = _dense_cells(11)
    a_set = set(a_cells.tolist())
    b_set = set(b_cells.tolist())
    for op, exp in (("union", a_set | b_set),
                    ("intersect", a_set & b_set),
                    ("difference", a_set - b_set)):
        res = cover_set_op(_ds(sorted(a_set)), _ds(sorted(b_set)),
                           op, level=7, compact=False)
        assert _cells_of(res) == exp, op
        # compacted result round-trips to the same flat set
        comp = cover_set_op(_ds(sorted(a_set)), _ds(sorted(b_set)),
                            op, level=7)
        back = _cells_of(s2_uncompact(comp, 7))
        assert back == exp, op


def test_cover_set_ops_multilevel_and_validation(ray_session):
    from osm_cut_ray.stages.cell_compact import cover_set_op

    # a level-4 super-cell minus one of its level-6 children
    root = s2_cell_id(np.array([5.0]), np.array([45.0]), 4)
    child = sorted(_cells_of(s2_uncompact(_ds(root, parts=1), 6)))
    diff = cover_set_op(_ds(root, parts=1), _ds(child[:1], parts=1),
                        "difference", level=6)
    got = _cells_of(s2_uncompact(diff, 6))
    assert got == set(child[1:])
    with pytest.raises(ValueError, match="unknown op"):
        cover_set_op(_ds(root), _ds(root), "xor", level=6)

"""Cell-set dissolve pinned against set-logic brute force plus
structural invariants (edge symmetry, closed loops, holes)."""

import numpy as np
import pyarrow as pa
import pytest

from osm_cut_ray.geometry.cells import (hex_cell, hex_disk,
                                        hex_neighbors)
from osm_cut_ray.stages.dissolve import dissolve_cells, edge_segment


def _ds(cells, parts=3):
    import ray
    return ray.data.from_arrow(pa.table({
        "cell": pa.array(np.asarray(cells, np.int64))})) \
        .repartition(parts)


def _brute_boundary(kept):
    ks = set(int(c) for c in kept)
    ka = np.array(sorted(ks), np.int64)
    nbr = hex_neighbors(ka)
    out = set()
    for i, c in enumerate(ka.tolist()):
        for n in nbr[i].tolist():
            if n not in ks:
                out.add((c, n))
    return out


def test_edge_segment_symmetry_and_geometry():
    cells = hex_cell(np.array([1.1, -3.0, 0.0]),
                     np.array([2.0, 1.5, -1.0]), 6)
    nbrs = hex_neighbors(cells)
    for i in range(len(cells)):
        for d in range(6):
            a = edge_segment(cells[i:i + 1], np.array([d]))
            # the same edge seen from the neighbor (opposite dir) is
            # the same point set with endpoints swapped
            bmask = hex_neighbors(nbrs[i, d:d + 1])[0] == cells[i]
            dd = int(np.flatnonzero(bmask)[0])
            assert dd == (d + 3) % 6
            bseg = edge_segment(nbrs[i, d:d + 1], np.array([dd]))
            pa_ = {(round(a[0][0], 9), round(a[1][0], 9)),
                   (round(a[2][0], 9), round(a[3][0], 9))}
            pb_ = {(round(bseg[0][0], 9), round(bseg[1][0], 9)),
                   (round(bseg[2][0], 9), round(bseg[3][0], 9))}
            assert pa_ == pb_, (i, d)


def test_dissolve_matches_brute_and_loops(ray_session):
    rng = np.random.default_rng(31)
    # away from lon = 0: corner x is reported in [0, 360), so vertex
    # identity by rounded key only holds off the modular seam
    pts = rng.uniform([30, -4], [38, 4], (600, 2))
    kept = np.unique(hex_cell(pts[:, 0], pts[:, 1], 5))
    got = dissolve_cells(_ds(kept)).to_pandas()
    want = _brute_boundary(kept)
    assert set(zip(got.cell, got.nbr)) == want
    assert len(got) == len(want)          # one row per edge
    # boundary forms closed loops: every vertex has even degree
    verts = {}
    for r in got.itertuples():
        for v in ((round(r.x1, 9), round(r.y1, 9)),
                  (round(r.x2, 9), round(r.y2, 9))):
            verts[v] = verts.get(v, 0) + 1
    assert all(c % 2 == 0 for c in verts.values())
    # partitioning invariance (incl. duplicate input cells)
    dup = np.concatenate([kept, kept[: len(kept) // 2]])
    got2 = dissolve_cells(_ds(dup, 11)).to_pandas()
    assert set(zip(got2.cell, got2.nbr)) == want


def test_dissolve_disk_and_hole(ray_session):
    center = int(hex_cell(np.array([0.5]), np.array([0.5]), 6)[0])
    disk = hex_disk(center, 2)           # filled 2-disk: 19 cells
    got = dissolve_cells(_ds(disk)).to_pandas()
    want = _brute_boundary(disk)
    assert set(zip(got.cell, got.nbr)) == want
    # all boundary owners are ring-2 cells
    ring2 = set(disk.tolist()) - set(hex_disk(center, 1).tolist())
    assert set(got.cell) == ring2
    # punch out the center: 6 new inner edges appear, owners = ring-1
    holed = np.array(sorted(set(disk.tolist()) - {center}), np.int64)
    gh = dissolve_cells(_ds(holed)).to_pandas()
    inner = gh[gh.nbr == center]
    assert len(inner) == 6
    assert set(inner.cell) == set(hex_disk(center, 1).tolist()) - {center}
    assert set(zip(gh.cell, gh.nbr)) == _brute_boundary(holed)


def test_dissolve_antimeridian_segments(ray_session):
    # cells straddling the date line: segments stay connected
    lon = np.array([179.9, -179.9, 179.95, -179.95])
    lat = np.array([0.0, 0.0, 0.1, 0.1])
    kept = np.unique(hex_cell(lon, lat, 4))
    got = dissolve_cells(_ds(kept, 2)).to_pandas()
    assert set(zip(got.cell, got.nbr)) == _brute_boundary(kept)
    assert (np.abs(got.x1 - got.x2) < 180.0).all()


def test_dissolve_empty(ray_session):
    import ray
    empty = ray.data.from_arrow(pa.table({
        "cell": pa.array([], pa.int64())}))
    out = dissolve_cells(empty).to_pandas()
    # zero-row Ray blocks drop their schema (documented repo-wide);
    # the contract here is just "no rows, no crash"
    assert len(out) == 0

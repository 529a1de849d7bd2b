import numpy as np
import pyarrow as pa
import pytest


def _ds(x, y, parts=7):
    import ray.data as rd
    t = pa.table({"x": pa.array(np.asarray(x, np.int64)),
                  "y": pa.array(np.asarray(y, np.int64))})
    return rd.from_arrow(t).repartition(parts)


def _collect(ds):
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.to_pandas()


def _blob_raster(seed=3, n_blobs=25, span=600):
    """Disjoint-ish random blobs + snakes crossing tile borders."""
    rng = np.random.default_rng(seed)
    xs, ys = [], []
    for _ in range(n_blobs):
        cx, cy = rng.integers(-span, span, 2)
        w, h = rng.integers(2, 14, 2)
        gx, gy = np.meshgrid(np.arange(cx, cx + w),
                             np.arange(cy, cy + h))
        xs.append(gx.ravel())
        ys.append(gy.ravel())
    # one long snake guaranteed to span many 16-cell tiles
    sx = np.arange(-span, span)
    xs.append(sx)
    ys.append((np.abs(sx) % 37).astype(np.int64) + 2 * span)
    return np.concatenate(xs), np.concatenate(ys)


def test_raster_cc_matches_brute_bfs(ray_session):
    from osm_cut_ray.stages.raster_cc import (pack_xy,
                                              raster_components,
                                              raster_components_brute)

    x, y = _blob_raster()
    exp = raster_components_brute(x, y)

    for tile_bits, parts in ((4, 3), (8, 11)):
        out = _collect(raster_components(
            _ds(x, y, parts), tile_bits=tile_bits))
        got = dict(zip(pack_xy(out["x"].to_numpy(),
                               out["y"].to_numpy()).tolist(),
                       out["label"].tolist()))
        assert got == exp


def test_raster_cc_labels_are_min_cells_and_dedup(ray_session):
    from osm_cut_ray.stages.raster_cc import (raster_components,
                                              unpack_xy)

    # two components + duplicated input rows
    x = np.array([0, 1, 2, 2, 10, 10, 11, 0])
    y = np.array([0, 0, 0, 1, 5, 6, 6, 0])
    out = _collect(raster_components(_ds(x, y, 2), tile_bits=2))
    assert len(out) == 7                     # dup (0,0) removed
    labs = sorted(out["label"].unique().tolist())
    lx, ly = unpack_xy(np.array(labs))
    # deterministic min-cell labels: (0,0) and (10,5)
    assert list(zip(lx.tolist(), ly.tolist())) == [(0, 0), (10, 5)]
    a = out.set_index(["x", "y"])["label"]
    assert a[(2, 1)] == a[(0, 0)]
    assert a[(11, 6)] == a[(10, 5)]
    assert a[(10, 5)] != a[(0, 0)]


def test_raster_cc_negative_coords_and_caps(ray_session):
    from osm_cut_ray.stages.raster_cc import (raster_components,
                                              raster_components_brute,
                                              pack_xy)

    # component straddling the origin and tile boundaries
    x = np.arange(-20, 20)
    y = np.zeros(40, np.int64)
    out = _collect(raster_components(_ds(x, y, 3), tile_bits=3))
    assert out["label"].nunique() == 1
    exp = raster_components_brute(x, y)
    got = dict(zip(pack_xy(out["x"].to_numpy(),
                           out["y"].to_numpy()).tolist(),
                   out["label"].tolist()))
    assert got == exp

    with pytest.raises(ValueError, match="max_boundary_cells"):
        raster_components(_ds(x, y, 3), tile_bits=2,
                          max_boundary_cells=3).materialize()


def test_raster_cc_empty(ray_session):
    from osm_cut_ray.stages.raster_cc import raster_components

    out = raster_components(_ds(np.array([]), np.array([]), 1))
    assert out.count() == 0
    assert set(out.schema().names) == {"x", "y", "label"}

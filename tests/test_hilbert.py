import numpy as np
import pyarrow as pa


def test_order1_published_table():
    from osm_cut_ray.geometry.hilbert import _d2xy, _xy2d

    # the canonical order-1 "U": d = 0..3 -> (0,0),(0,1),(1,1),(1,0)
    xs, ys = _d2xy(1, np.arange(4))
    assert xs.tolist() == [0, 0, 1, 1]
    assert ys.tolist() == [0, 1, 1, 0]
    d = _xy2d(1, np.array([0, 0, 1, 1]), np.array([0, 1, 1, 0]))
    assert d.tolist() == [0, 1, 2, 3]


def test_roundtrip_bijection_and_adjacency():
    from osm_cut_ray.geometry.hilbert import _d2xy, _xy2d

    for order in (2, 3, 5, 7):
        n = 1 << order
        d = np.arange(n * n, dtype=np.int64)
        x, y = _d2xy(order, d)
        # bijection onto the grid
        assert len(np.unique(x * n + y)) == n * n
        assert x.min() == 0 and x.max() == n - 1
        assert y.min() == 0 and y.max() == n - 1
        # exact inverse
        np.testing.assert_array_equal(_xy2d(order, x, y), d)
        # THE Hilbert property: consecutive distances are
        # grid-adjacent (no Z-order seam jumps)
        step = np.abs(np.diff(x)) + np.abs(np.diff(y))
        assert (step == 1).all()
    # high order stays in range and roundtrips on random points
    rng = np.random.default_rng(9)
    gx = rng.integers(0, 1 << 31, 1000)
    gy = rng.integers(0, 1 << 31, 1000)
    d = _xy2d(31, gx, gy)
    assert (d >= 0).all()
    rx, ry = _d2xy(31, d)
    np.testing.assert_array_equal(rx, gx)
    np.testing.assert_array_equal(ry, gy)


def test_hilbert_keys_clamp_and_quantize():
    from osm_cut_ray.geometry.hilbert import _xy2d, hilbert_keys

    lon = np.array([-180.0, 0.0, 179.999, 200.0, -300.0])
    lat = np.array([-90.0, 0.0, 89.999, 95.0, -95.0])
    k = hilbert_keys(lon, lat, order=10)
    n = 1 << 10
    # outside points clamp to edge cells, all keys valid
    assert ((k >= 0) & (k < n * n)).all()
    # the center point lands in the center cell
    exp = _xy2d(10, np.array([n // 2]), np.array([n // 2]))
    assert k[1] == exp[0]


def _block_bbox_area_sum(ds, k):
    """Sum of per-chunk bbox areas after splitting into k contiguous
    chunks — the locality metric (lower = more prunable)."""
    t = pa.concat_tables(list(ds.iter_batches(batch_size=None,
                                              batch_format="pyarrow")))
    lon = t["lon"].to_numpy()
    lat = t["lat"].to_numpy()
    total = 0.0
    for c in np.array_split(np.arange(len(lon)), k):
        total += (lon[c].max() - lon[c].min()) * \
            (lat[c].max() - lat[c].min())
    return total


def test_hilbert_sort_improves_block_locality(ray_session):
    import ray.data as rd

    from osm_cut_ray.geometry.hilbert import hilbert_sort

    rng = np.random.default_rng(31)
    n = 40_000
    t = pa.table({"pid": pa.array(np.arange(n)),
                  "lon": pa.array(rng.uniform(-20, 40, n)),
                  "lat": pa.array(rng.uniform(30, 60, n))})
    ds = rd.from_arrow(t).repartition(8)
    out = hilbert_sort(ds).materialize()
    # schema preserved, key dropped, same row multiset
    st = pa.concat_tables(list(out.iter_batches(
        batch_size=None, batch_format="pyarrow")))
    assert st.schema.names == ["pid", "lon", "lat"]
    assert sorted(st["pid"].to_pylist()) == list(range(n))
    # locality: 32 contiguous chunks of the sorted stream cover ~1/32
    # of the area each; the random order covers ~all of it each
    before = _block_bbox_area_sum(ds, 32)
    after = _block_bbox_area_sum(out, 32)
    assert after < before / 8, (before, after)
    # keep_key + explicit bbox path
    out2 = hilbert_sort(ds, bbox=(-20, 30, 40.001, 60.001),
                        keep_key=True).materialize()
    kt = pa.concat_tables(list(out2.iter_batches(
        batch_size=None, batch_format="pyarrow")))
    assert "hilbert_key" in kt.schema.names
    keys = np.asarray(kt["hilbert_key"].to_pylist())
    assert (np.diff(keys) >= 0).all()

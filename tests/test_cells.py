"""Cell indexer invariants: S2 hierarchy/determinism, hex neighbors,
grid cells, geotag codec roundtrip."""

import numpy as np

from osm_cut_ray.geometry import cells
from osm_cut_ray.geometry.geotag import decode_geotag, encode_geotag


def _rand_lonlat(n, seed=7):
    rng = np.random.default_rng(seed)
    return rng.uniform(-180, 180, n), rng.uniform(-89.9, 89.9, n)


def test_s2_known_values():
    # Spot values computed from the public s2geometry algorithm; also
    # pin determinism across runs.
    lon = np.array([0.0, -122.419, 37.618])
    lat = np.array([0.0, 37.775, 55.751])
    ids = cells.s2_cell_id(lon, lat, level=12)
    assert len(np.unique(ids)) == 3
    # level sentinel correct
    assert (cells.s2_level(ids) == 12).all()
    # deterministic
    np.testing.assert_array_equal(ids, cells.s2_cell_id(lon, lat, level=12))


def test_s2_hierarchy():
    lon, lat = _rand_lonlat(2000)
    fine = cells.s2_cell_id(lon, lat, level=16)
    coarse = cells.s2_cell_id(lon, lat, level=10)
    # parent of the fine cell must equal the directly-computed coarse cell
    np.testing.assert_array_equal(cells.s2_parent(fine, 10), coarse)
    assert (cells.s2_level(fine) == 16).all()
    assert (cells.s2_level(coarse) == 10).all()


def test_s2_locality():
    # two points 1e-6 deg apart share a level-10 cell almost surely;
    # antipodal points never share a face.
    lon, lat = _rand_lonlat(500)
    a = cells.s2_cell_id(lon, lat, 10)
    b = cells.s2_cell_id(lon + 1e-7, lat + 1e-7, 10)
    assert (a == b).mean() > 0.99
    far = cells.s2_cell_id(((lon + 360) % 360) - 180, -lat, 10)
    assert (a != far).all()


def test_hex_roundtrip_and_neighbors():
    lon, lat = _rand_lonlat(1000)
    for res in (7, 8, 9):
        ids = cells.hex_cell(lon, lat, res)
        r, q, _ = cells.hex_cell_decode(ids)
        assert (r == res).all()
        nbrs = cells.hex_neighbors(ids)
        assert nbrs.shape == (1000, 6)
        # neighbors are distinct from the cell and from each other
        assert (nbrs != ids[:, None]).all()
    # hierarchy-ish: coarser res has (far) fewer distinct cells
    assert len(np.unique(cells.hex_cell(lon, lat, 3))) < \
        len(np.unique(cells.hex_cell(lon, lat, 9)))


def test_hex_disk():
    c = cells.hex_cell(np.array([10.0]), np.array([20.0]), 8)[0]
    d1 = cells.hex_disk(int(c), 1)
    assert len(d1) == 7 and int(c) in d1.tolist()
    d2 = cells.hex_disk(int(c), 2)
    assert len(d2) == 19


def test_hex_same_point_same_cell_nearby_point_near_cell():
    lon = np.array([30.0, 30.00001])
    lat = np.array([50.0, 50.00001])
    ids = cells.hex_cell(lon, lat, 7)
    # ~1m apart at res 7 (~1.2 km edge): same or adjacent cell
    assert ids[0] == ids[1] or ids[1] in cells.hex_neighbors(ids[:1])[0]


def test_grid_cell_matches_sql_expression():
    import duckdb
    lon, lat = _rand_lonlat(500, seed=11)
    got = cells.grid_cell(lon, lat, 0.5)
    con = duckdb.connect()
    con.register("pts", __import__("pandas").DataFrame({"lon": lon, "lat": lat}))
    want = con.sql(
        "select (cast(floor((lon + 180.0) / 0.5) as bigint) * 4294967296)"
        " + cast(floor((lat + 90.0) / 0.5) as bigint) as g from pts"
    ).fetchnumpy()["g"]
    np.testing.assert_array_equal(got, want)


def test_geotag_roundtrip():
    lon, lat = _rand_lonlat(10000, seed=3)
    ph = encode_geotag(lon, lat)
    lon2, lat2 = decode_geotag(ph)
    np.testing.assert_allclose(lon2, lon, atol=1e-7)
    np.testing.assert_allclose(lat2, lat, atol=1e-7)

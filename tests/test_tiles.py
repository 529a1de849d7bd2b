import numpy as np
import pyarrow as pa


def _brute_tiles(lons, lats, zoom, tile_px, log_scale=True):
    tiles = {}
    n = (1 << zoom) * tile_px
    for lon, lat in zip(lons, lats):
        u = min(max((lon + 180.0) / 360.0, 0.0), np.nextafter(1.0, 0.0))
        v = min(max((90.0 - lat) / 180.0, 0.0), np.nextafter(1.0, 0.0))
        gx = min(int(u * n), n - 1)
        gy = min(int(v * n), n - 1)
        key = (gx // tile_px, gy // tile_px)
        grid = tiles.setdefault(key, np.zeros(
            (tile_px, tile_px), np.int64))
        grid[gy % tile_px, gx % tile_px] += 1
    out = {}
    for key, grid in tiles.items():
        cmax = grid.max()
        img = np.zeros_like(grid, np.uint8)
        nz = grid > 0
        # NOTE: divide-then-scale, the stage's pinned float order
        # (scale-then-divide differs by 1 ulp at floor boundaries)
        if log_scale:
            img[nz] = 1 + np.floor(
                254.0 * (np.log1p(grid[nz]) / np.log1p(cmax))
            ).astype(np.uint8)
        else:
            img[nz] = 1 + np.floor(
                254.0 * (grid[nz] / cmax)).astype(np.uint8)
        out[key] = (int(grid.sum()), img)
    return out


def test_density_tiles_match_brute(ray_session):
    import ray.data as rd

    from osm_cut_ray.sources.images import decode_image
    from osm_cut_ray.stages.tiles import render_density_tiles

    rng = np.random.default_rng(47)
    # clustered points + exact boundary probes
    lons = np.concatenate([rng.normal(12.0, 3.0, 4000),
                           rng.uniform(-180, 180, 800),
                           [-180.0, 180.0, 0.0]])
    lats = np.concatenate([rng.normal(40.0, 2.0, 4000),
                           rng.uniform(-90, 90, 800),
                           [90.0, -90.0, 0.0]])
    ds = rd.from_arrow(pa.table({"lon": lons, "lat": lats})) \
        .repartition(5)

    zoom, px = 3, 64
    got = render_density_tiles(ds, zoom=zoom, tile_px=px).to_pandas()
    exp = _brute_tiles(lons, lats, zoom, px)
    assert {(int(r.tx), int(r.ty)) for r in got.itertuples()} \
        == set(exp)
    assert int(got["n_pts"].sum()) == len(lons)
    for r in got.itertuples():
        n, img = exp[(int(r.tx), int(r.ty))]
        assert int(r.n_pts) == n
        dec, fmt = decode_image(r.bytes)
        assert fmt == "fpng" and dec.shape == (px, px)
        assert (dec == img).all()
        assert (r.w, r.h, int(r.tz)) == (px, px, zoom)
    # the hottest pixel of the densest tile is fully saturated
    dens = got.loc[got["n_pts"].idxmax()]
    assert decode_image(dens.bytes)[0].max() == 255


def test_smooth_tiles_matches_global_blur(ray_session):
    import ray.data as rd

    from osm_cut_ray.sources.images import decode_image
    from osm_cut_ray.stages.tiles import render_density_tiles, smooth_tiles

    rng = np.random.default_rng(59)
    # points concentrated near tile borders so the halo exchange is
    # load-bearing, spanning a 2x2+ tile neighborhood at zoom 2
    lons = np.concatenate([rng.normal(0.0, 8.0, 3000),
                           rng.uniform(-30, 30, 500)])
    lats = np.concatenate([rng.normal(0.0, 5.0, 3000),
                           rng.uniform(-20, 20, 500)])
    ds = rd.from_arrow(pa.table({"lon": lons, "lat": lats}))
    zoom, px, r = 2, 32, 3
    tiles = render_density_tiles(ds, zoom=zoom, tile_px=px).materialize()
    sm = smooth_tiles(tiles, radius=r).to_pandas()

    # brute: stitch the global raster (absent tiles = truly zero:
    # they hold no points), blur with the same int box + floor
    n = (1 << zoom)
    world = np.zeros((n * px, n * px), np.int64)
    in_tiles = {}
    for row in tiles.to_pandas().itertuples():
        img = decode_image(row.bytes)[0]
        world[row.ty * px:(row.ty + 1) * px,
              row.tx * px:(row.tx + 1) * px] = img
        in_tiles[(int(row.tx), int(row.ty))] = True
    pad = np.zeros((n * px + 2 * r, n * px + 2 * r), np.int64)
    pad[r:-r, r:-r] = world
    ii = pad.cumsum(0).cumsum(1)
    ii = np.pad(ii, ((1, 0), (1, 0)))
    k = 2 * r + 1
    m = n * px
    sums = (ii[k:k + m, k:k + m] - ii[0:m, k:k + m]
            - ii[k:k + m, 0:m] + ii[0:m, 0:m])
    blurred = (sums // (k * k)).astype(np.uint8)

    assert {(int(t.tx), int(t.ty)) for t in sm.itertuples()} \
        == set(in_tiles)
    for row in sm.itertuples():
        got = decode_image(row.bytes)[0]
        exp = blurred[row.ty * px:(row.ty + 1) * px,
                      row.tx * px:(row.tx + 1) * px]
        assert (got == exp).all(), (row.tx, row.ty)


def test_tile_pyramid_level(ray_session):
    import ray.data as rd

    from osm_cut_ray.sources.images import decode_image
    from osm_cut_ray.stages.tiles import (render_density_tiles,
                                          tile_pyramid_level)

    rng = np.random.default_rng(61)
    lons = rng.uniform(-90, 90, 3000)
    lats = rng.uniform(-45, 45, 3000)
    ds = rd.from_arrow(pa.table({"lon": lons, "lat": lats}))
    zoom, px = 3, 32
    tiles = render_density_tiles(ds, zoom=zoom, tile_px=px).materialize()
    up = tile_pyramid_level(tiles).to_pandas()

    child = {(int(r.tx), int(r.ty)): decode_image(r.bytes)[0]
             for r in tiles.to_pandas().itertuples()}
    exp_parents = {(x // 2, y // 2) for x, y in child}
    assert {(int(r.tx), int(r.ty)) for r in up.itertuples()} \
        == exp_parents
    assert (up["tz"] == zoom - 1).all()
    for r in up.itertuples():
        big = np.zeros((2 * px, 2 * px), np.int64)
        for cx in (0, 1):
            for cy in (0, 1):
                img = child.get((2 * int(r.tx) + cx, 2 * int(r.ty) + cy))
                if img is not None:
                    big[cy * px:(cy + 1) * px,
                        cx * px:(cx + 1) * px] = img
        exp = ((big[0::2, 0::2] + big[1::2, 0::2]
                + big[0::2, 1::2] + big[1::2, 1::2]) // 4) \
            .astype(np.uint8)
        got = decode_image(r.bytes)[0]
        assert got.shape == (px, px)
        assert (got == exp).all()


def test_write_tile_pyramid_resumable(ray_session, tmp_path):
    import ray.data as rd

    from osm_cut_ray.pipelines.tile_pyramid import write_tile_pyramid
    from osm_cut_ray.stages.tiles import render_density_tiles

    rng = np.random.default_rng(97)
    lons = rng.uniform(-60, 60, 4000)
    lats = rng.uniform(-30, 30, 4000)
    ds = rd.from_arrow(pa.table({"lon": lons, "lat": lats}))
    out = str(tmp_path / "pyr")

    rep = write_tile_pyramid(ds, out, zmax=3, zmin=1, tile_px=16)
    assert rep["written"] == [3, 2, 1] and rep["skipped"] == []
    # level contents equal a direct render / rollup
    direct = render_density_tiles(ds, zoom=3, tile_px=16).to_pandas()
    z3 = rd.read_parquet(out + "/z=3").to_pandas()
    assert len(z3) == len(direct) == rep["n_tiles"][3]
    key = lambda df: sorted(  # noqa: E731
        (int(r.tx), int(r.ty), bytes(r.bytes))
        for r in df.itertuples())
    assert key(z3) == key(direct)

    # full re-run: everything skips
    rep2 = write_tile_pyramid(ds, out, zmax=3, zmin=1, tile_px=16)
    assert rep2["written"] == [] and rep2["skipped"] == [3, 2, 1]
    assert rep2["n_tiles"] == rep["n_tiles"]

    # crash simulation: drop level 2's manifest -> only 2 and below
    # rebuild, and level 2 rebuilds FROM the on-disk level 3
    import os
    os.remove(out + "/_manifests/z2.json")
    rep3 = write_tile_pyramid(ds, out, zmax=3, zmin=1, tile_px=16)
    assert rep3["skipped"] == [3] and rep3["written"] == [2, 1]
    z1a = rd.read_parquet(out + "/z=1").to_pandas()
    # changed params invalidate every level
    rep4 = write_tile_pyramid(ds, out, zmax=3, zmin=1, tile_px=16,
                              corpus_tag="v2")
    assert rep4["written"] == [3, 2, 1]
    z1b = rd.read_parquet(out + "/z=1").to_pandas()
    assert key(z1a) == key(z1b)  # same corpus -> identical bytes


def test_density_tiles_linear_and_single(ray_session):
    import ray.data as rd

    from osm_cut_ray.sources.images import decode_image
    from osm_cut_ray.stages.tiles import render_density_tiles

    one = rd.from_arrow(pa.table({"lon": pa.array([10.0]),
                                  "lat": pa.array([20.0])}))
    got = render_density_tiles(one, zoom=0, tile_px=16,
                               log_scale=False).to_pandas()
    assert len(got) == 1 and int(got["n_pts"][0]) == 1
    dec = decode_image(got["bytes"][0])[0]
    assert dec.sum() == 255 and (dec > 0).sum() == 1  # single max pixel

    empty = rd.from_arrow(pa.table({"lon": pa.array([], pa.float64()),
                                    "lat": pa.array([], pa.float64())}))
    assert render_density_tiles(empty, zoom=2).count() == 0

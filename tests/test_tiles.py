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

import numpy as np
import pyarrow as pa
import pytest


def _collect(ds):
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.to_pandas().sort_values("id").reset_index(drop=True)


def _points(seed=7, n=4000):
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-12, 12, n)
    lat = rng.uniform(-8, 8, n)
    ids = np.arange(n, dtype=np.int64)
    return ids, lon, lat


def _ds(ids, lon, lat, parts):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "pid": pa.array(ids), "lon": pa.array(lon),
        "lat": pa.array(lat)})).repartition(parts)


def test_spatial_split_matches_brute(ray_session):
    from osm_cut_ray.stages.geo_split import (spatial_split,
                                              spatial_split_brute)

    ids, lon, lat = _points()
    exp = spatial_split_brute(ids, lon, lat, cell_deg=1.0,
                              n_folds=4, buffer=0.35, seed=5)
    for parts in (3, 11):
        got = _collect(spatial_split(
            _ds(ids, lon, lat, parts), id_col="pid", lon_col="lon",
            lat_col="lat", cell_deg=1.0, n_folds=4, buffer=0.35,
            seed=5))
        assert np.array_equal(got["fold"].to_numpy(), exp["fold"])
        assert np.array_equal(got["excluded"].to_numpy(),
                              exp["excluded"])
        assert np.array_equal(got["cx"].to_numpy(), exp["cx"])
    # all folds populated, some exclusions fired
    assert len(np.unique(exp["fold"])) == 4
    assert 0 < exp["excluded"].sum() < len(ids)


def test_spatial_split_leakage_guarantee(ray_session):
    """No kept (non-excluded) point may lie within buffer of ANY
    point of a different fold — the published blocked-CV property."""
    from osm_cut_ray.stages.geo_split import spatial_split

    ids, lon, lat = _points(seed=11, n=2500)
    buffer = 0.5
    got = _collect(spatial_split(
        _ds(ids, lon, lat, 5), id_col="pid", lon_col="lon",
        lat_col="lat", cell_deg=1.25, n_folds=3, buffer=buffer))
    fold = got["fold"].to_numpy()
    kept = ~got["excluded"].to_numpy()
    pts = np.stack([lon, lat], axis=1)
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(axis=2)
    cross = fold[:, None] != fold[None, :]
    close = d2 < buffer * buffer
    viol = close & cross & kept[:, None] & kept[None, :]
    assert not viol.any()


def test_spatial_split_zero_buffer_and_guards(ray_session):
    from osm_cut_ray.stages.geo_split import spatial_split

    ids, lon, lat = _points(seed=3, n=300)
    got = _collect(spatial_split(
        _ds(ids, lon, lat, 3), id_col="pid", lon_col="lon",
        lat_col="lat", cell_deg=2.0, n_folds=5, buffer=0.0))
    assert not got["excluded"].any()

    with pytest.raises(ValueError, match="n_folds"):
        spatial_split(_ds(ids, lon, lat, 2), id_col="pid",
                      lon_col="lon", lat_col="lat", cell_deg=1.0,
                      n_folds=1)
    with pytest.raises(ValueError, match="max_rings"):
        spatial_split(_ds(ids, lon, lat, 2), id_col="pid",
                      lon_col="lon", lat_col="lat", cell_deg=0.01,
                      n_folds=3, buffer=5.0)

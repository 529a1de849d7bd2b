"""Horn slope/aspect/hillshade vs an independent scalar transcription
of the published Esri steps (stages/terrain.py)."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from osm_cut_ray.stages.terrain import terrain_attributes

CS, ZF, AZ, ALT = 30.0, 1.0, 315.0, 45.0


def brute_cell(vals, present, cx, cy, w=CS, z=ZF, az=AZ, alt=ALT):
    """vals/present: dicts keyed (ix, iy). Missing neighbors take the
    center value."""
    e = vals[(cx, cy)]

    def gv(dx, dy):
        return vals.get((cx + dx, cy + dy), e) \
            if present.get((cx + dx, cy + dy)) else e

    a, b, c = gv(-1, 1), gv(0, 1), gv(1, 1)
    d, f = gv(-1, 0), gv(1, 0)
    g, h, i = gv(-1, -1), gv(0, -1), gv(1, -1)
    dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / (8 * w)
    dzdy = ((g + 2 * h + i) - (a + 2 * b + c)) / (8 * w)
    slope = math.atan(z * math.hypot(dzdx, dzdy))
    zen = math.radians(90.0 - alt)
    azm = math.radians((360.0 - az + 90.0) % 360.0)
    aspect = math.atan2(dzdy, -dzdx)
    shade = (math.cos(zen) * math.cos(slope)
             + math.sin(zen) * math.sin(slope)
             * math.cos(azm - aspect))
    hs = int(math.floor(255.0 * min(max(shade, 0.0), 1.0)))
    asp = (90.0 - math.degrees(aspect)) % 360.0
    if dzdx == 0 and dzdy == 0:
        asp = -1.0
    return math.degrees(slope), asp, hs


def run(ixs, iys, vs, tile=8):
    ds = rd.from_arrow(pa.table({
        "ix": pa.array(ixs, pa.int64()),
        "iy": pa.array(iys, pa.int64()),
        "value": pa.array(vs, pa.float64())}))
    out = terrain_attributes(ds.repartition(5), cell_size=CS,
                             z_factor=ZF, sun_az_deg=AZ,
                             sun_alt_deg=ALT, tile=tile)
    return {(r["ix"], r["iy"]): r for r in out.take_all()}


def test_terrain_matches_brute_randomized():
    rng = np.random.default_rng(7)
    W, H = 30, 22
    keep = rng.random((W, H)) > 0.15   # holes exercise nodata rule
    V = rng.uniform(0, 500, (W, H))
    ixs, iys = np.nonzero(keep)
    ixs = ixs - 11          # negative coords cross tile boundaries
    iys = iys - 40
    vs = V[keep]
    got = run(ixs.tolist(), iys.tolist(), vs.tolist())
    vals = {(x, y): v for x, y, v in zip(ixs, iys, vs)}
    present = {k: True for k in vals}
    assert set(got) == set(vals)
    for (x, y), r in got.items():
        ws, wa, wh = brute_cell(vals, present, x, y)
        assert np.isclose(r["slope_deg"], ws, atol=1e-9)
        assert np.isclose(r["aspect_deg"], wa, atol=1e-9)
        assert r["hillshade"] == wh


def test_terrain_plane_and_flat():
    # inclined plane z = 2x: slope = atan(2*z/cs... dz/dx exact
    ixs, iys, vs = [], [], []
    for x in range(10):
        for y in range(10):
            ixs.append(x)
            iys.append(y)
            vs.append(2.0 * CS * x)  # rise 2 per horizontal unit
    got = run(ixs, iys, vs)
    r = got[(5, 5)]
    assert np.isclose(r["slope_deg"], math.degrees(math.atan(2.0)))
    assert np.isclose(r["aspect_deg"], 270.0)  # downslope west
    flat = run(ixs, iys, [7.0] * len(ixs))
    assert all(np.isclose(v["slope_deg"], 0.0)
               and v["aspect_deg"] == -1.0 for v in flat.values())
    # flat hillshade = floor(255*cos(zenith))
    want_hs = int(math.floor(255 * math.cos(math.radians(45.0))))
    assert all(v["hillshade"] == want_hs for v in flat.values())


def test_terrain_partitioning_invariance_and_validation():
    rng = np.random.default_rng(3)
    ixs = rng.integers(-20, 20, 300)
    iys = rng.integers(-20, 20, 300)
    key = ixs * 1000 + iys
    _, first = np.unique(key, return_index=True)
    ixs, iys = ixs[first], iys[first]
    vs = rng.uniform(0, 100, len(ixs))
    a = run(ixs.tolist(), iys.tolist(), vs.tolist(), tile=4)
    b = run(ixs.tolist(), iys.tolist(), vs.tolist(), tile=16)
    assert set(a) == set(b)
    for k in a:
        assert a[k]["slope_deg"] == b[k]["slope_deg"]
        assert a[k]["hillshade"] == b[k]["hillshade"]
    ds = rd.from_arrow(pa.table({"ix": pa.array([0], pa.int64()),
                                 "iy": pa.array([0], pa.int64()),
                                 "value": pa.array([1.0])}))
    with pytest.raises(ValueError):
        terrain_attributes(ds, tile=1)
    with pytest.raises(ValueError):
        terrain_attributes(ds, cell_size=0.0)

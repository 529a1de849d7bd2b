import json

import numpy as np
import pytest


def _poly_text(rings):
    lines = ["test"]
    for kind, pts in rings:
        lines.append("!h" if kind == "exclude" else "area")
        lines.extend(f"   {x} {y}" for x, y in pts)
        lines.append("END")
    lines.append("END")
    return "\n".join(lines)


def test_geojson_polygon_with_hole_matches_poly():
    from osm_cut_ray.geometry.polygon import (PolygonIndex,
                                              parse_geojson_text,
                                              parse_poly_text)

    outer = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0),
             (0.0, 0.0)]
    hole = [(3.0, 3.0), (7.0, 3.0), (7.0, 7.0), (3.0, 7.0), (3.0, 3.0)]
    gj = {"type": "Feature", "properties": {},
          "geometry": {"type": "Polygon",
                       "coordinates": [outer, hole]}}
    got = parse_geojson_text(json.dumps(gj))
    exp = parse_poly_text(_poly_text(
        [("include", outer), ("exclude", hole)]))
    assert [(k, [(float(x), float(y)) for x, y in pts])
            for k, pts in got] == exp

    # identical PIP decisions from both compiled indexes
    rng = np.random.default_rng(2)
    lon = rng.uniform(-2, 12, 4000)
    lat = rng.uniform(-2, 12, 4000)
    a = PolygonIndex.compile(got).contains(lon, lat)
    b = PolygonIndex.compile(exp).contains(lon, lat)
    np.testing.assert_array_equal(a, b)
    # sanity on semantics: inside ring, outside hole
    probe = PolygonIndex.compile(got).contains(
        np.array([5.0, 1.0, 20.0]), np.array([5.0, 1.0, 5.0]))
    assert probe.tolist() == [False, True, False]


def test_geojson_multipolygon_featurecollection_and_altitude():
    from osm_cut_ray.geometry.polygon import parse_geojson_text

    gj = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "geometry": {
            "type": "MultiPolygon", "coordinates": [
                [[[0, 0, 99.0], [4, 0, 99.0], [4, 4, 99.0],
                  [0, 4, 99.0], [0, 0, 99.0]]],
                [[[10, 10], [14, 10], [14, 14], [10, 14], [10, 10]],
                 [[11, 11], [13, 11], [13, 13], [11, 13], [11, 11]]],
            ]}},
        {"type": "Feature", "geometry": {
            "type": "GeometryCollection", "geometries": [
                {"type": "Polygon",
                 "coordinates": [[[20, 20], [22, 20], [22, 22],
                                  [20, 22], [20, 20]]]}]}},
    ]}
    rings = parse_geojson_text(json.dumps(gj))
    kinds = [k for k, _ in rings]
    assert kinds == ["include", "include", "exclude", "include"]
    assert rings[0][1][0] == (0.0, 0.0)  # altitude dropped


def test_geojson_rejects_non_areal():
    from osm_cut_ray.geometry.polygon import parse_geojson_text

    with pytest.raises(ValueError, match="not polygonal"):
        parse_geojson_text(json.dumps(
            {"type": "Point", "coordinates": [1, 2]}))


def test_load_polygon_rings_dispatch(tmp_path):
    from osm_cut_ray.geometry.polygon import load_polygon_rings

    sq = [(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)]
    gj_path = tmp_path / "area.GeoJSON"
    gj_path.write_text(json.dumps(
        {"type": "Polygon", "coordinates": [sq]}))
    poly_path = tmp_path / "area.poly"
    poly_path.write_text(_poly_text([("include", sq)]))
    a = load_polygon_rings(str(gj_path))
    b = load_polygon_rings(str(poly_path))
    assert a == b == [("include", sq)]


def test_cut_cli_accepts_geojson(tmp_path, ray_session):
    """End-to-end: the same cut through a .poly and a .geojson
    boundary is byte-identical."""
    import subprocess
    import sys

    xml = """<?xml version='1.0' encoding='UTF-8'?>
<osm version="0.6" generator="t">
  <node id="1" lat="1.0" lon="1.0" version="1"/>
  <node id="2" lat="5.0" lon="5.0" version="1"/>
  <node id="3" lat="1.5" lon="1.5" version="1"/>
  <node id="4" lat="50.0" lon="50.0" version="1"/>
  <way id="10" version="1"><nd ref="1"/><nd ref="3"/></way>
  <way id="11" version="1"><nd ref="2"/><nd ref="1"/></way>
</osm>
"""
    src = tmp_path / "in.osm"
    src.write_text(xml)
    sq = [(0.0, 0.0), (3.0, 0.0), (3.0, 3.0), (0.0, 3.0), (0.0, 0.0)]
    (tmp_path / "a.poly").write_text(_poly_text([("include", sq)]))
    (tmp_path / "a.geojson").write_text(json.dumps(
        {"type": "Polygon", "coordinates": [sq]}))
    outs = []
    for boundary in ("a.poly", "a.geojson"):
        out = tmp_path / f"out_{boundary}.osm"
        r = subprocess.run(
            [sys.executable, "-m", "osm_cut_ray.cli", "cut",
             str(src), str(tmp_path / boundary), str(out)],
            capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]
        outs.append(out.read_bytes())
    assert outs[0] == outs[1]
    # node 1 is inside; node 2 is outside but kept (referenced by the
    # kept way 11 — complete-ways back-join); node 4 is outside and
    # unreferenced -> dropped
    assert b'id="1"' in outs[0] and b'id="4"' not in outs[0]
    assert b'id="2"' in outs[0]


def test_cut_cli_accepts_bbox(tmp_path, ray_session):
    """cut bbox:... == cut with the equivalent .poly square."""
    import subprocess
    import sys

    xml = """<?xml version='1.0' encoding='UTF-8'?>
<osm version="0.6" generator="t">
  <node id="1" lat="1.0" lon="1.0" version="1"/>
  <node id="2" lat="5.0" lon="5.0" version="1"/>
</osm>
"""
    src = tmp_path / "in.osm"
    src.write_text(xml)
    sq = [(0.0, 0.0), (3.0, 0.0), (3.0, 3.0), (0.0, 3.0), (0.0, 0.0)]
    (tmp_path / "a.poly").write_text(_poly_text([("include", sq)]))
    outs = []
    for boundary in (str(tmp_path / "a.poly"), "bbox:0,0,3,3"):
        out = tmp_path / f"out_{len(outs)}.osm"
        r = subprocess.run(
            [sys.executable, "-m", "osm_cut_ray.cli", "cut",
             str(src), boundary, str(out)],
            capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]
        outs.append(out.read_bytes())
    assert outs[0] == outs[1]
    assert b'id="1"' in outs[0] and b'id="2"' not in outs[0]

import json

import numpy as np
import pyarrow as pa
import pytest

XML = """<?xml version='1.0' encoding='UTF-8'?>
<osm version="0.6" generator="t">
  <node id="1" lat="1.5" lon="1.25" version="1"/>
  <node id="2" lat="2.5" lon="2.25" version="1">
    <tag k="amenity" v="cafe"/>
  </node>
  <node id="3" lat="3.5" lon="3.25" version="1"/>
  <way id="10" version="1"><nd ref="3"/><nd ref="1"/><nd ref="2"/>
    <tag k="highway" v="primary"/></way>
  <way id="11" version="1"><nd ref="2"/><nd ref="3"/></way>
</osm>
"""


def _corpus(tmp_path, xml=XML):
    from osm_cut_ray.sources.osm_xml import load_osm_xml
    p = tmp_path / "in.osm"
    p.write_text(xml)
    return load_osm_xml(str(p), str(tmp_path / "w"))


def test_add_locations_preserves_ref_order(tmp_path, ray_session):
    from osm_cut_ray.stages.locate import add_locations_to_ways

    nodes, ways, _ = _corpus(tmp_path)
    out = {r["id"]: r for r in
           add_locations_to_ways(nodes,
                                 ways.repartition(3)).take_all()}
    # way 10 visits 3 -> 1 -> 2: coordinates in REF order, not id order
    assert out[10]["lons"] == [3.25, 1.25, 2.25]
    assert out[10]["lats"] == [3.5, 1.5, 2.5]
    assert out[11]["lons"] == [2.25, 3.25]
    assert out[10]["tags"] == [("highway", "primary")]


def test_add_locations_missing_nodes(tmp_path, ray_session):
    from osm_cut_ray.stages.locate import add_locations_to_ways

    broken = XML.replace('<nd ref="1"/>', '<nd ref="99"/>')
    nodes, ways, _ = _corpus(tmp_path, broken)
    # the raise happens inside a Ray task -> RayTaskError wrapper
    with pytest.raises(Exception, match="exist in the corpus"):
        add_locations_to_ways(nodes, ways).take_all()
    out = {r["id"]: r for r in
           add_locations_to_ways(nodes, ways,
                                 ignore_missing=True).take_all()}
    # order preserved, the missing middle ref dropped
    assert out[10]["lons"] == [3.25, 2.25]


def test_export_geojson_cli(tmp_path, ray_session):
    import subprocess
    import sys

    src = tmp_path / "in.osm"
    src.write_text(XML)
    out = tmp_path / "out.geojson"
    r = subprocess.run(
        [sys.executable, "-m", "osm_cut_ray.cli", "export-geojson",
         str(src), str(out)],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    fc = json.loads(out.read_text())
    assert fc["type"] == "FeatureCollection"
    by_id = {f["id"]: f for f in fc["features"]}
    # only the tagged node exports by default
    assert set(by_id) == {"node/2", "way/10", "way/11"}
    assert by_id["node/2"]["geometry"]["coordinates"] == [2.25, 2.5]
    assert by_id["node/2"]["properties"] == {"amenity": "cafe"}
    assert by_id["way/10"]["geometry"]["coordinates"] == [
        [3.25, 3.5], [1.25, 1.5], [2.25, 2.5]]
    assert by_id["way/10"]["properties"] == {"highway": "primary"}
    # deterministic order: nodes first, then ways by id
    ids = [f["id"] for f in fc["features"]]
    assert ids == ["node/2", "way/10", "way/11"]

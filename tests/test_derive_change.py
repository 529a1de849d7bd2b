import numpy as np
import pyarrow as pa

OLD_XML = """<?xml version='1.0' encoding='UTF-8'?>
<osm version="0.6" generator="t">
  <node id="1" lat="1.0" lon="1.0" version="1"/>
  <node id="2" lat="2.0" lon="2.0" version="1">
    <tag k="amenity" v="cafe"/>
  </node>
  <node id="3" lat="3.0" lon="3.0" version="1"/>
  <way id="10" version="1"><nd ref="1"/><nd ref="2"/></way>
  <way id="11" version="1"><nd ref="2"/><nd ref="3"/></way>
  <relation id="20" version="1">
    <member type="way" ref="10" role="outer"/>
  </relation>
</osm>
"""

# vs OLD: node 2 moved, node 3 deleted, node 4 created, way 11
# re-routed, way 12 created, relation 20 re-rolled
NEW_XML = """<?xml version='1.0' encoding='UTF-8'?>
<osm version="0.6" generator="t">
  <node id="1" lat="1.0" lon="1.0" version="1"/>
  <node id="2" lat="2.5" lon="2.0" version="2">
    <tag k="amenity" v="cafe"/>
  </node>
  <node id="4" lat="4.0" lon="4.0" version="1"/>
  <way id="10" version="1"><nd ref="1"/><nd ref="2"/></way>
  <way id="11" version="2"><nd ref="2"/><nd ref="4"/></way>
  <way id="12" version="1"><nd ref="1"/><nd ref="4"/></way>
  <relation id="20" version="2">
    <member type="way" ref="11" role="inner"/>
  </relation>
</osm>
"""


def _rows(ds):
    out = []
    for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        out.extend(b.to_pylist())
    return sorted(out, key=lambda r: r["id"])


def test_derive_then_apply_reproduces_new(tmp_path, ray_session):
    from osm_cut_ray.sources.osm_change import (apply_osc, derive_osc,
                                                parse_osc_xml)
    from osm_cut_ray.sources.osm_xml import load_osm_xml

    (tmp_path / "old.osm").write_text(OLD_XML)
    (tmp_path / "new.osm").write_text(NEW_XML)
    old = load_osm_xml(str(tmp_path / "old.osm"), str(tmp_path / "wo"))
    new = load_osm_xml(str(tmp_path / "new.osm"), str(tmp_path / "wn"))
    osc = tmp_path / "delta.osc"
    counts = derive_osc(old, new, str(osc))
    assert counts == {"create": 2, "modify": 3, "delete": 1}

    ch = parse_osc_xml(str(osc))
    assert {(r["id"], r["op"]) for r in ch["node"].to_pylist()} == {
        (4, "create"), (2, "modify"), (3, "delete")}
    assert {(r["id"], r["op"]) for r in ch["way"].to_pylist()} == {
        (12, "create"), (11, "modify")}
    assert {(r["id"], r["op"]) for r in ch["relation"].to_pylist()} \
        == {(20, "modify")}

    # THE closure: applying the derived change to old == new, exactly
    got = apply_osc(*old, str(osc))
    for g_ds, n_ds in zip(got, new):
        g, n = _rows(g_ds), _rows(n_ds)
        assert g == n


def test_derive_change_cli_roundtrip(tmp_path, ray_session):
    import subprocess
    import sys

    (tmp_path / "old.osm").write_text(OLD_XML)
    (tmp_path / "new.osm").write_text(NEW_XML)
    osc = tmp_path / "delta.osc"
    r = subprocess.run(
        [sys.executable, "-m", "osm_cut_ray.cli", "derive-change",
         str(tmp_path / "old.osm"), str(tmp_path / "new.osm"),
         str(osc)],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "create=2, modify=3, delete=1" in r.stdout
    out = tmp_path / "applied.osm"
    r2 = subprocess.run(
        [sys.executable, "-m", "osm_cut_ray.cli", "apply-change",
         str(tmp_path / "old.osm"), str(osc), str(out)],
        capture_output=True, text=True, timeout=600)
    assert r2.returncode == 0, r2.stderr[-2000:]
    txt = out.read_text()
    assert 'id="4"' in txt and 'id="3"' not in txt
    assert 'lat="2.5"' in txt and 'id="12"' in txt


def test_derive_osc_empty_delta(tmp_path, ray_session):
    from osm_cut_ray.sources.osm_change import derive_osc
    from osm_cut_ray.sources.osm_xml import load_osm_xml

    (tmp_path / "a.osm").write_text(OLD_XML)
    a = load_osm_xml(str(tmp_path / "a.osm"), str(tmp_path / "wa"))
    b = load_osm_xml(str(tmp_path / "a.osm"), str(tmp_path / "wb"))
    osc = tmp_path / "empty.osc"
    counts = derive_osc(a, b, str(osc))
    assert counts == {"create": 0, "modify": 0, "delete": 0}
    assert "<create>" not in osc.read_text()

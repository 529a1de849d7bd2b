import numpy as np
import pytest

BASE_XML = """<?xml version='1.0' encoding='UTF-8'?>
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

OSC_XML = """<?xml version='1.0' encoding='UTF-8'?>
<osmChange version="0.6" generator="t">
  <create>
    <node id="4" lat="4.5" lon="4.5" version="1">
      <tag k="name" v="new"/>
    </node>
  </create>
  <modify>
    <node id="2" lat="2.5" lon="2.5" version="2"/>
    <way id="10" version="2"><nd ref="1"/><nd ref="4"/></way>
  </modify>
  <delete>
    <node id="3" version="2"/>
    <node id="5" version="1"/>
  </delete>
  <modify>
    <node id="6" lat="6.0" lon="6.0" version="1"/>
  </modify>
  <delete>
    <node id="6" version="2"/>
  </delete>
  <create>
    <node id="3" lat="3.5" lon="3.5" version="3"/>
  </create>
</osmChange>
"""


def test_parse_osc_sections_and_order(tmp_path):
    from osm_cut_ray.sources.osm_change import parse_osc_xml

    p = tmp_path / "c.osc"
    p.write_text(OSC_XML)
    ch = parse_osc_xml(str(p))
    nodes = ch["node"].to_pylist()
    assert [(r["id"], r["op"]) for r in nodes] == [
        (4, "create"), (2, "modify"), (3, "delete"), (5, "delete"),
        (6, "modify"), (6, "delete"), (3, "create")]
    seqs = [r["seq"] for r in nodes]
    assert seqs == sorted(seqs) and len(set(seqs)) == len(seqs)
    assert nodes[0]["tags"] == [("name", "new")]
    assert np.isnan(nodes[2]["lon"])  # delete may omit coords
    ways = ch["way"].to_pylist()
    assert ways[0]["id"] == 10 and ways[0]["node_ids"] == [1, 4]
    assert ch["relation"].num_rows == 0


def _brute_apply(base, change):
    """Dict replay of the documented last-wins semantics."""
    state = {r["id"]: r for r in base}
    for r in sorted(change, key=lambda r: r["seq"]):
        if r["op"] == "delete":
            state.pop(r["id"], None)
        else:
            state[r["id"]] = {k: v for k, v in r.items()
                              if k not in ("op", "seq")}
    return {i: state[i] for i in sorted(state)}


def test_apply_change_matches_brute(tmp_path, ray_session):
    import ray.data as rd

    from osm_cut_ray.sources.osm_change import apply_osc, parse_osc_xml
    from osm_cut_ray.sources.osm_xml import load_osm_xml

    src = tmp_path / "base.osm"
    src.write_text(BASE_XML)
    osc = tmp_path / "c.osc"
    osc.write_text(OSC_XML)
    nodes, ways, rels = load_osm_xml(str(src), str(tmp_path / "w"))
    n2, w2, r2 = apply_osc(nodes.repartition(3), ways, rels, str(osc))

    ch = parse_osc_xml(str(osc))
    exp_nodes = _brute_apply(
        [r for b in nodes.iter_batches(batch_size=None,
                                       batch_format="pyarrow")
         for r in b.to_pylist()], ch["node"].to_pylist())
    got = {r["id"]: r for r in n2.take_all()}
    assert sorted(got) == sorted(exp_nodes) == [1, 2, 3, 4]
    assert got[2]["lat"] == 2.5 and got[2]["version"] == 2
    assert got[2]["tags"] in ([], None)   # modify replaces tags
    assert got[3]["lat"] == 3.5           # delete then re-create
    assert 6 not in got                   # create then delete
    assert got[4]["tags"] == [("name", "new")]
    got_w = {r["id"]: r for r in w2.take_all()}
    assert got_w[10]["node_ids"] == [1, 4]
    assert got_w[11]["node_ids"] == [2, 3]
    assert {r["id"] for r in r2.take_all()} == {20}


def test_apply_change_cap_and_noop(tmp_path, ray_session):
    import ray.data as rd

    from osm_cut_ray.sources.osm_change import apply_osc
    from osm_cut_ray.sources.osm_xml import load_osm_xml

    src = tmp_path / "base.osm"
    src.write_text(BASE_XML)
    osc = tmp_path / "c.osc"
    osc.write_text(OSC_XML)
    nodes, ways, rels = load_osm_xml(str(src), str(tmp_path / "w"))
    with pytest.raises(RuntimeError, match="re-ingest"):
        apply_osc(nodes, ways, rels, str(osc), max_broadcast_changes=2)
    # empty change file: everything passes through
    empty = tmp_path / "e.osc"
    empty.write_text("<osmChange version='0.6'></osmChange>")
    n2, w2, r2 = apply_osc(nodes, ways, rels, str(empty))
    assert n2.count() == 3 and w2.count() == 2 and r2.count() == 1


def test_apply_change_cli_e2e(tmp_path, ray_session):
    import subprocess
    import sys

    src = tmp_path / "base.osm"
    src.write_text(BASE_XML)
    osc = tmp_path / "c.osc"
    osc.write_text(OSC_XML)
    out = tmp_path / "out.osm"
    r = subprocess.run(
        [sys.executable, "-m", "osm_cut_ray.cli", "apply-change",
         str(src), str(osc), str(out)],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    txt = out.read_text()
    assert 'id="4"' in txt and 'lat="2.5"' in txt
    assert 'id="6"' not in txt
    assert txt.index('id="1"') < txt.index('id="10"')  # nodes first
    # applying the EMPTY change roundtrips the base corpus through
    # parse -> write unchanged (same element count)
    empty = tmp_path / "e.osc"
    empty.write_text("<osmChange version='0.6'></osmChange>")
    out2 = tmp_path / "round.osm"
    r2 = subprocess.run(
        [sys.executable, "-m", "osm_cut_ray.cli", "apply-change",
         str(src), str(empty), str(out2)],
        capture_output=True, text=True, timeout=600)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert out2.read_text().count("<node") == 3

BASE_XML = """<?xml version='1.0' encoding='UTF-8'?>
<osm version="0.6" generator="t">
  <node id="1" lat="1.0" lon="1.0" version="1"/>
  <node id="2" lat="2.0" lon="2.0" version="1">
    <tag k="amenity" v="cafe"/>
  </node>
  <node id="3" lat="9.0" lon="9.0" version="1"/>
  <node id="4" lat="8.5" lon="8.5" version="1"/>
  <node id="5" lat="4.0" lon="4.0" version="1"/>
  <way id="10" version="1"><nd ref="1"/><nd ref="2"/></way>
  <way id="11" version="1"><nd ref="3"/><nd ref="4"/></way>
  <way id="12" version="1"><nd ref="5"/><nd ref="3"/></way>
  <relation id="20" version="1">
    <member type="way" ref="10" role="outer"/>
  </relation>
  <relation id="21" version="1">
    <member type="way" ref="11" role="outer"/>
  </relation>
</osm>
"""

# diff 1: node 3 moves INSIDE (flips way 11 in), node 6 created
# inside, way 13 created over node 6
OSC1 = """<?xml version='1.0' encoding='UTF-8'?>
<osmChange version="0.6" generator="t">
  <modify>
    <node id="3" lat="3.0" lon="3.0" version="2"/>
  </modify>
  <create>
    <node id="6" lat="2.5" lon="2.5" version="1"/>
    <way id="13" version="1"><nd ref="6"/><nd ref="4"/></way>
  </create>
</osmChange>
"""

# diff 2: node 5 moves OUT (drops way 12 unless node 3 holds it),
# way 13 deleted, node 2 deleted (still referenced by kept way 10)
OSC2 = """<?xml version='1.0' encoding='UTF-8'?>
<osmChange version="0.6" generator="t">
  <modify>
    <node id="5" lat="9.5" lon="9.5" version="2"/>
  </modify>
  <delete>
    <way id="13" version="2"/>
    <node id="2" version="2"/>
  </delete>
</osmChange>
"""

BBOX = "bbox:0,0,5,5"


def test_cut_update_cli_matches_full_cut(ray_session, tmp_path):
    from osm_cut_ray.cli import main

    base = tmp_path / "base.xml"
    base.write_text(BASE_XML)
    osc1 = tmp_path / "1.osc"
    osc1.write_text(OSC1)
    osc2 = tmp_path / "2.osc"
    osc2.write_text(OSC2)
    state = str(tmp_path / "state")

    # round 1: no state -> full build
    out1 = str(tmp_path / "out1.xml")
    assert main(["cut-update", str(base), str(osc1), BBOX, out1,
                 "--state-dir", state]) == 0

    # reference for round 1: apply-change then full cut
    base1 = str(tmp_path / "base1.xml")
    assert main(["apply-change", str(base), str(osc1), base1]) == 0
    ref1 = str(tmp_path / "ref1.xml")
    assert main(["cut", base1, BBOX, ref1]) == 0
    assert open(out1, "rb").read() == open(ref1, "rb").read()

    # round 2: incremental from persisted state
    out2 = str(tmp_path / "out2.xml")
    assert main(["cut-update", base1, str(osc2), BBOX, out2,
                 "--state-dir", state]) == 0
    base2 = str(tmp_path / "base2.xml")
    assert main(["apply-change", base1, str(osc2), base2]) == 0
    ref2 = str(tmp_path / "ref2.xml")
    assert main(["cut", base2, BBOX, ref2]) == 0
    assert open(out2, "rb").read() == open(ref2, "rb").read()

    # the incrementally cut extract still contains the flipped-in
    # way and drops the deleted way
    txt = open(out2).read()
    assert '<way id="11"' in txt
    assert '<way id="13"' not in txt


def test_state_save_load_roundtrip(tmp_path):
    import numpy as np

    from osm_cut_ray.pipelines.cut_incremental import (CutState,
                                                       has_state,
                                                       load_state,
                                                       save_state)

    st = CutState(inside_ids=np.array([1, 5, 9], np.int64),
                  way_ids=np.array([2], np.int64),
                  ref_ids=np.array([1, 4], np.int64),
                  ref_cnt=np.array([2, 1], np.int64),
                  rel_ids=np.array([], np.int64))
    d = str(tmp_path / "st")
    assert not has_state(d)
    save_state(st, d)
    assert has_state(d)
    got = load_state(d)
    for f in ("inside_ids", "way_ids", "ref_ids", "ref_cnt",
              "rel_ids"):
        assert np.array_equal(getattr(got, f), getattr(st, f))

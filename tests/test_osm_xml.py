"""OSM XML source/sink + end-to-end parity with the reference fixture:
parse the verbatim 1.osm/simple.poly content, cut, compare against the
golden sets from processor_SUITE.erl, write XML, re-parse, re-cut."""

import os

import pytest

FIXTURE_XML = """<?xml version="1.0" encoding="UTF-8"?>
<osm version="0.6" generator="Hands">
  <node id="1" lat="0" lon="0" version="1" changeset="440330" user="smsm1" uid="6871" timestamp="2008-12-17T01:18:42Z"/>
  <node id="2" lat="0" lon="5" version="1" changeset="440330" user="smsm1" uid="6871" timestamp="2008-12-17T01:18:42Z"/>
  <node id="3" lat="5" lon="10" version="3" changeset="2980587" user="nickb" uid="1697" timestamp="2009-10-29T12:14:35Z">
    <tag k="name" v="Jam's Sandwich Bar"/>
    <tag k="amenity" v="cafe"/>
  </node>
  <node id="4" lat="10" lon="10" version="2" changeset="388960" user="BiIbo" uid="3516" timestamp="2009-02-13T00:41:47Z">
    <tag k="barrier" v="gate"/>
  </node>
  <node id="5" lat="10" lon="0" version="1" changeset="374143" user="Matt" uid="70" timestamp="2008-10-16T16:35:57Z"/>
  <node id="6" lat="15" lon="15" version="4" changeset="2114003" user="jamicu" uid="38244" timestamp="2009-08-12T01:33:32Z"/>
  <way id="1" timestamp="2009-05-31T13:39:15Z" version="3" changeset="1368552" user="Matt" uid="70">
    <nd ref="1"/>
    <nd ref="2"/>
    <nd ref="3"/>
    <nd ref="4"/>
    <nd ref="1"/>
    <tag k="access" v="private"/>
    <tag k="highway" v="service"/>
  </way>
  <way id="2">
    <nd ref="4"/>
  </way>
  <relation id="1" version="1" timestamp="2009-12-13T17:06:48Z" uid="118927" user="DSem" changeset="3364749">
    <member type="way" ref="1" role=""/>
    <member type="node" ref="6" role=""/>
    <tag k="admin_level" v="8"/>
    <tag k="boundary" v="administrative"/>
    <tag k="name" v="Warsaw"/>
    <tag k="type" v="boundary"/>
  </relation>
  <relation id="2">
    <member type="node" ref="4" role=""/>
  </relation>
  <relation id="3">
    <member type="way" ref="2" role=""/>
  </relation>
  <relation id="4">
    <member type="relation" ref="2" role=""/>
    <member type="relation" ref="3" role=""/>
  </relation>
</osm>
"""

SIMPLE_POLY = "simple\n1\n0 0\n5 0\n10 5\nEND\nEND\n"


@pytest.fixture()
def xml_path(tmp_path):
    p = tmp_path / "1.osm"
    p.write_text(FIXTURE_XML)
    return str(p)


def _cut_from_xml(xml_path, tmp_path, complete):
    from osm_cut_ray.geometry.polygon import PolygonIndex, parse_poly_text
    from osm_cut_ray.pipelines.cut import cut
    from osm_cut_ray.sources.osm_xml import load_osm_xml
    nodes, ways, rels = load_osm_xml(xml_path, str(tmp_path / "pq"))
    poly = PolygonIndex.compile(parse_poly_text(SIMPLE_POLY))
    return cut(nodes, ways, rels, poly, complete=complete)


def test_xml_parse_schema(xml_path, tmp_path, ray_session):
    from osm_cut_ray.sources.osm_xml import load_osm_xml
    nodes, ways, rels = load_osm_xml(xml_path, str(tmp_path / "pq"))
    assert nodes.count() == 6 and ways.count() == 2 and rels.count() == 4
    n3 = [r for r in nodes.take_all() if r["id"] == 3][0]
    assert n3["lon"] == 10.0 and n3["lat"] == 5.0
    assert dict(n3["tags"])["name"] == "Jam's Sandwich Bar"
    assert n3["version"] == 3 and n3["user"] == "nickb"
    w2 = [r for r in ways.take_all() if r["id"] == 2][0]
    assert list(w2["node_ids"]) == [4] and w2["version"] is None


def test_xml_cut_complete_golden(xml_path, tmp_path, ray_session):
    # processor_SUITE.erl:223-264 golden expectations on the real file
    res = _cut_from_xml(xml_path, tmp_path, complete=True)
    assert sorted(res.node_ids.tolist()) == [1, 2, 3, 4]
    assert sorted(res.way_ids.tolist()) == [1]
    assert sorted(res.rel_ids.tolist()) == [1, 2, 4]
    way1 = res.ways.take_all()[0]
    assert list(way1["node_ids"]) == [1, 2, 3, 4, 1]  # verbatim
    assert way1["user"] == "Matt"  # metadata preserved through the cut


def test_xml_cut_noncomplete_golden(xml_path, tmp_path, ray_session):
    res = _cut_from_xml(xml_path, tmp_path, complete=False)
    assert sorted(res.node_ids.tolist()) == [1, 2, 3]
    assert sorted(res.way_ids.tolist()) == [1]
    assert sorted(res.rel_ids.tolist()) == [1]
    assert list(res.ways.take_all()[0]["node_ids"]) == [1, 2, 3, 1]


def test_xml_roundtrip(xml_path, tmp_path, ray_session):
    from osm_cut_ray.sources.osm_xml import load_osm_xml, write_osm_xml
    res = _cut_from_xml(xml_path, tmp_path, complete=True)
    out = str(tmp_path / "out.osm")
    n = write_osm_xml(out, res.nodes.iter_rows(), res.ways.iter_rows(),
                      res.relations.iter_rows())
    assert n == 4 + 1 + 3
    nodes2, ways2, rels2 = load_osm_xml(out, str(tmp_path / "pq2"))
    assert sorted(r["id"] for r in nodes2.take_all()) == [1, 2, 3, 4]
    w1 = ways2.take_all()[0]
    assert list(w1["node_ids"]) == [1, 2, 3, 4, 1]
    assert dict(w1["tags"])["highway"] == "service"
    r4 = [r for r in rels2.take_all() if r["id"] == 4][0]
    assert [(m["type"], m["ref"]) for m in r4["members"]] \
        == [("relation", 2)]


def test_xml_undefined_metadata_fidelity(xml_path, tmp_path, ray_session):
    """The reference serializes absent metadata as the literal
    `undefined` in every attribute slot (osm_writer.erl:228-237,
    pinned by processor_SUITE.erl:261-262); our sink must match and
    our parser must read it back as null."""
    from osm_cut_ray.sources.osm_xml import load_osm_xml, write_osm_xml
    res = _cut_from_xml(xml_path, tmp_path, complete=True)
    out = str(tmp_path / "undef.osm")
    write_osm_xml(out, res.nodes.iter_rows(), res.ways.iter_rows(),
                  res.relations.iter_rows())
    text = open(out).read()
    # relation 2 has no metadata in the fixture -> all five slots
    # serialize as undefined, in the reference attribute order
    assert ('<relation id="2" version="undefined" '
            'timestamp="undefined" uid="undefined" '
            'changeset="undefined" user="undefined">') in text
    # elements WITH metadata keep real values in the same order
    assert ('<node id="1" lat="0" lon="0" version="1" '
            'timestamp="2008-12-17T01:18:42Z" uid="6871" '
            'changeset="440330" user="smsm1"/>') in text
    # parse-back: undefined reads as null, ints stay ints
    nodes2, _, rels2 = load_osm_xml(out, str(tmp_path / "pq_undef"))
    r2 = [r for r in rels2.take_all() if r["id"] == 2][0]
    assert r2["version"] is None and r2["user"] is None
    n1 = [r for r in nodes2.take_all() if r["id"] == 1][0]
    assert n1["version"] == 1 and n1["user"] == "smsm1"


def test_sink_protocol_injection(xml_path, tmp_path, ray_session):
    """S5: any Sink implementation can replace the writer (the
    reference's writer_module option, osm_supervisor.erl:93-101);
    CollectSink is the test_osm_writer.erl analog."""
    import ray.data as rd
    from osm_cut_ray.sources.sink import (CollectSink, ParquetSink,
                                          Sink, write_cut_result)
    res = _cut_from_xml(xml_path, tmp_path, complete=True)

    col = CollectSink()
    assert isinstance(col, Sink)
    counts = write_cut_result(res, col)
    assert counts == {"node": 4, "way": 1, "relation": 3}
    assert sorted(col.table("node")["id"].to_pylist()) == [1, 2, 3, 4]
    assert col.table("way")["node_ids"].to_pylist() == [[1, 2, 3, 4, 1]]

    pq_dir = str(tmp_path / "sinkpq")
    counts2 = write_cut_result(res, ParquetSink(pq_dir))
    assert counts2 == counts
    back = rd.read_parquet(os.path.join(pq_dir, "relations"))
    assert sorted(r["id"] for r in back.take_all()) == [1, 2, 4]


def test_sink_cut_shuffle_members_rebuilt(xml_path, tmp_path, ray_session):
    """Streaming a cut_shuffle dict through a Sink must emit the
    REBUILT (filtered) relation member lists, identical to the
    broadcast CutResult's — not relations_meta's original unfiltered
    lists (round-2 advice: the dict branch discarded relation_members).
    """
    from osm_cut_ray.geometry.polygon import PolygonIndex, parse_poly_text
    from osm_cut_ray.pipelines.cut_shuffle import cut_shuffle
    from osm_cut_ray.sources.osm_xml import load_osm_xml
    from osm_cut_ray.sources.sink import CollectSink, write_cut_result

    nodes, ways, rels = load_osm_xml(xml_path, str(tmp_path / "pq"))
    poly = PolygonIndex.compile(parse_poly_text(SIMPLE_POLY))
    bres = _cut_from_xml(xml_path, tmp_path, complete=True)
    sres = cut_shuffle(nodes, ways, rels, poly, complete=True)

    bsink, ssink = CollectSink(), CollectSink()
    bcounts = write_cut_result(bres, bsink)
    scounts = write_cut_result(sres, ssink)
    assert scounts == bcounts

    def rows(sink, kind):
        # EMISSION order, not re-sorted: the dict branch must deliver
        # id order so sinks match the broadcast path byte-for-byte on
        # id-sorted inputs (OSM dump order)
        return sink.table(kind).to_pylist()

    assert [r["id"] for r in rows(ssink, "node")] \
        == [r["id"] for r in rows(bsink, "node")]
    assert [(r["id"], list(r["node_ids"])) for r in rows(ssink, "way")] \
        == [(r["id"], list(r["node_ids"])) for r in rows(bsink, "way")]
    bmem = [(r["id"], [(m["type"], m["ref"]) for m in r["members"]])
            for r in rows(bsink, "relation")]
    smem = [(r["id"], [(m["type"], m["ref"]) for m in r["members"]])
            for r in rows(ssink, "relation")]
    assert smem == bmem
    # the fixture makes the filter observable: relation 1's node-6
    # member is outside and must be gone from the sunk stream
    assert dict(bmem)[1] == [("way", 1)]


def test_xml_sink_streams_bounded(tmp_path, ray_session):
    """The XML sink must hold O(buffer_elements) state, not O(corpus):
    feed many batches and assert the writer buffer stays bounded and
    bytes land on disk incrementally (round-2 verdict item #1)."""
    import pyarrow as pa
    from osm_cut_ray.sources.osm_xml import write_osm_xml
    from osm_cut_ray.sources.sink import OsmXmlSink

    def node_rows(lo, hi):
        return [{"id": i, "lon": float(i % 360 - 180),
                 "lat": float(i % 180 - 90), "version": 1,
                 "changeset": None, "uid": None, "user": f"u{i}",
                 "timestamp": None, "tags": [("k", f"v{i}")]}
                for i in range(lo, hi)]

    out = str(tmp_path / "stream.osm")
    sink = OsmXmlSink(out, buffer_elements=100)
    sizes = []
    for b in range(8):
        batch = pa.Table.from_pylist(node_rows(b * 500, (b + 1) * 500))
        sink.write("node", batch)
        # bound: never more than one buffer + one element's lines
        assert len(sink._writer._buf) < 100 + 8
        sizes.append(os.path.getsize(out + ".tmp"))
    assert sizes[-1] > sizes[0] > 0  # bytes hit disk before close()
    counts = sink.close()
    assert counts == {"node": 4000, "way": 0, "relation": 0}

    # byte-identity with the one-shot writer
    ref = str(tmp_path / "ref.osm")
    write_osm_xml(ref, node_rows(0, 4000), [], [], buffer_elements=100)
    assert open(out).read() == open(ref).read()

    # kind-order contract: a node after a way must be rejected
    sink2 = OsmXmlSink(str(tmp_path / "bad.osm"))
    sink2.write("way", pa.Table.from_pylist(
        [{"id": 1, "node_ids": [1], "version": None, "changeset": None,
          "uid": None, "user": None, "timestamp": None, "tags": []}]))
    with pytest.raises(ValueError):
        sink2.write("node", pa.Table.from_pylist(node_rows(0, 1)))


def test_tag_filter(xml_path, tmp_path, ray_session):
    from osm_cut_ray.sources.osm_xml import load_osm_xml
    from osm_cut_ray.stages.tag_filter import filter_by_tag, tag_value

    nodes, ways, rels = load_osm_xml(xml_path, str(tmp_path / "pq"))

    cafes = filter_by_tag(nodes, "amenity", ["cafe"]).take_all()
    assert [r["id"] for r in cafes] == [3]
    tagged = filter_by_tag(nodes, "barrier").take_all()
    assert [r["id"] for r in tagged] == [4]
    drop = filter_by_tag(nodes, "amenity", mode="drop").take_all()
    assert sorted(r["id"] for r in drop) == [1, 2, 4, 5, 6]
    # value mismatch -> empty
    assert filter_by_tag(nodes, "amenity", ["bank"]).count() == 0
    # ways: highway=service kept, others dropped
    hw = filter_by_tag(ways, "highway", ["service"]).take_all()
    assert [r["id"] for r in hw] == [1]
    # tag_value returns null for absent keys
    import pyarrow as pa
    t = pa.concat_tables(list(
        nodes.iter_batches(batch_size=None, batch_format="pyarrow")))
    v = tag_value(t, "amenity")
    ids = t["id"].to_pylist()
    got = {i: x for i, x in zip(ids, v.to_pylist())}
    assert got[3] == "cafe" and got[1] is None

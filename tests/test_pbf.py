import struct
import zlib

import numpy as np
import pytest


def _v(x):  # varint
    out = bytearray()
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zz(x):  # zigzag
    return (x << 1) ^ (x >> 63)


def _ld(fn, payload):  # length-delimited field
    return _v((fn << 3) | 2) + _v(len(payload)) + payload


def _vi(fn, x):  # varint field
    return _v(fn << 3) + _v(x)


def _handcrafted_pbf(tmp_path):
    """A tiny spec-exact .osm.pbf written byte-by-byte from the
    PUBLISHED format: 2 dense nodes (one tagged), 1 way, 1 relation,
    granularity 100, lon/lat offsets 0."""
    st = [b"", b"amenity", b"cafe", b"inner"]
    stable = b"".join(_ld(1, s) for s in st)
    # dense: ids 10, 12 (deltas 10, 2); lat 1.0, -0.5 deg ->
    # nano/100 = 1e7, -5e6 (deltas 1e7, -15e6); lon 2.0, 2.5
    dense = _ld(1, _v(_zz(10)) + _v(_zz(2))) \
        + _ld(8, _v(_zz(10_000_000)) + _v(_zz(-15_000_000))) \
        + _ld(9, _v(_zz(20_000_000)) + _v(_zz(5_000_000))) \
        + _ld(10, _v(1) + _v(2) + _v(0) + _v(0))  # node1 tagged
    way = _vi(1, 77) + _ld(2, _v(1)) + _ld(3, _v(2)) \
        + _ld(8, _v(_zz(10)) + _v(_zz(2)))  # refs 10, 12
    rel = _vi(1, 99) + _ld(8, _v(3)) + _ld(9, _v(_zz(77))) \
        + _ld(10, _v(1))  # one way member, role "inner"
    group = _ld(2, dense) + _ld(3, way) + _ld(4, rel)
    block = _ld(1, stable) + _ld(2, group) + _vi(17, 100) + _vi(18, 1000)
    z = zlib.compress(block)
    blob = _vi(2, len(block)) + _ld(3, z)
    bh = _ld(1, b"OSMData") + _vi(3, len(blob))
    hdr_block = _ld(4, b"OsmSchema-V0.6") + _ld(4, b"DenseNodes")
    hdr_blob = _vi(2, len(hdr_block)) + _ld(3, zlib.compress(hdr_block))
    hdr_bh = _ld(1, b"OSMHeader") + _vi(3, len(hdr_blob))
    p = tmp_path / "tiny.osm.pbf"
    p.write_bytes(struct.pack(">i", len(hdr_bh)) + hdr_bh + hdr_blob
                  + struct.pack(">i", len(bh)) + bh + blob)
    return str(p)


def test_reader_parses_handcrafted_spec_bytes(tmp_path):
    from osm_cut_ray.sources.osm_pbf import parse_osm_pbf

    got = {"node": [], "way": [], "relation": []}
    for kind, tbl in parse_osm_pbf(_handcrafted_pbf(tmp_path)):
        got[kind].extend(tbl.to_pylist())
    n = got["node"]
    assert [r["id"] for r in n] == [10, 12]
    assert abs(n[0]["lat"] - 1.0) < 1e-9
    assert abs(n[1]["lat"] + 0.5) < 1e-9
    assert abs(n[0]["lon"] - 2.0) < 1e-9
    assert abs(n[1]["lon"] - 2.5) < 1e-9
    assert n[0]["tags"] == [("amenity", "cafe")]
    assert n[1]["tags"] == []
    w = got["way"][0]
    assert w["id"] == 77 and w["node_ids"] == [10, 12]
    assert w["tags"] == [("amenity", "cafe")]
    r = got["relation"][0]
    assert r["id"] == 99
    assert r["members"] == [{"type": "way", "ref": 77,
                             "role": "inner"}]


def test_packed_varint_vectorized_decoder():
    from osm_cut_ray.sources.osm_pbf import _packed_varints

    rng = np.random.default_rng(3)
    vals = np.concatenate([
        rng.integers(0, 2**62, 50), [0, 1, 127, 128, 2**63 - 1]])
    buf = b"".join(_v(int(v)) for v in vals)
    np.testing.assert_array_equal(
        _packed_varints(buf, zigzag=False), vals.astype(np.int64))
    svals = np.concatenate([rng.integers(-2**40, 2**40, 50),
                            [0, -1, 1, -2**62]])
    sbuf = b"".join(_v(_zz(int(v)) & ((1 << 64) - 1)) for v in svals)
    np.testing.assert_array_equal(
        _packed_varints(sbuf, zigzag=True), svals.astype(np.int64))


def test_pbf_roundtrip_writer_reader():
    import tempfile

    from osm_cut_ray.sources.osm_pbf import (parse_osm_pbf,
                                             write_osm_pbf)

    rng = np.random.default_rng(7)
    nodes = [{"id": int(i * 3 + 1),
              "lon": round(float(rng.uniform(-179, 179)), 7),
              "lat": round(float(rng.uniform(-89, 89)), 7),
              "tags": ([("k%d" % (i % 5), "v%d" % (i % 3))]
                       if i % 4 == 0 else [])}
             for i in range(9000)]  # > one 8k block
    ways = [{"id": int(i + 1), "node_ids":
             [int(x) for x in rng.integers(1, 27000, 5)],
             "tags": [("highway", "primary")] if i % 2 else []}
            for i in range(300)]
    rels = [{"id": int(i + 1),
             "members": [{"type": "way", "ref": int(i + 1),
                          "role": "outer"},
                         {"type": "node", "ref": 4, "role": ""}],
             "tags": [("type", "multipolygon")]}
            for i in range(40)]
    with tempfile.TemporaryDirectory() as d:
        path = d + "/rt.osm.pbf"
        n = write_osm_pbf(path, iter(nodes), iter(ways), iter(rels))
        assert n == 9340
        got = {"node": [], "way": [], "relation": []}
        for kind, tbl in parse_osm_pbf(path):
            got[kind].extend(tbl.to_pylist())
    assert len(got["node"]) == 9000
    for src, dst in zip(nodes, got["node"]):
        assert dst["id"] == src["id"]
        assert abs(dst["lon"] - src["lon"]) < 1e-7 + 1e-12
        assert abs(dst["lat"] - src["lat"]) < 1e-7 + 1e-12
        assert dst["tags"] == src["tags"]
    for src, dst in zip(ways, got["way"]):
        assert dst["id"] == src["id"]
        assert dst["node_ids"] == src["node_ids"]
        assert dst["tags"] == src["tags"]
    for src, dst in zip(rels, got["relation"]):
        assert dst["members"] == src["members"]
        assert dst["tags"] == src["tags"]


def test_cut_from_pbf_matches_cut_from_xml(tmp_path, ray_session):
    """The SAME corpus through the PBF path and the XML path produces
    byte-identical cut output."""
    import subprocess
    import sys

    xml = """<?xml version='1.0' encoding='UTF-8'?>
<osm version="0.6" generator="t">
  <node id="1" lat="1.0" lon="1.0" version="1"/>
  <node id="2" lat="5.0" lon="5.0" version="1"/>
  <node id="3" lat="1.5" lon="1.5" version="1"><tag k="a" v="b"/></node>
  <node id="4" lat="50.0" lon="50.0" version="1"/>
  <way id="10" version="1"><nd ref="1"/><nd ref="3"/></way>
  <way id="11" version="1"><nd ref="2"/><nd ref="1"/></way>
  <relation id="20" version="1">
    <member type="way" ref="10" role="outer"/>
  </relation>
</osm>
"""
    src_xml = tmp_path / "in.osm"
    src_xml.write_text(xml)
    # convert to pbf via the writer fed from the parsed xml tables
    from osm_cut_ray.sources.osm_pbf import write_osm_pbf
    from osm_cut_ray.sources.osm_xml import parse_osm_xml
    rows = {"node": [], "way": [], "relation": []}
    for kind, tbl in parse_osm_xml(str(src_xml)):
        rows[kind].extend(tbl.to_pylist())
    src_pbf = tmp_path / "in.osm.pbf"
    write_osm_pbf(str(src_pbf), iter(rows["node"]),
                  iter(rows["way"]), iter(rows["relation"]))
    sq = [(0.0, 0.0), (3.0, 0.0), (3.0, 3.0), (0.0, 3.0), (0.0, 0.0)]
    poly = tmp_path / "a.poly"
    poly.write_text("t\narea\n"
                    + "\n".join(f"  {x} {y}" for x, y in sq)
                    + "\nEND\nEND\n")
    outs = []
    for src in (src_xml, src_pbf):
        out = tmp_path / (src.name + ".out.osm")
        r = subprocess.run(
            [sys.executable, "-m", "osm_cut_ray.cli", "cut",
             str(src), str(poly), str(out)],
            capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]
        outs.append(out.read_bytes())
    assert outs[0] == outs[1]
    assert b'id="3"' in outs[0] and b'id="4"' not in outs[0]


def test_negative_offsets_and_signed_info_sign_extend(tmp_path):
    """proto int64 plain varints encode negatives as 10-byte two's
    complement; lat/lon offsets (PrimitiveBlock 19/20), Info
    changeset/uid and way/relation ids must sign-extend (ADVICE r4:
    -1e9 read unsigned decodes as ~1.8e19 -> wrong-region cut)."""
    from osm_cut_ray.sources.osm_pbf import parse_osm_pbf

    def sv(fn, x):  # signed plain varint field
        return _vi(fn, x & ((1 << 64) - 1))

    st = [b"", b"bob"]
    stable = b"".join(_ld(1, s) for s in st)
    # one dense node: raw lat 1.0 deg, raw lon 2.0 deg at gran 100
    dense = _ld(1, _v(_zz(10))) \
        + _ld(8, _v(_zz(10_000_000))) \
        + _ld(9, _v(_zz(20_000_000)))
    info = _vi(1, 2) + sv(3, -7) + sv(4, -3) + _vi(5, 1)
    way = sv(1, -77) + _ld(4, info) + _ld(8, _v(_zz(10)))
    rel = sv(1, -99) + _ld(8, _v(1)) \
        + _ld(9, _v(_zz(-77) & ((1 << 64) - 1))) + _ld(10, _v(1))
    group = _ld(2, dense) + _ld(3, way) + _ld(4, rel)
    # negative offsets: lat -0.5 deg, lon -0.25 deg (nanodegrees)
    block = _ld(1, stable) + _ld(2, group) + _vi(17, 100) \
        + _vi(18, 1000) + sv(19, -500_000_000) + sv(20, -250_000_000)
    z = zlib.compress(block)
    blob = _vi(2, len(block)) + _ld(3, z)
    bh = _ld(1, b"OSMData") + _vi(3, len(blob))
    p = tmp_path / "neg.osm.pbf"
    p.write_bytes(struct.pack(">i", len(bh)) + bh + blob)

    got = {"node": [], "way": [], "relation": []}
    for kind, tbl in parse_osm_pbf(str(p)):
        got[kind].extend(tbl.to_pylist())
    n = got["node"][0]
    assert abs(n["lat"] - 0.5) < 1e-9    # 1.0 + (-0.5)
    assert abs(n["lon"] - 1.75) < 1e-9   # 2.0 + (-0.25)
    w = got["way"][0]
    assert w["id"] == -77
    assert w["changeset"] == -7 and w["uid"] == -3
    r = got["relation"][0]
    assert r["id"] == -99
    assert r["members"][0]["ref"] == -77


def test_ts_vec_matches_ts_elementwise():
    """Vectorized ISO formatting must equal the datetime-based `_ts`
    exactly, including negative epochs (floor semantics)."""
    from osm_cut_ray.sources.osm_pbf import _ts, _ts_vec

    ms = np.array([0, 1, 999, 1000, -1, -999, -1000, -1500,
                   1167609600000, 1735689599999, -2208988800000],
                  np.int64)
    rng = np.random.default_rng(9)
    ms = np.concatenate([ms, rng.integers(-3_000_000_000_000,
                                          3_000_000_000_000, 200)])
    got = _ts_vec(ms)
    want = [_ts(int(m)) for m in ms]
    assert got.tolist() == want


def test_dense_kv_zero_value_falls_back_to_scan(tmp_path):
    """A 0 at a VALUE position (string index 0, spec-reserved) makes
    the vectorized even-segment split unsound — the parser must
    detect it and reproduce the reference scan's semantics."""
    from osm_cut_ray.sources.osm_pbf import parse_osm_pbf

    st = [b"", b"highway", b"primary"]
    stable = b"".join(_ld(1, s) for s in st)
    # two nodes; node 1 tags: (1 -> 0) i.e. value is string index 0
    # ("" — the reserved slot), then delimiter; node 2: (1, 2)
    kv = _v(1) + _v(0) + _v(0) + _v(1) + _v(2) + _v(0)
    dense = _ld(1, _v(_zz(10)) + _v(_zz(1))) \
        + _ld(8, _v(_zz(1_000_000)) + _v(_zz(0))) \
        + _ld(9, _v(_zz(2_000_000)) + _v(_zz(0))) \
        + _ld(10, kv)
    group = _ld(2, dense)
    block = _ld(1, stable) + _ld(2, group) + _vi(17, 100)
    z = zlib.compress(block)
    blob = _vi(2, len(block)) + _ld(3, z)
    bh = _ld(1, b"OSMData") + _vi(3, len(blob))
    p = tmp_path / "zv.osm.pbf"
    p.write_bytes(struct.pack(">i", len(bh)) + bh + blob)

    nodes = []
    for kind, tbl in parse_osm_pbf(str(p)):
        if kind == "node":
            nodes.extend(tbl.to_pylist())
    assert len(nodes) == 2
    assert nodes[0]["tags"] == [("highway", "")]
    assert nodes[1]["tags"] == [("highway", "primary")]

import numpy as np
import pyarrow as pa
import pytest

A_XML = """<?xml version='1.0' encoding='UTF-8'?>
<osm version="0.6" generator="t">
  <node id="1" lat="1.0" lon="1.0" version="1"/>
  <node id="2" lat="2.0" lon="2.0" version="2">
    <tag k="amenity" v="cafe"/>
  </node>
  <node id="3" lat="3.0" lon="3.0" version="1"/>
  <way id="10" version="1"><nd ref="1"/><nd ref="2"/></way>
  <relation id="20" version="1">
    <member type="way" ref="10" role="outer"/>
    <member type="relation" ref="21" role="sub"/>
  </relation>
  <relation id="21" version="1">
    <member type="node" ref="3" role=""/>
  </relation>
</osm>
"""

B_XML = """<?xml version='1.0' encoding='UTF-8'?>
<osm version="0.6" generator="t">
  <node id="2" lat="2.9" lon="2.9" version="1"/>
  <node id="4" lat="4.0" lon="4.0" version="1"/>
  <way id="10" version="3"><nd ref="2"/><nd ref="4"/></way>
</osm>
"""


def _corpus(tmp_path, xml, name):
    from osm_cut_ray.sources.osm_xml import load_osm_xml
    p = tmp_path / f"{name}.osm"
    p.write_text(xml)
    return load_osm_xml(str(p), str(tmp_path / f"w_{name}"))


def _rows(ds):
    out = []
    for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        out.extend(b.to_pylist())
    return sorted(out, key=lambda r: r["id"])


def test_merge_corpora_version_and_source_precedence(tmp_path,
                                                     ray_session):
    from osm_cut_ray.stages.osm_tools import merge_corpora

    an, aw, ar = _corpus(tmp_path, A_XML, "a")
    bn, bw, br = _corpus(tmp_path, B_XML, "b")
    nodes = _rows(merge_corpora([an, bn]))
    assert [r["id"] for r in nodes] == [1, 2, 3, 4]
    # node 2: A has version 2 > B's version 1 -> A wins despite order
    n2 = nodes[1]
    assert n2["lat"] == 2.0 and n2["tags"] == [("amenity", "cafe")]
    ways = _rows(merge_corpora([aw, bw]))
    assert ways[0]["version"] == 3  # B's way 10 wins on version
    assert ways[0]["node_ids"] == [2, 4]
    # equal versions: LATER source wins
    ways2 = _rows(merge_corpora([bw, bw]))
    assert len(ways2) == 1 and ways2[0]["node_ids"] == [2, 4]


def test_extract_by_ids_recursive(tmp_path, ray_session):
    from osm_cut_ray.stages.osm_tools import extract_by_ids

    n, w, r = _corpus(tmp_path, A_XML, "a")
    kn, kw, kr = extract_by_ids(n, w, r, rel_ids=[20])
    # relation 20 pulls way 10 (-> nodes 1, 2) and nested relation 21
    # (-> node 3)
    assert [x["id"] for x in _rows(kr)] == [20, 21]
    assert [x["id"] for x in _rows(kw)] == [10]
    assert [x["id"] for x in _rows(kn)] == [1, 2, 3]
    # a plain node seed pulls just itself
    kn2, kw2, kr2 = extract_by_ids(n, w, r, node_ids=[3])
    assert [x["id"] for x in _rows(kn2)] == [3]
    assert kw2.count() == 0 and kr2.count() == 0


def test_renumber_preserves_referential_integrity(tmp_path,
                                                  ray_session):
    from osm_cut_ray.stages.osm_tools import renumber_corpus

    # shift ids far from dense so the remap is visible
    xml = A_XML.replace('id="1"', 'id="1001"') \
        .replace('id="2"', 'id="2002"') \
        .replace('id="3"', 'id="3003"') \
        .replace('ref="1"', 'ref="1001"') \
        .replace('ref="2"', 'ref="2002"') \
        .replace('ref="3"', 'ref="3003"') \
        .replace('id="10"', 'id="510"').replace('ref="10"', 'ref="510"') \
        .replace('id="20"', 'id="620"') \
        .replace('id="21"', 'id="621"').replace('ref="21"', 'ref="621"')
    n, w, r = _corpus(tmp_path, xml, "shifted")
    rn, rw, rr = renumber_corpus(n, w, r)
    nodes = _rows(rn)
    assert [x["id"] for x in nodes] == [1, 2, 3]
    # old ascending order preserved: 1001 -> 1, 2002 -> 2, 3003 -> 3
    assert nodes[0]["lat"] == 1.0 and nodes[2]["lat"] == 3.0
    ways = _rows(rw)
    assert ways[0]["id"] == 1 and ways[0]["node_ids"] == [1, 2]
    rels = _rows(rr)
    assert [x["id"] for x in rels] == [1, 2]
    mem = rels[0]["members"]
    assert mem[0] == {"type": "way", "ref": 1, "role": "outer"}
    assert mem[1] == {"type": "relation", "ref": 2, "role": "sub"}
    assert rels[1]["members"][0]["ref"] == 3  # node 3003 -> 3


def test_osm_tool_cli_verbs(tmp_path, ray_session):
    import subprocess
    import sys

    (tmp_path / "a.osm").write_text(A_XML)
    (tmp_path / "b.osm").write_text(B_XML)

    merged = tmp_path / "m.osm"
    r = subprocess.run(
        [sys.executable, "-m", "osm_cut_ray.cli", "merge",
         str(tmp_path / "a.osm"), str(tmp_path / "b.osm"),
         str(merged)],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    txt = merged.read_text()
    assert 'id="4"' in txt                      # B-only node arrives
    assert txt.count("<node") == 4
    assert 'lat="2"' in txt and 'lat="2.9"' not in txt  # A's v2 wins

    got = tmp_path / "g.osm"
    r = subprocess.run(
        [sys.executable, "-m", "osm_cut_ray.cli", "getid",
         str(tmp_path / "a.osm"), str(got), "r20"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    txt = got.read_text()
    assert txt.count("<node") == 3 and txt.count("<relation") == 2

    ren = tmp_path / "r.osm"
    r = subprocess.run(
        [sys.executable, "-m", "osm_cut_ray.cli", "renumber",
         str(tmp_path / "b.osm"), str(ren)],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    txt = ren.read_text()
    assert '<node id="1" ' in txt and '<node id="2" ' in txt
    assert '<way id="1" ' in txt
    assert '<nd ref="1"/>' in txt and '<nd ref="2"/>' in txt


def test_renumber_dangling_refs_raise_and_shift(tmp_path,
                                                ray_session):
    """ADVICE r4: a dangling ref must never silently alias a new
    dense id. Default raises; on_unknown='shift' maps old -> N+old."""
    import pytest
    from osm_cut_ray.stages.osm_tools import renumber_corpus

    # way 10 references node 999 which is absent; nodes are 1001/2002/
    # 3003 so under the OLD behavior 999 would collide-free here, but
    # a corpus with node 999 missing and 3 nodes renumbered 1..3 can
    # alias — the contract is now explicit.
    xml = A_XML.replace('<nd ref="2"/>', '<nd ref="2"/><nd ref="999"/>')
    n, w, r = _corpus(tmp_path, xml, "dangling")
    # the worker-side RuntimeError surfaces wrapped in RayTaskError
    with pytest.raises(Exception, match="dangling"):
        _rows(renumber_corpus(n, w, r)[1])
    rn, rw, rr = renumber_corpus(n, w, r, on_unknown="shift")
    ways = _rows(rw)
    # 3 known nodes -> 1..3; unknown 999 -> 3 + 999 = 1002
    assert ways[0]["node_ids"] == [1, 2, 1002]
    ids = {x["id"] for x in _rows(rn)}
    assert 1002 not in ids and ids == {1, 2, 3}


def test_getid_cli_rejects_malformed_tokens(tmp_path):
    import subprocess
    import sys
    p = tmp_path / "a.osm"
    p.write_text(A_XML)
    r = subprocess.run(
        [sys.executable, "-m", "osm_cut_ray.cli", "getid", str(p),
         str(tmp_path / "o.osm"), "x5"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode != 0
    assert "bad id" in (r.stderr + r.stdout)

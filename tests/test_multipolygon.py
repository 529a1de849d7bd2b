import numpy as np
import pytest


def test_stitch_rings_reversal_and_determinism():
    from osm_cut_ray.stages.multipolygon import stitch_rings

    # square split into two open fragments, second stored REVERSED
    ways = {10: [1, 2, 3], 12: [1, 4, 3]}  # 3->4->1 must reverse
    rings = stitch_rings(ways)
    assert rings == [[1, 2, 3, 4, 1]]
    # a closed way passes through as its own ring
    assert stitch_rings({5: [7, 8, 9, 7]}) == [[7, 8, 9, 7]]
    # two disjoint rings, lowest-id-first order
    two = stitch_rings({4: [1, 2, 3, 1], 2: [5, 6, 7, 5]})
    assert two == [[5, 6, 7, 5], [1, 2, 3, 1]]
    # lowest-id continuation wins when two candidates match (two
    # rings touching at node 2: both assemblies are valid closings,
    # the deterministic rule picks way 2 first)
    r = stitch_rings({1: [1, 2], 2: [2, 1], 3: [2, 4, 1], 4: [1, 2]})
    assert r == [[1, 2, 1], [2, 4, 1, 2]]


def test_stitch_rings_raises_on_broken():
    from osm_cut_ray.stages.multipolygon import stitch_rings

    with pytest.raises(RuntimeError, match="cannot close"):
        stitch_rings({1: [1, 2, 3]})
    with pytest.raises(RuntimeError, match="<2 nodes"):
        stitch_rings({1: [1]})


def _corpus(rd, pa):
    """Nodes forming a 0-10 square boundary (two fragments) with a
    3-7 square hole (two fragments), plus interior/exterior probe
    nodes, one probe way, and the boundary relation."""
    import pyarrow as pa_

    coords = {
        1: (0.0, 0.0), 2: (10.0, 0.0), 3: (10.0, 10.0),
        4: (0.0, 10.0),
        5: (3.0, 3.0), 6: (7.0, 3.0), 7: (7.0, 7.0), 8: (3.0, 7.0),
        # probes: 100 inside, 101 in hole, 102 outside
        100: (1.5, 1.5), 101: (5.0, 5.0), 102: (20.0, 20.0),
    }
    nodes = pa_.table({
        "id": pa_.array(sorted(coords), pa_.int64()),
        "lon": pa_.array([coords[i][0] for i in sorted(coords)]),
        "lat": pa_.array([coords[i][1] for i in sorted(coords)])})
    ways = pa_.table({
        "id": pa_.array([30, 31, 32, 33, 40], pa_.int64()),
        "node_ids": pa_.array(
            [[1, 2, 3], [3, 4, 1],            # outer fragments
             [5, 6, 7], [5, 8, 7],            # inner (one reversed)
             [100, 101]],                     # unrelated probe way
            pa_.list_(pa_.int64()))})
    rels = pa_.table({
        "id": pa_.array([900], pa_.int64()),
        "members": pa_.array([[
            {"type": "way", "ref": 30, "role": "outer"},
            {"type": "way", "ref": 31, "role": "outer"},
            {"type": "way", "ref": 32, "role": "inner"},
            {"type": "way", "ref": 33, "role": "inner"},
            {"type": "node", "ref": 100, "role": "admin_centre"},
        ]], pa_.list_(pa_.struct([("type", pa_.large_string()),
                                  ("ref", pa_.int64()),
                                  ("role", pa_.large_string())])))})
    return (rd.from_arrow(nodes).repartition(3),
            rd.from_arrow(ways), rd.from_arrow(rels))


def test_boundary_rings_assembles_and_cuts(ray_session):
    import ray.data as rd

    from osm_cut_ray.geometry.polygon import PolygonIndex
    from osm_cut_ray.stages.multipolygon import boundary_rings

    nodes, ways, rels = _corpus(rd, None)
    rings = boundary_rings(nodes, ways, rels, 900)
    assert [k for k, _ in rings] == ["include", "exclude"]
    assert rings[0][1][0] == rings[0][1][-1] == (0.0, 0.0)
    poly = PolygonIndex.compile(rings)
    got = poly.contains(np.array([1.5, 5.0, 20.0]),
                        np.array([1.5, 5.0, 20.0]))
    assert got.tolist() == [True, False, False]


def test_boundary_rings_error_paths(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.multipolygon import boundary_rings

    nodes, ways, rels = _corpus(rd, None)
    with pytest.raises(RuntimeError, match="not in corpus"):
        boundary_rings(nodes, ways, rels, 901)

    # a relation pointing at a way the corpus lacks
    import pyarrow as pa_
    bad = rd.from_arrow(pa_.table({
        "id": pa_.array([902], pa_.int64()),
        "members": pa_.array([[
            {"type": "way", "ref": 777, "role": "outer"}]],
            pa_.list_(pa_.struct([("type", pa_.large_string()),
                                  ("ref", pa_.int64()),
                                  ("role", pa_.large_string())])))}))
    with pytest.raises(RuntimeError, match="missing from the corpus"):
        boundary_rings(nodes, ways, bad, 902)


def test_cut_cli_by_relation(tmp_path, ray_session):
    """cut rel:<id> == cut with the equivalent .poly, byte-identical."""
    import subprocess
    import sys

    node_xml = "\n".join(
        f'  <node id="{i}" lat="{la}" lon="{lo}" version="1"/>'
        for i, lo, la in [
            (1, 0.0, 0.0), (2, 10.0, 0.0), (3, 10.0, 10.0),
            (4, 0.0, 10.0), (100, 1.5, 1.5), (102, 20.0, 20.0)])
    xml = f"""<?xml version='1.0' encoding='UTF-8'?>
<osm version="0.6" generator="t">
{node_xml}
  <way id="30" version="1"><nd ref="1"/><nd ref="2"/><nd ref="3"/></way>
  <way id="31" version="1"><nd ref="3"/><nd ref="4"/><nd ref="1"/></way>
  <relation id="900" version="1">
    <member type="way" ref="30" role="outer"/>
    <member type="way" ref="31" role="outer"/>
  </relation>
</osm>
"""
    src = tmp_path / "in.osm"
    src.write_text(xml)
    sq = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0),
          (0.0, 0.0)]
    (tmp_path / "a.poly").write_text(
        "t\narea\n" + "\n".join(f"  {x} {y}" for x, y in sq)
        + "\nEND\nEND\n")
    outs = []
    for boundary in ("a.poly", "rel:900"):
        out = tmp_path / f"out_{boundary.replace(':', '_')}.osm"
        arg = str(tmp_path / boundary) if boundary.endswith(".poly") \
            else boundary
        r = subprocess.run(
            [sys.executable, "-m", "osm_cut_ray.cli", "cut",
             str(src), arg, str(out)],
            capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]
        outs.append(out.read_bytes())
    assert outs[0] == outs[1]
    assert b'id="100"' in outs[0] and b'id="102"' not in outs[0]

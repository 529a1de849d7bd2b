

def test_cut_multi_config_json(tmp_path, ray_session):
    """osmium-style extract config == the same cuts via --polygon."""
    import json
    import subprocess
    import sys

    xml = """<?xml version='1.0' encoding='UTF-8'?>
<osm version="0.6" generator="t">
  <node id="1" lat="1.0" lon="1.0" version="1"/>
  <node id="2" lat="5.0" lon="5.0" version="1"/>
  <node id="3" lat="9.0" lon="9.0" version="1"/>
</osm>
"""
    src = tmp_path / "in.osm"
    src.write_text(xml)
    sq = [(4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0)]
    (tmp_path / "mid.poly").write_text(
        "t\narea\n" + "\n".join(f"  {x} {y}" for x, y in sq)
        + "\nEND\nEND\n")
    cfg = {"directory": str(tmp_path), "extracts": [
        {"output": "low.osm", "bbox": [0, 0, 3, 3]},
        {"output": "mid.osm", "polygon": {"file_name": "mid.poly"}},
        {"output": "high.osm",
         "polygon": [[[8, 8], [10, 8], [10, 10], [8, 10], [8, 8]]]},
    ]}
    (tmp_path / "cfg.json").write_text(json.dumps(cfg))
    outdir = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, "-m", "osm_cut_ray.cli", "cut-multi",
         str(src), str(outdir), "--config", str(tmp_path / "cfg.json")],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    low = (outdir / "low.osm").read_bytes()
    mid = (outdir / "mid.osm").read_bytes()
    high = (outdir / "high.osm").read_bytes()
    assert b'id="1"' in low and b'id="2"' not in low
    assert b'id="2"' in mid and b'id="1"' not in mid
    assert b'id="3"' in high and b'id="2"' not in high

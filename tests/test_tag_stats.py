import numpy as np
import pyarrow as pa


def _ds(rd, rows):
    tags_type = pa.map_(pa.large_string(), pa.large_string())
    return rd.from_arrow(pa.table({
        "id": pa.array(range(len(rows)), pa.int64()),
        "tags": pa.array(rows, tags_type)})).repartition(4)


def test_tag_stats_matches_brute(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.tag_stats import tag_stats

    rng = np.random.default_rng(13)
    keys = ["highway", "name", "amenity", "oneway"]
    vals = ["primary", "secondary", "yes", "no", "x"]
    rows = []
    for _ in range(500):
        n = int(rng.integers(0, 4))
        rows.append([(keys[int(rng.integers(0, 4))],
                      vals[int(rng.integers(0, 5))])
                     for _ in range(n)] or None)
    brute = {}
    brute_k = {}
    for r in rows:
        for k, v in (r or []):
            brute[(k, v)] = brute.get((k, v), 0) + 1
            brute_k[k] = brute_k.get(k, 0) + 1
    ds = _ds(rd, rows)
    got = tag_stats(ds, top_k=1000)
    got_pairs = {(got["key"][i].as_py(), got["value"][i].as_py()):
                 got["n"][i].as_py() for i in range(got.num_rows)}
    assert got_pairs == brute
    # count-desc with (key, value) tie order
    ns = got["n"].to_pylist()
    assert ns == sorted(ns, reverse=True)
    trip = list(zip([-n for n in ns], got["key"].to_pylist(),
                    got["value"].to_pylist()))
    assert trip == sorted(trip)

    by_key = tag_stats(ds, top_k=2, by_value=False)
    assert by_key.schema.names == ["key", "n"]
    exp = sorted(brute_k.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert list(zip(by_key["key"].to_pylist(),
                    by_key["n"].to_pylist())) == exp


def test_tag_stats_empty(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.tag_stats import tag_stats

    got = tag_stats(_ds(rd, [None, None]), top_k=5)
    assert got.num_rows == 0


def test_tag_stats_cli(tmp_path, ray_session):
    import subprocess
    import sys

    xml = """<?xml version='1.0' encoding='UTF-8'?>
<osm version="0.6" generator="t">
  <node id="1" lat="1.0" lon="1.0" version="1"/>
  <way id="10" version="1"><nd ref="1"/>
    <tag k="highway" v="primary"/></way>
  <way id="11" version="1"><nd ref="1"/>
    <tag k="highway" v="primary"/><tag k="oneway" v="yes"/></way>
</osm>
"""
    src = tmp_path / "in.osm"
    src.write_text(xml)
    r = subprocess.run(
        [sys.executable, "-m", "osm_cut_ray.cli", "tag-stats",
         str(src)],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln.strip() for ln in r.stdout.splitlines() if ln.strip()]
    assert lines[0].endswith("highway=primary") and \
        lines[0].startswith("2")
    assert lines[1].endswith("oneway=yes")

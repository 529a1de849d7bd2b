"""CLI regression: the reference cut.escript analog end-to-end in a
subprocess (own Ray session), using the actual reference fixture
content."""

import json
import os
import subprocess
import sys

from tests.test_osm_xml import FIXTURE_XML, SIMPLE_POLY


def _run(args, env_extra=None):
    env = dict(os.environ, RAY_GRAFT_CPUS="4")
    if env_extra:
        env.update(env_extra)
    return subprocess.run([sys.executable, "-m", "osm_cut_ray.cli", *args],
                         capture_output=True, text=True, env=env,
                         cwd="/root/repo", timeout=300)


def test_cli_cut_complete_xml(tmp_path):
    xml = tmp_path / "1.osm"
    xml.write_text(FIXTURE_XML)
    poly = tmp_path / "simple.poly"
    poly.write_text(SIMPLE_POLY)
    out = tmp_path / "out.osm"
    r = _run(["cut", str(xml), str(poly), str(out)])
    assert r.returncode == 0, r.stderr[-800:]
    assert "wrote xml" in r.stdout and "nodes=4, ways=1, relations=3" in r.stdout
    text = out.read_text()
    # complete-mode golden set, serialized
    assert '<node id="4"' in text and '<node id="5"' not in text
    assert text.count("<relation") == 3
    assert '<member type="relation" ref="2"' in text


def test_cli_flagship_resume(tmp_path):
    out = str(tmp_path / "ck")
    r1 = _run(["flagship", "/root/testdata/sf0.001", out])
    assert r1.returncode == 0, r1.stderr[-800:]
    assert "completed=['lineitem-0']" in r1.stdout
    r2 = _run(["flagship", "/root/testdata/sf0.001", out])
    assert "skipped=['lineitem-0']" in r2.stdout
    man = json.load(open(os.path.join(out, "_manifests",
                                      "lineitem-0.json")))
    assert man["rows_out"] > 0 and man["params"] == {
        "version": "flagship-v1"}


def test_cli_cut_parquet_dir_roundtrip(tmp_path):
    """The parquet ingest + parquet sink path: XML -> parquet dirs ->
    CLI cut with a directory input and --format parquet -> re-read and
    assert the complete-mode golden sets."""
    xml = tmp_path / "1.osm"
    xml.write_text(FIXTURE_XML)
    poly = tmp_path / "simple.poly"
    poly.write_text(SIMPLE_POLY)
    # build the parquet input layout the CLI expects (nodes/ways/relations)
    conv = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, '/root/repo');"
         "from osm_cut_ray.sources.osm_xml import osm_xml_to_parquet;"
         f"print(osm_xml_to_parquet({str(xml)!r}, {str(tmp_path / 'pq_in')!r}))"],
        capture_output=True, text=True, timeout=120)
    assert conv.returncode == 0, conv.stderr[-500:]
    out = tmp_path / "pq_out"
    r = _run(["cut", str(tmp_path / "pq_in"), str(poly), str(out),
              "--format", "parquet"])
    assert r.returncode == 0, r.stderr[-800:]
    assert "nodes=4, ways=1, relations=3" in r.stdout
    check = subprocess.run(
        [sys.executable, "-c",
         "import pyarrow.parquet as pq; import sys;"
         f"n = pq.read_table({str(out / 'nodes')!r});"
         f"w = pq.read_table({str(out / 'ways')!r});"
         "print(sorted(n['id'].to_pylist()), w['node_ids'].to_pylist())"],
        capture_output=True, text=True, timeout=120)
    assert check.returncode == 0, check.stderr[-500:]
    assert "[1, 2, 3, 4] [[1, 2, 3, 4, 1]]" in check.stdout


def test_cli_curate_resume(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": ["the cat sat on the mat today fine",
                 "the cat sat on the mat today fine",   # exact dup -> drop
                 "the dog ran in the park and then home",
                 "benchmark sentence to remove from the training set"],
    })
    p = tmp_path / "docs.parquet"
    pq.write_table(docs, str(p))
    bench = tmp_path / "bench.txt"
    bench.write_text("benchmark sentence to remove from the training set\n")
    out = str(tmp_path / "curated")
    r1 = _run(["curate", str(p), out, "--benchmark", str(bench),
               "--max-overlap", "0.5", "--min-tokens", "1",
               "--jaccard-threshold", "0.9"])
    assert r1.returncode == 0, r1.stderr[-800:]
    assert "exact=1" in r1.stdout and "contaminated=1" in r1.stdout
    assert "rows_out=2" in r1.stdout
    r2 = _run(["curate", str(p), out, "--benchmark", str(bench),
               "--max-overlap", "0.5", "--min-tokens", "1",
               "--jaccard-threshold", "0.9"])
    assert r2.returncode == 0 and "skipped=['docs']" in r2.stdout


def test_cli_curate_images_resume(tmp_path):
    import numpy as np
    import pyarrow.parquet as pq

    from tests.test_image_pipeline import DE_CAP, EN_CAP, _hint
    rng = np.random.default_rng(51)
    base = [rng.integers(0, 256, (32, 32)).astype(np.uint8)
            for _ in range(4)]
    entries = [
        (0, base[0], "fpng", EN_CAP, 1.0, 1.0),
        (1, base[0], "fpng", EN_CAP, 1.0, 1.1),   # exact dup of 0
        (2, base[1], "fpng", DE_CAP, 1.0, 1.2),   # German caption
        (3, np.full((32, 32), 50, np.uint8),
         "fpng", EN_CAP, 1.0, 1.3),               # flat -> quality drop
        (4, base[2], "fpng", EN_CAP, 1.0, 1.4),   # keep
    ]
    p = tmp_path / "imgs.parquet"
    pq.write_table(_hint(entries), str(p))
    out = str(tmp_path / "curated")
    r1 = _run(["curate-images", str(p), out, "--resize-target", "16"])
    assert r1.returncode == 0, r1.stderr[-800:]
    assert "exact=1" in r1.stdout and "rows_out=2" in r1.stdout
    r2 = _run(["curate-images", str(p), out, "--resize-target", "16"])
    assert r2.returncode == 0 and "skipped=['imgs']" in r2.stdout


def test_cli_export_wds(tmp_path):
    import numpy as np
    import pyarrow.parquet as pq

    from tests.test_image_pipeline import EN_CAP, _hint
    rng = np.random.default_rng(53)
    entries = [(i, rng.integers(0, 256, (16, 16)).astype(np.uint8),
                "fpng", EN_CAP, 1.0, 1.0) for i in range(7)]
    p = tmp_path / "imgs.parquet"
    pq.write_table(_hint(entries), str(p))
    out = str(tmp_path / "wds")
    r = _run(["export-wds", str(p), out, "--rows-per-shard", "3"])
    assert r.returncode == 0, r.stderr[-800:]
    assert "rows=7" in r.stdout
    import json as _json
    man = _json.load(open(os.path.join(out, "_manifest.json")))
    assert sum(man["rows"]) == 7
    assert all(s.endswith(".tar") for s in man["shards"])


def test_cli_export_wds_packed_and_layout(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.test_image_pipeline import EN_CAP, _hint
    rng = np.random.default_rng(59)
    shapes = [(16, 16), (16, 32)]
    entries = [(i, rng.integers(0, 256, shapes[i % 2]).astype(np.uint8),
                "fpng", EN_CAP, 1.0, 1.0) for i in range(20)]
    p = tmp_path / "imgs.parquet"
    pq.write_table(_hint(entries), str(p))
    out = str(tmp_path / "packed")
    r = _run(["export-wds", str(p), out, "--pack-batch-size", "4",
              "--batches-per-shard", "2"])
    assert r.returncode == 0, r.stderr[-800:]
    man = json.load(open(os.path.join(out, "_manifest.json")))
    assert man["batch_size"] == 4
    # 10 per aspect bucket, batch 4 -> 8 kept per bucket
    assert sum(man["rows"]) == 16
    assert all(r % 4 == 0 for r in man["rows"])
    assert all(s.startswith("packed-ab") for s in man["shards"])

    # layout subcommand: clustered parquet, same rows back
    pts = tmp_path / "pts.parquet"
    n = 5000
    pq.write_table(pa.table({
        "id": np.arange(n, dtype=np.int64),
        "lon": rng.uniform(-180, 180, n),
        "lat": rng.uniform(-90, 90, n)}), str(pts))
    lay = str(tmp_path / "layout")
    r = _run(["layout", str(pts), lay, "--rows-per-group", "512"])
    assert r.returncode == 0, r.stderr[-800:]
    back = pq.read_table(lay)
    assert back.num_rows == n
    assert sorted(back.column_names) == ["id", "lat", "lon"]


def test_cli_curate_pii_flag(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    texts = ["the good and clear study of data " * 3 + f" filler {i}"
             for i in ("a", "b")]
    texts.append("the good clear mail me at a.b@example.com today ok")
    p = tmp_path / "docs.parquet"
    pq.write_table(pa.table({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": texts}), str(p))
    out = str(tmp_path / "cur")
    r = _run(["curate", str(p), out, "--redact-pii",
              "--jaccard-threshold", "0.99"])
    assert r.returncode == 0, r.stderr[-800:]
    assert "model=0" in r.stdout
    shard = os.path.join(out, "docs")
    kept = pa.concat_tables([
        pq.read_table(os.path.join(shard, f))
        for f in os.listdir(shard) if f.endswith(".parquet")])
    joined = " ".join(kept["text"].to_pylist())
    assert "[EMAIL]" in joined and "a.b@example.com" not in joined


CLIP_POLY = "clipbox\n1\n-1 -1\n6 -1\n6 11\n-1 11\nEND\nEND\n"


def test_cli_clip(tmp_path):
    import pyarrow.parquet as pq

    xml = tmp_path / "1.osm"
    xml.write_text(FIXTURE_XML)
    poly = tmp_path / "clip.poly"
    poly.write_text(CLIP_POLY)
    out = str(tmp_path / "pieces")
    r = _run(["clip", str(xml), str(poly), out])
    assert r.returncode == 0, r.stderr[-800:]
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert files
    t = pq.read_table(out)
    assert sorted(t.column_names) == ["lats", "lons", "n_pts",
                                      "piece", "way_id"]
    # way 1 (the 1-2-3-4-1 ring polyline) crosses the triangle's
    # boundary: at least one piece, every piece >= 2 points, and all
    # piece midpoints are inside the polygon
    import numpy as np

    from osm_cut_ray.geometry.polygon import PolygonIndex, parse_poly_text
    pol = PolygonIndex.compile(parse_poly_text(CLIP_POLY))
    assert t.num_rows >= 2          # way 1 leaves and re-enters the box
    for i in range(t.num_rows):
        xs = np.asarray(t["lons"][i].as_py())
        ys = np.asarray(t["lats"][i].as_py())
        assert len(xs) >= 2
        mx, my = (xs[:-1] + xs[1:]) / 2, (ys[:-1] + ys[1:]) / 2
        assert pol.contains(mx, my).all()


def test_cli_curate_boilerplate_and_lm(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    boiler = "COPYRIGHT FOOTER APPLIES TO EVERYTHING HERE"
    texts = [f"some sensible document body number {i}\n{boiler}"
             for i in range(10)]
    ids = np.arange(10, dtype=np.int64)
    p = str(tmp_path / "shard_x.parquet")
    pq.write_table(pa.table({"doc_id": ids, "text": texts}), p)
    out = str(tmp_path / "out")
    r = _run(["curate", p, out, "--langs", "en,de,fr,es,zh",
              "--min-tokens", "1", "--max-dup-line-frac", "1.0",
              "--max-top-bigram-frac", "1.0",
              "--jaccard-threshold", "0.99",
              "--drop-boilerplate", "--boilerplate-min-df", "4",
              "--lm-max-xent", "99.0"])
    assert r.returncode == 0, r.stderr[-800:]
    assert "hot_lines=1" in r.stdout and "lm=0" in r.stdout
    kept = pa.concat_tables([
        pq.read_table(os.path.join(out, "shard_x", f))
        for f in os.listdir(os.path.join(out, "shard_x"))
        if f.endswith(".parquet")])
    assert kept.num_rows == 10
    assert all(boiler not in t for t in kept["text"].to_pylist())


def test_cli_pack_seqs(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = [" ".join(f"tok{j}" for j in range(20)) for _ in range(40)]
    ids = np.arange(40, dtype=np.int64)
    p = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({"doc_id": ids, "text": texts}), p)
    out = str(tmp_path / "packed")
    r = _run(["pack-seqs", p, out, "--seq-len", "64"])
    assert r.returncode == 0, r.stderr[-800:]
    t = pq.read_table(out)
    # 40 docs x 21 tokens (incl EOS) = 840 tokens -> 13 full sequences
    assert t.num_rows == 13
    assert sorted(t.column_names) == ["seq_id", "tokens"]
    assert all(len(x) == 64 for x in t["tokens"].to_pylist())


def test_cli_cut_multi(tmp_path):
    xml = tmp_path / "1.osm"
    xml.write_text(FIXTURE_XML)
    p1 = tmp_path / "simple.poly"
    p1.write_text(SIMPLE_POLY)
    # a second region covering everything
    p2 = tmp_path / "world.poly"
    p2.write_text("world\n1\n-180 -90\n180 -90\n180 90\n-180 90\n"
                  "END\nEND\n")
    out = str(tmp_path / "regions")
    r = _run(["cut-multi", str(xml), out,
              "--polygon", str(p1), "--polygon", str(p2)])
    assert r.returncode == 0, r.stderr[-800:]
    assert "region simple: nodes=4, ways=1, relations=3" in r.stdout
    assert "region world: nodes=6, ways=2, relations=4" in r.stdout
    simple = (tmp_path / "regions" / "simple.osm").read_text()
    # identical golden set to the single-cut CLI test
    assert '<node id="4"' in simple and '<node id="5"' not in simple
    assert simple.count("<relation") == 3
    world = (tmp_path / "regions" / "world.osm").read_text()
    assert world.count("<node") == 6 and world.count("<relation") == 4


def test_cli_report(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = ["the and of to in is words here"] * 8 + ["einzig der satz"]
    p = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts}), p)
    r = _run(["report", p])
    assert r.returncode == 0, r.stderr[-800:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["n_docs"] == 9
    assert rep["n_tokens"] == 8 * 8 + 3
    assert rep["dup_rate_est"] > 0.5


def test_cli_cut_way_tag_filter(tmp_path):
    xml = tmp_path / "1.osm"
    xml.write_text(FIXTURE_XML)
    poly = tmp_path / "world.poly"
    poly.write_text("world\n1\n-180 -90\n180 -90\n180 90\n-180 90\n"
                    "END\nEND\n")
    out = tmp_path / "out.osm"
    # way 1 has highway=service; way 2 has no tags -> dropped pre-cut
    r = _run(["cut", str(xml), str(poly), str(out),
              "--way-tag", "highway=service"])
    assert r.returncode == 0, r.stderr[-800:]
    text = out.read_text()
    assert '<way id="1"' in text and '<way id="2"' not in text
    # presence-only form keeps the same single tagged way
    out2 = tmp_path / "out2.osm"
    r2 = _run(["cut", str(xml), str(poly), str(out2),
               "--way-tag", "highway"])
    assert r2.returncode == 0, r2.stderr[-800:]
    t2 = out2.read_text()
    assert '<way id="1"' in t2 and '<way id="2"' not in t2


def test_cli_diff(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    old = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                    "v": pa.array([10, 20, 30])})
    new = pa.table({"id": pa.array([2, 3, 4], pa.int64()),
                    "v": pa.array([20, 99, 40])})
    po = str(tmp_path / "old.parquet")
    pn = str(tmp_path / "new.parquet")
    pq.write_table(old, po)
    pq.write_table(new, pn)
    out = str(tmp_path / "changes")
    r = _run(["diff", po, pn, "--output", out])
    assert r.returncode == 0, r.stderr[-800:]
    assert "added: 1" in r.stdout and "removed: 1" in r.stdout
    assert "modified: 1" in r.stdout
    got = pq.read_table(out).to_pylist() if os.path.isfile(out) else \
        __import__("pyarrow.dataset", fromlist=["dataset"]) \
        .dataset(out).to_table().to_pylist()
    changes = {row["id"]: row["change"] for row in got}
    assert changes == {1: "removed", 3: "modified", 4: "added"}

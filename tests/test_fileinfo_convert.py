import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _synth_corpus(seed=4):
    rng = np.random.default_rng(seed)
    n = 5000
    nodes = pa.table({
        "id": pa.array(np.arange(1, n + 1, dtype=np.int64)),
        "lon": pa.array(rng.uniform(-30, 60, n)),
        "lat": pa.array(rng.uniform(-10, 50, n)),
        "uid": pa.array(rng.integers(1, 301, n).astype(np.int64)),
        "version": pa.array(rng.integers(1, 9, n).astype(np.int64)),
        "timestamp": pa.array(
            [f"2021-0{1 + i % 9}-01T00:00:0{i % 10}Z"
             for i in range(n)], pa.large_string()),
        "tags": pa.array(
            [[("k", "v")] if i % 7 == 0 else []
             for i in range(n)],
            pa.map_(pa.large_string(), pa.large_string()))})
    ways = pa.table({
        "id": pa.array(np.arange(100, 200, dtype=np.int64)),
        "uid": pa.array(rng.integers(1, 51, 100).astype(np.int64)),
        "tags": pa.array([[("highway", "x")] for _ in range(100)],
                         pa.map_(pa.large_string(),
                                 pa.large_string()))})
    rels = pa.table({
        "id": pa.array(np.arange(7, 10, dtype=np.int64))})
    return nodes, ways, rels


def test_corpus_info_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from osm_cut_ray.stages.fileinfo import corpus_info, format_info

    nodes_t, ways_t, rels_t = _synth_corpus()
    info = corpus_info(rd.from_arrow(nodes_t).repartition(9),
                       rd.from_arrow(ways_t).repartition(3),
                       rd.from_arrow(rels_t))
    con = duckdb.connect()
    con.register("nodes", nodes_t.select(
        ["id", "lon", "lat", "uid", "version", "timestamp"]))
    r = con.execute(
        "SELECT count(*), min(id), max(id), min(lon), max(lon), "
        "min(lat), max(lat), min(timestamp), max(timestamp), "
        "max(version), count(DISTINCT uid) FROM nodes").fetchone()
    nd = info["nodes"]
    assert nd["count"] == r[0]
    assert nd["id_min"] == r[1] and nd["id_max"] == r[2]
    assert nd["lon_min"] == r[3] and nd["lon_max"] == r[4]
    assert nd["lat_min"] == r[5] and nd["lat_max"] == r[6]
    assert nd["ts_min"] == r[7] and nd["ts_max"] == r[8]
    assert nd["ver_max"] == r[9]
    # HLL estimate within 5% of the exact distinct-user count
    assert abs(nd["users_est"] - r[10]) <= 0.05 * r[10]
    # tag entries: one per 7th node
    assert nd["n_tags"] == sum(1 for i in range(5000) if i % 7 == 0)
    assert info["ways"]["count"] == 100
    assert info["ways"]["n_tags"] == 100
    assert info["relations"]["count"] == 3
    assert info["bbox"] == (nd["lon_min"], nd["lat_min"],
                            nd["lon_max"], nd["lat_max"])
    txt = format_info(info)
    assert "Number of nodes: 5000" in txt
    assert "Bounding box" in txt


def test_fileinfo_on_fixture_corpus(ray_session):
    import ray.data as rd

    from osm_cut_ray.sources.osm_fixture import (fixture_nodes,
                                                 fixture_relations,
                                                 fixture_ways)
    from osm_cut_ray.stages.fileinfo import corpus_info

    info = corpus_info(rd.from_arrow(fixture_nodes()),
                       rd.from_arrow(fixture_ways()),
                       rd.from_arrow(fixture_relations()))
    assert info["nodes"]["count"] == 6
    assert info["bbox"] == (0.0, 0.0, 15.0, 15.0)
    assert info["nodes"]["ts_min"] is None
    assert info["nodes"]["users_est"] == 0


def test_convert_roundtrip_parquet_csv(ray_session, tmp_path):
    import duckdb

    from osm_cut_ray.sources.tables import convert_table

    src = "/root/testdata/sf0.001/orders.parquet"
    csv_dir = str(tmp_path / "csv")
    pq_dir = str(tmp_path / "pq")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus"]
    convert_table(src, csv_dir, to="csv", columns=cols)
    convert_table(csv_dir, pq_dir, to="parquet")

    con = duckdb.connect()
    want = con.execute(
        f"SELECT * FROM read_parquet('{src}') ORDER BY o_orderkey"
    ).fetch_arrow_table().select(cols)
    files = [os.path.join(pq_dir, f) for f in os.listdir(pq_dir)
             if f.endswith(".parquet")]
    got = pa.concat_tables([pq.read_table(f) for f in files])
    got = got.sort_by("o_orderkey").select(cols)
    assert got.num_rows == want.num_rows
    for c in cols:
        assert got[c].to_pylist() == want[c].to_pylist()


def test_convert_jsonl_and_csv_refusal(ray_session, tmp_path):
    import pytest

    from osm_cut_ray.sources.tables import convert_table

    src = "/root/testdata/sf0.001/nation.parquet"
    jl_dir = str(tmp_path / "jl")
    pq_dir = str(tmp_path / "pq2")
    convert_table(src, jl_dir, to="jsonl")
    convert_table(jl_dir, pq_dir, to="parquet")
    files = [os.path.join(pq_dir, f) for f in os.listdir(pq_dir)
             if f.endswith(".parquet")]
    got = pa.concat_tables([pq.read_table(f) for f in files])
    want = pq.read_table(src)
    assert got.num_rows == want.num_rows
    assert got.sort_by("n_nationkey")["n_name"].to_pylist() == \
        want.sort_by("n_nationkey")["n_name"].to_pylist()

    # list<float> columns must be refused by the CSV sink
    with pytest.raises(ValueError, match="non-CSV-representable"):
        convert_table("/root/testdata/sf0.001/embeddings.parquet",
                      str(tmp_path / "bad"), to="csv")


def test_fileinfo_cli(ray_session, tmp_path, capsys):
    import ray.data as rd

    from osm_cut_ray.cli import main
    from osm_cut_ray.sources.osm_fixture import (fixture_nodes,
                                                 fixture_relations,
                                                 fixture_ways)

    corpus = str(tmp_path / "corpus")
    for name, t in (("nodes", fixture_nodes()),
                    ("ways", fixture_ways()),
                    ("relations", fixture_relations())):
        rd.from_arrow(t).write_parquet(os.path.join(corpus, name))
    rc = main(["fileinfo", corpus])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Number of nodes: 6" in out
    assert "Number of ways: 2" in out
    assert "Bounding box" in out

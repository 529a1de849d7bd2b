

def test_compression_stats_separates_junk(ray_session):
    import zlib

    import pyarrow as pa
    import ray.data as rd

    from osm_cut_ray.stages.text import compression_stats

    docs = [
        {"doc_id": 0, "text": "spam " * 400},                # repetitive
        {"doc_id": 1, "text": ("The quick brown fox jumps over the "
                               "lazy dog while seventeen violinists "
                               "argue about breakfast pastries and "
                               "the weather in distant harbors. ") * 6},
        {"doc_id": 2, "text": ""},                           # empty
    ]
    out = rd.from_items(docs).map_batches(
        compression_stats, batch_format="pyarrow")
    got = {r["doc_id"]: r["compress_ratio"] for r in out.take_all()}
    # exact definition replay
    for d in docs:
        raw = d["text"].encode()
        exp = len(zlib.compress(raw, 6)) / len(raw) if raw else 1.0
        assert got[d["doc_id"]] == exp
    assert got[0] < 0.05 < got[1] < 0.9
    assert got[2] == 1.0

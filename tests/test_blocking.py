import numpy as np
import pyarrow as pa


def _pairs(ds):
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return set(zip(t["a_id"].to_pylist(), t["b_id"].to_pylist()))


def _brute(recs, window):
    order = sorted(recs, key=lambda r: (r[1], r[0]))
    ids = [r[0] for r in order]
    out = set()
    for i in range(len(ids)):
        for d in range(1, window):
            if i + d < len(ids):
                out.add((ids[i], ids[i + d]))
    return out


def test_snm_pairs_match_brute(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.blocking import sorted_neighborhood_pairs

    rng = np.random.default_rng(55)
    names = ["smith", "smyth", "jones", "jonas", "garcia", "garzia",
             "lee", "leigh", "chen", "chan", "kumar", "kumaar"]
    recs = []
    for i in range(600):
        base = names[int(rng.integers(0, len(names)))]
        # typo-ish variants and duplicates
        suffix = "" if rng.uniform() < 0.5 else \
            chr(ord("a") + int(rng.integers(0, 26)))
        recs.append((i, base + suffix))

    ds = rd.from_items([{"rid": i, "name": k} for i, k in recs]) \
        .repartition(8)
    for window in (3, 6):
        for nb in (1, 4, 9):
            got = _pairs(sorted_neighborhood_pairs(
                ds, id_col="rid", key_col="name", window=window,
                num_buckets=nb))
            assert got == _brute(recs, window), (window, nb)


def test_snm_tiny_bucket_raises(ray_session):
    import pytest
    import ray.data as rd

    from osm_cut_ray.stages.blocking import sorted_neighborhood_pairs

    # a dominant pile captures every quantile split, stranding the
    # few keys below it in a bucket smaller than the window
    recs = [(i, chr(ord("a") + i) * 3) for i in range(5)] + \
        [(100 + i, "mmm") for i in range(995)]
    ds = rd.from_items([{"rid": i, "name": k} for i, k in recs])
    with pytest.raises(Exception, match="span 3"):
        sorted_neighborhood_pairs(
            ds, id_col="rid", key_col="name", window=10,
            num_buckets=32).materialize()


def test_snm_single_bucket_exact(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.blocking import sorted_neighborhood_pairs

    recs = [(i, f"key{i:03d}") for i in range(40)]
    ds = rd.from_items([{"rid": i, "name": k} for i, k in recs])
    got = _pairs(sorted_neighborhood_pairs(
        ds, id_col="rid", key_col="name", window=4, num_buckets=1))
    assert got == _brute(recs, 4)

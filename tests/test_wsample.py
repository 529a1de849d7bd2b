import numpy as np
import pyarrow as pa


def _collect(ds):
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.to_pandas()


def test_weighted_sample_matches_brute(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.wsample import (uniform_hash,
                                            weighted_sample_per_key)

    rng = np.random.default_rng(5)
    rows = []
    for key in range(8):
        n = int(rng.integers(3, 60))
        for _ in range(n):
            rows.append((key, len(rows) + 1000,
                         float(rng.uniform(0.1, 5.0))))
    ds = rd.from_items([{"grp": k, "rid": i, "w": w}
                        for k, i, w in rows]).repartition(8)
    got = _collect(weighted_sample_per_key(
        ds, key_col="grp", id_col="rid", weight_col="w", k=5,
        seed=42))

    # independent brute with the same hash formula
    by_key = {}
    for k, i, w in rows:
        u = float(uniform_hash(np.array([i], np.int64), 42)[0])
        by_key.setdefault(k, []).append((np.log(u) / w, -i, i, w))
    exp = set()
    for k, lst in by_key.items():
        lst.sort(reverse=True)
        for prio, _, i, w in lst[:5]:
            exp.add((k, i))
    assert set(zip(got["key"], got["id"])) == exp
    # per-key count caps at k
    assert got.groupby("key").size().max() <= 5


def test_weighted_sample_determinism_and_weights(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.wsample import weighted_sample_per_key

    n = 4000
    ids = np.arange(n, dtype=np.int64)
    # half the rows carry 10x the weight
    w = np.where(ids % 2 == 0, 10.0, 1.0)
    t = pa.table({"g": pa.array(np.zeros(n, np.int64)),
                  "rid": pa.array(ids), "w": pa.array(w)})
    r1 = _collect(weighted_sample_per_key(
        rd.from_arrow(t).repartition(4), key_col="g", id_col="rid",
        weight_col="w", k=400, seed=7))
    r2 = _collect(weighted_sample_per_key(
        rd.from_arrow(t).repartition(13), key_col="g", id_col="rid",
        weight_col="w", k=400, seed=7))
    # bit-identical under different partitioning
    key = ["key", "id"]
    assert r1.sort_values(key).reset_index(drop=True).equals(
        r2.sort_values(key).reset_index(drop=True))
    # heavy rows dominate the sample (10:1 odds -> expect >> 50%)
    frac_heavy = (r1["id"] % 2 == 0).mean()
    assert frac_heavy > 0.75

    # zero/negative weights never sample
    t2 = pa.table({"g": pa.array(np.zeros(4, np.int64)),
                   "rid": pa.array([1, 2, 3, 4], pa.int64()),
                   "w": pa.array([0.0, -1.0, 2.0, 2.0])})
    r3 = _collect(weighted_sample_per_key(
        rd.from_arrow(t2), key_col="g", id_col="rid",
        weight_col="w", k=10, seed=1))
    assert sorted(r3["id"].tolist()) == [3, 4]

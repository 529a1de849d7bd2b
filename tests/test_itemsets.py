from collections import Counter
from itertools import combinations

import numpy as np
import pyarrow as pa


def _rows(baskets):
    out = []
    for b, items in baskets.items():
        for x in items:
            out.append({"order": int(b), "part": int(x)})
    return out


def _synth_baskets(seed=7, n=200, vocab=30):
    rng = np.random.default_rng(seed)
    baskets = {}
    for b in range(n):
        size = int(rng.integers(2, 9))
        baskets[b] = set(rng.integers(0, vocab, size).tolist())
    # plant a frequent bundle {3, 11, 22} in 40 baskets
    for b in range(0, 120, 3):
        baskets[b] |= {3, 11, 22}
    return baskets


def _brute_freq(baskets, s_abs, max_len=3):
    counts = Counter()
    for items in baskets.values():
        s = sorted(items)
        for k in range(1, max_len + 1):
            for c in combinations(s, k):
                counts[c] += 1
    return {c: v for c, v in counts.items() if v >= s_abs}


def _freq_map(ds):
    bs = [pa.table(b)
          for b in ds.iter_batches(batch_format="pyarrow")]
    if not bs:
        return {}
    t = pa.concat_tables(bs)
    return {tuple(i): s for i, s in
            zip(t["items"].to_pylist(), t["support"].to_pylist())}


def test_frequent_itemsets_match_brute(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.itemsets import frequent_itemsets

    baskets = _synth_baskets()
    want = _brute_freq(baskets, 30)
    ds = rd.from_items(_rows(baskets))
    got = _freq_map(frequent_itemsets(
        ds, basket_col="order", item_col="part", min_support=30))
    assert got == want
    assert (3, 11, 22) in got  # the planted bundle survives
    # partition invariance
    got2 = _freq_map(frequent_itemsets(
        ds.repartition(11), basket_col="order", item_col="part",
        min_support=30))
    assert got2 == want
    # fraction form is the ceil-equivalent absolute threshold
    got3 = _freq_map(frequent_itemsets(
        ds, basket_col="order", item_col="part",
        min_support=30 / len(baskets)))
    assert got3 == want


def test_frequent_pairs_match_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from osm_cut_ray.stages.itemsets import frequent_itemsets

    baskets = _synth_baskets(seed=13)
    rows = _rows(baskets)
    ds = rd.from_items(rows)
    got = _freq_map(frequent_itemsets(
        ds, basket_col="order", item_col="part", min_support=25,
        max_len=2))
    t = pa.table({
        "b": pa.array([r["order"] for r in rows], pa.int64()),
        "x": pa.array([r["part"] for r in rows], pa.int64())})
    con = duckdb.connect()
    con.register("t", t)
    sql = """
      WITH d AS (SELECT DISTINCT b, x FROM t)
      SELECT a.x AS i1, c.x AS i2, count(*) AS s
      FROM d a JOIN d c ON a.b = c.b AND a.x < c.x
      GROUP BY 1, 2 HAVING count(*) >= 25
    """
    want_pairs = {(int(r[0]), int(r[1])): int(r[2])
                  for r in con.execute(sql).fetchall()}
    got_pairs = {k: v for k, v in got.items() if len(k) == 2}
    assert got_pairs == want_pairs


def test_association_rules_match_brute(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.itemsets import (association_rules,
                                             frequent_itemsets)

    baskets = _synth_baskets()
    n = len(baskets)
    ds = rd.from_items(_rows(baskets))
    freq = frequent_itemsets(
        ds, basket_col="order", item_col="part", min_support=30)
    rules = association_rules(freq, n_baskets=n,
                              min_confidence=0.6)
    bs = [pa.table(b)
          for b in rules.iter_batches(batch_format="pyarrow")]
    got = {}
    if bs:
        t = pa.concat_tables(bs)
        for a, c, s, cf, lf in zip(
                t["antecedent"].to_pylist(),
                t["consequent"].to_pylist(),
                t["support"].to_pylist(),
                t["confidence"].to_pylist(),
                t["lift"].to_pylist()):
            got[(tuple(a), tuple(c))] = (s, cf, lf)

    smap = _brute_freq(baskets, 30)
    want = {}
    for s, v in smap.items():
        if len(s) < 2:
            continue
        for r in range(1, len(s)):
            for ante in combinations(s, r):
                cons = tuple(x for x in s if x not in ante)
                conf = v / smap[ante]
                if conf >= 0.6:
                    want[(ante, cons)] = (
                        v, conf, conf / (smap[cons] / n))
    assert got == want
    assert got  # the planted bundle yields at least one rule


def test_itemsets_basket_cap_raises(ray_session):
    import pytest
    import ray.data as rd

    from osm_cut_ray.stages.itemsets import frequent_itemsets

    rows = [{"order": 1, "part": i} for i in range(100)]
    ds = rd.from_items(rows)
    with pytest.raises(RuntimeError, match="max_basket_items"):
        frequent_itemsets(ds, basket_col="order", item_col="part",
                          min_support=1, max_basket_items=10)


def test_itemsets_empty(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.itemsets import frequent_itemsets

    ds = rd.from_items([{"order": 1, "part": 2}]).filter(
        lambda r: False)
    out = frequent_itemsets(ds, basket_col="order",
                            item_col="part", min_support=2)
    assert out.count() == 0

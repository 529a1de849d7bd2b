import numpy as np
import pyarrow as pa
import pytest

BASES = ["robert", "ruprecht", "martinez", "gonzales", "schmidt",
         "okafor", "tanaka", "lindqvist", "petrov", "almeida"]
VOWEL = {"a": "e", "e": "a", "i": "y", "o": "u", "u": "o",
         "y": "i"}


def _typo(name: str, which: int) -> str:
    """Vowel swaps keep soundex AND the 4-char prefix when past
    position 3, so planted variants stay adjacent in the sort."""
    vowels = [i for i, c in enumerate(name) if c in VOWEL and i >= 4]
    if not vowels:
        return name + "e"
    i = vowels[which % len(vowels)]
    return name[:i] + VOWEL[name[i]] + name[i + 1:]


def _corpus(seed=3, n_noise=120):
    rng = np.random.default_rng(seed)
    names, groups = [], []
    for g, base in enumerate(BASES):
        names.append(base)
        groups.append(g)
        for v in range(2):
            names.append(_typo(base, v))
            groups.append(g)
    for _ in range(n_noise):
        names.append("".join(
            chr(97 + c) for c in rng.integers(0, 26, 9)))
        groups.append(-1)
    ids = np.arange(len(names), dtype=np.int64) * 3 + 11
    return ids, names, np.array(groups)


def _ds(ids, names, parts):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "id": pa.array(ids),
        "name": pa.array(names, pa.string())})).repartition(parts)


def test_er_pipeline_matches_brute_spec(ray_session):
    from osm_cut_ray.pipelines.entity_resolution import (
        resolve_entities, resolve_entities_brute)

    ids, names, groups = _corpus()
    exp = resolve_entities_brute(ids, names, window=6, d_max=2)

    for parts in (2, 9):
        got = resolve_entities(_ds(ids, names, parts),
                               window=6, d_max=2)
        gp = got["pairs"].to_pandas().sort_values(
            ["a_id", "b_id"]).reset_index(drop=True)
        ep = exp["pairs"].to_pandas().sort_values(
            ["a_id", "b_id"]).reset_index(drop=True)
        assert gp.equals(ep)
        gc = got["clusters"].to_pandas().sort_values(
            "doc_id").reset_index(drop=True)
        ec = exp["clusters"].to_pandas().sort_values(
            "doc_id").reset_index(drop=True)
        assert gc.equals(ec)
        assert got["n_candidates"] > 0


def test_er_recovers_planted_groups(ray_session):
    from osm_cut_ray.pipelines.entity_resolution import \
        resolve_entities

    ids, names, groups = _corpus()
    got = resolve_entities(_ds(ids, names, 4), window=6, d_max=2)
    cl = got["clusters"].to_pandas().set_index("doc_id")["cluster_id"]
    for g in range(len(BASES)):
        members = ids[groups == g]
        assert set(members).issubset(set(cl.index)), g
        assert len(set(cl.loc[members])) == 1, g
    # distinct base-name groups never merge
    reps = [cl.loc[ids[groups == g][0]] for g in range(len(BASES))]
    assert len(set(reps)) == len(BASES)


def test_er_no_matches_and_guards(ray_session):
    from osm_cut_ray.pipelines.entity_resolution import \
        resolve_entities

    ids = np.arange(6, dtype=np.int64)
    names = ["aaaaaaa", "bzzzzzq", "cmmmmmx", "dqqqqqj",
             "evvvvvk", "fwwwwwp"]
    got = resolve_entities(_ds(ids, names, 2), window=4, d_max=1)
    assert got["pairs"].num_rows == 0
    assert got["clusters"].num_rows == 0

    with pytest.raises(ValueError, match="phonetic"):
        resolve_entities(_ds(ids, names, 2), phonetic="metaphone")
    dup_names = ["samesame"] * 6
    with pytest.raises(ValueError, match="max_pairs"):
        resolve_entities(_ds(ids, dup_names, 2), window=6,
                         d_max=2, max_pairs=3)

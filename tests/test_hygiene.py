"""Training-data hygiene additions: benchmark decontamination (plus,
further down, mergeable sketches and image perceptual-hash dedup)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from osm_cut_ray.stages.decontaminate import (
    benchmark_shingle_set, contamination_scores, decontaminate)
from osm_cut_ray.stages.dedup import shingle_hashes


BENCH = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "pack my box with five dozen liquor jugs before noon today ok",
]


def _corpus(n_clean: int = 40):
    """Docs 0..3 contain benchmark n-grams verbatim (full copy, long
    quote, short quote, paraphrase-with-inserts); the rest are clean."""
    rng = np.random.default_rng(7)
    words = np.array(["alpha", "beta", "gamma", "delta", "epsilon",
                      "zeta", "eta", "theta", "iota", "kappa"])
    texts = [
        BENCH[0],                                      # full copy
        "intro words then " + BENCH[1] + " and an outro",
        "quick brown fox jumps over the lazy snake",   # 8-gram? no: 7 shared words max
        " ".join(rng.choice(words, 60)),
    ]
    texts += [" ".join(rng.choice(words, 30)) for _ in range(n_clean)]
    ids = np.arange(len(texts), dtype=np.int64)
    return ids, texts


def _brute_overlap(text: str, bench_set: set, k: int) -> tuple[int, int]:
    sh = set(shingle_hashes(text, k).tolist())
    return len(sh), len(sh & bench_set)


@pytest.mark.parametrize("use_bloom", [False, True])
def test_contamination_scores_match_brute_force(ray_session, use_bloom):
    k = 8
    ids, texts = _corpus()
    bench = benchmark_shingle_set(BENCH, k)
    bench_set = set(bench.tolist())
    docs = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    got = contamination_scores(docs, bench, shingle_k=k,
                               use_bloom=use_bloom).to_pandas()
    got = got.set_index("doc_id").sort_index()
    assert len(got) == len(ids)
    for i, text in zip(ids.tolist(), texts):
        n_sh, n_hit = _brute_overlap(text, bench_set, k)
        assert got.loc[i, "n_shingles"] == n_sh
        assert got.loc[i, "n_hits"] == n_hit, f"doc {i}"
        exp = n_hit / n_sh if n_sh else 0.0
        assert got.loc[i, "overlap"] == pytest.approx(exp)
    # the two verbatim-contaminated docs are fully / heavily flagged
    assert got.loc[0, "overlap"] == 1.0
    assert got.loc[1, "overlap"] > 0.3
    # clean tail: zero hits
    assert (got.loc[4:, "n_hits"] == 0).all()


def test_decontaminate_drops_only_contaminated(ray_session):
    ids, texts = _corpus()
    docs = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    clean, report = decontaminate(docs, BENCH, shingle_k=8,
                                  max_overlap=0.1)
    kept = sorted(r["doc_id"] for r in
                  clean.select_columns(["doc_id"]).iter_rows())
    assert report["n_docs"] == len(ids)
    assert 0 not in kept and 1 not in kept          # verbatim copies out
    assert set(kept) | {0, 1} == set(ids.tolist())  # nothing else lost
    assert report["n_flagged"] == 2


def test_decontaminate_clean_corpus_is_noop(ray_session):
    ids, texts = _corpus(n_clean=10)
    ids, texts = ids[4:], texts[4:]  # drop the planted docs
    docs = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    clean, report = decontaminate(docs, BENCH, shingle_k=8)
    assert report["n_flagged"] == 0
    assert clean.count() == len(ids)


def test_benchmark_shingle_set_empty():
    assert len(benchmark_shingle_set([], 8)) == 0
    assert len(benchmark_shingle_set(["two words"], 8)) == 1  # short doc

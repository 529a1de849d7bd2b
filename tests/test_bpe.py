"""BPE fit/encode pinned against (a) a recompute-from-scratch brute
force (so the incremental pair-count maintenance cannot drift) and
(b) the worked example from Sennrich et al. 2016 §3.2."""

from collections import Counter

import numpy as np
import pytest

from osm_cut_ray.stages.bpe import (BPEModel, bpe_encode, encode_word,
                                    fit_bpe, word_counts)


def _brute_fit(wc: dict[str, int], num_merges: int,
               min_pair_count: int = 2):
    """Recompute every pair count from scratch each round; same
    (count desc, pair asc) tie-break."""
    syms = {w: tuple(w) + ("</w>",) for w in wc}
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for w, c in wc.items():
            ws = syms[w]
            for p in zip(ws[:-1], ws[1:]):
                pc[p] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pc[best] < min_pair_count:
            break
        merges.append(best)
        for w in wc:
            ws, out, i = syms[w], [], 0
            while i < len(ws):
                if i < len(ws) - 1 and (ws[i], ws[i + 1]) == best:
                    out.append(ws[i] + ws[i + 1])
                    i += 2
                else:
                    out.append(ws[i])
                    i += 1
            syms[w] = tuple(out)
    return merges, syms


def _docs_ds(docs: list[str], parts: int = 4):
    import ray
    return ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(docs)])\
        .repartition(parts)


def _corpus_wc(docs: list[str]) -> dict[str, int]:
    c = Counter()
    for t in docs:
        c.update(t.split())
    return dict(c)


def test_sennrich_worked_example(ray_session):
    # the paper's vocab {low:5, lower:2, newest:6, widest:3} learns
    # e+s, es+t, est+</w>, l+o as its first merges
    docs = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6
            + ["widest"] * 3)
    m = fit_bpe(_docs_ds(docs), num_merges=4)
    assert m.merges == [("e", "s"), ("es", "t"), ("est", "</w>"),
                        ("l", "o")]
    assert encode_word("newest", m.ranks) == ["n", "e", "w", "est</w>"]
    assert encode_word("lowest", m.ranks) == ["lo", "w", "est</w>"]


def test_fit_matches_brute_and_partition_invariant(ray_session):
    rng = np.random.default_rng(7)
    vocab = ["spark", "sorting", "sorted", "batching", "batch",
             "stream", "streams", "parting", "partition", "scan"]
    docs = [" ".join(rng.choice(vocab, int(rng.integers(3, 20))))
            for _ in range(40)]
    want, syms = _brute_fit(_corpus_wc(docs), 30)
    got2 = fit_bpe(_docs_ds(docs, parts=2), num_merges=30)
    got7 = fit_bpe(_docs_ds(docs, parts=7), num_merges=30)
    assert got2.merges == want
    assert got7.merges == want
    # rank-greedy encode reproduces the fit loop's final segmentation
    # for every training word
    for w in _corpus_wc(docs):
        assert encode_word(w, got2.ranks) == list(syms[w])


def test_encode_dataset_matches_driver_and_ids(ray_session):
    docs = ["low lower", "newest widest lowest", "", "low"]
    fit_docs = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6
                + ["widest"] * 3)
    m = fit_bpe(_docs_ds(fit_docs), num_merges=6)
    out = bpe_encode(_docs_ds(docs), m, emit_ids=True).to_pandas()\
        .sort_values("doc_id").reset_index(drop=True)
    v = m.vocab()
    for i, text in enumerate(docs):
        want = [s for w in text.split() for s in encode_word(w, m.ranks)]
        assert list(out.tokens[i]) == want
        assert out.n_bpe_tokens[i] == len(want)
        assert list(out.token_ids[i]) == [v.get(s, -1) for s in want]
    # every training-derived token is in-vocab; ids round-trip
    assert all(i >= 0 for row in out.token_ids for i in row)


def test_word_counts_min_count_and_cap(ray_session):
    docs = ["a a a b", "b c"]
    w, c = word_counts(_docs_ds(docs))
    assert dict(zip(w, c)) == {"a": 3, "b": 2, "c": 1}
    w, c = word_counts(_docs_ds(docs), min_word_count=2)
    assert dict(zip(w, c)) == {"a": 3, "b": 2}
    with pytest.raises(ValueError, match="max_unique_words"):
        word_counts(_docs_ds(docs), max_unique_words=1)


def test_min_pair_count_stops_and_save_load(ray_session, tmp_path):
    docs = ["ab ab", "cd"]  # ('a','b') count 2; everything else 1
    m = fit_bpe(_docs_ds(docs), num_merges=10, min_pair_count=2)
    assert m.merges[0] == ("a", "b")
    # after ab</w> (count 2) no pair reaches 2 again
    assert len(m.merges) == 2 and m.merges[1] == ("ab", "</w>")
    p = str(tmp_path / "bpe.json")
    m.save(p)
    m2 = BPEModel.load(p)
    assert m2 == BPEModel(merges=m.merges, base_symbols=m.base_symbols)
    assert m2.vocab() == m.vocab()


def test_empty_and_degenerate(ray_session):
    m = fit_bpe(_docs_ds(["", ""]), num_merges=5)
    assert m.merges == []
    out = bpe_encode(_docs_ds(["x y", ""]), m).to_pandas()
    assert sorted(out.n_bpe_tokens) == [0, 4]  # singletons + </w>

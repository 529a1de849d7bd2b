"""Training-data hygiene additions: benchmark decontamination (plus,
further down, mergeable sketches and image perceptual-hash dedup)."""

import os

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


# ------------------------------------------------------------- sketches

def _zipf_keys(n=200_000, seed=3):
    rng = np.random.default_rng(seed)
    return rng.zipf(1.3, n).astype(np.int64) % 10_000


def test_countmin_bounds_and_linearity():
    from osm_cut_ray.functions.sketch import CountMin
    keys = _zipf_keys()
    uniq, true = np.unique(keys, return_counts=True)
    cm = CountMin(width=4096, depth=4).add_int64(keys)
    est = cm.estimate(uniq)
    assert (est >= true).all()              # CM never underestimates
    assert (est - true).max() <= 2 * len(keys) / 4096 * 4  # CM bound w/ slack
    # CM is LINEAR: split + merge must equal the streaming sketch exactly
    a = CountMin(width=4096, depth=4).add_int64(keys[:50_000])
    b = CountMin(width=4096, depth=4).add_int64(keys[50_000:])
    merged = a.merge(CountMin.from_bytes(b.to_bytes()))
    assert np.array_equal(merged.table, cm.table)
    assert merged.n == cm.n


def test_misra_gries_heavy_hitter_guarantee():
    from osm_cut_ray.functions.sketch import MisraGries
    keys = _zipf_keys()
    uniq, true = np.unique(keys, return_counts=True)
    k = 64
    mg = MisraGries(k=k).add_int64(keys)
    n = len(keys)
    # estimates are lower bounds, off by at most n/(k+1)
    for key, c in mg.counts.items():
        t = int(true[np.searchsorted(uniq, key)])
        assert c <= t
        assert t - c <= n / (k + 1)
    # every key with true count > n/(k+1) is present
    must = set(uniq[true > n / (k + 1)].tolist())
    assert must <= set(mg.counts)
    # merged variant keeps the same guarantee
    a = MisraGries(k=k).add_int64(keys[:70_000])
    b = MisraGries(k=k).add_int64(keys[70_000:])
    m = a.merge(MisraGries.from_bytes(b.to_bytes()))
    for key, c in m.counts.items():
        t = int(true[np.searchsorted(uniq, key)])
        assert c <= t and t - c <= n / (k + 1)
    assert must <= set(m.counts)


def test_kll_quantile_error_and_determinism():
    from osm_cut_ray.functions.sketch import KLL
    rng = np.random.default_rng(11)
    vals = rng.standard_normal(150_000) * 10 + 3
    sk = KLL(k=200).add(vals)
    sv = np.sort(vals)
    n = len(vals)
    for q in [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]:
        got = sk.quantile(q)
        rank = np.searchsorted(sv, got) / n
        assert abs(rank - q) < 0.03, (q, rank)
    # deterministic: same input -> byte-identical sketch
    assert KLL(k=200).add(vals).to_bytes() == sk.to_bytes()
    # weight conservation across compactions
    total_w = sum(len(a) * (1 << lv) for lv, a in enumerate(sk.levels))
    assert total_w == n
    # merged halves stay within the rank bound
    m = KLL(k=200).add(vals[:60_000]).merge(
        KLL.from_bytes(KLL(k=200).add(vals[60_000:]).to_bytes()))
    for q in [0.1, 0.5, 0.9]:
        rank = np.searchsorted(sv, m.quantile(q)) / n
        assert abs(rank - q) < 0.04


def test_sketch_dataset_over_ray(ray_session):
    from osm_cut_ray.functions.sketch import CountMin, KLL, sketch_dataset
    keys = _zipf_keys(50_000)
    ds = rd.from_arrow(pa.table({"k": keys,
                                 "v": keys.astype(np.float64)}))
    cm = sketch_dataset(ds, "k", CountMin, width=2048, depth=4)
    ref = CountMin(width=2048, depth=4).add_int64(keys)
    assert np.array_equal(cm.table, ref.table)  # linearity: exact match
    kll = sketch_dataset(ds, "v", KLL, value_kind="float", k=200)
    sv = np.sort(keys.astype(np.float64))
    med_rank = np.searchsorted(sv, kll.quantile(0.5)) / len(keys)
    assert abs(med_rank - 0.5) < 0.04


# ------------------------------------------- image perceptual-hash dedup

def _image_table(patterns):
    from osm_cut_ray.sources.images import encode_image
    ids = [f"img{i:08d}" for i in range(len(patterns))]
    blobs = [encode_image(p, "fpng") for p in patterns]
    return pa.table({"image_id": ids,
                     "bytes": pa.array(blobs, pa.binary())})


def test_ahash_shift_invariance_and_reencode_robustness():
    from osm_cut_ray.sources.images import decode_image, encode_image
    from osm_cut_ray.stages.image_dedup import ahash_stack
    from osm_cut_ray.stages.dedup import hamming64
    rng = np.random.default_rng(5)
    img = rng.integers(20, 200, (32, 32)).astype(np.uint8)
    # constant brightness shift (no wraparound) leaves aHash unchanged
    h0 = ahash_stack(img[None])[0]
    h1 = ahash_stack((img + 10)[None])[0]
    assert h0 == h1
    # lossy re-encode (quantization noise) stays within a few bits
    lossy = decode_image(encode_image(img, "fjpg"))[0]
    h2 = ahash_stack(lossy[None])[0]
    d = hamming64(np.array([h0], np.uint64).view(np.int64),
                  np.array([h2], np.uint64).view(np.int64))[0]
    assert d <= 8
    # non-divisible shape works (block grid from reduceat offsets)
    h3 = ahash_stack(rng.integers(0, 256, (2, 21, 13)).astype(np.uint8))
    assert h3.shape == (2,)


def _brute_phash(img: np.ndarray) -> int:
    """Textbook pHash: NN resample to 32x32, per-coefficient double
    summation DCT-II (orthonormal), 8x8 low block, median threshold."""
    import math
    h, w = img.shape
    x = np.empty((32, 32))
    for r in range(32):
        for c in range(32):
            x[r, c] = float(img[(r * h) // 32, (c * w) // 32])
    coef = np.empty((8, 8))
    for u in range(8):
        for v in range(8):
            s = 0.0
            for r in range(32):
                for c in range(32):
                    s += x[r, c] \
                        * math.cos(math.pi * (2 * r + 1) * u / 64) \
                        * math.cos(math.pi * (2 * c + 1) * v / 64)
            au = math.sqrt((1 if u else 0.5) * 2 / 32)
            av = math.sqrt((1 if v else 0.5) * 2 / 32)
            coef[u, v] = au * av * s
    flat = coef.ravel()
    med = float(np.median(flat))
    return sum(1 << i for i, c in enumerate(flat) if c > med)


def test_phash_matches_textbook_dct():
    from osm_cut_ray.stages.dedup import hamming64
    from osm_cut_ray.sources.images import decode_image, encode_image
    from osm_cut_ray.stages.image_dedup import ahash_stack, phash_stack
    rng = np.random.default_rng(17)
    imgs = [rng.integers(0, 256, (32, 32)).astype(np.uint8),
            rng.integers(0, 256, (48, 40)).astype(np.uint8),
            rng.integers(0, 256, (21, 13)).astype(np.uint8)]  # upsampled
    for img in imgs:
        got = int(phash_stack(img[None])[0])
        assert got == _brute_phash(img), img.shape
    # stacked call == per-image calls
    sq = [i for i in imgs if i.shape == (32, 32)]
    st = phash_stack(np.stack(sq))
    assert [int(v) for v in st] == [_brute_phash(i) for i in sq]
    # robustness: lossy re-encode stays within a few bits
    img = imgs[0]
    lossy = decode_image(encode_image(img, "fjpg"))[0]
    d = hamming64(phash_stack(img[None]).view(np.int64),
                  phash_stack(lossy[None]).view(np.int64))[0]
    assert d <= 8
    # discrimination pHash has and aHash lacks: a smooth gradient vs
    # the same gradient with high-frequency texture riding on it —
    # identical block means (aHash collides), different spectra
    g = np.tile(np.linspace(40, 200, 32, dtype=np.float64), (32, 1))
    tex = g.copy()
    tex[:, ::2] += 12.0
    tex[:, 1::2] -= 12.0
    a = ahash_stack(np.stack([g.astype(np.uint8),
                              np.clip(tex, 0, 255).astype(np.uint8)]))
    p = phash_stack(np.stack([g.astype(np.uint8),
                              np.clip(tex, 0, 255).astype(np.uint8)]))
    da = hamming64(a[:1].view(np.int64), a[1:].view(np.int64))[0]
    dp = hamming64(p[:1].view(np.int64), p[1:].view(np.int64))[0]
    assert da <= 1          # aHash confuses them
    assert dp >= 4          # pHash separates them


def test_image_dup_pairs_phash_matches_brute(ray_session):
    from osm_cut_ray.stages.dedup import hamming64
    from osm_cut_ray.stages.image_dedup import image_dup_pairs, phash_stack
    rng = np.random.default_rng(23)
    base = [rng.integers(0, 256, (32, 32)).astype(np.uint8)
            for _ in range(12)]
    dups = [np.clip(p.astype(np.int16)
                    + rng.integers(-1, 2, p.shape), 0, 255)
            .astype(np.uint8) for p in base[:4]]
    patterns = base + dups          # ids 12..15 duplicate ids 0..3
    tbl = _image_table(patterns)
    thr = 4
    fps = phash_stack(np.stack(patterns)).view(np.int64)
    exp = set()
    for i in range(len(patterns)):
        for j in range(i + 1, len(patterns)):
            if hamming64(fps[i:i + 1], fps[j:j + 1])[0] <= thr:
                exp.add((i, j))
    got = image_dup_pairs(rd.from_arrow(tbl), hamming_threshold=thr,
                          n_bands=8, method="phash")
    got_pairs = set(zip(got["a_id"].to_pylist(), got["b_id"].to_pylist()))
    assert got_pairs == exp
    assert len(got_pairs & {(i, i + 12) for i in range(4)}) >= 2
    with pytest.raises(ValueError, match="method"):
        image_dup_pairs(rd.from_arrow(tbl), method="dhash")


def test_image_dup_pairs_match_brute_force(ray_session):
    from osm_cut_ray.stages.dedup import hamming64
    from osm_cut_ray.stages.image_dedup import ahash_stack, image_dup_pairs
    rng = np.random.default_rng(9)
    base = [rng.integers(0, 256, (32, 32)).astype(np.uint8)
            for _ in range(15)]
    # 5 planted near-dups: tiny additive noise on the first 5 patterns
    dups = [np.clip(p.astype(np.int16)
                    + rng.integers(-1, 2, p.shape), 0, 255)
            .astype(np.uint8) for p in base[:5]]
    patterns = base + dups          # ids 15..19 duplicate ids 0..4
    tbl = _image_table(patterns)
    thr = 3
    # brute-force over the same fingerprints
    fps = ahash_stack(np.stack(patterns)).view(np.int64)
    exp = set()
    for i in range(len(patterns)):
        for j in range(i + 1, len(patterns)):
            if hamming64(fps[i:i + 1], fps[j:j + 1])[0] <= thr:
                exp.add((i, j))
    got = image_dup_pairs(rd.from_arrow(tbl), hamming_threshold=thr)
    got_pairs = set(zip(got["a_id"].to_pylist(), got["b_id"].to_pylist()))
    assert got_pairs == exp
    # sanity: banding found real planted dups, not an empty intersection
    assert len(got_pairs & {(i, i + 15) for i in range(5)}) >= 3


# ----------------------------------------------- repetition quality stats

def test_repetition_stats_match_brute_force(ray_session):
    import collections
    import re

    from osm_cut_ray.stages.text import repetition_stats
    rng = np.random.default_rng(21)
    words = ["aa", "bb", "cc", "dd", "ee", "ff"]
    texts = [
        "one\ntwo\nthree\nfour",                     # no dup lines
        "same\nsame\nsame\nother",                   # 50% dup lines
        "spam spam spam spam spam spam",             # one dominant bigram
        " ".join(rng.choice(words, 40)) + "\nx\nx",  # mixed
        "",                                          # degenerate
        "single",                                    # one token, no bigram
    ]
    ids = np.arange(len(texts), dtype=np.int64)
    got = repetition_stats(pa.table({"doc_id": ids, "text": texts}))\
        .to_pandas().set_index("doc_id")
    tok_re = re.compile(r"\S+")
    for i, s in enumerate(texts):
        lines = s.split("\n")
        exp_dup = 1.0 - len(set(lines)) / len(lines)
        toks = tok_re.findall(s.lower())
        bigs = list(zip(toks, toks[1:]))
        exp_top = min(
            2.0 * max(collections.Counter(bigs).values()) / len(toks), 1.0
        ) if bigs else 0.0
        assert got.loc[i, "dup_line_frac"] == pytest.approx(exp_dup), i
        assert got.loc[i, "top_bigram_frac"] == pytest.approx(exp_top), i
    # distributed: same kernel per batch over a Dataset
    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    dist = ds.map_batches(repetition_stats, batch_format="pyarrow")\
        .to_pandas().set_index("doc_id").sort_index()
    assert np.allclose(dist["dup_line_frac"], got.sort_index()["dup_line_frac"])
    assert np.allclose(dist["top_bigram_frac"], got.sort_index()["top_bigram_frac"])


# ------------------------------------------------- composed curation run

def test_curate_documents_end_to_end(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from osm_cut_ray.pipelines.curate import curate_documents
    rng = np.random.default_rng(31)
    words = np.array(["alpha", "beta", "gamma", "delta", "epsilon",
                      "zeta", "eta", "theta", "iota", "kappa",
                      "the", "and", "of", "to", "is"])

    def doc(n=40):
        return " ".join(rng.choice(words, n))

    base = [doc() for _ in range(20)]
    texts = list(base)
    ids = list(range(20))
    # shard 2 content: planted problems
    texts2 = [
        base[0],                       # 100: exact dup of 0 -> drop
        base[1] + " extra tail word",  # 101: near dup of 1 -> drop
        BENCH[0],                      # 102: contaminated -> drop
        "der die und das ist nicht " * 5,     # 103: German -> drop
        "spam " * 30,                  # 104: repetitive -> drop
        "tiny",                        # 105: under min_tokens -> drop
        doc(),                         # 106: clean -> keep
    ]
    ids2 = [100 + i for i in range(len(texts2))]
    p1 = str(tmp_path / "shard_a.parquet")
    p2 = str(tmp_path / "shard_b.parquet")
    pq.write_table(pa.table({"doc_id": np.array(ids, np.int64),
                             "text": texts}), p1)
    pq.write_table(pa.table({"doc_id": np.array(ids2, np.int64),
                             "text": texts2}), p2)
    out = str(tmp_path / "curated")

    report = curate_documents(
        [p1, p2], out, bench_texts=BENCH, max_overlap=0.1,
        jaccard_threshold=0.5, langs=("en",),
        max_dup_line_frac=0.5, max_top_bigram_frac=0.5, min_tokens=3)
    assert sorted(report["completed"]) == ["shard_a", "shard_b"]
    assert report["n_drop_exact_dup"] == 1        # 100
    assert report["n_drop_near_dup"] >= 1         # 101
    assert report["n_drop_contaminated"] == 1     # 102

    kept = pa.concat_tables([
        pq.read_table(os.path.join(out, s, f))
        for s in ("shard_a", "shard_b")
        for f in os.listdir(os.path.join(out, s))
        if f.endswith(".parquet")])
    kept_ids = set(kept["doc_id"].to_pylist())
    for bad in (100, 101, 102, 103, 104, 105):
        assert bad not in kept_ids, bad
    assert 106 in kept_ids
    # shard_a survivors: everything except docs pulled into near-dup
    # clusters as non-representatives (base docs keep their min id)
    assert set(ids) <= kept_ids | {i for i in ids}  # reps stay by min-id rule
    assert 0 in kept_ids and 1 in kept_ids

    # resume: second run skips both shards, same row counts
    report2 = curate_documents(
        [p1, p2], out, bench_texts=BENCH, max_overlap=0.1,
        jaccard_threshold=0.5, langs=("en",),
        max_dup_line_frac=0.5, max_top_bigram_frac=0.5, min_tokens=3)
    assert sorted(report2["skipped"]) == ["shard_a", "shard_b"]
    assert report2["rows_out"] == report["rows_out"]

    # changed params -> shards recompute
    report3 = curate_documents(
        [p1, p2], out, bench_texts=BENCH, max_overlap=0.1,
        jaccard_threshold=0.5, langs=("en",),
        max_dup_line_frac=0.5, max_top_bigram_frac=0.5, min_tokens=4)
    assert sorted(report3["completed"]) == ["shard_a", "shard_b"]


def test_read_table_strips_unhashable_schema_metadata(ray_session):
    """Pandas-written parquet schemas carry a metadata dict that is
    unhashable in pyarrow 16, defeating Ray's block-schema dedup; the
    shared readers must emit metadata-free (hashable) schemas."""
    import pyarrow.parquet as pq

    from osm_cut_ray.sources.tables import read_table, sf_path
    path = sf_path("/root/testdata/sf0.001", "documents")
    raw = pq.read_schema(path)
    assert raw.metadata  # the fixture really does carry metadata
    with pytest.raises(TypeError):
        hash(raw)
    for b in read_table(path, columns=["doc_id"]).iter_batches(
            batch_size=None, batch_format="pyarrow"):
        assert b.schema.metadata is None
        hash(b.schema)  # must not raise


# ---------------------------------------------------------------- PII

PII_DOCS = [
    "contact me at jane.doe+spam@example.co.uk or call 415-555-0199",
    "server at 192.168.1.254 rejected 10.0.0.1; ssh root@host failed",
    "SSN 123-45-6789 and card 4111-1111-1111-1111 were leaked",
    "raw pan 4111111111111111 plus phone (212) 555-0100 and +1 646.555.0101",
    "totally clean document with words only, no identifiers at all",
    "almost-pii: version 1.2.3.4.5, date 12-34-5678 extended, a@b",
    "unicode café naïve 北京 mail: üser@exämple.com stays ascii-only match",
    "",
]


def test_pii_scrub_matches_brute_reference(ray_session):
    from osm_cut_ray.stages.pii import (PII_ORDER, redact_pii,
                                        pii_stats, scrub_pii_brute)
    ids = np.arange(len(PII_DOCS), dtype=np.int64)
    docs = rd.from_arrow(pa.table({"doc_id": ids, "text": PII_DOCS}))
    got = redact_pii(docs).to_pandas().set_index("doc_id").sort_index()
    assert len(got) == len(PII_DOCS)
    for i, text in enumerate(PII_DOCS):
        red, counts = scrub_pii_brute(text)
        assert got.loc[i, "text"] == red, f"doc {i}"
        for cat in PII_ORDER:
            assert got.loc[i, f"n_{cat}"] == counts[cat], (i, cat)
        assert got.loc[i, "n_pii"] == sum(counts.values())
    # semantic pins: the known payloads really are caught
    assert "[EMAIL]" in got.loc[0, "text"] and "[PHONE]" in got.loc[0, "text"]
    assert got.loc[1, "n_ipv4"] == 2
    # sequential semantics: the SSN is not double-counted as a phone
    assert got.loc[2, "n_ssn"] == 1 and got.loc[2, "n_phone"] == 0
    assert got.loc[2, "n_ccard"] == 1
    # bare 16-digit PAN caught by the run-of-digits alternative
    assert got.loc[3, "n_ccard"] == 1 and got.loc[3, "n_phone"] == 2
    # clean docs untouched
    assert got.loc[4, "text"] == PII_DOCS[4] and got.loc[4, "n_pii"] == 0
    assert got.loc[7, "n_pii"] == 0

    # stats variant: same counts, text dropped map-side
    st = pii_stats(docs).to_pandas().set_index("doc_id").sort_index()
    assert "text" not in st.columns
    assert (st["n_pii"] == got["n_pii"]).all()


# ------------------------------------------- linear quality classifier

def _labeled_corpus(n_per_class: int = 120, seed: int = 11):
    rng = np.random.default_rng(seed)
    good = np.array(["thoughtful", "analysis", "research", "evidence",
                     "method", "结论", "careful", "study", "data",
                     "results", "discussion", "clear"])
    bad = np.array(["buy", "click", "free", "winner", "casino",
                    "pills", "offer", "now", "cheap", "deal",
                    "subscribe", "prize"])
    both = np.array(["the", "and", "with", "for", "this"])
    texts, labels = [], []
    for i in range(n_per_class * 2):
        src = good if i < n_per_class else bad
        w = np.concatenate([rng.choice(src, 20), rng.choice(both, 10)])
        rng.shuffle(w)
        texts.append(" ".join(w))
        labels.append(1 if i < n_per_class else 0)
    ids = np.arange(len(texts), dtype=np.int64)
    return ids, texts, np.array(labels, np.int64)


def test_linear_classifier_fit_and_score(ray_session):
    from osm_cut_ray.stages.classify import (
        fit_linear_classifier, quality_filter, score_quality)
    ids, texts, labels = _labeled_corpus()
    tbl = pa.table({"doc_id": ids, "text": texts, "label": labels})
    ds = rd.from_arrow(tbl)
    w, report = fit_linear_classifier(ds, dim=1024, epochs=12, lr=2.0)
    assert report["loss_last"] < report["loss_first"]

    # partitioning invariance: exact int64 gradient reduce -> weights
    # bit-identical no matter how the training rows are split
    w2, _ = fit_linear_classifier(ds.repartition(7), dim=1024,
                                  epochs=12, lr=2.0)
    assert np.array_equal(w, w2)

    scores = score_quality(
        rd.from_arrow(pa.table({"doc_id": ids, "text": texts})), w)
    sc = scores.to_pandas().set_index("doc_id").sort_index()["score"]
    acc = ((sc.to_numpy() >= 0.5).astype(int) == labels).mean()
    assert acc >= 0.95, acc

    # filter keeps (almost) only the quality class
    kept, rep = quality_filter(
        rd.from_arrow(pa.table({"doc_id": ids, "text": texts})), w,
        min_score=0.5)
    kept_ids = {r["doc_id"] for r in
                kept.select_columns(["doc_id"]).iter_rows()}
    spam_ids = set(ids[labels == 0].tolist())
    assert len(kept_ids & spam_ids) <= 3
    assert rep["n_dropped"] >= len(spam_ids) - 3


def test_jsonl_roundtrip(ray_session, tmp_path):
    """JSONL source/sink: documents roundtrip through line-delimited
    JSON with values intact and column pruning applied."""
    from osm_cut_ray.sources.tables import read_jsonl, read_table, \
        write_jsonl
    ids = np.arange(50, dtype=np.int64)
    texts = [f"doc {i} with \"quotes\" and unicode café 北京" for i in ids]
    src = rd.from_arrow(pa.table({"doc_id": ids, "text": texts,
                                  "extra": ids * 2}))
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(src, out)
    back = read_jsonl(out, columns=["doc_id", "text"]).to_pandas()
    assert sorted(back.columns) == ["doc_id", "text"]
    back = back.sort_values("doc_id").reset_index(drop=True)
    assert back["doc_id"].tolist() == ids.tolist()
    assert back["text"].tolist() == texts
    # extension dispatch through the shared reader
    import glob
    one = sorted(glob.glob(out + "/*.json"))[0]
    via = read_table(one, columns=["doc_id"]).count()
    assert via > 0


def test_curate_documents_pii_and_model_gates(ray_session, tmp_path):
    """The composed curation pipeline with the round-3 gates: PII
    redaction inside the per-shard rewrite, and a fitted linear
    classifier as a global drop pass (model fingerprint in the params
    lineage so a model swap recomputes shards)."""
    import pyarrow.parquet as pq

    from osm_cut_ray.pipelines.curate import curate_documents
    from osm_cut_ray.stages.classify import fit_linear_classifier

    ids, texts, labels = _labeled_corpus(60, seed=5)
    train = rd.from_arrow(pa.table({"doc_id": ids, "text": texts,
                                    "label": labels}))
    w, _ = fit_linear_classifier(train, dim=512, epochs=10)

    good = [t for t, l in zip(texts, labels) if l == 1][:6]
    spam = [t for t, l in zip(texts, labels) if l == 0][:2]
    shard = good + spam + [
        good[0].replace(" ", " ", 1)
        + " write to jane@example.com or 415-555-0199 for the data",
    ]
    sids = np.arange(200, 200 + len(shard), dtype=np.int64)
    p = str(tmp_path / "shard_p.parquet")
    pq.write_table(pa.table({"doc_id": sids, "text": shard}), p)
    out = str(tmp_path / "curated_pm")

    report = curate_documents(
        [p], out, langs=("en", "zh"), min_tokens=3,
        jaccard_threshold=0.99, max_dup_line_frac=1.0,
        max_top_bigram_frac=1.0,
        redact_pii=True, quality_model=w, min_model_score=0.5)
    assert report["n_drop_model"] >= 2

    kept = pa.concat_tables([
        pq.read_table(os.path.join(out, "shard_p", f))
        for f in os.listdir(os.path.join(out, "shard_p"))
        if f.endswith(".parquet")])
    kept_ids = set(kept["doc_id"].to_pylist())
    spam_ids = set(sids[len(good):len(good) + len(spam)].tolist())
    assert not (kept_ids & spam_ids)           # model gate dropped spam
    assert sorted(kept.column_names) == ["doc_id", "text"]
    pii_row = [t for i, t in zip(kept["doc_id"].to_pylist(),
                                 kept["text"].to_pylist())
               if i == int(sids[-1])]
    assert pii_row and "[EMAIL]" in pii_row[0] \
        and "[PHONE]" in pii_row[0] \
        and "jane@example.com" not in pii_row[0]

    # model swap changes the params lineage -> shard recomputes
    w2 = w * 0.5
    report2 = curate_documents(
        [p], out, langs=("en", "zh"), min_tokens=3,
        jaccard_threshold=0.99, max_dup_line_frac=1.0,
        max_top_bigram_frac=1.0,
        redact_pii=True, quality_model=w2, min_model_score=0.5)
    assert report2["completed"] == ["shard_p"]  # not skipped


# ------------------------------------------------ corpus line dedup

def _line_corpus():
    boiler1 = "SUBSCRIBE TO OUR NEWSLETTER TODAY"
    boiler2 = "cookie policy applies to this site"
    shorty = "ok yes"                      # < min_line_chars: never dropped
    rare = "this footer appears only twice in the corpus"
    texts = []
    for i in range(30):
        lines = [f"unique content line {i} alpha",
                 f"unique content line {i} beta {i * 7}"]
        if i % 2 == 0:
            lines.insert(0, boiler1)
        if i % 3 == 0:
            lines.append(boiler2)
        if i < 2:
            lines.append(rare)
        lines.append(shorty)
        if i == 5:
            lines.append(boiler1)          # same doc twice: df counts once
        texts.append("\n".join(lines))
    texts.append(boiler1 + "\n" + boiler2)  # doc 30: all lines hot
    return texts


def test_line_dedup_matches_brute(ray_session):
    from collections import Counter

    from osm_cut_ray.stages.line_dedup import dedup_lines, hot_line_hashes

    texts = _line_corpus()
    min_df, min_chars = 3, 8
    df = Counter()
    for t in texts:
        for ln in {l for l in t.split("\n") if len(l) >= min_chars}:
            df[ln] += 1
    hot_brute = {l for l, c in df.items() if c >= min_df}
    expect = []
    for t in texts:
        kept = [l for l in t.split("\n")
                if not (len(l) >= min_chars and l in hot_brute)]
        expect.append("\n".join(kept))

    ids = np.arange(len(texts), dtype=np.int64)
    docs = rd.from_arrow(pa.table({
        "doc_id": ids, "text": texts,
        "n_chars": [len(t) for t in texts]})).repartition(7)
    out, hot = dedup_lines(docs, min_df=min_df, min_line_chars=min_chars)
    got = out.to_pandas().set_index("doc_id").sort_index()

    assert len(hot) == len(hot_brute)
    for i, t in enumerate(texts):
        assert got.loc[i, "text"] == expect[i], f"doc {i}"
        n_removed = len(t.split("\n")) - len(expect[i].split("\n")) \
            if expect[i] else len(t.split("\n"))
        assert got.loc[i, "n_lines_removed"] == n_removed, f"doc {i}"
        assert got.loc[i, "n_chars"] == len(expect[i])
    # doc 30 lost every line
    assert got.loc[30, "text"] == "" and got.loc[30, "n_lines_removed"] == 2
    # short repeated line survives everywhere
    assert all("ok yes" in got.loc[i, "text"] for i in range(30))

    # determinism under a different partitioning
    docs1 = rd.from_arrow(pa.table({
        "doc_id": ids, "text": texts,
        "n_chars": [len(t) for t in texts]}))
    out1, hot1 = dedup_lines(docs1, min_df=min_df, min_line_chars=min_chars)
    got1 = out1.to_pandas().set_index("doc_id").sort_index()
    assert (got1["text"] == got["text"]).all()
    assert set(hot1.tolist()) == set(hot.tolist())

    # cap raises, never truncates
    with pytest.raises(ValueError):
        hot_line_hashes(docs, min_df=1, min_line_chars=1, max_hot_lines=3)


# --------------------------------------------- bigram LM perplexity

def _brute_lm_counts(texts, dim):
    """Pure-Python reference: blake2b token hashes, add-alpha hashed
    bigram LM — mirrors the documented model exactly."""
    import hashlib
    from collections import Counter

    def toks(t):
        return [int.from_bytes(
            hashlib.blake2b(w.encode(), digest_size=8).digest(),
            "little") for w in t.lower().split()]

    M0, M1 = 0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F
    uni, big = Counter(), Counter()
    for t in texts:
        hs = toks(t)
        for h in hs:
            uni[h % dim] += 1
        for a, b in zip(hs, hs[1:]):
            big[((a * M0) ^ (b * M1)) % (1 << 64) % dim] += 1
    return uni, big, toks


def test_bigram_lm_matches_brute_and_separates(ray_session):
    import math

    from osm_cut_ray.stages.lm_score import (fit_bigram_lm, lm_filter,
                                             lm_cross_entropy)

    rng = np.random.default_rng(5)
    words = [f"w{i:03d}" for i in range(60)]
    # in-domain corpus: Markov-ish chains w_i -> w_{i+1}
    ref_texts = []
    for _ in range(80):
        start = int(rng.integers(0, 50))
        ref_texts.append(" ".join(words[start:start + 10]))
    # score set: 3 in-domain docs, 3 scrambled, 1 tiny (NaN)
    good = [" ".join(words[i:i + 10]) for i in (3, 17, 31)]
    perm = [" ".join(rng.permutation(words).tolist()) for _ in range(3)]
    score_texts = good + perm + ["solo"]

    dim, alpha = 4096, 0.1
    ref_ds = rd.from_arrow(pa.table({
        "doc_id": np.arange(len(ref_texts), dtype=np.int64),
        "text": ref_texts})).repartition(5)
    lm = fit_bigram_lm(ref_ds, dim=dim, alpha=alpha)

    uni_b, big_b, toks = _brute_lm_counts(ref_texts, dim)
    assert lm.uni.sum() == sum(uni_b.values())
    assert lm.big.sum() == sum(big_b.values())
    for k, v in list(uni_b.items())[:50]:
        assert lm.uni[k] == v
    for k, v in list(big_b.items())[:50]:
        assert lm.big[k] == v

    ids = np.arange(len(score_texts), dtype=np.int64)
    sds = rd.from_arrow(pa.table({"doc_id": ids, "text": score_texts}))
    got = lm_cross_entropy(sds, lm).to_pandas() \
        .set_index("doc_id").sort_index()

    M0, M1 = 0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F
    for i, t in enumerate(score_texts):
        hs = toks(t)
        if len(hs) < 2:
            assert np.isnan(got.loc[i, "lm_xent"])
            continue
        lp = 0.0
        for a, b in zip(hs, hs[1:]):
            bb = ((a * M0) ^ (b * M1)) % (1 << 64) % dim
            lp += math.log((big_b[bb] + alpha)
                           / (uni_b[a % dim] + alpha * dim))
        assert abs(got.loc[i, "lm_xent"] - (-lp / (len(hs) - 1))) < 1e-9
        assert got.loc[i, "n_bigrams"] == len(hs) - 1

    # semantic pin: in-domain clearly beats scrambled
    assert got.loc[[0, 1, 2], "lm_xent"].max() \
        < got.loc[[3, 4, 5], "lm_xent"].min()

    # deterministic refit under different partitioning
    lm2 = fit_bigram_lm(ref_ds.repartition(11), dim=dim, alpha=alpha)
    assert (lm2.uni == lm.uni).all() and (lm2.big == lm.big).all()

    # gate: threshold between the groups keeps good + NaN, drops junk
    thr = float(got.loc[[0, 1, 2], "lm_xent"].max()
                + got.loc[[3, 4, 5], "lm_xent"].min()) / 2
    kept = lm_filter(sds, lm, max_xent=thr).to_pandas()
    assert set(kept["doc_id"]) == {0, 1, 2, 6}


def test_curate_documents_boilerplate_and_lm_gates(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from osm_cut_ray.pipelines.curate import curate_documents
    from osm_cut_ray.stages.lm_score import fit_bigram_lm

    rng = np.random.default_rng(9)
    words = [f"tok{i:02d}" for i in range(40)]
    boiler = "ALL RIGHTS RESERVED CONTACT US AT FOOTER"
    good = []
    for i in range(12):
        st = int(rng.integers(0, 30))
        body = " ".join(words[st:st + 8])
        good.append(f"{body}\n{boiler}\nextra line {i} for doc")
    junk = [" ".join(rng.permutation(words)[:8].tolist()
                     + ["zzqx", "qqzz", f"jx{i}"]) for i in range(3)]
    texts = good + junk
    ids = np.arange(len(texts), dtype=np.int64)

    p = str(tmp_path / "shard_a.parquet")
    pq.write_table(pa.table({"doc_id": ids, "text": texts}), p)

    lm = fit_bigram_lm(
        rd.from_arrow(pa.table({"doc_id": ids[:12], "text": good})),
        dim=4096)
    # pick a threshold between the in-domain max and junk min
    from osm_cut_ray.stages.lm_score import lm_cross_entropy
    x = lm_cross_entropy(
        rd.from_arrow(pa.table({"doc_id": ids, "text": texts})),
        lm).to_pandas().set_index("doc_id")["lm_xent"]
    thr = float((x.iloc[:12].max() + x.iloc[12:].min()) / 2)
    assert x.iloc[:12].max() < x.iloc[12:].min()

    out = str(tmp_path / "out")
    report = curate_documents(
        [p], out, langs=("en", "zh", "de", "fr", "es"), min_tokens=1,
        jaccard_threshold=0.99, max_dup_line_frac=1.0,
        max_top_bigram_frac=1.0,
        drop_boilerplate=True, boilerplate_min_df=4,
        lm_model=lm, lm_max_xent=thr)
    assert report["n_hot_lines"] == 1
    assert report["n_drop_lm"] == 3

    kept = pa.concat_tables([
        pq.read_table(os.path.join(out, "shard_a", f))
        for f in os.listdir(os.path.join(out, "shard_a"))
        if f.endswith(".parquet")])
    kept_ids = sorted(kept["doc_id"].to_pylist())
    assert kept_ids == list(range(12))            # junk gone
    for t in kept["text"].to_pylist():
        assert boiler not in t                    # boilerplate stripped
        assert "extra line" in t                  # content kept


# ------------------------------------------ cross-corpus text dedup

def test_text_cross_dup_filter(ray_session):
    from osm_cut_ray.stages.cross_dedup import (RefMinhashIndex,
                                                _band_hashes,
                                                build_ref_minhash_index,
                                                text_cross_dup_filter)
    from osm_cut_ray.stages.dedup import MinHasher, shingle_hashes

    rng = np.random.default_rng(3)
    words = [f"v{i:03d}" for i in range(200)]
    ref_texts = [" ".join(rng.choice(words, 40).tolist())
                 for _ in range(50)]
    ref_ids = np.arange(1000, 1000 + len(ref_texts), dtype=np.int64)

    # new shard: 5 near-copies of ref docs (one word changed),
    # 10 fresh docs
    near = []
    for i in range(5):
        ws = ref_texts[i * 7].split()
        ws[3] = "CHANGED"
        near.append(" ".join(ws))
    fresh = [" ".join(rng.choice(words, 40).tolist())
             for _ in range(10)]
    new_texts = near + fresh
    new_ids = np.arange(len(new_texts), dtype=np.int64)

    ref_ds = rd.from_arrow(pa.table(
        {"doc_id": ref_ids, "text": ref_texts})).repartition(4)
    idx = build_ref_minhash_index(ref_ds)

    # brute reference: same signatures, full pairwise agreement
    mh = MinHasher(64, 42, 3)
    rsig = np.stack([mh.signature(shingle_hashes(t, 3))
                     for t in ref_texts])
    nsig = np.stack([mh.signature(shingle_hashes(t, 3))
                     for t in new_texts])
    agree = (nsig[:, None, :] == rsig[None, :, :]).mean(axis=2)
    # candidates limited to shared bands (LSH semantics)
    rb = _band_hashes(rsig, 16)
    nb = _band_hashes(nsig, 16)
    shares_band = (nb[:, None, :] == rb[None, :, :]).any(axis=2)
    cand_agree = np.where(shares_band, agree, 0.0)
    brute_hit = cand_agree.max(axis=1) >= 0.7

    new_ds = rd.from_arrow(pa.table(
        {"doc_id": new_ids, "text": new_texts})).repartition(3)
    flagged = text_cross_dup_filter(new_ds, idx, mode="flag",
                                est_threshold=0.7) \
        .to_pandas().set_index("doc_id").sort_index()
    assert (flagged["is_ref_dup"].to_numpy() == brute_hit).all()
    # planted near-copies caught, fresh docs clean
    assert flagged["is_ref_dup"].iloc[:5].all()
    assert not flagged["is_ref_dup"].iloc[5:].any()
    # matched ref id: a band-sharing candidate with >= brute agreement
    for i in range(5):
        rid = flagged.loc[i, "ref_id"]
        j = int(np.where(ref_ids == rid)[0][0])
        assert shares_band[i, j]
        assert flagged.loc[i, "ref_agree"] >= 0.7

    kept = text_cross_dup_filter(new_ds, idx, mode="anti",
                             est_threshold=0.7).to_pandas()
    assert sorted(kept["doc_id"]) == list(range(5, 15))
    dups = text_cross_dup_filter(new_ds, idx, mode="semi",
                             est_threshold=0.7).to_pandas()
    assert sorted(dups["doc_id"]) == list(range(5))

    # empty reference: everything passes anti
    empty_idx = RefMinhashIndex(np.array([], np.int64),
                                np.empty((0, 64), np.uint64))
    allkept = text_cross_dup_filter(new_ds, empty_idx,
                                    mode="anti").to_pandas()
    assert len(allkept) == len(new_texts)

    # cap raises, never truncates
    with pytest.raises(ValueError):
        build_ref_minhash_index(ref_ds, max_ref_docs=10)


# --------------------------------------------- LM sequence packing

def test_pack_token_sequences_matches_brute(ray_session):
    from osm_cut_ray.stages.geo_sample import sample_hash
    from osm_cut_ray.stages.seq_pack import pack_token_sequences

    rng = np.random.default_rng(21)
    texts = [" ".join(f"t{j}" for j in range(int(rng.integers(0, 40))))
             for _ in range(120)]          # includes 0-token docs
    ids = np.arange(500, 500 + len(texts), dtype=np.int64)
    L = 64

    # brute: deterministic (hash, id) order, concat with EOS, chunk
    hv = sample_hash(ids)
    order = np.lexsort((ids, hv))
    n_tok = np.array([len(t.split()) + 1 for t in texts], np.int64)
    expected = set()
    pos = 0
    total = int(n_tok.sum())
    n_seq = total // L
    for i in order:
        o, n = pos, int(n_tok[i])
        pos += n
        while n > 0:
            seq = o // L
            take = min((seq + 1) * L - o, n)
            if seq < n_seq:
                expected.add((int(ids[i]), seq, o - seq * L,
                              o - (pos - n_tok[i]), take))
            o += take
            n -= take

    docs = rd.from_arrow(pa.table({"doc_id": ids, "text": texts})) \
        .repartition(6)
    got = pack_token_sequences(docs, seq_len=L).to_pandas()
    got_set = set(map(tuple, got[["doc_id", "seq_id", "seq_start",
                                  "doc_start", "n_span"]].to_numpy()))
    assert got_set == expected

    # every kept sequence fully covered, no overlaps
    for s, grp in got.groupby("seq_id"):
        assert grp["n_span"].sum() == L
        covered = np.zeros(L, bool)
        for _, r in grp.iterrows():
            sl = slice(int(r["seq_start"]),
                       int(r["seq_start"]) + int(r["n_span"]))
            assert not covered[sl].any()
            covered[sl] = True
        assert covered.all()
    assert got["seq_id"].nunique() == n_seq

    # partitioning invariance
    got1 = pack_token_sequences(
        rd.from_arrow(pa.table({"doc_id": ids, "text": texts})),
        seq_len=L).to_pandas()
    got1_set = set(map(tuple, got1[["doc_id", "seq_id", "seq_start",
                                    "doc_start", "n_span"]].to_numpy()))
    assert got1_set == expected

    # drop_last=False keeps the tail
    got2 = pack_token_sequences(docs, seq_len=L,
                                drop_last=False).to_pandas()
    assert got2["n_span"].sum() == total


# ------------------------------------------- per-key heavy hitters

def test_heavy_hitters_by_key(ray_session):
    from collections import Counter

    from osm_cut_ray.stages.heavy import heavy_hitters_by_key

    rng = np.random.default_rng(7)
    keys_l, items_l = [], []
    truth = {}
    for key in range(5):
        n = 4000 + key * 500
        heavy = 10_000 + key          # ~30% of the key's rows
        items = np.where(rng.random(n) < 0.3, heavy,
                         rng.integers(0, 2000, n))
        keys_l.append(np.full(n, key, np.int64))
        items_l.append(items.astype(np.int64))
        truth[key] = Counter(items.tolist())
    keys = np.concatenate(keys_l)
    items = np.concatenate(items_l)

    ds = rd.from_arrow(pa.table({"cell": keys, "part": items})) \
        .repartition(9)
    k = 64
    got = heavy_hitters_by_key(ds, "cell", "part",
                               k=k, min_frac=0.1).to_pandas()

    for key in range(5):
        sub = got[got["key"] == key]
        n_key = sum(truth[key].values())
        assert (sub["n_key"] == n_key).all()      # exact row totals
        heavy = 10_000 + key
        true_heavy = truth[key][heavy]
        # MG guarantee: the planted heavy item survives with a lower-
        # bound estimate within n/(k+1) of truth
        row = sub[sub["item"] == heavy]
        assert len(row) == 1
        est = int(row["est_count"].iloc[0])
        assert est <= true_heavy
        assert est >= true_heavy - n_key // (k + 1) - 1
        # every reported estimate is a lower bound on truth
        for _, r in sub.iterrows():
            assert r["est_count"] <= truth[key][int(r["item"])]
        # nothing from the uniform tail clears the 10% threshold
        assert set(sub["item"]) == {heavy}


def test_materialize_packed_sequences(ray_session):
    from osm_cut_ray.stages.dedup import _token_hashes_batch
    from osm_cut_ray.stages.geo_sample import sample_hash
    from osm_cut_ray.stages.seq_pack import (EOS_TOKEN,
                                             materialize_packed_sequences,
                                             pack_token_sequences)

    rng = np.random.default_rng(22)
    texts = [" ".join(f"w{int(rng.integers(0, 99))}"
                      for _ in range(int(rng.integers(1, 30))))
             for _ in range(80)]
    ids = np.arange(80, dtype=np.int64)
    L = 48

    docs = rd.from_arrow(pa.table({"doc_id": ids, "text": texts})) \
        .repartition(5)
    spans = pack_token_sequences(docs, seq_len=L).materialize()
    got = materialize_packed_sequences(docs, spans, seq_len=L) \
        .to_pandas().set_index("seq_id").sort_index()

    # brute: same hashed tokens + EOS in (hash, id) order, chunked
    hv = sample_hash(ids)
    order = np.lexsort((ids, hv))
    stream = []
    for i in order:
        th, _ = _token_hashes_batch([texts[i]])
        stream.extend(th.view(np.int64).tolist())
        stream.append(int(EOS_TOKEN))
    n_seq = len(stream) // L
    assert len(got) == n_seq
    for s in range(n_seq):
        toks = np.asarray(got.loc[s, "tokens"], np.int64)
        assert len(toks) == L
        assert toks.tolist() == stream[s * L:(s + 1) * L]


def test_bpe_token_count(ray_session):
    import re

    from osm_cut_ray.stages.text import BPE_RE, bpe_token_count

    texts = ["Hello, world! It's 2026...",
             "don't stop; can't won't I'll we're you've I'm he'd",
             "plain words only here",
             "", "   ", "a1b2c3 x-y_z 3.14159"]
    ids = np.arange(len(texts), dtype=np.int64)
    docs = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    got = docs.map_batches(bpe_token_count, batch_format="pyarrow") \
        .to_pandas().set_index("doc_id").sort_index()
    for i, t in enumerate(texts):
        assert got.loc[i, "n_bpe_tokens"] == len(BPE_RE.findall(t)), i
    # semantic pins: punctuation and contractions count separately
    assert got.loc[0, "n_bpe_tokens"] > len(texts[0].split())
    assert got.loc[3, "n_bpe_tokens"] == 0


def test_model_save_load_roundtrip(ray_session, tmp_path):
    from osm_cut_ray.stages.lm_score import (BigramLM, fit_bigram_lm,
                                             lm_cross_entropy)
    from osm_cut_ray.stages.pq import PQCodebook, fit_pq

    texts = [" ".join(f"w{j}" for j in range(i, i + 8))
             for i in range(30)]
    docs = rd.from_arrow(pa.table({
        "doc_id": np.arange(30, dtype=np.int64), "text": texts}))
    lm = fit_bigram_lm(docs, dim=1024, alpha=0.2)
    p = str(tmp_path / "lm.npz")
    lm.save(p)
    lm2 = BigramLM.load(p)
    assert lm2.dim == lm.dim and lm2.alpha == lm.alpha
    assert (lm2.uni == lm.uni).all() and (lm2.big == lm.big).all()
    a = lm_cross_entropy(docs, lm).to_pandas().sort_values("doc_id")
    b = lm_cross_entropy(docs, lm2).to_pandas().sort_values("doc_id")
    assert np.allclose(a["lm_xent"], b["lm_xent"], equal_nan=True)

    rng = np.random.default_rng(2)
    emb = rd.from_arrow(pa.table({
        "vec_id": np.arange(200, dtype=np.int64),
        "embedding": list(rng.standard_normal((200, 16))
                          .astype(np.float32))}))
    cb = fit_pq(emb, m=4, k=32, sample_size=128)
    q = str(tmp_path / "pq.npz")
    cb.save(q)
    cb2 = PQCodebook.load(q)
    assert (cb2.centroids == cb.centroids).all()
    assert (cb2.m, cb2.k, cb2.dsub) == (cb.m, cb.k, cb.dsub)


def test_normalize_text(ray_session):
    from osm_cut_ray.stages.text import normalize_text

    texts = ["“Smart”  quotes — and\tspace runs",
             "café composed",        # e + combining acute
             "ctrl\x00chars\x1fhere",
             "  edge   trim  ", ""]
    ids = np.arange(len(texts), dtype=np.int64)
    docs = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    got = docs.map_batches(normalize_text, batch_format="pyarrow") \
        .to_pandas().set_index("doc_id").sort_index()
    assert got.loc[0, "text"] == '"Smart" quotes - and space runs'
    assert got.loc[1, "text"] == "caf\u00e9 composed"  # NFC composed
    assert got.loc[2, "text"] == "ctrl chars here"
    assert got.loc[3, "text"] == "edge trim"
    assert got.loc[4, "text"] == ""
    assert sorted(got.columns) == ["text"]

    # normalized variants dedup together where raw bytes would not
    import hashlib
    a = got.loc[1, "text"]
    b = "caf\u00e9 composed"
    assert hashlib.md5(a.encode()).digest() \
        == hashlib.md5(b.encode()).digest()


def test_curate_documents_ref_dedup_gate(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from osm_cut_ray.pipelines.curate import curate_documents
    from osm_cut_ray.stages.cross_dedup import build_ref_minhash_index

    rng = np.random.default_rng(14)
    words = [f"x{i:03d}" for i in range(150)]
    ref_texts = [" ".join(rng.choice(words, 30).tolist())
                 for _ in range(20)]
    ref = rd.from_arrow(pa.table({
        "doc_id": np.arange(5000, 5020, dtype=np.int64),
        "text": ref_texts}))
    idx = build_ref_minhash_index(ref)

    # new shard: 4 near-copies of ref docs + 6 fresh docs
    near = []
    for i in range(4):
        ws = ref_texts[i * 3].split()
        ws[0] = "SWAP"
        near.append(" ".join(ws))
    fresh = [" ".join(rng.choice(words, 30).tolist()) for _ in range(6)]
    texts = near + fresh
    ids = np.arange(10, dtype=np.int64)
    p = str(tmp_path / "shard_n.parquet")
    pq.write_table(pa.table({"doc_id": ids, "text": texts}), p)

    out = str(tmp_path / "out")
    curate_documents(
        [p], out, langs=("en", "zh", "de", "fr", "es"), min_tokens=1,
        jaccard_threshold=0.99, max_dup_line_frac=1.0,
        max_top_bigram_frac=1.0,
        ref_dup_index=idx, ref_dup_threshold=0.7)
    kept = pa.concat_tables([
        pq.read_table(os.path.join(out, "shard_n", f))
        for f in os.listdir(os.path.join(out, "shard_n"))
        if f.endswith(".parquet")])
    assert sorted(kept["doc_id"].to_pylist()) == list(range(4, 10))


# ------------------------------------------------- corpus datasheet

def test_corpus_report(ray_session):
    from osm_cut_ray.pipelines.report import corpus_report

    texts = (["the and of to in is common english words here"] * 20
             + ["der die und das ist nicht deutsch satz"] * 6
             + ["一些中文内容在这里"] * 3
             + ["", "   "])
    # 5 exact duplicate groups inside the english block
    ids = np.arange(len(texts), dtype=np.int64)
    docs = rd.from_arrow(pa.table({"doc_id": ids, "text": texts})) \
        .repartition(7)
    r = corpus_report(docs)
    assert r["n_docs"] == len(texts)
    assert r["n_tokens"] == sum(len(t.split()) for t in texts)
    assert r["n_chars"] == sum(len(t) for t in texts)
    assert r["n_empty_docs"] == 2
    assert r["lang_counts"]["de"] == 6
    assert r["lang_counts"]["zh"] == 3
    # 31 docs, 5 distinct texts -> dup rate ~ 26/31 (HLL exact-ish at
    # tiny cardinality)
    assert abs(r["distinct_docs_est"] - 5) < 0.5
    assert r["dup_rate_est"] > 0.8
    assert r["token_quantiles"]["p50"] >= 8
    # determinism across partitionings (sketch merges are max-based)
    r2 = corpus_report(rd.from_arrow(
        pa.table({"doc_id": ids, "text": texts})))
    assert r2["n_tokens"] == r["n_tokens"]
    assert r2["distinct_docs_est"] == r["distinct_docs_est"]


def test_quantiles_by_key(ray_session):
    from osm_cut_ray.stages.heavy import quantiles_by_key

    rng = np.random.default_rng(27)
    keys_l, vals_l = [], []
    truth = {}
    for key in range(4):
        n = 3000 + 500 * key
        v = rng.gamma(2.0 + key, 10.0, n)
        keys_l.append(np.full(n, key, np.int64))
        vals_l.append(v)
        truth[key] = np.sort(v)
    ds = rd.from_arrow(pa.table({
        "cell": np.concatenate(keys_l),
        "val": np.concatenate(vals_l)})).repartition(8)

    got = quantiles_by_key(ds, "cell", "val",
                           qs=(0.1, 0.5, 0.9)).to_pandas() \
        .set_index("key").sort_index()
    for key in range(4):
        sv = truth[key]
        n = len(sv)
        assert got.loc[key, "n_key"] == n
        for q, col in ((0.1, "q_10"), (0.5, "q_50"), (0.9, "q_90")):
            est = got.loc[key, col]
            # KLL rank-error bound (~1.65/sqrt(200) ~ 0.12; allow 0.1
            # with margin): estimated value's true rank near q
            rank = np.searchsorted(sv, est) / n
            assert abs(rank - q) < 0.1, (key, q, rank)

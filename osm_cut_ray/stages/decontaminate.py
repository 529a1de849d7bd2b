"""Benchmark decontamination over the documents table.

A training-data pipeline must drop (or at least flag) documents that
overlap an evaluation benchmark — the n-gram-overlap pass described in
the public GPT-3 appendix / Dolma / FineWeb writeups. Ray-Data shape:
the benchmark side is tiny relative to the corpus (MBs vs TBs), so its
k-gram hash set is built ONCE on the driver, shipped ONCE via
`ray.put`, and every document is scored map-side inside `map_batches`
— ZERO shuffles; the corpus streams with backpressure.

Reuses the dedup family's token/shingle machinery (`stages/dedup.py`:
one blake2b per UNIQUE token, vectorized k-window combine), so a
"benchmark k-gram" here is bit-identical to the dedup shingle of the
same text — one hashing convention across the whole hygiene family.

At 100 TB: the broadcast payload is the sorted unique benchmark
shingle array (8 B/shingle; a full eval-suite is a few MB) plus a
Bloom filter (~1.5 B/shingle) that lets the clean majority of document
shingles skip the binary search. Nothing about the corpus ever lands
on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .dedup import _combine_shingles, _token_hashes_batch, shingle_hashes
from .join import BloomFilter


def benchmark_shingle_set(texts, k: int = 8) -> np.ndarray:
    """Sorted unique uint64 k-gram hashes of the benchmark corpus.

    Driver-side by design: benchmarks are small (the guide's broadcast
    rule — build the small side once, `ray.put` it, read it in every
    task)."""
    sets = [shingle_hashes(t, k) for t in texts]
    sets = [s for s in sets if len(s)]
    if not sets:
        return np.array([], np.uint64)
    return np.unique(np.concatenate(sets))


def _score_batch(t: pa.Table, k: int, bench_sorted: np.ndarray,
                 bloom: BloomFilter | None) -> pa.Table:
    """(doc_id, text) batch -> (doc_id, n_shingles, n_hits, overlap).

    Fully vectorized: one tokenize+hash pass for the batch, per-doc
    dedup via lexsort-mask (set semantics, matching `jaccard`), Bloom
    pre-filter + exact searchsorted membership, segment-sum per doc.
    """
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "n_shingles": pa.array([], pa.int64()),
                      "n_hits": pa.array([], pa.int64()),
                      "overlap": pa.array([], pa.float64())})
    if len(t) == 0 or "doc_id" not in t.column_names:
        return empty  # zero-row blocks lose their schema after spread
    th, offs = _token_hashes_batch(t["text"].to_pylist())
    doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(t)
    sh_per_doc = [_combine_shingles(th[offs[i]:offs[i + 1]], k)
                  for i in range(n)]
    lens = np.fromiter((len(s) for s in sh_per_doc), np.int64, n)
    n_sh = np.zeros(n, np.int64)
    n_hit = np.zeros(n, np.int64)
    if lens.sum():
        flat = np.concatenate([s for s in sh_per_doc if len(s)])
        didx = np.repeat(np.arange(n, dtype=np.int64), lens)
        # per-doc set semantics: sort by (doc, shingle), drop repeats
        order = np.lexsort((flat, didx))
        flat, didx = flat[order], didx[order]
        first = np.concatenate(([True], (didx[1:] != didx[:-1])
                                | (flat[1:] != flat[:-1])))
        flat, didx = flat[first], didx[first]
        n_sh = np.bincount(didx, minlength=n).astype(np.int64)
        if len(bench_sorted):
            maybe = bloom.might_contain(flat.view(np.int64)) \
                if bloom is not None else np.ones(len(flat), bool)
            hit = np.zeros(len(flat), bool)
            if maybe.any():
                cand = flat[maybe]
                pos = np.searchsorted(bench_sorted, cand)
                pos_c = np.minimum(pos, len(bench_sorted) - 1)
                hit[maybe] = bench_sorted[pos_c] == cand
            n_hit = np.bincount(didx, weights=hit,
                                minlength=n).astype(np.int64)
    return pa.table({
        "doc_id": doc_ids,
        "n_shingles": n_sh,
        "n_hits": n_hit,
        "overlap": np.where(n_sh > 0, n_hit / np.maximum(n_sh, 1), 0.0),
    })


def contamination_scores(docs_ds, bench_hashes: np.ndarray, *,
                         shingle_k: int = 8,
                         use_bloom: bool | None = None):
    """Score every document's benchmark k-gram overlap, map-side.

    docs_ds: Dataset (doc_id, text). bench_hashes: output of
    `benchmark_shingle_set` (sorted unique uint64). Returns a streamed
    Dataset (doc_id, n_shingles, n_hits, overlap) — overlap is the
    fraction of the document's DISTINCT k-grams present in the
    benchmark set (the contaminated-fraction metric).

    The sorted hash array (and, when it is large, a Bloom pre-filter)
    is `ray.put` once; each map task reads it zero-copy from the
    object store. `use_bloom=None` auto-enables the filter past 64k
    benchmark shingles (below that the binary search is already cheap).
    """
    from .dedup import _spread
    bench_sorted = np.asarray(bench_hashes, np.uint64)
    if use_bloom is None:
        use_bloom = len(bench_sorted) > 65536
    bloom = BloomFilter(bench_sorted.view(np.int64)) \
        if (use_bloom and len(bench_sorted)) else None
    ref = ray.put((bench_sorted, bloom))

    def score(t: pa.Table) -> pa.Table:
        bs, bl = ray.get(ref)  # zero-copy numpy views of plasma buffers
        return _score_batch(t, shingle_k, bs, bl)

    return _spread(docs_ds).map_batches(score, batch_format="pyarrow")


def decontaminate(docs_ds, bench_texts, *, shingle_k: int = 8,
                  max_overlap: float = 0.1):
    """Drop documents whose benchmark k-gram overlap exceeds
    `max_overlap`; returns (clean_docs_ds, report_dict).

    The keep/drop decision needs only the slim score table; the kept
    ids are pulled to the driver ONLY to build the broadcast keep set
    when small — past `broadcast_is_in` limits a caller can semi-join
    `contamination_scores` output against the corpus instead (same
    two-strategy discipline as the cut pipelines)."""
    import pyarrow.compute as pc

    from .join import broadcast_is_in
    bench = benchmark_shingle_set(bench_texts, shingle_k)
    scores = contamination_scores(docs_ds, bench, shingle_k=shingle_k)
    # vectorized flag filter per batch; only the contaminated TAIL's
    # ids reach the driver (clean corpora: zero rows)
    flagged = scores.map_batches(
        lambda t: t.filter(pc.greater(t["overlap"], max_overlap))
        .select(["doc_id"]) if len(t)
        else pa.table({"doc_id": pa.array([], pa.int64())}),
        batch_format="pyarrow")
    bad_l = [b["doc_id"].to_numpy(zero_copy_only=False)
             for b in flagged.iter_batches(batch_size=None,
                                           batch_format="pyarrow")
             if b.num_rows]
    bad_ids = np.concatenate(bad_l).astype(np.int64) \
        if bad_l else np.array([], np.int64)
    n_total = docs_ds.count()
    clean = broadcast_is_in(docs_ds, "doc_id", bad_ids, mode="anti") \
        if len(bad_ids) else docs_ds
    report = {"n_docs": int(n_total), "n_flagged": int(len(bad_ids)),
              "max_overlap": max_overlap, "shingle_k": shingle_k,
              "n_bench_shingles": int(len(bench))}
    return clean, report

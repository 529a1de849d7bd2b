"""End-to-end training-corpus curation: the composed pipeline a
100-TB documents corpus actually runs, built from the engine's hygiene
operators.

Two-phase shape chosen for scale:

1. GLOBAL DECISION PASSES over slim projections compute the small
   drop-id sets — exact-dup non-representatives (content-hash
   bucketed groups), MinHash near-dup non-representatives (LSH pairs
   -> connected components, keep min id), benchmark-contaminated docs
   (broadcast k-gram overlap). Only (id, hash/fingerprint) columns
   transit these shuffles; the verified outputs are orders of
   magnitude smaller than the corpus.
2. A PER-SHARD RESUMABLE REWRITE streams every input shard through
   map-side filters (quality/repetition/language thresholds computed
   in-place, drop-id broadcast anti-join) and writes partitioned
   parquet with manifest-last checkpoints (`state/checkpoint.py`) —
   a failed run reprocesses only unfinished shards, and the global
   decisions are reused because they are part of the params lineage
   only through their thresholds (decision sets are deterministic
   functions of the inputs).

Per-doc decisions are deliberately id-based so phase 2 needs no
second shuffle: the drop set broadcasts once via `ray.put`.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..sources.tables import sf_path, strip_schema_metadata
from ..stages import join as J
from ..stages.decontaminate import benchmark_shingle_set, \
    contamination_scores
from ..stages.dedup import _spread, dup_clusters, minhash_lsh_pairs
from ..stages.text import LANG_RES, CJK_RE, repetition_stats
from ..state.checkpoint import run_resumable


def _exact_dup_drop_ids(docs_ds) -> np.ndarray:
    """doc_ids that are exact-content duplicates of a smaller id.

    md5-low64 of the text per batch (hash + id transit the shuffle,
    never text), ONE bucketed-group pass emitting every non-min id per
    hash group."""
    def h(df: pd.DataFrame) -> pa.Table:
        hs = np.fromiter(
            (int.from_bytes(hashlib.md5(s.encode()).digest()[8:],
                            "little") for s in df["text"].astype(str)),
            np.uint64, len(df))
        return pa.table({"h": pa.array(hs.view(np.int64)),
                         "doc_id": pa.array(
                             df["doc_id"].to_numpy(np.int64))})

    hashed = _spread(docs_ds).map_batches(h, batch_format="pandas")

    def drops(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64)})
        g = g.sort_values(["h", "doc_id"])
        dup = g["h"].to_numpy() == np.roll(g["h"].to_numpy(), 1)
        dup[0] = False
        return pd.DataFrame({"doc_id": g["doc_id"].to_numpy()[dup]})

    out = J.bucketed_group_apply(hashed, "h", drops)
    ids = [b["doc_id"].to_numpy(zero_copy_only=False)
           for b in out.iter_batches(batch_size=None,
                                     batch_format="pyarrow")
           if b.num_rows]
    return np.concatenate(ids).astype(np.int64) if ids \
        else np.array([], np.int64)


def _near_dup_drop_ids(docs_ds, jaccard_threshold: float) -> np.ndarray:
    """Non-representative members of MinHash near-dup clusters
    (keep the min id of each connected component)."""
    pairs = minhash_lsh_pairs(docs_ds,
                              jaccard_threshold=jaccard_threshold)
    if len(pairs) == 0:
        return np.array([], np.int64)
    cl = dup_clusters(pairs)
    doc = cl["doc_id"].to_numpy(zero_copy_only=False)
    rep = cl["cluster_id"].to_numpy(zero_copy_only=False)
    return doc[doc != rep].astype(np.int64)


def _contaminated_ids(docs_ds, bench_texts, shingle_k: int,
                      max_overlap: float) -> np.ndarray:
    import pyarrow.compute as pc
    bench = benchmark_shingle_set(bench_texts, shingle_k)
    if len(bench) == 0:
        return np.array([], np.int64)
    scores = contamination_scores(docs_ds, bench, shingle_k=shingle_k)
    flagged = scores.map_batches(
        lambda t: t.filter(pc.greater(t["overlap"], max_overlap))
        .select(["doc_id"]) if len(t)
        else pa.table({"doc_id": pa.array([], pa.int64())}),
        batch_format="pyarrow")
    ids = [b["doc_id"].to_numpy(zero_copy_only=False)
           for b in flagged.iter_batches(batch_size=None,
                                         batch_format="pyarrow")
           if b.num_rows]
    return np.concatenate(ids).astype(np.int64) if ids \
        else np.array([], np.int64)


def _quality_filter_batch(t: pa.Table, *, langs: tuple[str, ...],
                          max_dup_line_frac: float,
                          max_top_bigram_frac: float,
                          min_tokens: int) -> pa.Table:
    """Map-side in-place quality gate: language allow-list +
    repetition thresholds + minimum length, computed on the batch and
    applied immediately (no stats join)."""
    if len(t) == 0 or "doc_id" not in t.column_names:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "text": pa.array([], pa.string())})
    text = pd.Series(t["text"].to_pylist()).astype(str)
    low = text.str.lower()
    counts = {k: low.str.count(v).to_numpy() for k, v in LANG_RES.items()}
    c_zh = text.str.count(CJK_RE).to_numpy()
    en, de, fr, es = counts["en"], counts["de"], counts["fr"], counts["es"]
    lang = np.select(
        [c_zh > 0,
         (en >= de) & (en >= fr) & (en >= es),
         (de >= fr) & (de >= es),
         fr >= es],
        ["zh", "en", "de", "fr"], default="es")  # == stages.text.LangId
    rep = repetition_stats(t)
    n_tok = text.str.count(r"\S+").to_numpy()
    keep = (np.isin(lang, list(langs))
            & (rep["dup_line_frac"].to_numpy() <= max_dup_line_frac)
            & (rep["top_bigram_frac"].to_numpy() <= max_top_bigram_frac)
            & (n_tok >= min_tokens))
    return t.filter(pa.array(keep))


def _model_low_ids(docs_ds, weights, min_score: float) -> np.ndarray:
    """doc_ids scored below `min_score` by a fitted linear quality
    classifier (stages/classify.py) — slim (id, score) stream, only
    the rejected tail's ids reach the driver."""
    import pyarrow.compute as pc

    from ..stages.classify import score_quality
    scores = score_quality(docs_ds, weights)
    low = scores.map_batches(
        lambda t: t.filter(pc.less(t["score"], min_score))
        .select(["doc_id"]) if len(t)
        else pa.table({"doc_id": pa.array([], pa.int64())}),
        batch_format="pyarrow")
    ids = [b["doc_id"].to_numpy(zero_copy_only=False)
           for b in low.iter_batches(batch_size=None,
                                     batch_format="pyarrow")
           if b.num_rows]
    return np.concatenate(ids).astype(np.int64) if ids \
        else np.array([], np.int64)


def _lm_high_ids(docs_ds, lm, max_xent: float) -> np.ndarray:
    """doc_ids whose bigram-LM cross-entropy exceeds `max_xent`
    (stages/lm_score.py) — slim (id, xent) stream, only the rejected
    tail's ids reach the driver. NaN scores (< 2 tokens) pass."""
    import pyarrow.compute as pc

    from ..stages.lm_score import lm_cross_entropy
    scores = lm_cross_entropy(docs_ds, lm)
    high = scores.map_batches(
        lambda t: t.filter(pc.greater(t["lm_xent"], max_xent))
        .select(["doc_id"]) if len(t)
        else pa.table({"doc_id": pa.array([], pa.int64())}),
        batch_format="pyarrow")
    ids = [b["doc_id"].to_numpy(zero_copy_only=False)
           for b in high.iter_batches(batch_size=None,
                                      batch_format="pyarrow")
           if b.num_rows]
    return np.concatenate(ids).astype(np.int64) if ids \
        else np.array([], np.int64)


def curate_documents(input_paths, out_dir: str, *,
                     bench_texts=(), shingle_k: int = 8,
                     max_overlap: float = 0.1,
                     jaccard_threshold: float = 0.8,
                     langs: tuple[str, ...] = ("en",),
                     max_dup_line_frac: float = 0.5,
                     max_top_bigram_frac: float = 0.5,
                     min_tokens: int = 3,
                     redact_pii: bool = False,
                     quality_model: np.ndarray | None = None,
                     min_model_score: float = 0.5,
                     drop_boilerplate: bool = False,
                     boilerplate_min_df: int = 4,
                     boilerplate_min_chars: int = 8,
                     lm_model=None,
                     lm_max_xent: float = float("inf"),
                     ref_dup_index=None,
                     ref_dup_threshold: float = 0.8) -> dict:
    """Curate a documents corpus into `out_dir` (one parquet directory
    per input shard, manifest-last checkpoints). Returns the resume
    report extended with per-cause drop counters.

    input_paths: list of parquet paths, each with (doc_id, text) —
    doc_ids must be globally unique across shards."""
    docs = strip_schema_metadata(
        rd.read_parquet(list(input_paths), columns=["doc_id", "text"]))

    exact = _exact_dup_drop_ids(docs)
    near = _near_dup_drop_ids(docs, jaccard_threshold)
    contam = _contaminated_ids(docs, list(bench_texts), shingle_k,
                               max_overlap)
    modeled = _model_low_ids(docs, quality_model, min_model_score) \
        if quality_model is not None else np.array([], np.int64)
    lm_high = _lm_high_ids(docs, lm_model, lm_max_xent) \
        if lm_model is not None else np.array([], np.int64)
    drop = np.unique(np.concatenate([exact, near, contam, modeled,
                                     lm_high])) \
        if len(exact) + len(near) + len(contam) + len(modeled) \
        + len(lm_high) else np.array([], np.int64)

    import ray as _ray

    from ..stages.line_dedup import drop_hot_lines, hot_line_hashes
    hot_ref = None
    n_hot = 0
    if drop_boilerplate:
        hot = hot_line_hashes(docs, min_df=boilerplate_min_df,
                              min_line_chars=boilerplate_min_chars)
        n_hot = int(len(hot))
        hot_ref = _ray.put(np.ascontiguousarray(hot))

    model_fp = hashlib.md5(
        np.ascontiguousarray(quality_model, np.float64).tobytes()
    ).hexdigest() if quality_model is not None else None
    lm_fp = hashlib.md5(
        lm_model.uni.tobytes() + lm_model.big.tobytes()
        + np.float64([lm_model.alpha, lm_model.dim]).tobytes()
    ).hexdigest() if lm_model is not None else None
    ref_fp = hashlib.md5(
        ref_dup_index.ids.tobytes() + ref_dup_index.sigs.tobytes()
    ).hexdigest() if ref_dup_index is not None else None
    params = {"shingle_k": shingle_k, "max_overlap": max_overlap,
              "jaccard_threshold": jaccard_threshold,
              "langs": list(langs),
              "max_dup_line_frac": max_dup_line_frac,
              "max_top_bigram_frac": max_top_bigram_frac,
              "min_tokens": min_tokens,
              "n_bench": len(bench_texts),
              "redact_pii": redact_pii,
              "model_fp": model_fp,
              "min_model_score": min_model_score if model_fp else None,
              "drop_boilerplate": drop_boilerplate,
              "boilerplate_min_df": boilerplate_min_df
              if drop_boilerplate else None,
              "boilerplate_min_chars": boilerplate_min_chars
              if drop_boilerplate else None,
              "lm_fp": lm_fp,
              "lm_max_xent": lm_max_xent if lm_fp else None,
              "ref_fp": ref_fp,
              "ref_dup_threshold": ref_dup_threshold if ref_fp
              else None}

    def process(path: str):
        from ..stages.pii import PiiScrub
        shard = strip_schema_metadata(
            rd.read_parquet(path, columns=["doc_id", "text"]))
        if hot_ref is not None:
            # boilerplate strip FIRST (C4 order): quality stats and
            # PII run on the cleaned text; schema back to (id, text)
            shard = drop_hot_lines(
                shard, hot_ref,
                min_line_chars=boilerplate_min_chars) \
                .select_columns(["doc_id", "text"])
        gated = shard.map_batches(
            lambda t: _quality_filter_batch(
                t, langs=langs, max_dup_line_frac=max_dup_line_frac,
                max_top_bigram_frac=max_top_bigram_frac,
                min_tokens=min_tokens),
            batch_format="pyarrow")
        if ref_dup_index is not None:
            # incremental-ingest dedup vs the EXISTING corpus: pure
            # map-side probe of the broadcast index (zero shuffles)
            from ..stages.cross_dedup import text_cross_dup_filter
            gated = text_cross_dup_filter(
                gated, ref_dup_index, mode="anti",
                est_threshold=ref_dup_threshold)
        if redact_pii:
            # rewrite text in the same per-shard pass (no extra
            # shuffle); output schema stays (doc_id, text)
            gated = gated.map_batches(
                PiiScrub, batch_format="pandas",
                concurrency=(1, 4)).select_columns(["doc_id", "text"])
        return J.broadcast_is_in(gated, "doc_id", drop, mode="anti") \
            if len(drop) else gated

    shards = [(os.path.splitext(os.path.basename(p))[0] or f"s{i}", p)
              for i, p in enumerate(input_paths)]
    report = run_resumable(shards, process, out_dir, params=params)
    report["n_drop_exact_dup"] = int(len(exact))
    report["n_drop_near_dup"] = int(len(near))
    report["n_drop_contaminated"] = int(len(contam))
    report["n_drop_model"] = int(len(modeled))
    report["n_drop_lm"] = int(len(lm_high))
    report["n_hot_lines"] = n_hot
    return report


def curate_sf_documents(sf_dir: str, out_dir: str, **kwargs) -> dict:
    """Convenience wrapper over the sf test layout."""
    return curate_documents([sf_path(sf_dir, "documents")], out_dir,
                            **kwargs)

"""Stub image / caption embeddings + CLIP-style scoring plumbing.

The north_star pipeline family includes model-based curation (CLIP
score filtering, embedding near-dup, image similarity search). No
model runtime exists in this container, so — exactly like the image
codec stubs (`sources/images.py:5-15`) — the MODELS are deterministic
stand-ins while every Ray-side contract is real: embeddings are
`list<float>` Arrow columns computed map-side in one decode pass,
image bytes never transit shuffles, scores are scalar columns, and
the outputs plug straight into the existing similarity machinery
(`stages/knn.py:knn_brute/knn_ivf`, `stages/dedup.py:
embedding_dup_pairs`). Swap `embed_stack` / `embed_captions` for a
real vision/text encoder on a GPU cluster — nothing else changes.

Stub encoders (both deterministic and L2-normalized):

- image: 8x8 thumbnail (shared `resize_stack`), mean-centered, L2 —
  similar pixels => similar embeddings, so near-dup retrieval is
  genuinely exercised end-to-end.
- caption: signed token-hash projection (blake2b low bits pick the
  dimension and the sign — the classic feature-hashing trick), L2.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..sources.images import resize_stack
from .image_quality import decode_by_shape

EMBED_DIM = 64
_SIDE = 8


def embed_stack(stack: np.ndarray) -> np.ndarray:
    """(m, h, w) uint8 -> (m, 64) float64 stub image embeddings."""
    m = stack.shape[0]
    small = resize_stack(stack, _SIDE, _SIDE).reshape(m, EMBED_DIM) \
        .astype(np.float64)
    small -= small.mean(axis=1, keepdims=True)
    n = np.linalg.norm(small, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return small / n


def embed_captions(texts) -> np.ndarray:
    """list[str] -> (n, 64) float64 stub caption embeddings via signed
    feature hashing of whitespace tokens (vectorized accumulation)."""
    from .dedup import _token_hashes_batch
    hashes, offs = _token_hashes_batch(texts)
    out = np.zeros((len(texts), EMBED_DIM), np.float64)
    if len(hashes):
        doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64),
                            np.diff(offs))
        dims = (hashes % EMBED_DIM).astype(np.int64)
        signs = np.where((hashes >> np.uint64(32)) & np.uint64(1),
                         1.0, -1.0)
        np.add.at(out, (doc_idx, dims), signs)
    n = np.linalg.norm(out, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return out / n


def _embed_images_batch(t: pa.Table, id_prefix_len: int) -> pa.Table:
    empty = pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float64()))})
    if len(t) == 0 or "image_id" not in t.column_names:
        return empty
    from ..pipelines.curate_images import parse_image_ids
    ids = parse_image_ids(t["image_id"], id_prefix_len)
    pixels, by_shape = decode_by_shape(t["bytes"].to_pylist())
    emb = np.empty((len(t), EMBED_DIM), np.float64)
    for _, idxs in by_shape.items():
        idx = np.asarray(idxs, np.int64)
        emb[idx] = embed_stack(np.stack([pixels[i] for i in idxs]))
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(emb.ravel()), EMBED_DIM).cast(
                pa.list_(pa.float64()))})


def image_embeddings(images_ds, *, id_prefix_len: int = 3):
    """input_hint-shaped Dataset -> (vec_id:int64,
    embedding:list<float64>) — the shape `knn_brute` / `knn_ivf` /
    `embedding_dup_pairs` consume, so image similarity search and
    embedding-cosine image dedup reuse the tested machinery as-is."""
    from .dedup import _spread
    return _spread(images_ds).map_batches(
        lambda t: _embed_images_batch(t, id_prefix_len),
        batch_format="pyarrow")


def image_knn_brute(images_ds, probe_keys, *, k: int = 5,
                    id_prefix_len: int = 3) -> pa.Table:
    """Exact cosine top-k image retrieval: embed the corpus map-side,
    pull only the probe vectors to the driver (|probes| rows), then
    run the broadcast-probe brute kNN. Returns (probe_id, neighbor_id,
    sim)."""
    from .join import broadcast_is_in
    from .knn import knn_brute
    probe_keys = np.asarray(probe_keys, np.int64)
    emb = image_embeddings(images_ds,
                           id_prefix_len=id_prefix_len).materialize()
    probes = broadcast_is_in(emb, "vec_id", probe_keys).take_all()
    pid = np.array([r["vec_id"] for r in probes], np.int64)
    pmat = np.stack([np.asarray(r["embedding"], np.float64)
                     for r in probes])
    return knn_brute(emb, pid, pmat, k=k)


def clip_scores(images_ds, *, id_prefix_len: int = 3):
    """Per-row caption<->image agreement score: cosine of the two stub
    embeddings, computed in ONE decode pass map-side. Output:
    (image_id, clip_score:float64). With a real CLIP the same stage
    becomes the LAION-style alignment filter's scoring pass."""
    def fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"image_id": pa.array([], pa.string()),
                          "clip_score": pa.array([], pa.float64())})
        if len(t) == 0 or "image_id" not in t.column_names:
            return empty
        pixels, by_shape = decode_by_shape(t["bytes"].to_pylist())
        ie = np.empty((len(t), EMBED_DIM), np.float64)
        for _, idxs in by_shape.items():
            idx = np.asarray(idxs, np.int64)
            ie[idx] = embed_stack(np.stack([pixels[i] for i in idxs]))
        ce = embed_captions([c if c is not None else ""
                             for c in t["caption"].to_pylist()])
        return pa.table({
            "image_id": t["image_id"],
            "clip_score": pa.array((ie * ce).sum(axis=1))})

    from .dedup import _spread
    return _spread(images_ds).map_batches(fn, batch_format="pyarrow")


def clip_filter(images_ds, *, min_score: float,
                id_prefix_len: int = 3):
    """Drop rows whose caption<->image score is below `min_score`,
    keeping the input_hint schema — the filter is applied in the same
    map_batches that scores, so low-score blobs die map-side and never
    transit anywhere."""
    from ..pipelines.curate_images import EMPTY_HINT

    def fn(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "image_id" not in t.column_names:
            return EMPTY_HINT
        pixels, by_shape = decode_by_shape(t["bytes"].to_pylist())
        ie = np.empty((len(t), EMBED_DIM), np.float64)
        for _, idxs in by_shape.items():
            idx = np.asarray(idxs, np.int64)
            ie[idx] = embed_stack(np.stack([pixels[i] for i in idxs]))
        ce = embed_captions([c if c is not None else ""
                             for c in t["caption"].to_pylist()])
        keep = (ie * ce).sum(axis=1) >= min_score
        out = t.filter(pa.array(keep))
        return out if len(out) else EMPTY_HINT

    from .dedup import _spread
    return _spread(images_ds).map_batches(fn, batch_format="pyarrow")


def image_embedding_dup_pairs(images_ds, *, cosine_threshold: float = 0.999,
                              n_bits: int = 16, seed: int = 42,
                              id_prefix_len: int = 3) -> pa.Table:
    """Embedding-cosine near-duplicate image pairs: the third dedup
    modality next to bytes-md5 (exact) and aHash (perceptual) — at a
    real deployment this catches semantic dups (rescaled/recropped
    variants) the pixel hashes miss. Embeds map-side, then reuses the
    hyperplane-LSH + exact-verify machinery on the 64-dim vectors."""
    from .dedup import embedding_dup_pairs
    emb = image_embeddings(images_ds, id_prefix_len=id_prefix_len)
    return embedding_dup_pairs(emb, cosine_threshold=cosine_threshold,
                               n_bits=n_bits, seed=seed)


def caption_dup_pairs(images_ds, *, jaccard_threshold: float = 0.8,
                      id_prefix_len: int = 3) -> pa.Table:
    """Near-duplicate CAPTION pairs over the image table — boilerplate
    and spam captions ("stock photo of ...") are the text-side dup
    signal in image+text corpora. Projects (doc_id, text=caption)
    map-side and reuses the fully-distributed MinHash-LSH pipeline."""
    from ..pipelines.curate_images import parse_image_ids
    from .dedup import minhash_lsh_pairs

    def project(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "image_id" not in t.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "text": pa.array([], pa.string())})
        return pa.table({
            "doc_id": pa.array(parse_image_ids(t["image_id"],
                                               id_prefix_len)),
            "text": t["caption"]})

    docs = images_ds.map_batches(project, batch_format="pyarrow")
    return minhash_lsh_pairs(docs, jaccard_threshold=jaccard_threshold)


def image_knn_ivf(images_ds, probe_keys, *, k: int = 5,
                  n_centroids: int = 16, nprobe: int = 4,
                  id_prefix_len: int = 3) -> pa.Table:
    """Approximate image retrieval at scale: embed map-side, then
    search only the `nprobe` nearest IVF cells (deterministic sampled
    k-means centroids, `stages/knn.py:knn_ivf`). Recall < 1 by design;
    pinned against `image_knn_brute` in tests."""
    from .join import broadcast_is_in
    from .knn import knn_ivf
    probe_keys = np.asarray(probe_keys, np.int64)
    emb = image_embeddings(images_ds,
                           id_prefix_len=id_prefix_len).materialize()
    probes = broadcast_is_in(emb, "vec_id", probe_keys).take_all()
    pid = np.array([r["vec_id"] for r in probes], np.int64)
    pmat = np.stack([np.asarray(r["embedding"], np.float64)
                     for r in probes])
    return knn_ivf(emb, pid, pmat, k=k, n_centroids=n_centroids,
                   nprobe=nprobe)

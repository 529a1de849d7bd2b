"""Retrieval-quality evaluation: recall@k of an embedding index —
the measurement a curation pipeline needs before trusting
embedding-based dedup or search (does a perturbed copy retrieve its
original?).

`retrieval_recall` is the general harness: broadcast query vectors
against a distributed (vec_id, embedding) corpus via the oracled
`knn_brute` (probe ids are offset into a private range so its
self-exclusion rule never hides a true hit), then score each query's
expected id against the ranked neighbors.

`image_query_recall` is the self-contained image variant: sample
n_queries images deterministically (smallest sample_hash — one
streamed pass, no shuffle), perturb each with reproducible +/-noise
uint8 jitter, embed the jittered copy, and expect the ORIGINAL image
back. With the stub encoders this pins the whole distributed
retrieval path end to end; with real encoders the same harness
measures actual index quality.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .geo_sample import sample_hash

_PROBE_OFFSET = np.int64(1) << 48


def retrieval_recall(emb_ds, probe_mat: np.ndarray,
                     expected_ids: np.ndarray, *,
                     ks: tuple[int, ...] = (1, 5, 10),
                     round_to: int | None = 6) -> dict:
    """-> {"recall@k": float for k in ks, "n_queries": n}. Ranks are
    knn_brute's (sim desc, neighbor_id) order."""
    from .knn import knn_brute
    expected_ids = np.asarray(expected_ids, np.int64)
    n = len(expected_ids)
    if n == 0:
        return {**{f"recall@{k}": 0.0 for k in ks}, "n_queries": 0}
    pids = _PROBE_OFFSET + np.arange(n, dtype=np.int64)
    nn = knn_brute(emb_ds, pids, np.asarray(probe_mat, np.float64),
                   k=max(ks), round_to=round_to)
    p = nn["probe_id"].to_numpy(zero_copy_only=False) - _PROBE_OFFSET
    nb = nn["neighbor_id"].to_numpy(zero_copy_only=False)
    # knn_brute returns rows grouped per probe in rank order
    rank_of = {}
    seen: dict[int, int] = {}
    for q, neigh in zip(p.tolist(), nb.tolist()):
        r = seen.get(q, 0)
        seen[q] = r + 1
        if neigh == expected_ids[q]:
            rank_of[q] = r
    out = {}
    for k in ks:
        hits = sum(1 for q, r in rank_of.items() if r < k)
        out[f"recall@{k}"] = hits / n
    out["n_queries"] = n
    return out


def _sample_min_hash(images_ds, n: int, id_prefix_len: int = 3):
    """Smallest-`sample_hash` rows: per-batch partial top-n + tiny
    driver merge (no shuffle). -> pa.Table of the sampled rows."""

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        from ..pipelines.curate_images import parse_image_ids
        ids = parse_image_ids(t["image_id"], id_prefix_len)
        h = sample_hash(ids)
        keep = np.argsort(h, kind="stable")[:n]
        return t.take(pa.array(np.sort(keep)))

    parts = [b for b in images_ds.map_batches(
        partial, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows]
    if not parts:
        return None
    allp = pa.concat_tables(parts, promote_options="default")
    from ..pipelines.curate_images import parse_image_ids
    ids = parse_image_ids(allp["image_id"], id_prefix_len)
    keep = np.argsort(sample_hash(ids), kind="stable")[:n]
    return allp.take(pa.array(np.sort(keep)))


def image_query_recall(images_ds, *, n_queries: int = 128,
                       noise: int = 2, seed: int = 0,
                       ks: tuple[int, ...] = (1, 5, 10),
                       id_prefix_len: int = 3) -> dict:
    """Perturbed-copy retrieval eval over an input_hint image corpus
    (module docstring)."""
    from ..pipelines.curate_images import parse_image_ids
    from ..sources.images import decode_image
    from .image_embed import embed_stack, image_embeddings

    emb = image_embeddings(images_ds,
                           id_prefix_len=id_prefix_len).materialize()
    sample = _sample_min_hash(images_ds, n_queries, id_prefix_len)
    if sample is None:
        return {**{f"recall@{k}": 0.0 for k in ks}, "n_queries": 0}
    expected = parse_image_ids(sample["image_id"], id_prefix_len)
    rng = np.random.default_rng(seed)
    probes = []
    for buf in sample["bytes"].to_pylist():
        px = decode_image(buf)[0].astype(np.int64)
        jit = rng.integers(-noise, noise + 1, px.shape)
        px = np.clip(px + jit, 0, 255).astype(np.uint8)
        probes.append(embed_stack(px[None])[0])
    return retrieval_recall(emb, np.stack(probes),
                            np.asarray(expected, np.int64), ks=ks)

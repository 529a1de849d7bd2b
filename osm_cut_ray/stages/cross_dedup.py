"""Cross-corpus TEXT dedup: filter a NEW document shard against an
EXISTING training corpus without reshuffling the old corpus — the
text analog of `stages/image_dedup.py:RefFpIndex`, and the
incremental-ingest path every growing corpus needs (the within-corpus
`minhash_lsh_pairs` self-join would re-pay the whole corpus's shuffle
on every ingest).

Ray-Data shape:

- **Build** — one distributed pass computes MinHash signatures over
  the reference corpus (the shared `MinHasher`, identical permutation
  params / band hashing as the self-join pipeline, so a doc flagged
  by one is flagged by the other); only the (id, 64x8 B signature)
  projection is pulled and packed into per-band sorted arrays. The
  broadcast side must fit — `max_ref_docs` RAISES (never truncates)
  when it doesn't; shard the reference and probe per shard past that.
- **Probe** — `ray.put` once, then pure map-side: each batch of new
  docs computes its signatures, looks up each band hash by
  binary search, and VERIFIES candidates by signature agreement
  (matching permutations / n_perm — the standard unbiased Jaccard
  estimate). Zero shuffles; the new corpus streams.

Semantics: candidate generation is standard LSH (probabilistic recall
following the band S-curve — NOT the pigeonhole guarantee of the
Hamming fingerprint path); verification is the signature-estimated
Jaccard, not exact shingle Jaccard. Both are the canonical trade for
an index that must fit in one broadcast. Degenerate band buckets are
truncated at `max_candidates` with a surfaced count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .dedup import _STAGE_CACHE, MinHasher, shingle_hashes

_BAND_MUL = np.uint64(0x9E3779B97F4A7C15)


def _band_hashes(sigs: np.ndarray, n_bands: int) -> np.ndarray:
    """(n, n_perm) signatures -> (n, n_bands) band hashes; the exact
    formula of `dedup.band_rows` so cross- and self-join LSH agree."""
    n, n_perm = sigs.shape
    rpb = n_perm // n_bands
    out = np.empty((n, n_bands), np.uint64)
    with np.errstate(over="ignore"):
        for bnd in range(n_bands):
            seg = sigs[:, bnd * rpb:(bnd + 1) * rpb]
            out[:, bnd] = np.bitwise_xor.reduce(
                seg * _BAND_MUL + np.uint64(bnd), axis=1)
    return out


class RefMinhashIndex:
    """Broadcastable banded MinHash index over a reference corpus."""

    def __init__(self, ids: np.ndarray, sigs: np.ndarray, *,
                 n_bands: int = 16, n_perm: int = 64,
                 shingle_k: int = 3, seed: int = 42):
        self.n_bands, self.n_perm = n_bands, n_perm
        self.shingle_k, self.seed = shingle_k, seed
        self.ids = np.asarray(ids, np.int64)
        self.sigs = np.ascontiguousarray(sigs, np.uint64)
        if len(self.ids):
            bh = _band_hashes(self.sigs, n_bands)
            self.band_sorted, self.band_order = [], []
            for b in range(n_bands):
                order = np.argsort(bh[:, b], kind="stable")
                self.band_sorted.append(bh[order, b])
                self.band_order.append(order.astype(np.int64))
        else:
            self.band_sorted = [np.array([], np.uint64)] * n_bands
            self.band_order = [np.array([], np.int64)] * n_bands

    def query(self, probe_sigs: np.ndarray, *,
              est_threshold: float = 0.8,
              max_candidates: int = 4096
              ) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
        """(m, n_perm) probe signatures -> (hit mask, best ref id or
        -1, best agreement fraction, truncated-candidate count)."""
        m = len(probe_sigs)
        hit = np.zeros(m, bool)
        ref = np.full(m, -1, np.int64)
        best = np.zeros(m, np.float64)
        truncated = 0
        if m == 0 or len(self.ids) == 0:
            return hit, ref, best, truncated
        pbh = _band_hashes(np.ascontiguousarray(probe_sigs, np.uint64),
                           self.n_bands)
        for b in range(self.n_bands):
            todo = np.flatnonzero(~hit)
            if len(todo) == 0:
                break
            lo = np.searchsorted(self.band_sorted[b], pbh[todo, b], "left")
            hi = np.searchsorted(self.band_sorted[b], pbh[todo, b], "right")
            for j, i in enumerate(todo.tolist()):
                l, h = int(lo[j]), int(hi[j])
                if h - l > max_candidates:
                    truncated += h - l - max_candidates
                    h = l + max_candidates
                if h <= l:
                    continue
                cand = self.band_order[b][l:h]
                agree = (self.sigs[cand] == probe_sigs[i]).mean(axis=1)
                k = int(np.argmax(agree))
                if agree[k] > best[i] or (agree[k] == best[i]
                                          and ref[i] == -1):
                    best[i] = float(agree[k])
                    ref[i] = self.ids[cand[k]]
                if agree[k] >= est_threshold:
                    hit[i] = True
        return hit, ref, best, truncated


def build_ref_minhash_index(ref_docs_ds, *, n_perm: int = 64,
                            n_bands: int = 16, shingle_k: int = 3,
                            seed: int = 42,
                            max_ref_docs: int = 20_000_000
                            ) -> RefMinhashIndex:
    """Signature the reference corpus distributed; pull only the slim
    (id, signature) projection. Raises past `max_ref_docs` — shard the
    reference instead of silently degrading."""
    n = ref_docs_ds.count()
    if n > max_ref_docs:
        raise ValueError(f"reference corpus {n} docs exceeds "
                         f"max_ref_docs={max_ref_docs}")
    sig_ds = ref_docs_ds.map_batches(
        lambda df: MinHasher(n_perm, seed, shingle_k)(df),
        batch_format="pandas")
    ids_l, sigs_l = [], []
    for b in sig_ds.iter_batches(batch_size=None, batch_format="pandas"):
        if len(b):
            ids_l.append(b["doc_id"].to_numpy(np.int64))
            sigs_l.append(np.stack(b["sig"].to_numpy()))
    if not ids_l:
        return RefMinhashIndex(np.array([], np.int64),
                               np.empty((0, n_perm), np.uint64),
                               n_bands=n_bands, n_perm=n_perm,
                               shingle_k=shingle_k, seed=seed)
    return RefMinhashIndex(np.concatenate(ids_l), np.vstack(sigs_l),
                           n_bands=n_bands, n_perm=n_perm,
                           shingle_k=shingle_k, seed=seed)


def text_cross_dup_filter(new_docs_ds, index: RefMinhashIndex, *,
                          mode: str = "anti",
                          est_threshold: float = 0.8,
                          max_candidates: int = 4096):
    """Filter a new shard against the broadcast reference index.

    mode="anti"  -> keep docs NOT near-duplicating the reference
    mode="semi"  -> keep only the near-duplicates
    mode="flag"  -> keep all rows, add (is_ref_dup, ref_id, ref_agree)
    """
    if mode not in ("anti", "semi", "flag"):
        raise ValueError(f"unknown mode {mode!r}")
    ref = ray.put(index)
    n_perm, seed, k = index.n_perm, index.seed, index.shingle_k

    def _probe(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            if mode != "flag":
                return t
            return t.append_column(
                "is_ref_dup", pa.array([], pa.bool_())).append_column(
                "ref_id", pa.array([], pa.int64())).append_column(
                "ref_agree", pa.array([], pa.float64()))
        idx = ray.get(ref)  # zero-copy plasma rehydrate
        key = ("mh", n_perm, seed, k)
        mh = _STAGE_CACHE.get(key)
        if mh is None:
            mh = _STAGE_CACHE[key] = MinHasher(n_perm, seed, k)
        texts = [str(x) for x in t["text"].to_pylist()]
        sigs = np.stack([mh.signature(shingle_hashes(s, k))
                         for s in texts])
        hit, rid, agree, trunc = idx.query(
            sigs, est_threshold=est_threshold,
            max_candidates=max_candidates)
        if trunc:
            print(f"text_cross_dup_filter: truncated {trunc} "
                  f"candidates past max_candidates={max_candidates}")
        if mode == "anti":
            return t.filter(pa.array(~hit))
        if mode == "semi":
            return t.filter(pa.array(hit))
        return t.append_column(
            "is_ref_dup", pa.array(hit)).append_column(
            "ref_id", pa.array(rid)).append_column(
            "ref_agree", pa.array(agree))

    return new_docs_ds.map_batches(_probe, batch_format="pyarrow")

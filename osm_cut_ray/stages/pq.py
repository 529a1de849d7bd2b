"""Product quantization (PQ) for embedding corpora: compress each
vector to m uint8 codes (32x+ smaller than float64) and search with
asymmetric distance computation (ADC) — the memory-scale companion to
the IVF path (`stages/knn.py`): IVF prunes WHICH vectors to score,
PQ shrinks WHAT is stored and scored.

Ray-Data shape:

- **Fit** — deterministic hash-filtered sample (the
  `deterministic_centroids` pattern: vec_id hash filter, so training
  is identical under any partitioning), then per-subspace L2 Lloyd on
  the driver; the codebook is (m, 256, d/m) floats — a few hundred KB,
  the canonical broadcast small side.
- **Encode** — pure map-side: per batch, per subspace, one (n, 256)
  distance matrix argmin -> uint8 code; only (vec_id, m-byte code)
  rows leave the mappers. The corpus streams; at 100 TB the encoded
  table is the only thing that needs to live hot.
- **Search** — probes are broadcast; each batch builds the per-probe
  (m, 256) ADC lookup table once, scores codes by table gather + sum,
  keeps a batch-local top-k and merges the tiny partials (the
  `knn_brute` shape).

Vectors are L2-normalized before fit/encode, so ADC L2 order ==
cosine order (the repo's kNN metric). Recall is approximate by design
(quantization error); pinned vs brute in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .knn import _normalize

_HASH_MUL = np.uint64(0x9E3779B97F4A7C15)


class PQCodebook:
    def __init__(self, centroids: np.ndarray):
        # (m, k, dsub)
        self.centroids = np.ascontiguousarray(centroids, np.float64)
        self.m, self.k, self.dsub = centroids.shape

    @property
    def dim(self) -> int:
        return self.m * self.dsub

    def save(self, path: str) -> None:
        """Persist to .npz — the codebook is fit once per corpus and
        reused by every later encode/search job."""
        np.savez_compressed(path, centroids=self.centroids)

    @classmethod
    def load(cls, path: str) -> "PQCodebook":
        return cls(np.load(path)["centroids"])


def _hash_sample(emb_ds, sample_size: int) -> np.ndarray:
    """Deterministic corpus sample (vec_id hash filter + hash-ranked
    trim) — identical under any partitioning."""
    n = emb_ds.count()
    frac = min(1.0, (2.0 * sample_size) / max(1, n))
    thresh = np.uint64(min((1 << 64) - 1,
                           int(frac * float(1 << 63)) * 2 + 1))

    def pick(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(ids.view(np.uint64) * _HASH_MUL
                                 < thresh))

    rows = emb_ds.map_batches(pick, batch_format="pyarrow").take_all()
    if not rows:
        rows = emb_ds.take_all()
    ids = np.array([r["vec_id"] for r in rows], np.int64)
    order = np.argsort(ids.view(np.uint64) * _HASH_MUL, kind="stable")
    return _normalize(np.stack(
        [np.asarray(rows[i]["embedding"], np.float64)
         for i in order[:sample_size]]))


def fit_pq(emb_ds, *, m: int = 8, k: int = 256,
           sample_size: int = 4096, n_iters: int = 12) -> PQCodebook:
    """Train per-subspace L2 k-means codebooks on a deterministic
    sample. `dim % m` must be 0."""
    sample = _hash_sample(emb_ds, sample_size)
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    kk = min(k, len(sample))
    cents = np.empty((m, kk, dsub), np.float64)
    for s in range(m):
        sub = sample[:, s * dsub:(s + 1) * dsub]
        c = sub[:kk].copy()        # hash-ranked init (deterministic)
        for _ in range(n_iters):
            d2 = ((sub[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for ci in range(kk):
                members = sub[assign == ci]
                if len(members):
                    c[ci] = members.mean(axis=0)
        cents[s] = c
    return PQCodebook(cents)


def _encode_mat(vecs: np.ndarray, cb: PQCodebook) -> np.ndarray:
    """(n, dim) normalized vectors -> (n, m) uint8/uint16 codes."""
    n = len(vecs)
    codes = np.empty((n, cb.m), np.uint8 if cb.k <= 256 else np.uint16)
    for s in range(cb.m):
        sub = vecs[:, s * cb.dsub:(s + 1) * cb.dsub]
        c = cb.centroids[s]
        # |x - c|^2 = |x|^2 - 2 x.c + |c|^2; |x|^2 constant per row
        d2 = (c * c).sum(axis=1)[None, :] - 2.0 * (sub @ c.T)
        codes[:, s] = d2.argmin(axis=1)
    return codes


def encode_pq(emb_ds, cb: PQCodebook):
    """-> Dataset (vec_id, code binary[m]). Pure map-side."""
    ref = ray.put(cb)

    def fn(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "code": pa.array([], pa.binary())})
        c = ray.get(ref)
        vecs = _normalize(np.stack(df["embedding"].to_numpy())
                          .astype(np.float64))
        codes = _encode_mat(vecs, c)
        return pa.table({
            "vec_id": pa.array(df["vec_id"].to_numpy()
                               .astype(np.int64)),
            "code": pa.array([row.tobytes() for row in codes],
                             pa.binary())})

    return emb_ds.map_batches(fn, batch_format="pandas")


def knn_pq(codes_ds, cb: PQCodebook, probe_ids: np.ndarray,
           probe_mat: np.ndarray, *, k: int = 5) -> pa.Table:
    """ADC top-k over the encoded corpus -> (probe_id, vec_id, rank).

    Ties break on (distance rounded to 1e-9, vec_id) so results are
    stable across partitionings."""
    if cb.k > 256:
        raise ValueError("knn_pq decodes uint8 codes; k must be <= 256")
    pm = _normalize(np.asarray(probe_mat, np.float64))
    # per-probe (m, k) lookup tables of subspace squared distances
    luts = np.empty((len(pm), cb.m, cb.k), np.float64)
    for s in range(cb.m):
        sub = pm[:, s * cb.dsub:(s + 1) * cb.dsub]
        c = cb.centroids[s]
        luts[:, s, :] = ((sub[:, None, :] - c[None, :, :]) ** 2) \
            .sum(axis=2)
    ref = ray.put((luts, np.asarray(probe_ids, np.int64)))
    m = cb.m

    def score(df: pd.DataFrame) -> pa.Table:
        empty = pa.table({"probe_id": pa.array([], pa.int64()),
                          "vec_id": pa.array([], pa.int64()),
                          "dist": pa.array([], pa.float64())})
        if len(df) == 0:
            return empty
        lt, pids = ray.get(ref)
        ids = df["vec_id"].to_numpy().astype(np.int64)
        codes = np.frombuffer(b"".join(df["code"]), np.uint8) \
            .reshape(len(df), m)
        out_p, out_v, out_d = [], [], []
        for pi in range(len(pids)):
            d = lt[pi][np.arange(m)[None, :], codes].sum(axis=1)
            top = min(k, len(d))
            part = np.argpartition(d, top - 1)[:top]
            # deterministic order: (rounded dist, vec_id)
            order = np.lexsort((ids[part], d[part].round(9)))
            sel = part[order]
            out_p.append(np.full(top, pids[pi], np.int64))
            out_v.append(ids[sel])
            out_d.append(d[sel].round(9))
        return pa.table({"probe_id": np.concatenate(out_p),
                         "vec_id": np.concatenate(out_v),
                         "dist": np.concatenate(out_d)})

    partials = codes_ds.map_batches(score, batch_format="pandas") \
        .to_pandas()
    out_p, out_v, out_r = [], [], []
    for pid, grp in partials.groupby("probe_id", sort=True):
        grp = grp.sort_values(["dist", "vec_id"], kind="mergesort") \
            .head(k)
        out_p.extend([pid] * len(grp))
        out_v.extend(grp["vec_id"].tolist())
        out_r.extend(range(len(grp)))
    return pa.table({"probe_id": pa.array(out_p, pa.int64()),
                     "vec_id": pa.array(out_v, pa.int64()),
                     "rank": pa.array(out_r, pa.int64())})


def knn_pq_refined(emb_ds, codes_ds, cb: PQCodebook,
                   probe_ids: np.ndarray, probe_mat: np.ndarray, *,
                   k: int = 5, shortlist: int = 50) -> pa.Table:
    """The production two-stage shape: ADC shortlist over the compact
    code table, then EXACT cosine rerank of only the shortlisted
    vectors (broadcast semi-join pulls ~shortlist x probes rows of the
    float corpus, never the whole thing). Recall approaches brute
    while the hot set stays m bytes/vector."""
    from .join import broadcast_is_in
    from .knn import knn_brute

    short = knn_pq(codes_ds, cb, probe_ids, probe_mat, k=shortlist)
    cand = np.unique(short["vec_id"].to_numpy(zero_copy_only=False))
    if len(cand) == 0:
        return pa.table({"probe_id": pa.array([], pa.int64()),
                         "neighbor_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64())})
    sub = broadcast_is_in(emb_ds, "vec_id", cand, mode="semi")
    return knn_brute(sub, np.asarray(probe_ids, np.int64),
                     np.asarray(probe_mat, np.float64), k=k)

"""Content-defined chunking (gear-hash CDC) for binary blob dedup —
the storage-level dedup layer for multimodal corpora (image bytes,
tar shards, document scans): chunk boundaries follow CONTENT, so an
insertion shifts only the chunks around it and identical regions
across blobs hash to identical chunks.

Algorithm: the public gear rolling hash (the FastCDC family, Xia et
al., USENIX ATC'16): h_i = (h_{i-1} << 1) + gear[b_i] over a
deterministic 256-entry table (splitmix64 of the byte value), cut
where (h & (avg_size-1)) == 0, with min/max chunk-length clamps
(forced cut at max). The << 1 shift makes h_i depend on only the last
64 bytes, so the whole hash sequence is computed VECTORIZED as 64
shifted adds of the gear-mapped byte array — no per-byte Python loop.

Ray-Data shape: chunking is pure map-side flat emission (blob ->
chunk rows, 24 B + hash per chunk in any shuffle); dedup stats fold
per chunk-hash through one slim bucket pass; blob-overlap candidate
pairs reuse the dedup-family key-bucket machinery with its df caps.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .join import bucketed_group_apply

_SM1 = np.uint64(0xBF58476D1CE4E5B9)
_SM2 = np.uint64(0x94D049BB133111EB)


def gear_table(seed: int = 0) -> np.ndarray:
    """Deterministic 256-entry uint64 gear table (splitmix64)."""
    z = (np.arange(256, dtype=np.uint64)
         + np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15))
    with np.errstate(over="ignore"):
        z = (z + np.uint64(0x9E3779B97F4A7C15))
        z = (z ^ (z >> np.uint64(30))) * _SM1
        z = (z ^ (z >> np.uint64(27))) * _SM2
        z = z ^ (z >> np.uint64(31))
    return z


def gear_hashes(data: np.ndarray, gear: np.ndarray) -> np.ndarray:
    """Rolling gear hash at every byte position, vectorized: 64
    shifted adds (contributions older than 64 bytes leave the
    word)."""
    g = gear[data]
    h = np.zeros(len(data), np.uint64)
    with np.errstate(over="ignore"):
        for j in range(min(64, len(data))):
            h[j:] += g[:len(g) - j if j else None] << np.uint64(j)
    return h


def cut_points(data: bytes | np.ndarray, *, min_size: int,
               avg_size: int, max_size: int,
               gear: np.ndarray) -> list[int]:
    """Chunk END offsets (ascending, last == len(data))."""
    arr = np.frombuffer(data, np.uint8) if isinstance(data, bytes) \
        else data
    n = len(arr)
    if n == 0:
        return []
    mask = np.uint64(avg_size - 1)
    h = gear_hashes(arr, gear)
    cand = np.flatnonzero((h & mask) == np.uint64(0)) + 1  # end offs
    cuts, cur = [], 0
    while cur < n:
        if n - cur <= min_size:
            nxt = n
        else:
            i = np.searchsorted(cand, cur + min_size)
            if i < len(cand) and cand[i] <= cur + max_size:
                nxt = int(cand[i])
            else:
                nxt = min(cur + max_size, n)
        cuts.append(nxt)
        cur = nxt
    return cuts


def cdc_chunk_blobs(blobs_ds, *, min_size: int = 256,
                    avg_size: int = 1024, max_size: int = 4096,
                    seed: int = 0, id_col: str = "id",
                    bytes_col: str = "bytes"):
    """-> Dataset (blob_id, chunk_idx, offset, length, chunk_hash):
    content-defined chunks per blob; chunk_hash is the first 8 bytes
    of blake2b over the chunk bytes (int64). avg_size must be a power
    of two; min < avg <= max."""
    if avg_size & (avg_size - 1) or avg_size < 2:
        raise ValueError("avg_size must be a power of two >= 2")
    if not 0 < min_size < avg_size <= max_size:
        raise ValueError("need 0 < min_size < avg_size <= max_size")
    gear = gear_table(seed)

    def chunk(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "blob_id": pa.array([], pa.int64()),
            "chunk_idx": pa.array([], pa.int32()),
            "offset": pa.array([], pa.int64()),
            "length": pa.array([], pa.int64()),
            "chunk_hash": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        ids = t[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bids, idxs, offs, lens, hashes = [], [], [], [], []
        for i, buf in enumerate(t[bytes_col].to_pylist()):
            if buf is None or len(buf) == 0:
                continue
            cuts = cut_points(buf, min_size=min_size,
                              avg_size=avg_size, max_size=max_size,
                              gear=gear)
            prev = 0
            for ci, c in enumerate(cuts):
                hh = int.from_bytes(
                    hashlib.blake2b(buf[prev:c],
                                    digest_size=8).digest(),
                    "big", signed=True)
                bids.append(ids[i])
                idxs.append(ci)
                offs.append(prev)
                lens.append(c - prev)
                hashes.append(hh)
                prev = c
        if not bids:
            return empty
        return pa.table({
            "blob_id": pa.array(np.asarray(bids, np.int64)),
            "chunk_idx": pa.array(np.asarray(idxs, np.int32)),
            "offset": pa.array(np.asarray(offs, np.int64)),
            "length": pa.array(np.asarray(lens, np.int64)),
            "chunk_hash": pa.array(np.asarray(hashes, np.int64))})

    return blobs_ds.map_batches(chunk, batch_format="pyarrow")


def chunk_dedup_stats(chunks_ds) -> dict:
    """Corpus storage-dedup summary from the chunk table: bytes
    total/unique and the dedup ratio. One slim bucket pass; per-hash
    partials fold map-side."""
    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({"total": pa.array([], pa.int64()),
                             "uniq": pa.array([], pa.int64()),
                             "n_chunks": pa.array([], pa.int64()),
                             "n_uniq": pa.array([], pa.int64())})
        agg = g.groupby("chunk_hash")["length"] \
            .agg(["sum", "first", "count"])
        return pa.table({
            "total": pa.array([int(agg["sum"].sum())]),
            "uniq": pa.array([int(agg["first"].sum())]),
            "n_chunks": pa.array([int(agg["count"].sum())]),
            "n_uniq": pa.array([int(len(agg))])})

    slim = chunks_ds.select_columns(["chunk_hash", "length"])
    parts = bucketed_group_apply(slim, "chunk_hash", fold)
    import ray.data
    agg = parts.aggregate(
        ray.data.aggregate.Sum("total", alias_name="total"),
        ray.data.aggregate.Sum("uniq", alias_name="uniq"),
        ray.data.aggregate.Sum("n_chunks", alias_name="n_chunks"),
        ray.data.aggregate.Sum("n_uniq", alias_name="n_uniq"))
    total = int(agg["total"] or 0)
    uniq = int(agg["uniq"] or 0)
    return {"bytes_total": total, "bytes_unique": uniq,
            "n_chunks": int(agg["n_chunks"] or 0),
            "n_unique_chunks": int(agg["n_uniq"] or 0),
            "dedup_ratio": (total / uniq) if uniq else 1.0}


def blob_overlap_pairs(chunks_ds, *, min_shared: int = 2,
                       max_df: int = 256) -> pa.Table:
    """Blob pairs sharing >= min_shared distinct chunk hashes (the
    near-dup candidate detector at the storage layer) -> pa.Table
    (a_id, b_id, shared). Hot chunk hashes past max_df are dropped
    with a printed count (dedup-family contract)."""
    def rows(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"sh": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64())})
        h = t["chunk_hash"].to_numpy(zero_copy_only=False)
        b = t["blob_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, h))
        h, b = h[order], b[order]
        first = np.concatenate(
            ([True], (h[1:] != h[:-1]) | (b[1:] != b[:-1])))
        return pa.table({"sh": pa.array(h[first]),
                         "doc_id": pa.array(b[first])})

    # pair emission WITH per-key multiplicity (pairs_from_key_rows
    # pre-dedups cross-key pairs inside a bucket, which would
    # undercount `shared` — so this uses its bucket pattern minus the
    # dedup; per-key df cap prints drops)
    def per_key_pairs(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"a_id": pa.array([], pa.int64()),
                          "b_id": pa.array([], pa.int64())})
        if len(g) == 0:
            return empty
        g = g.sort_values(["sh", "doc_id"], kind="mergesort")
        key = g["sh"].to_numpy(np.int64)
        doc = g["doc_id"].to_numpy(np.int64)
        starts = np.flatnonzero(
            np.concatenate(([True], key[1:] != key[:-1])))
        ends = np.concatenate((starts[1:], [len(key)]))
        out_a, out_b, capped = [], [], 0
        for s0, e0 in zip(starts.tolist(), ends.tolist()):
            n = e0 - s0
            if n > max_df:
                capped += 1
                continue
            if n < 2:
                continue
            ids = doc[s0:e0]
            ai, bi = np.triu_indices(n, k=1)
            out_a.append(ids[ai])
            out_b.append(ids[bi])
        if capped:
            print(f"blob_overlap_pairs: {capped} hot chunk hashes "
                  f"capped (max_df={max_df})")
        if not out_a:
            return empty
        return pa.table({"a_id": pa.array(np.concatenate(out_a)),
                         "b_id": pa.array(np.concatenate(out_b))})

    cand = bucketed_group_apply(
        chunks_ds.select_columns(["chunk_hash", "blob_id"])
        .map_batches(rows, batch_format="pyarrow"),
        "sh", per_key_pairs)

    def tag_pk(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"a_id": pa.array([], pa.int64()),
                             "b_id": pa.array([], pa.int64()),
                             "pk": pa.array([], pa.int64())})
        a = t["a_id"].to_numpy(zero_copy_only=False)
        b = t["b_id"].to_numpy(zero_copy_only=False)
        pk = ((a.view(np.uint64)
               * np.uint64(0xBF58476D1CE4E5B9))
              ^ (b.view(np.uint64)
                 * np.uint64(0x9E3779B97F4A7C15))).view(np.int64)
        return t.append_column("pk", pa.array(pk))

    def count_bucket(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({"a_id": pa.array([], pa.int64()),
                             "b_id": pa.array([], pa.int64()),
                             "shared": pa.array([], pa.int64())})
        agg = g.groupby(["a_id", "b_id"], as_index=False).size()
        agg = agg[agg["size"] >= min_shared]
        return pa.table({
            "a_id": pa.array(agg["a_id"].to_numpy(np.int64)),
            "b_id": pa.array(agg["b_id"].to_numpy(np.int64)),
            "shared": pa.array(agg["size"].to_numpy(np.int64))})

    counted = bucketed_group_apply(
        cand.map_batches(tag_pk, batch_format="pyarrow"),
        "pk", count_bucket)
    parts = [p for p in counted.iter_batches(
        batch_size=None, batch_format="pyarrow") if p.num_rows]
    if not parts:
        return pa.table({"a_id": pa.array([], pa.int64()),
                         "b_id": pa.array([], pa.int64()),
                         "shared": pa.array([], pa.int64())})
    df = pa.concat_tables(parts).to_pandas() \
        .sort_values(["a_id", "b_id"])
    return pa.table({"a_id": pa.array(df["a_id"].to_numpy(np.int64)),
                     "b_id": pa.array(df["b_id"].to_numpy(np.int64)),
                     "shared": pa.array(
                         df["shared"].to_numpy(np.int64))})

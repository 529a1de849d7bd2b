"""Deterministic domain-mixture sampling — the data-mixing step of
corpus assembly (web 60%, code 25%, papers 15%...): each domain is
downsampled at its own rate with a pure hash rule, so membership is
a property of the ROW, not of execution — re-runs, resumes and
different partitionings select the identical subset (the
`split_by_hash` contract, per-domain).

Keep rule: uniform_hash(id xor domain_salt, seed) < rate, with the
shared splitmix64 `stages/wsample.py:uniform_hash`. Per-domain salts
decorrelate the draw from every other hash-based split in the
pipeline. Rates outside [0, 1] RAISE. Zero shuffles; one map-side
filter.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .wsample import uniform_hash


def _dom_salt(domain: str, seed: int) -> np.int64:
    h = hashlib.blake2b(f"{seed}:{domain}".encode(),
                        digest_size=8).digest()
    return np.int64(int.from_bytes(h, "little") & 0x7FFFFFFFFFFFFFFF)


def mixture_sample(ds, *, rates: dict[str, float],
                   domain_col: str = "domain", id_col: str = "id",
                   default_rate: float = 0.0, seed: int = 0):
    """-> Dataset: rows kept per-domain at `rates[domain]` (domains
    absent from `rates` use `default_rate`). Deterministic in
    (id, domain, seed) only."""
    for d, r in {**rates, "__default__": default_rate}.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {d!r} must be in [0, 1]")

    def keep(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        ids = t[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # dictionary-encode: only the (tiny) distinct-domain dictionary
        # is materialized to Python; the per-row side stays int32 codes
        enc = t[domain_col].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        mask = np.zeros(len(t), bool)
        for code, d in enumerate(enc.dictionary.to_pylist()):
            sel = codes == code
            rate = rates.get(d, default_rate)
            u = uniform_hash(ids[sel] ^ _dom_salt(str(d), seed),
                             seed)
            mask[sel] = u < rate
        return t.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")

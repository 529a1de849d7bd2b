"""Deterministic keyed pseudonymization of identifier columns.

The companion to `stages/pii.py` (free-text redaction) and
`stages/dp_noise.py` (aggregate releases): before a table leaves the
trust boundary, identifier columns are replaced by keyed blake2b
pseudonyms. Deterministic under one secret — the SAME value maps to
the SAME pseudonym in every table and every run — so joins and
referential integrity survive the rewrite while raw ids do not.
Without the secret, inversion is preimage-hard; with a fresh secret
per release, releases cannot be linked to each other.

One map pass, zero shuffles. Values are canonicalized to their
string form before hashing (so int64 7 and string "7" collide only
if the caller mixes types deliberately); nulls stay null.

`out_format`: "hex16" (16-hex-char string, 64 bits) or "int64"
(int64 of the same 64 bits — keeps key columns joinable AND
bucket-hashable by every int64-keyed op in this repo).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _pseudo_array(arr: pa.ChunkedArray, secret: bytes,
                  out_format: str) -> pa.Array:
    s = pc.cast(arr, pa.large_string())
    valid = pc.is_valid(s)
    out = np.empty(len(s), np.uint64)
    vals = s.to_pylist()
    # one keyed blake2b per UNIQUE value (memoized per batch)
    memo: dict[str, int] = {}
    for i, v in enumerate(vals):
        if v is None:
            out[i] = 0
            continue
        h = memo.get(v)
        if h is None:
            h = int.from_bytes(
                hashlib.blake2b(v.encode(), key=secret,
                                digest_size=8).digest(), "big")
            memo[v] = h
        out[i] = h
    if out_format == "int64":
        return pa.array(out.view(np.int64), pa.int64(),
                        mask=~np.asarray(valid.to_numpy(
                            zero_copy_only=False)))
    hexes = [format(int(x), "016x") for x in out]
    return pa.array(
        [h if ok else None
         for h, ok in zip(hexes, valid.to_numpy(zero_copy_only=False))],
        pa.large_string())


def pseudonymize(ds, cols: list[str], secret: str | bytes, *,
                 out_format: str = "int64"):
    """-> Dataset with each column in `cols` replaced by its keyed
    pseudonym (schema otherwise untouched)."""
    if out_format not in ("int64", "hex16"):
        raise ValueError(f"unknown out_format {out_format!r}")
    if not secret:
        raise ValueError("pseudonymize: empty secret")
    key = secret.encode() if isinstance(secret, str) else bytes(secret)
    if len(key) > 64:
        key = hashlib.blake2b(key, digest_size=64).digest()

    def fn(t: pa.Table) -> pa.Table:
        for c in cols:
            idx = t.schema.get_field_index(c)
            if idx < 0:
                raise KeyError(f"pseudonymize: no column {c!r}")
            t = t.set_column(idx, c,
                             _pseudo_array(t[c], key, out_format))
        return t

    return ds.map_batches(fn, batch_format="pyarrow")

"""End-to-end entity resolution: phonetic blocking -> sorted-
neighborhood candidate pairs -> banded edit-distance verification ->
duplicate clustering. The classic record-linkage composition
(Hernández & Stolfo 1995 blocking; Fellegi-Sunter-style verify
reduced to an edit-distance gate), built entirely from the repo's
existing distributed pieces:

- `functions/phonetic.py` soundex/nysiis keys (map-side encode),
- `stages/blocking.py:sorted_neighborhood_pairs` (one bucket
  shuffle + boundary stitch),
- `stages/join.py:bucketed_attach_column` x2 to pull both names
  onto the slim candidate pairs (payload bytes never ride the
  blocking shuffle),
- `stages/edit_join.py:banded_edit_distances` exact Levenshtein
  verify (vectorized across pairs),
- `stages/dedup.py:dup_clusters` union-find over VERIFIED pairs
  (driver-side, bounded: `max_pairs` RAISES with the
  `dup_clusters_distributed` escape hatch — the repo cap contract).

Sort key: phonetic code + lowercased name prefix (a composite SNM
key; the blocking stage's order is exact bytewise (key, id), see
stages/blocking.py). Records whose key collides phonetically but
differ beyond `d_max` edits are rejected by the verify, so the
output clusters never merge on phonetics alone.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.phonetic import nysiis_array, soundex_array
from ..stages import join as J
from ..stages.blocking import sorted_neighborhood_pairs
from ..stages.dedup import dup_clusters
from ..stages.edit_join import banded_edit_distances

_PAIRS_EMPTY = pa.table({"a_id": pa.array([], pa.int64()),
                         "b_id": pa.array([], pa.int64()),
                         "dist": pa.array([], pa.int32())})


def blocking_key(names: list[str], phonetic: str = "soundex",
                 prefix_len: int = 4) -> np.ndarray:
    """Composite SNM key: phonetic code + lowercased name prefix."""
    enc = soundex_array(names) if phonetic == "soundex" \
        else nysiis_array(names)
    return np.array(
        [f"{c}{str(n).lower()[:prefix_len]}"
         for c, n in zip(enc, names)], object)


def resolve_entities(records_ds, *, id_col: str = "id",
                     name_col: str = "name",
                     phonetic: str = "soundex", window: int = 8,
                     d_max: int = 2, max_len: int = 64,
                     prefix_len: int = 4,
                     max_pairs: int = 5_000_000,
                     num_buckets: int | None = None) -> dict:
    """-> {"pairs": pa.Table (a_id, b_id, dist), "clusters":
    pa.Table (doc_id, cluster_id = min id in component),
    "n_candidates": int}. Ids must be unique int64; singletons are
    absent from `clusters` (no pair survived the verify)."""
    if phonetic not in ("soundex", "nysiis"):
        raise ValueError("phonetic must be soundex|nysiis")

    def encode(t: pa.Table) -> pa.Table:
        empty = pa.table({"rid": pa.array([], pa.int64()),
                          "name": pa.array([], pa.string()),
                          "bkey": pa.array([], pa.string())})
        if t.num_rows == 0 or name_col not in t.column_names:
            return empty
        names = [str(s) for s in t[name_col].to_pylist()]
        return pa.table({
            "rid": pc.cast(t[id_col], pa.int64()),
            "name": pa.array(names, pa.string()),
            "bkey": pa.array(
                blocking_key(names, phonetic, prefix_len),
                pa.string())})

    enc = records_ds.map_batches(
        encode, batch_format="pyarrow").materialize()

    cand, n_cand = J.solidify(sorted_neighborhood_pairs(
        enc, id_col="rid", key_col="bkey", window=window,
        num_buckets=num_buckets))
    if n_cand == 0:
        return {"pairs": _PAIRS_EMPTY,
                "clusters": dup_clusters(_PAIRS_EMPTY),
                "n_candidates": 0}

    # attach both names; materialize between the two attaches (the
    # schema peek re-executes lazy upstreams — edit_join lesson)
    na = enc.map_batches(
        lambda t: pa.table({"doc_id": t["rid"], "name_a": t["name"]}),
        batch_format="pyarrow")
    nb = enc.map_batches(
        lambda t: pa.table({"doc_id": t["rid"], "name_b": t["name"]}),
        batch_format="pyarrow")
    with_a = J.bucketed_attach_column(
        cand, "a_id", na, "doc_id", "name_a").materialize()
    with_b = J.bucketed_attach_column(
        with_a, "b_id", nb, "doc_id", "name_b")

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "name_a" not in t.column_names:
            return _PAIRS_EMPTY
        d = banded_edit_distances(
            [s.lower() for s in t["name_a"].to_pylist()],
            [s.lower() for s in t["name_b"].to_pylist()],
            d_max, max_len)
        keep = d <= d_max
        # SNM pair order is positional; canonicalize to a_id < b_id
        a = t["a_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        b = t["b_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        return pa.table({
            "a_id": pa.array(np.minimum(a, b)),
            "b_id": pa.array(np.maximum(a, b)),
            "dist": pa.array(d[keep])})

    verified, n_ver = J.solidify(
        with_b.map_batches(verify, batch_format="pyarrow"))
    if n_ver > max_pairs:
        raise ValueError(
            f"{n_ver} verified pairs exceed max_pairs={max_pairs} "
            "for the driver union-find; use "
            "stages/dedup.py:dup_clusters_distributed")
    parts = [p for p in verified.iter_batches(
        batch_size=None, batch_format="pyarrow") if p.num_rows]
    if not parts:
        return {"pairs": _PAIRS_EMPTY,
                "clusters": dup_clusters(_PAIRS_EMPTY),
                "n_candidates": int(n_cand)}
    df = pa.concat_tables(parts).to_pandas() \
        .sort_values(["a_id", "b_id"]).reset_index(drop=True)
    pairs = pa.table({
        "a_id": pa.array(df["a_id"].to_numpy(np.int64)),
        "b_id": pa.array(df["b_id"].to_numpy(np.int64)),
        "dist": pa.array(df["dist"].to_numpy(np.int32))})
    return {"pairs": pairs, "clusters": dup_clusters(pairs),
            "n_candidates": int(n_cand)}


def resolve_entities_brute(ids: np.ndarray, names: list[str], *,
                           phonetic: str = "soundex",
                           window: int = 8, d_max: int = 2,
                           max_len: int = 64,
                           prefix_len: int = 4) -> dict:
    """Driver-side specification of the SAME pipeline (bytewise
    (key, id) sort -> window pairs -> exact edit gate -> union-find)
    for pinning tests."""
    keys = blocking_key(list(names), phonetic, prefix_len)
    order = sorted(range(len(ids)),
                   key=lambda i: (str(keys[i]).encode("utf-8"),
                                  int(ids[i])))
    sid = [int(ids[i]) for i in order]
    snm = [str(names[i]).lower() for i in order]
    pairs = []
    for i in range(len(sid)):
        for j in range(i + 1, min(i + window, len(sid))):
            d = banded_edit_distances(
                [snm[i]], [snm[j]], d_max, max_len)[0]
            if d <= d_max:
                a, b = sorted((sid[i], sid[j]))
                pairs.append((a, b, int(d)))
    pairs = sorted(set(pairs))
    pt = pa.table({
        "a_id": pa.array([p[0] for p in pairs], pa.int64()),
        "b_id": pa.array([p[1] for p in pairs], pa.int64()),
        "dist": pa.array([p[2] for p in pairs], pa.int32())})
    return {"pairs": pt, "clusters": dup_clusters(pt)}

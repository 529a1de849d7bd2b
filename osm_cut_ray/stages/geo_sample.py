"""Geographic de-biasing sampler — cap the corpus at K images per
spatial cell.

Web-scale geotagged imagery is brutally skewed (city centers hold
millions of near-identical views, rural cells a handful); training on
the raw distribution over-fits the hot cells. The standard cure is a
per-cell cap, and the scalable shape is the engine's stratified-
sampling pattern with an UNBOUNDED stratum count: only
(cell, id, hash) transits any shuffle, image bytes never move.

1. Slim pass: decode the phash geotag, assign the hex cell
   (`geometry/cells.py:hex_cell`), keep the HASH-SMALLEST K ids per
   cell within each batch (vectorized sort + C-speed groupby head —
   a deterministic, reproducible reservoir analog).
2. Merge: ONE bucketed-group shuffle over the partial rows
   (`stages/join.py:bucketed_group_apply` — Ray group overhead per
   bucket, not per cell) finishes the per-cell top-K exactly.
3. The kept-id set (bounded by #cells x K) broadcasts once and a
   map-side semi-join filters the full corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geometry.cells import hex_cell
from ..geometry.geotag import decode_geotag

_HASH_MULT = 2654435761


def sample_hash(ids: np.ndarray) -> np.ndarray:
    """The deterministic per-id ordering key (same formula as the
    oracle-checked stratified sampler, queries.py)."""
    return (np.asarray(ids, np.int64) * _HASH_MULT) % 4294967296


def geo_debias_sample(images_ds, *, hex_res: int = 7,
                      per_cell_k: int = 10, id_prefix_len: int = 3,
                      max_broadcast_keys: int = 50_000_000):
    """input_hint-shaped Dataset -> same-schema Dataset with at most
    `per_cell_k` rows per hex cell (hash-smallest ids win; fully
    deterministic under any partitioning).

    The kept-id set is bounded by #cells x K. Up to
    `max_broadcast_keys` it broadcasts once (`ray.put`, searchsorted
    map-side); past that — fine resolutions over a planetary corpus —
    the filter switches to the Arrow-native bucketed semi-join
    (`stages/join.py:bucketed_semi_join`), which shuffles the payload
    by id hash instead of pulling any id set to the driver. Both paths
    are result-identical (pinned in tests)."""
    from ..pipelines.curate_images import parse_image_ids
    from . import join as J
    from .dedup import _spread

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.int64()),
                          "doc_id": pa.array([], pa.int64()),
                          "h": pa.array([], pa.int64())})
        if len(t) == 0 or "image_id" not in t.column_names:
            return empty
        ids = parse_image_ids(t["image_id"], id_prefix_len)
        lon, lat = decode_geotag(
            t["phash"].to_numpy(zero_copy_only=False))
        cell = hex_cell(lon, lat, hex_res)
        d = pd.DataFrame({"cell": cell, "doc_id": ids,
                          "h": sample_hash(ids)})
        d = d.sort_values(["cell", "h", "doc_id"])
        top = d.groupby("cell", sort=False).head(per_cell_k)
        return pa.Table.from_pandas(top, preserve_index=False) \
            .replace_schema_metadata(None)

    part = _spread(images_ds).map_batches(partial,
                                          batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cell", "h", "doc_id"])
        return g.groupby("cell", sort=False).head(per_cell_k)[["doc_id"]]

    kept_ds = J.bucketed_group_apply(part, "cell", merge).materialize()

    if kept_ds.count() > max_broadcast_keys:
        # shuffle path: tag the payload with its parsed id and
        # semi-join against the kept-id Dataset — ids never leave
        # the cluster (blob bytes pay ONE hash shuffle, the price of
        # a keep-set too large to broadcast)
        def tag(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "image_id" not in t.column_names:
                from ..pipelines.curate_images import EMPTY_HINT
                return EMPTY_HINT.append_column(
                    "__gid", pa.array([], pa.int64()))
            return t.append_column("__gid", pa.array(
                parse_image_ids(t["image_id"], id_prefix_len)))

        tagged = images_ds.map_batches(tag, batch_format="pyarrow")
        out = J.bucketed_semi_join(tagged, "__gid", kept_ds, "doc_id")
        return out.map_batches(
            lambda t: t.drop_columns(["__gid"]),
            batch_format="pyarrow")

    ids_l = [b["doc_id"].to_numpy(zero_copy_only=False)
             for b in kept_ds.iter_batches(batch_size=None,
                                           batch_format="pyarrow")
             if b.num_rows]
    keep = np.concatenate(ids_l).astype(np.int64) if ids_l \
        else np.array([], np.int64)

    import ray
    ref = ray.put(np.sort(keep))

    def filt(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "image_id" not in t.column_names:
            from ..pipelines.curate_images import EMPTY_HINT
            return EMPTY_HINT
        ids = parse_image_ids(t["image_id"], id_prefix_len)
        k = ray.get(ref)
        pos = np.searchsorted(k, ids)
        pos_c = np.minimum(pos, max(0, len(k) - 1))
        hit = (k[pos_c] == ids) if len(k) else np.zeros(len(t), bool)
        out = t.filter(pa.array(hit))
        if len(out):
            return out
        from ..pipelines.curate_images import EMPTY_HINT
        return EMPTY_HINT

    return images_ds.map_batches(filt, batch_format="pyarrow")


def split_by_hash(images_ds, *, fractions: dict[str, float],
                  id_prefix_len: int = 3, seed: int = 0):
    """Deterministic disjoint corpus split (train/val/test) by id hash.

    Every row lands in exactly one split regardless of partitioning,
    batch order, or cluster size — the property `random_sample` lacks
    and reproducible training needs. fractions: {"train": 0.98,
    "val": 0.01, "test": 0.01} (must sum to ~1). Returns
    {name: Dataset}; each split is an independent map-side filter over
    the shared input (no shuffles, no materialization)."""
    from ..pipelines.curate_images import EMPTY_HINT, parse_image_ids
    tot = sum(fractions.values())
    if not 0.999 <= tot <= 1.001:
        raise ValueError(f"fractions sum to {tot}, need 1.0")
    names = sorted(fractions)          # deterministic boundary order
    bounds, acc = {}, 0.0
    for n in names:
        bounds[n] = (acc, acc + fractions[n])
        acc += fractions[n]
    denom = float(2 ** 32)

    def make(name):
        lo, hi = bounds[name]
        last = name == names[-1]

        def fn(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "image_id" not in t.column_names:
                return EMPTY_HINT
            ids = parse_image_ids(t["image_id"], id_prefix_len)
            u = ((ids + np.int64(seed)).view(np.uint64)
                 * np.uint64(_HASH_MULT)) % np.uint64(2 ** 32)
            x = u.astype(np.float64) / denom
            keep = (x >= lo) & ((x < hi) | last)  # last takes x==1 edge
            out = t.filter(pa.array(keep))
            return out if len(out) else EMPTY_HINT

        return images_ds.map_batches(fn, batch_format="pyarrow")

    return {n: make(n) for n in names}

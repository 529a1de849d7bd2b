"""Way-length and ring-area statistics (the `osmium export` /
taginfo companion: HOW MUCH geometry, not just how many objects).

- `way_lengths`: exact int64-cm length per way (the route family's
  `_edge_weight_cm` segment metric, summed per way) — one refs
  explode + one bucketed coordinate attach + one per-way fold.
- `length_by_tag`: total km per tag value (highway class road-km —
  the classic OSM QA table); way lengths never leave the cluster,
  only (value, cm) partials fold.
- `ring_areas`: signed shoelace area per closed way in m² on the
  local equirectangular plane (scaled by cos(centroid latitude) —
  exact for the small rings ways describe; open ways are REJECTED
  or skipped by flag). Positive = counter-clockwise.

All pinned against pure-Python replays in tests/test_geom_stats.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_M_PER_DEG = 111_320.0


def _explode_refs(ways_ds, refs_col: str):
    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"way": pa.array([], pa.int64()),
                             "idx": pa.array([], pa.int64()),
                             "ref": pa.array([], pa.int64())})
        col = t[refs_col].combine_chunks()
        lens = pc.fill_null(pc.list_value_length(col), 0)\
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)\
            .astype(np.int64)
        way = np.repeat(t["id"].to_numpy(zero_copy_only=False)
                        .astype(np.int64), lens)
        idx = (np.arange(len(way))
               - np.repeat(np.concatenate(
                   ([0], np.cumsum(lens)))[:-1], lens))
        return pa.table({"way": way, "idx": idx, "ref": flat})

    return ways_ds.map_batches(fn, batch_format="pyarrow")


def _with_coords(ways_ds, nodes_ds, refs_col: str, num_buckets: int):
    from .join import bucketed_attach_column
    from .route import _pack_pos

    refs = _explode_refs(ways_ds, refs_col).materialize()

    def pack(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(zero_copy_only=False).astype(np.float64)
        lat = t["lat"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"nid": t["id"].cast(pa.int64()),
                         "pos": pa.array(_pack_pos(lon, lat))})

    pos = nodes_ds.map_batches(pack, batch_format="pyarrow")\
        .materialize()
    return bucketed_attach_column(refs, "ref", pos, "nid", "pos",
                                  num_buckets=num_buckets)


def way_lengths(ways_ds, nodes_ds, *, refs_col: str = "refs",
                num_buckets: int = 64):
    """-> Dataset (way_id, length_cm, n_segments)."""
    from .join import bucketed_group_apply
    from .route import _edge_weight_cm, _unpack_pos

    with_pos = _with_coords(ways_ds, nodes_ds, refs_col, num_buckets)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({"way_id": pa.array([], pa.int64()),
                             "length_cm": pa.array([], pa.int64()),
                             "n_segments": pa.array([], pa.int64())})
        order = np.lexsort((g["idx"].to_numpy(), g["way"].to_numpy()))
        way = g["way"].to_numpy()[order]
        lon, lat = _unpack_pos(g["pos"].to_numpy()[order]
                               .astype(np.int64))
        same = way[1:] == way[:-1]
        seg = _edge_weight_cm(lon[:-1], lat[:-1], lon[1:], lat[1:])
        seg = np.where(same, seg, 0)
        uway, starts = np.unique(way, return_index=True)
        # segment k belongs to way[k] when same[k]; reduceat over the
        # zero-padded seg array with a guard for the final boundary
        segz = np.concatenate((seg, [0]))
        sums = np.add.reduceat(segz, starts)
        cnts = np.add.reduceat(
            np.concatenate((same.astype(np.int64), [0])), starts)
        return pa.table({"way_id": uway,
                         "length_cm": sums.astype(np.int64),
                         "n_segments": cnts.astype(np.int64)})

    return bucketed_group_apply(with_pos, "way", per_bucket,
                                num_buckets=num_buckets)


def length_by_tag(ways_ds, nodes_ds, key: str = "highway", *,
                  refs_col: str = "refs", tags_col: str = "tags",
                  num_buckets: int = 64) -> pa.Table:
    """-> pa.Table (value, total_km, n_ways) sorted by total_km desc
    then value asc: total length per tag value (ways without the tag
    fold under value='')."""
    from .join import bucketed_attach_column
    from .tag_filter import tag_value

    lengths = way_lengths(ways_ds, nodes_ds, refs_col=refs_col,
                          num_buckets=num_buckets).materialize()

    def way_tag(t: pa.Table) -> pa.Table:
        if tags_col in t.column_names:
            v = pc.fill_null(tag_value(t, key, col=tags_col), "")
        else:
            v = pa.array([""] * t.num_rows, pa.large_string())
        return pa.table({"wid": t["id"].cast(pa.int64()), "tagv": v})

    tags = ways_ds.map_batches(way_tag, batch_format="pyarrow")\
        .materialize()
    joined = bucketed_attach_column(lengths, "way_id", tags, "wid",
                                    "tagv", num_buckets=num_buckets)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"value": pa.array([], pa.large_string()),
                             "cm": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return t.group_by("tagv").aggregate(
            [("length_cm", "sum"), ("way_id", "count")])\
            .rename_columns(["value", "cm", "n"])

    acc: dict[str, list[int]] = {}
    for t in joined.map_batches(partial, batch_format="pyarrow")\
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        for v, cm, n in zip(t["value"].to_pylist(),
                            t["cm"].to_pylist(), t["n"].to_pylist()):
            cur = acc.setdefault(v, [0, 0])
            cur[0] += int(cm)
            cur[1] += int(n)
    rows = sorted(acc.items(), key=lambda kv: (-kv[1][0], kv[0]))
    return pa.table({
        "value": pa.array([v for v, _ in rows], pa.large_string()),
        "total_km": pa.array([c / 100_000.0 for _, (c, _n) in rows]),
        "n_ways": pa.array([n for _, (_c, n) in rows], pa.int64())})


def ring_areas(ways_ds, nodes_ds, *, refs_col: str = "refs",
               skip_open: bool = True, num_buckets: int = 64):
    """-> Dataset (way_id, area_m2): signed shoelace area of CLOSED
    ways (first ref == last ref) on the cos(centroid-lat)-scaled
    plane. Open ways are skipped (skip_open=True) or RAISE."""
    from .join import bucketed_group_apply
    from .route import _unpack_pos

    with_pos = _with_coords(ways_ds, nodes_ds, refs_col, num_buckets)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({"way_id": pa.array([], pa.int64()),
                             "area_m2": pa.array([], pa.float64())})
        order = np.lexsort((g["idx"].to_numpy(), g["way"].to_numpy()))
        way = g["way"].to_numpy()[order]
        lon, lat = _unpack_pos(g["pos"].to_numpy()[order]
                               .astype(np.int64))
        out_w, out_a = [], []
        uway, starts = np.unique(way, return_index=True)
        ends = np.append(starts[1:], len(way))
        for wi, s, e in zip(uway, starts, ends):
            wlon, wlat = lon[s:e], lat[s:e]
            if len(wlon) < 4 or wlon[0] != wlon[-1] \
                    or wlat[0] != wlat[-1]:
                if skip_open:
                    continue
                raise ValueError(
                    f"ring_areas: way {int(wi)} is not a closed ring")
            cosphi = np.cos(np.radians(wlat.mean()))
            x = wlon * _M_PER_DEG * cosphi
            y = wlat * _M_PER_DEG
            area = 0.5 * float(
                np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))
            out_w.append(int(wi))
            out_a.append(area)
        return pa.table({"way_id": pa.array(out_w, pa.int64()),
                         "area_m2": pa.array(out_a, pa.float64())})

    return bucketed_group_apply(with_pos, "way", per_bucket,
                                num_buckets=num_buckets)

"""Travel-time edge weights from way tags (navigation weights).

`route.way_edges` weighs edges by geometric distance — shortest
PATH, not fastest ROUTE. This derives per-edge travel times from the
way's `highway` class (or an explicit `maxspeed`-style tag) so the
whole existing routing family (sssp / isochrone_cells /
distance_matrix / ALT / turn restrictions) runs in TIME space
unchanged: weights stay exact int64, just centiseconds instead of
centimeters.

Speed resolution per way, vectorized with `pc.map_lookup` (the
tag_filter kernel): `speed_tag` (numeric, km/h) wins when present
and parseable, else `class_speeds[highway-class]`, else
`default_kmh`. Time = distance_cm / (kmh * 100000/3600 cm/s),
rounded half-up to int64 centiseconds — deterministic, and zero
travel times are clamped to 1 cs so Dijkstra's positive-weight
contract holds.

One map over ways + the same two bucketed coordinate attaches as
`turns.directed_segments`; emits (src, dst, w) drop-in compatible
with every consumer of way_edges. Pinned against a per-way brute
replay in tests/test_travel_time.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def travel_time_edges(ways_ds, nodes_ds, *,
                      class_speeds: dict[str, float],
                      default_kmh: float = 30.0,
                      tag_key: str = "highway",
                      speed_tag: str = "maxspeed",
                      refs_col: str = "refs",
                      tags_col: str = "tags",
                      num_buckets: int = 64):
    """-> Dataset (src, dst, w): bidirectional edges weighted in
    int64 CENTISECONDS."""
    if default_kmh <= 0 or any(v <= 0 for v in class_speeds.values()):
        raise ValueError("speeds must be positive km/h")

    from .join import bucketed_attach_column
    from .route import _edge_weight_cm, _pack_pos, _unpack_pos

    classes = sorted(class_speeds)
    cls_arr = pa.array(classes, pa.large_string())
    kmh_arr = np.array([class_speeds[c] for c in classes], np.float64)

    def explode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "kmh": pa.array([], pa.float64())})
        col = t[refs_col].combine_chunks()
        lens = pc.fill_null(pc.list_value_length(col), 0)\
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)\
            .astype(np.int64)
        nseg = np.maximum(lens - 1, 0)
        # per-way speed: explicit numeric speed tag > class map >
        # default (all vectorized)
        kmh = np.full(t.num_rows, default_kmh)
        if tags_col in t.column_names:
            tags = t[tags_col].combine_chunks()
            key_t = tags.type.key_type
            cls = pc.map_lookup(tags,
                                query_key=pa.scalar(tag_key, key_t),
                                occurrence="first")
            code = pc.index_in(cls, value_set=cls_arr)\
                .to_numpy(zero_copy_only=False)
            ok = code >= 0
            kmh[ok] = kmh_arr[code[ok].astype(np.int64)]
            sp = pc.map_lookup(tags,
                               query_key=pa.scalar(speed_tag, key_t),
                               occurrence="first")
            spn = pd_to_num(sp)
            good = np.isfinite(spn) & (spn > 0)
            kmh[good] = spn[good]
        off = np.concatenate(([0], np.cumsum(lens)))[:-1]
        starts = (np.repeat(off, nseg)
                  + (np.arange(int(nseg.sum()))
                     - np.repeat(np.concatenate(
                         ([0], np.cumsum(nseg)))[:-1], nseg)))
        return pa.table({"a": flat[starts], "b": flat[starts + 1],
                         "kmh": np.repeat(kmh, nseg)})

    segs = ways_ds.map_batches(explode, batch_format="pyarrow")\
        .materialize()

    def pack_nodes(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(zero_copy_only=False).astype(np.float64)
        lat = t["lat"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"nid": t["id"].cast(pa.int64()),
                         "pos": pa.array(_pack_pos(lon, lat))})

    pos = nodes_ds.map_batches(pack_nodes, batch_format="pyarrow")\
        .materialize()
    segs = bucketed_attach_column(segs, "a", pos, "nid", "pos",
                                  num_buckets=num_buckets)
    segs = segs.map_batches(
        lambda t: t.rename_columns(
            [c if c != "pos" else "pos_a" for c in t.column_names]),
        batch_format="pyarrow").materialize()
    segs = bucketed_attach_column(segs, "b", pos, "nid", "pos",
                                  num_buckets=num_buckets)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        la, fa = _unpack_pos(t["pos_a"].to_numpy(zero_copy_only=False)
                             .astype(np.int64))
        lb, fb = _unpack_pos(t["pos"].to_numpy(zero_copy_only=False)
                             .astype(np.int64))
        dist_cm = _edge_weight_cm(la, fa, lb, fb)
        kmh = t["kmh"].to_numpy(zero_copy_only=False)
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        cm_per_s = kmh * (100000.0 / 3600.0)
        w = np.maximum(
            np.rint(dist_cm * 100.0 / cm_per_s), 1).astype(np.int64)
        return pa.table({
            "src": np.concatenate([a[keep], b[keep]]),
            "dst": np.concatenate([b[keep], a[keep]]),
            "w": np.concatenate([w[keep], w[keep]])})

    return segs.map_batches(finish, batch_format="pyarrow")


def pd_to_num(arr: pa.Array) -> np.ndarray:
    """Arrow string array -> float64 with NaN for unparseable/null
    (accepts plain numbers and 'NN km/h'; 'NN mph' converts)."""
    out = np.full(len(arr), np.nan)
    for i, v in enumerate(arr.to_pylist()):
        if v is None:
            continue
        s = str(v).strip().lower()
        mult = 1.0
        if s.endswith("mph"):
            mult = 1.609344
            s = s[:-3].strip()
        elif s.endswith("km/h"):
            s = s[:-4].strip()
        try:
            out[i] = float(s) * mult
        except ValueError:
            pass
    return out

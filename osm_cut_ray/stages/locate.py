"""Way geometry materialization — the `osmium add-locations-to-ways`
analog: attach each way's ordered (lon, lat) sequence so geometry
consumers (GeoJSON export, renderers, length/area stats) need no
node store.

Ray-Data shape (fully shuffled, no broadcast node store — the node
table at planet scale is the BIG side): ways explode into slim
(way, pos, ref) rows; lon and lat attach via the shared bucketed
Arrow joins on ref; ONE way-bucket fold re-assembles position-
ordered coordinate lists; a final bucketed attach puts the packed
list back on the original way rows (payload tags never transit the
coordinate shuffles).

Missing nodes RAISE by default (a way pointing at absent nodes is a
broken corpus — osmium errors too); `ignore_missing=True` gives
osmium's --ignore-missing-nodes semantics: absent refs drop from the
sequence (order preserved), and ways with NO resolvable nodes drop
entirely.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .join import bucketed_attach_column, bucketed_group_apply, solidify


def add_locations_to_ways(nodes, ways, *, ignore_missing: bool = False,
                          refs_col: str = "node_ids"):
    """-> Dataset: the way rows plus `lons`/`lats` (list<double>,
    ref order)."""
    import ray.data

    def explode(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        empty = pa.table({"wid": pa.array([], pa.int64()),
                          "pos": pa.array([], pa.int64()),
                          "ref": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        col = t[refs_col]
        lens = pc.fill_null(pc.list_value_length(col), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        refs = pc.list_flatten(col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        wid = np.repeat(t["id"].to_numpy(zero_copy_only=False)
                        .astype(np.int64), lens)
        pos = np.arange(len(refs), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(lens)[:-1])), lens)
        return pa.table({"wid": pa.array(wid), "pos": pa.array(pos),
                         "ref": pa.array(refs)})

    slim_ways = ways.map_batches(
        lambda t: t.select(["id", refs_col]), batch_format="pyarrow")
    exploded, n = solidify(slim_ways.map_batches(
        explode, batch_format="pyarrow"))

    def empty_out(t: pa.Table) -> pa.Table:
        return t.append_column(
            "lons", pa.array([[]] * len(t),
                             pa.list_(pa.float64()))).append_column(
            "lats", pa.array([[]] * len(t), pa.list_(pa.float64())))

    if n == 0:
        return ways.map_batches(empty_out, batch_format="pyarrow")

    nlon = nodes.map_batches(
        lambda t: pa.table({"id": t["id"], "lon": t["lon"]}),
        batch_format="pyarrow")
    nlat = nodes.map_batches(
        lambda t: pa.table({"id": t["id"], "lat": t["lat"]}),
        batch_format="pyarrow")
    exploded = bucketed_attach_column(exploded, "ref", nlon, "id",
                                      "lon").materialize()
    exploded = bucketed_attach_column(exploded, "ref", nlat, "id",
                                      "lat")

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({
                "wid": pa.array([], pa.int64()),
                "coords": pa.array([], pa.list_(pa.float64())),
                "n_found": pa.array([], pa.int64())})
        g = g.sort_values(["wid", "pos"], kind="stable") \
            .reset_index(drop=True)
        wid = g["wid"].to_numpy(np.int64)
        lon = g["lon"].to_numpy(np.float64)
        lat = g["lat"].to_numpy(np.float64)
        starts = np.concatenate(
            ([0], np.flatnonzero(wid[1:] != wid[:-1]) + 1, [len(wid)]))
        ids, coords, nf = [], [], []
        for k in range(len(starts) - 1):
            s, e = int(starts[k]), int(starts[k + 1])
            ids.append(wid[s])
            coords.append(np.concatenate((lon[s:e], lat[s:e])))
            nf.append(e - s)
        return pa.table({
            "wid": pa.array(np.asarray(ids, np.int64)),
            "coords": pa.array(coords, pa.list_(pa.float64())),
            "n_found": pa.array(np.asarray(nf, np.int64))})

    packed = bucketed_group_apply(exploded, "wid", fold).materialize()

    out = bucketed_attach_column(ways, "id", packed.map_batches(
        lambda t: pa.table({"wid": t["wid"], "__coords": t["coords"]}),
        batch_format="pyarrow"), "wid", "__coords")

    def finish(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.drop_columns(["__coords"]).append_column(
                "lons", pa.array([], pa.list_(pa.float64()))) \
                .append_column("lats",
                               pa.array([], pa.list_(pa.float64())))
        lons, lats = [], []
        refs = t[refs_col].to_pylist()
        for i, c in enumerate(t["__coords"].to_pylist()):
            half = len(c) // 2
            if not ignore_missing and half != len(refs[i] or []):
                raise RuntimeError(
                    f"way {t['id'][i].as_py()} references "
                    f"{len(refs[i] or [])} nodes but only {half} "
                    "exist in the corpus — broken input (pass "
                    "ignore_missing=True for osmium's "
                    "--ignore-missing-nodes semantics)")
            lons.append(c[:half])
            lats.append(c[half:])
        return t.drop_columns(["__coords"]).append_column(
            "lons", pa.array(lons, pa.list_(pa.float64()))) \
            .append_column("lats", pa.array(lats,
                                            pa.list_(pa.float64())))

    out = out.map_batches(finish, batch_format="pyarrow") \
        .materialize()
    if not ignore_missing and out.count() != ways.count():
        raise RuntimeError(
            "ways were dropped because NONE of their nodes (or no "
            "refs at all) exist in the corpus — broken input (pass "
            "ignore_missing=True to drop them silently)")
    return out

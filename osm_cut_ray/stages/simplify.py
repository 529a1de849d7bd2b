"""Douglas-Peucker way simplification — the tile-rendering /
vector-generalization operator a spatial engine runs right after a
cut (the reference stops at membership filtering; zoomed-out raster
tiles need geometry thinning too).

Shape: ways carry node-id lists (`refs`), nodes carry coordinates —
the same data model as the cut pipelines (`pipelines/cut.py:90`). The
node coordinate table is broadcast ONCE via `ray.put` as three sorted
numpy arrays (id, lon, lat; searchsorted lookup inside `map_batches`
— the cut's broadcast-membership strategy, `stages/join.py:131`),
then each batch of ways flattens its ref lists, runs an ITERATIVE
(stack-based, no recursion limit) Douglas-Peucker per way with the
point-to-segment distances computed vectorized per split, and rebuilds
the list column through the shared `filter_list_column` offset
machinery — the refs stay `list<int64>`.

At 10^12 nodes the broadcast table no longer fits: cap guarded by
`max_broadcast_nodes`; past it, attach coordinates with the exploded
bucketed joins instead (`stages/join.py:bucketed_attach_column`,
explode→attach→regroup exactly like the shuffle cut's list rewrites) —
the per-way kernel is unchanged because it only ever sees one way's
points.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from .list_ops import _flatten, filter_list_column


def dp_keep_mask(x: np.ndarray, y: np.ndarray, eps: float) -> np.ndarray:
    """Iterative Douglas-Peucker: bool keep-mask over one polyline.
    Endpoints always kept; distances per split segment are vectorized."""
    n = len(x)
    keep = np.zeros(n, bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        xs = x[i + 1:j]
        ys = y[i + 1:j]
        dx = x[j] - x[i]
        dy = y[j] - y[i]
        seg = np.hypot(dx, dy)
        if seg == 0.0:
            d = np.hypot(xs - x[i], ys - y[i])
        else:
            d = np.abs(dy * (xs - x[i]) - dx * (ys - y[i])) / seg
        k = int(np.argmax(d))
        if d[k] > eps:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return keep


class _CoordLookup:
    """Broadcast (sorted id -> lon/lat) lookup; missing ids resolve to
    NaN and are dropped from the polyline before simplification (a ref
    to a node outside the corpus cannot contribute geometry)."""

    def __init__(self, ids: np.ndarray, lon: np.ndarray, lat: np.ndarray):
        order = np.argsort(ids, kind="stable")
        self.ids = ids[order]
        self.lon = lon[order]
        self.lat = lat[order]

    def __call__(self, refs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        pos = np.searchsorted(self.ids, refs)
        pos = np.clip(pos, 0, len(self.ids) - 1)
        hit = self.ids[pos] == refs
        lon = np.where(hit, self.lon[pos], np.nan)
        lat = np.where(hit, self.lat[pos], np.nan)
        return lon, lat


def simplify_refs_batch(t: pa.Table, lookup: _CoordLookup, eps: float,
                        refs_col: str = "refs") -> pa.Table:
    """One batch of ways -> same schema with simplified ref lists."""
    if len(t) == 0 or refs_col not in t.column_names:
        return t
    lengths, values = _flatten(t, refs_col)
    refs = values.to_numpy(zero_copy_only=False).astype(np.int64)
    lon, lat = lookup(refs)
    known = ~np.isnan(lon)
    keep = np.zeros(len(refs), bool)
    start = 0
    for ln in lengths:
        end = start + int(ln)
        k = known[start:end]
        idx = np.flatnonzero(k) + start
        if len(idx):
            keep[idx] = dp_keep_mask(lon[idx], lat[idx], eps)
        start = end
    return filter_list_column(t, refs_col, keep, lengths, values)


def simplify_ways(ways_ds, nodes_ds, eps: float, *,
                  refs_col: str = "refs",
                  max_broadcast_nodes: int = 50_000_000):
    """Simplify every way's geometry to tolerance `eps` (coordinate
    units). Returns the ways Dataset with rewritten ref lists.

    Broadcast strategy (see module docstring for the shuffle path past
    the cap): the (id, lon, lat) projection is pulled once, `ray.put`
    once, and rehydrated zero-copy per task."""
    n_nodes = nodes_ds.count()
    if n_nodes > max_broadcast_nodes:
        raise ValueError(
            f"{n_nodes} nodes exceed max_broadcast_nodes="
            f"{max_broadcast_nodes}; use the exploded bucketed-join "
            "attach (stages/join.py:bucketed_attach_column) for "
            "corpora past broadcast size")
    cols = [[], [], []]
    for b in nodes_ds.select_columns(["id", "lon", "lat"]).iter_batches(
            batch_size=None, batch_format="pyarrow"):
        if b.num_rows:
            cols[0].append(b["id"].to_numpy(zero_copy_only=False))
            cols[1].append(b["lon"].to_numpy(zero_copy_only=False))
            cols[2].append(b["lat"].to_numpy(zero_copy_only=False))
    if cols[0]:
        ids = np.concatenate(cols[0]).astype(np.int64)
        lon = np.concatenate(cols[1]).astype(np.float64)
        lat = np.concatenate(cols[2]).astype(np.float64)
    else:
        ids = np.array([], np.int64)
        lon = lat = np.array([], np.float64)
    ref = ray.put(_CoordLookup(ids, lon, lat))

    def fn(t: pa.Table) -> pa.Table:
        return simplify_refs_batch(t, ray.get(ref), eps, refs_col)

    return ways_ds.map_batches(fn, batch_format="pyarrow")


def simplify_ways_shuffle(ways_ds, nodes_ds, eps: float, *,
                          id_col: str = "id", refs_col: str = "refs",
                          num_buckets: int | None = None):
    """The past-broadcast-cap strategy: refs explode with positions,
    coordinates attach through ONE Arrow-native bucketed join (lon/lat
    packed as a struct so a single shuffle carries both), then a
    bucketed regroup runs the same per-way DP kernel and rebuilds the
    lists. Nothing is ever pulled to the driver.

    Output is the slim (id, refs) projection; refs unknown to the node
    table are dropped by the inner attach (same as the broadcast
    path), and ways with NO known refs disappear entirely (the
    broadcast path keeps them with an empty list) — semi-join the
    result back to re-attach metadata or empties if needed."""
    import pyarrow.compute as pc

    from . import join as J
    if num_buckets is None:
        num_buckets = J.default_bucket_count()
    exploded = J.explode(ways_ds.select_columns([id_col, refs_col]),
                         [id_col], refs_col, value_col="ref",
                         pos_col="pos")

    def pack(t: pa.Table) -> pa.Table:
        return pa.table({
            "nid": t["id"],
            "coord": pa.StructArray.from_arrays(
                [t["lon"].combine_chunks(), t["lat"].combine_chunks()],
                ["lon", "lat"])})

    coords = nodes_ds.select_columns(["id", "lon", "lat"]).map_batches(
        pack, batch_format="pyarrow")
    att = J.bucketed_attach_column(exploded, "ref", coords, "nid",
                                   "coord", num_buckets=num_buckets)

    def tag(t: pa.Table) -> pa.Table:
        b = ((t[id_col].to_numpy(zero_copy_only=False)
              .astype(np.int64).view(np.uint64))
             * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets)
        return t.append_column("__wb", pa.array(b.view(np.int64)))

    def per_bucket(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          refs_col: pa.array([], pa.list_(pa.int64()))})
        if len(t) == 0 or id_col not in t.column_names:
            return empty
        wid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = t["pos"].to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, wid))
        wid = wid[order]
        refs = t["ref"].to_numpy(zero_copy_only=False)[order]
        coord = t["coord"].combine_chunks() \
            if isinstance(t["coord"], pa.ChunkedArray) else t["coord"]
        lon = pc.struct_field(coord, "lon") \
            .to_numpy(zero_copy_only=False)[order]
        lat = pc.struct_field(coord, "lat") \
            .to_numpy(zero_copy_only=False)[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(np.diff(wid)) + 1, [len(wid)]))
        keep = np.zeros(len(wid), bool)
        for s, e in zip(starts[:-1], starts[1:]):
            keep[s:e] = dp_keep_mask(lon[s:e], lat[s:e], eps)
        kept_per_way = np.add.reduceat(keep, starts[:-1])
        offs = np.zeros(len(starts), np.int64)
        np.cumsum(kept_per_way, out=offs[1:])
        return pa.table({
            id_col: pa.array(wid[starts[:-1]]),
            refs_col: pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()), pa.array(refs[keep]))})

    return att.map_batches(tag, batch_format="pyarrow") \
        .groupby("__wb").map_groups(per_bucket, batch_format="pyarrow")


EARTH_RADIUS_M = 6_371_008.8


def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Vectorized great-circle distance in meters."""
    p1 = np.radians(np.asarray(lat1, np.float64))
    p2 = np.radians(np.asarray(lat2, np.float64))
    dp = p2 - p1
    dl = np.radians(np.asarray(lon2, np.float64)
                    - np.asarray(lon1, np.float64))
    a = np.sin(dp / 2.0) ** 2 \
        + np.cos(p1) * np.cos(p2) * np.sin(dl / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(a, 0, 1)))


def way_stats_batch(t: pa.Table, lookup: _CoordLookup,
                    refs_col: str = "refs") -> pa.Table:
    """One batch of ways -> per-way geometry stats: haversine length
    (meters), vertex count, bbox, centroid (vertex mean). Unknown refs
    are skipped; fully vectorized via reduceat over the flattened
    coordinate run (no per-way Python loop)."""
    import pyarrow.compute as pc
    empty = pa.table({
        "id": pa.array([], pa.int64()),
        "n_vertices": pa.array([], pa.int64()),
        "length_m": pa.array([], pa.float64()),
        "lon_min": pa.array([], pa.float64()),
        "lat_min": pa.array([], pa.float64()),
        "lon_max": pa.array([], pa.float64()),
        "lat_max": pa.array([], pa.float64()),
        "lon_c": pa.array([], pa.float64()),
        "lat_c": pa.array([], pa.float64())})
    if len(t) == 0 or refs_col not in t.column_names:
        return empty
    lengths, values = _flatten(t, refs_col)
    refs = values.to_numpy(zero_copy_only=False).astype(np.int64)
    lon, lat = lookup(refs)
    known = ~np.isnan(lon)
    # compact to known vertices, re-derive per-way runs
    way_of = np.repeat(np.arange(len(t), dtype=np.int64), lengths)
    way_k = way_of[known]
    lon_k = lon[known]
    lat_k = lat[known]
    nv = np.bincount(way_k, minlength=len(t)).astype(np.int64)
    starts = np.zeros(len(t), np.int64)
    np.cumsum(nv[:-1], out=starts[1:])
    # segment distances: consecutive known vertices WITHIN a way
    if len(lon_k) > 1:
        seg = haversine_m(lon_k[:-1], lat_k[:-1], lon_k[1:], lat_k[1:])
        same = way_k[1:] == way_k[:-1]
        seg = np.where(same, seg, 0.0)
        cs = np.concatenate(([0.0], np.cumsum(seg)))
        # length per way = cumsum window over its segment run
        ends = starts + nv
        length = cs[np.maximum(ends - 1, 0)] - cs[np.minimum(
            starts, len(cs) - 1)]
        length = np.where(nv > 1, length, 0.0)
    else:
        length = np.zeros(len(t))

    def agg(vals, fn, init):
        out = np.full(len(t), init, np.float64)
        if len(vals):
            got = fn.reduceat(vals, np.minimum(starts, len(vals) - 1))
            out = np.where(nv > 0, got, init)
        return out

    lon_min = agg(lon_k, np.minimum, np.nan)
    lat_min = agg(lat_k, np.minimum, np.nan)
    lon_max = agg(lon_k, np.maximum, np.nan)
    lat_max = agg(lat_k, np.maximum, np.nan)
    lon_sum = agg(lon_k, np.add, np.nan)
    lat_sum = agg(lat_k, np.add, np.nan)
    safe_nv = np.maximum(nv, 1)
    ids = t["id"] if "id" in t.column_names else pa.array(
        np.arange(len(t), dtype=np.int64))
    return pa.table({
        "id": pc.cast(ids, pa.int64()),
        "n_vertices": pa.array(nv),
        "length_m": pa.array(length),
        "lon_min": pa.array(lon_min), "lat_min": pa.array(lat_min),
        "lon_max": pa.array(lon_max), "lat_max": pa.array(lat_max),
        "lon_c": pa.array(lon_sum / safe_nv),
        "lat_c": pa.array(lat_sum / safe_nv)})


def way_geometry_stats(ways_ds, nodes_ds, *, refs_col: str = "refs",
                       max_broadcast_nodes: int = 50_000_000):
    """Per-way geometry stats Dataset (same broadcast coordinate
    strategy and cap as `simplify_ways`)."""
    import ray
    n_nodes = nodes_ds.count()
    if n_nodes > max_broadcast_nodes:
        raise ValueError(
            f"{n_nodes} nodes exceed max_broadcast_nodes="
            f"{max_broadcast_nodes}; attach coordinates via the "
            "exploded bucketed join as in simplify_ways_shuffle")
    cols = [[], [], []]
    for b in nodes_ds.select_columns(["id", "lon", "lat"]).iter_batches(
            batch_size=None, batch_format="pyarrow"):
        if b.num_rows:
            cols[0].append(b["id"].to_numpy(zero_copy_only=False))
            cols[1].append(b["lon"].to_numpy(zero_copy_only=False))
            cols[2].append(b["lat"].to_numpy(zero_copy_only=False))
    if cols[0]:
        lk = _CoordLookup(np.concatenate(cols[0]).astype(np.int64),
                          np.concatenate(cols[1]).astype(np.float64),
                          np.concatenate(cols[2]).astype(np.float64))
    else:
        lk = _CoordLookup(np.array([], np.int64),
                          np.array([], np.float64),
                          np.array([], np.float64))
    ref = ray.put(lk)

    def fn(t: pa.Table) -> pa.Table:
        return way_stats_batch(t, ray.get(ref), refs_col)

    return ways_ds.map_batches(fn, batch_format="pyarrow")

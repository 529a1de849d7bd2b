"""Multipolygon boundary assembly from OSM relations — the missing
link between "I have a .poly/.geojson file" and how real extract
boundaries ship: as type=multipolygon/boundary RELATIONS whose
member ways (roles outer/inner) are unordered, arbitrarily oriented
open fragments. `osmium extract` accepts a boundary relation id;
this gives `cut` the same power (CLI polygon argument `rel:<id>`).

Ring stitching (deterministic): starting from the lowest-id unused
member way, extend the open chain by the lowest-id way sharing the
chain's tail node (reversing it when needed) until the chain closes;
RAISES on unclosable geometry (dangling endpoint) or on a member way
missing from the corpus — a broken boundary must never silently cut
a different region. Outer rings -> include, inner -> exclude,
matching `PolygonIndex.compile`'s even-odd ring model.

Scale contract: the RELATION is tiny but the corpus is not — member
ways and their nodes are fetched with broadcast id-set filters
(`ray.put` once, searchsorted map-side, zero shuffles); only the
boundary's own ways/nodes reach the driver, capped (RAISES) at
`max_boundary_nodes`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def stitch_rings(ways: dict[int, list[int]]
                 ) -> list[list[int]]:
    """{way_id: [node ids]} open/closed fragments -> list of closed
    node-id rings (each ring ends where it starts). Deterministic
    lowest-id-first assembly; RAISES on unclosable geometry."""
    unused = dict(sorted(ways.items()))
    for wid, refs in unused.items():
        if len(refs) < 2:
            raise RuntimeError(
                f"boundary way {wid} has <2 nodes — broken geometry")
    rings: list[list[int]] = []
    while unused:
        wid, refs = next(iter(unused.items()))
        del unused[wid]
        chain = list(refs)
        while chain[0] != chain[-1]:
            tail = chain[-1]
            nxt = None
            for cid, crefs in unused.items():
                if crefs[0] == tail:
                    nxt, ext = cid, crefs[1:]
                    break
                if crefs[-1] == tail:
                    nxt, ext = cid, crefs[-2::-1]
                    break
            if nxt is None:
                raise RuntimeError(
                    f"boundary ring starting at way {wid} cannot "
                    f"close: no member way continues from node "
                    f"{tail} — broken multipolygon")
            del unused[nxt]
            chain.extend(ext)
        rings.append(chain)
    return rings


def _broadcast_fetch(ds, id_col: str, ids: np.ndarray, cols: list[str],
                     cap: int, what: str) -> pa.Table:
    """Filter ds to id in ids (broadcast + searchsorted, zero
    shuffles) and collect the (bounded, capped) result."""
    ids = np.unique(ids)
    ref = ray.put(ids)

    def filt(t: pa.Table) -> pa.Table:
        want = ray.get(ref)
        have = t[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pos = np.minimum(np.searchsorted(want, have), len(want) - 1)
        return t.select(cols).filter(pa.array(want[pos] == have))

    parts = [b for b in ds.map_batches(filt, batch_format="pyarrow")
             .iter_batches(batch_size=None, batch_format="pyarrow")
             if b.num_rows]
    out = pa.concat_tables(parts) if parts \
        else None
    n = out.num_rows if out is not None else 0
    if n > cap:
        raise RuntimeError(
            f"boundary fetch of {n} {what} rows exceeds the "
            f"driver cap {cap} — not a boundary-sized relation")
    return out


def boundary_rings(nodes, ways, rels, relation_id: int, *,
                   max_boundary_nodes: int = 10_000_000
                   ) -> list[tuple[str, list[tuple[float, float]]]]:
    """Assemble relation `relation_id`'s multipolygon from the corpus
    -> `PolygonIndex.compile`-ready ring list [(include|exclude,
    [(lon, lat), ...])]."""
    rel = _broadcast_fetch(rels, "id",
                           np.asarray([relation_id], np.int64),
                           ["id", "members"], 16, "relation")
    if rel is None or rel.num_rows == 0:
        raise RuntimeError(f"relation {relation_id} not in corpus")
    members = rel["members"][0].as_py() or []
    roles: dict[int, str] = {}
    for m in members:
        if m["type"] != "way":
            continue
        role = m["role"] or "outer"  # blank role: historical outer
        if role in ("outer", "inner"):
            roles[int(m["ref"])] = role
    if not roles:
        raise RuntimeError(
            f"relation {relation_id} has no outer/inner way members")

    way_ids = np.asarray(sorted(roles), np.int64)
    wt = _broadcast_fetch(ways, "id", way_ids, ["id", "node_ids"],
                          len(way_ids), "way")
    got = {} if wt is None else {
        int(wt["id"][i].as_py()): [int(r) for r in
                                   wt["node_ids"][i].as_py()]
        for i in range(wt.num_rows)}
    missing = sorted(set(roles) - set(got))
    if missing:
        raise RuntimeError(
            f"relation {relation_id} member ways missing from the "
            f"corpus: {missing[:8]}{'...' if len(missing) > 8 else ''}")

    out: list[tuple[str, list[int]]] = []
    for role in ("outer", "inner"):
        sel = {w: got[w] for w in sorted(roles) if roles[w] == role}
        if sel:
            out.extend((role, ring) for ring in stitch_rings(sel))

    need = np.unique(np.concatenate(
        [np.asarray(r, np.int64) for _, r in out]))
    if len(need) > max_boundary_nodes:
        raise RuntimeError(
            f"boundary uses {len(need)} nodes > max_boundary_nodes")
    nt = _broadcast_fetch(nodes, "id", need, ["id", "lon", "lat"],
                          max_boundary_nodes, "node")
    coords = {}
    if nt is not None:
        nid = nt["id"].to_numpy(zero_copy_only=False)
        lon = nt["lon"].to_numpy(zero_copy_only=False)
        lat = nt["lat"].to_numpy(zero_copy_only=False)
        coords = {int(i): (float(x), float(y))
                  for i, x, y in zip(nid, lon, lat)}
    miss_n = [int(i) for i in need if int(i) not in coords]
    if miss_n:
        raise RuntimeError(
            f"boundary nodes missing from the corpus: {miss_n[:8]}")
    kind = {"outer": "include", "inner": "exclude"}
    return [(kind[role], [coords[r] for r in ring])
            for role, ring in out]

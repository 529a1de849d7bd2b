"""Multi-region cut: extract K polygon regions from one corpus in a
SINGLE shared scan — the osmium-extract "many extracts per read"
feature. Running `cut` K times re-pays the expensive phases K times
(node PIP, way-pair explode + kept-way aggregate, member collect);
here each is paid once:

- **Phase 1 (shared)** — one PIP pass tags every node with a K-bit
  zone mask (per-zone bbox pre-mask + the shared banded kernel); only
  (id, mask) rows with mask != 0 leave the mappers.
- **Phase 2 (shared)** — way pairs explode once; per-pair zone masks
  come from ONE broadcast lookup; per-way masks reduce with a single
  bucketed bitwise-OR shuffle (one shuffle for all K regions, vs K
  groupbys).
- **Phase 3 (shared collect, per-zone driver closure)** — the member
  table is collected once; the J4 closure runs per zone on the driver
  (cardinality argument as in `cut`).
- **Phase 4 (inherently per-zone)** — payload semi-joins + list
  rewrites per region via the shared `_finish_cut`.

Semantics per region are EXACTLY `cut(polygon=zone)` — pinned by
tests comparing kept sets and rewritten lists against independent
single cuts, both modes. K <= 63 (int64 bitmask); raise past it by
batching regions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from ..geometry.polygon import PolygonIndex
from ..stages import join as J
from .cut import CutResult, _finish_cut

_EMPTY_MEM = pa.table({"rel_id": pa.array([], pa.int64()),
                       "m_type": pa.array([], pa.large_string()),
                       "m_ref": pa.array([], pa.int64())})


def _zone_masks(x: np.ndarray, y: np.ndarray, polys) -> np.ndarray:
    """Per-point K-bit membership mask (bit z set = inside zone z).
    Unlike zonal.tag_zones, zones are independent — no first-match."""
    mask = np.zeros(len(x), np.int64)
    for zi, poly in enumerate(polys):
        bx0, by0, bx1, by1 = poly.bbox
        cand = (x >= bx0) & (x <= bx1) & (y >= by0) & (y <= by1)
        if not cand.any():
            continue
        idx = np.flatnonzero(cand)
        hit = poly.contains(x[idx], y[idx])
        mask[idx[hit]] |= np.int64(1) << np.int64(zi)
    return mask


def cut_multi(nodes: Dataset, ways: Dataset, relations: Dataset,
              polygons: list[PolygonIndex], *, complete: bool = True,
              id_col: str = "id", lon_col: str = "lon",
              lat_col: str = "lat") -> list[CutResult]:
    """One shared scan, K `CutResult`s (one per polygon, same order)."""
    k = len(polygons)
    if k == 0:
        return []
    if k > 63:
        raise ValueError("cut_multi supports <= 63 regions per pass; "
                         "batch the polygon list")
    # this is the BROADCAST strategy (id+mask LUTs on the driver, same
    # contract as cut's broadcast path) — refuse silently huge sets;
    # past the cap run cut_shuffle per region instead
    n_nodes, n_ways = nodes.count(), ways.count()
    if max(n_nodes, n_ways) > J.BROADCAST_MAX_KEYS:
        raise ValueError(
            f"cut_multi is broadcast-strategy only: corpus "
            f"({n_nodes} nodes / {n_ways} ways) exceeds "
            f"BROADCAST_MAX_KEYS={J.BROADCAST_MAX_KEYS}; run "
            "pipelines.cut_shuffle per region past this size")
    poly_ref = ray.put(polygons)

    # --- phase 1 (shared): node zone masks ---
    def pip(t: pa.Table) -> pa.Table:
        empty = pa.table({"node_id": pa.array([], pa.int64()),
                          "mask": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        polys = ray.get(poly_ref)
        x = t[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        m = _zone_masks(x, y, polys)
        keep = m != 0
        return pa.table({
            "node_id": t[id_col].to_numpy(zero_copy_only=False)
            .astype(np.int64)[keep],
            "mask": pa.array(m[keep])})

    flagged = nodes.select_columns([id_col, lon_col, lat_col]) \
        .map_batches(pip, batch_format="pyarrow")
    in_ids_l, in_mask_l = [], []
    for b in flagged.iter_batches(batch_size=None,
                                  batch_format="pyarrow"):
        if b.num_rows:
            in_ids_l.append(b["node_id"].to_numpy(zero_copy_only=False))
            in_mask_l.append(b["mask"].to_numpy(zero_copy_only=False))
    if in_ids_l:
        in_ids = np.concatenate(in_ids_l).astype(np.int64)
        in_mask = np.concatenate(in_mask_l).astype(np.int64)
        order = np.argsort(in_ids, kind="stable")
        in_ids, in_mask = in_ids[order], in_mask[order]
    else:
        in_ids = np.array([], np.int64)
        in_mask = np.array([], np.int64)
    inside_by_zone = [in_ids[(in_mask >> np.int64(z)) & 1 == 1]
                      for z in range(k)]
    lut_ref = ray.put((in_ids, in_mask))

    # --- phase 2 (shared): way pairs + ONE bitwise-OR reduce ---
    way_pairs = J.explode(ways.select_columns([id_col, "node_ids"])
                          .map_batches(lambda t: t.rename_columns(
                              ["way_id", "node_ids"]),
                              batch_format="pyarrow"),
                          ["way_id"], "node_ids", "node_id")

    def pair_masks(t: pa.Table) -> pa.Table:
        empty = pa.table({"way_id": pa.array([], pa.int64()),
                          "mask": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        ids_s, mask_s = ray.get(lut_ref)
        refs = t["node_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(ids_s):
            pos = np.searchsorted(ids_s, refs)
            pos[pos == len(ids_s)] = 0
            pm = np.where(ids_s[pos] == refs, mask_s[pos], 0) \
                .astype(np.int64)
        else:
            pm = np.zeros(len(refs), np.int64)
        wid = t["way_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # per-batch partial OR per way
        order = np.argsort(wid, kind="stable")
        wid, pm = wid[order], np.asarray(pm, np.int64)[order]
        uw, starts = np.unique(wid, return_index=True)
        orr = np.bitwise_or.reduceat(pm, starts) if len(pm) \
            else np.array([], np.int64)
        return pa.table({"way_id": uw, "mask": pa.array(orr)})

    def or_merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"way_id": pd.Series(dtype=np.int64),
                                 "mask": pd.Series(dtype=np.int64)})
        g = g.sort_values("way_id", kind="mergesort")
        wid = g["way_id"].to_numpy(np.int64)
        pm = g["mask"].to_numpy(np.int64)
        uw, starts = np.unique(wid, return_index=True)
        return pd.DataFrame({"way_id": uw,
                             "mask": np.bitwise_or.reduceat(pm, starts)})

    way_mask_ds = J.bucketed_group_apply(
        way_pairs.map_batches(pair_masks, batch_format="pyarrow"),
        "way_id", or_merge)
    wm_ids_l, wm_mask_l = [], []
    for b in way_mask_ds.iter_batches(batch_size=None,
                                      batch_format="pyarrow"):
        if b.num_rows:
            wm_ids_l.append(b["way_id"].to_numpy(zero_copy_only=False))
            wm_mask_l.append(b["mask"].to_numpy(zero_copy_only=False))
    wm_ids = np.concatenate(wm_ids_l).astype(np.int64) if wm_ids_l \
        else np.array([], np.int64)
    wm_mask = np.concatenate(wm_mask_l).astype(np.int64) if wm_ids_l \
        else np.array([], np.int64)
    way_ids_by_zone = [np.sort(wm_ids[(wm_mask >> np.int64(z)) & 1 == 1])
                       for z in range(k)]

    # complete mode: per-zone back-join needs the refs of kept ways —
    # ONE more shared pass over way_pairs emits (node_id, way-zone
    # mask) and the per-zone needed sets fall out of the mask bits
    if complete:
        wm_sorted = np.argsort(wm_ids, kind="stable")
        wlut_ref = ray.put((wm_ids[wm_sorted], wm_mask[wm_sorted]))

        def ref_masks(t: pa.Table) -> pa.Table:
            empty = pa.table({"node_id": pa.array([], pa.int64()),
                              "mask": pa.array([], pa.int64())})
            if len(t) == 0:
                return empty
            wi, wmk = ray.get(wlut_ref)
            wid = t["way_id"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            refs = t["node_id"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            if len(wi) == 0:
                return empty
            pos = np.searchsorted(wi, wid)
            pos[pos == len(wi)] = 0
            m = np.where(wi[pos] == wid, wmk[pos], 0).astype(np.int64)
            keep = m != 0
            if not keep.any():
                return empty
            # partial OR per node id
            refs, m = refs[keep], m[keep]
            order = np.argsort(refs, kind="stable")
            refs, m = refs[order], m[order]
            un, starts = np.unique(refs, return_index=True)
            return pa.table({"node_id": un,
                             "mask": np.bitwise_or.reduceat(m, starts)})

        need_ds = way_pairs.map_batches(ref_masks, batch_format="pyarrow")
        nd_ids_l, nd_mask_l = [], []
        for b in need_ds.iter_batches(batch_size=None,
                                      batch_format="pyarrow"):
            if b.num_rows:
                nd_ids_l.append(
                    b["node_id"].to_numpy(zero_copy_only=False))
                nd_mask_l.append(b["mask"].to_numpy(zero_copy_only=False))
        if nd_ids_l:
            nd_ids = np.concatenate(nd_ids_l).astype(np.int64)
            nd_mask = np.concatenate(nd_mask_l).astype(np.int64)
            # driver OR-collapse of per-batch partials
            order = np.argsort(nd_ids, kind="stable")
            nd_ids, nd_mask = nd_ids[order], nd_mask[order]
            un, starts = np.unique(nd_ids, return_index=True)
            nd_or = np.bitwise_or.reduceat(nd_mask, starts)
        else:
            un = np.array([], np.int64)
            nd_or = np.array([], np.int64)
        node_ids_by_zone = [
            np.union1d(inside_by_zone[z],
                       un[(nd_or >> np.int64(z)) & 1 == 1])
            for z in range(k)]
    else:
        node_ids_by_zone = inside_by_zone

    # --- phase 3 (shared collect): member table once ---
    mem = J.explode(relations.select_columns([id_col, "members"])
                    .map_batches(lambda t: t.rename_columns(
                        ["rel_id", "members"]), batch_format="pyarrow"),
                    ["rel_id"], "members", "m")
    mem = mem.map_batches(
        lambda t: pa.table({
            "rel_id": t["rel_id"],
            "m_type": pc.struct_field(t["m"], "type"),
            "m_ref": pc.struct_field(t["m"], "ref"),
        }), batch_format="pyarrow")
    mem_tbl = pa.concat_tables(
        list(mem.iter_batches(batch_size=None, batch_format="pyarrow"))
        or [_EMPTY_MEM])
    mt = mem_tbl["m_type"].to_numpy(zero_copy_only=False)
    mref = mem_tbl["m_ref"].to_numpy(zero_copy_only=False).astype(np.int64)
    mrel = mem_tbl["rel_id"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)

    # --- phase 3b+4: per-zone closure + emission (shared helper) ---
    return [_finish_cut(nodes, ways, relations, mt, mref, mrel,
                        node_ids_by_zone[z], way_ids_by_zone[z],
                        complete=complete, id_col=id_col)
            for z in range(k)]

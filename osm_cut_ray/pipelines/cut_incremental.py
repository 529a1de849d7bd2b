"""Incremental cut maintenance: keep a polygon extract up to date
under OsmChange diffs WITHOUT re-running the full cut — the
osmium-ecosystem "minutely diff" workflow (osmium extract over a
planet file refreshed by .osc replication), expressed as incremental
view maintenance over the cut's membership sets.

The full cut (pipelines/cut.py) costs: PIP over every node + a
way-membership groupby shuffle + the back-join. After a diff touching
T elements, only these can change:
- inside-status of TOUCHED nodes (PIP on T rows, driver-side);
- kept-status of ways that are touched OR reference a FLIPPED node
  (one zero-shuffle projection scan of way refs against the broadcast
  flip set — no PIP, no groupby);
- the complete-mode node set, maintained EXACTLY via per-node
  reference COUNTS from kept ways (the classic count-maintenance fix:
  plain sets cannot tell "last kept way releasing a ref" from "one of
  several" — delete a kept way and a set would either leak or drop
  shared refs);
- relations: re-closed from scratch per update (the member table is
  driver-scale by the cut's own J4 cardinality argument — reuse, not
  re-derive).

`CutState` holds the sorted membership arrays + ref counts (the same
driver-scale objects the broadcast cut already materializes; the
shuffle-cut analog would keep them as Datasets — out of scope here,
complete mode + broadcast scale only, both RAISE otherwise).

Pinned by tests/test_cut_incremental.py: after every scripted AND
randomized diff, the incrementally maintained state equals a fresh
`cut()` of the post-apply corpus EXACTLY (np.array_equal on all three
id sets + ref counts), and old ± delta == new.

Reference parity: the reference engine re-runs the whole cut on a new
planet file (osm_cut.erl has no update path); this is the capability
its users script around with osmium + replication diffs.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..geometry.polygon import PolygonIndex
from ..sources.osm_change import _winners
from ..stages import join as J
from .cut import _finish_cut, _inside_node_ids, _kept_way_ids


@dataclass
class CutState:
    inside_ids: np.ndarray   # sorted unique node ids inside polygon
    way_ids: np.ndarray      # sorted unique kept way ids
    ref_ids: np.ndarray      # sorted node ids referenced by kept ways
    ref_cnt: np.ndarray      # aligned counts (all > 0)
    rel_ids: np.ndarray      # sorted kept relation ids

    def node_ids(self) -> np.ndarray:
        return np.union1d(self.inside_ids, self.ref_ids)


def save_state(state: CutState, out_dir: str) -> str:
    """Persist the maintained state (4 small parquet files — the
    arrays are broadcast-scale by construction)."""
    import os

    import pyarrow.parquet as pq
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(pa.table({"id": pa.array(state.inside_ids)}),
                   os.path.join(out_dir, "inside.parquet"))
    pq.write_table(pa.table({"id": pa.array(state.way_ids)}),
                   os.path.join(out_dir, "ways.parquet"))
    pq.write_table(pa.table({"id": pa.array(state.ref_ids),
                             "cnt": pa.array(state.ref_cnt)}),
                   os.path.join(out_dir, "refs.parquet"))
    pq.write_table(pa.table({"id": pa.array(state.rel_ids)}),
                   os.path.join(out_dir, "rels.parquet"))
    return out_dir


def load_state(in_dir: str) -> CutState:
    import os

    import pyarrow.parquet as pq

    def col(name, c="id"):
        return pq.read_table(os.path.join(in_dir, name))[c] \
            .to_numpy(zero_copy_only=False).astype(np.int64)

    return CutState(inside_ids=col("inside.parquet"),
                    way_ids=col("ways.parquet"),
                    ref_ids=col("refs.parquet"),
                    ref_cnt=col("refs.parquet", "cnt"),
                    rel_ids=col("rels.parquet"))


def has_state(in_dir: str) -> bool:
    import os
    return os.path.exists(os.path.join(in_dir, "refs.parquet"))


def _safe_winners(tbl: pa.Table):
    """`_winners` with the zero-row guard (apply_change guards at
    its own call site)."""
    if tbl.num_rows == 0:
        return (np.array([], np.int64),
                tbl.drop_columns(["op", "seq"]))
    return _winners(tbl)


def _member(sorted_arr: np.ndarray, vals: np.ndarray) -> np.ndarray:
    if len(sorted_arr) == 0:
        return np.zeros(len(vals), bool)
    pos = np.searchsorted(sorted_arr, vals)
    pos = np.minimum(pos, len(sorted_arr) - 1)
    return sorted_arr[pos] == vals


def _row_any(flags: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Per-list-row ANY over flattened flags — cumsum form (safe for
    zero-length rows, unlike reduceat)."""
    c = np.concatenate(([0], np.cumsum(flags.astype(np.int64))))
    return (c[offs[1:]] - c[offs[:-1]]) > 0


def _refs_of(t: pa.Table):
    col = t["node_ids"].combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0)
    flat = col.flatten().to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    offs = col.offsets.to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    offs = offs - offs[0]
    return flat, offs


def _collect_ref_counts(pairs_ds, col: str):
    """(sorted ids, counts) over an exploded (way_id, node_id) kept
    set — per-batch unique partials, one driver merge."""
    ids_parts, cnt_parts = [], []
    for b in pairs_ds.map_batches(
            lambda t: (lambda u, c: pa.table({
                "i": pa.array(u), "c": pa.array(c.astype(np.int64))})
            )(*np.unique(
                t[col].to_numpy(zero_copy_only=False)
                .astype(np.int64), return_counts=True))
            if len(t) and col in t.column_names
            else pa.table({"i": pa.array([], pa.int64()),
                           "c": pa.array([], pa.int64())}),
            batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"):
        t = pa.table(b)
        if len(t):
            ids_parts.append(t["i"].to_numpy(zero_copy_only=False)
                             .astype(np.int64))
            cnt_parts.append(t["c"].to_numpy(zero_copy_only=False)
                             .astype(np.int64))
    if not ids_parts:
        return np.array([], np.int64), np.array([], np.int64)
    ids = np.concatenate(ids_parts)
    cnt = np.concatenate(cnt_parts)
    u, inv = np.unique(ids, return_inverse=True)
    tot = np.bincount(inv, weights=cnt.astype(np.float64)) \
        .astype(np.int64)
    return u, tot


def _merge_counts(ids: np.ndarray, cnt: np.ndarray,
                  d_ids: np.ndarray, d_cnt: np.ndarray):
    """Apply a (possibly negative) count delta; drop zeros; RAISE on
    negative results (an impossible decrement == a maintenance bug)."""
    if len(d_ids) == 0:
        return ids, cnt
    all_ids = np.concatenate([ids, d_ids])
    all_cnt = np.concatenate([cnt, d_cnt])
    u, inv = np.unique(all_ids, return_inverse=True)
    tot = np.bincount(inv, weights=all_cnt.astype(np.float64)) \
        .astype(np.int64)
    if np.any(tot < 0):
        bad = u[tot < 0][:5]
        raise RuntimeError(
            f"cut_incremental: negative ref count for node ids "
            f"{bad.tolist()} — decrement without matching reference "
            "(state/diff mismatch)")
    keep = tot > 0
    return u[keep], tot[keep]


def _collect_way_rows(ds, *, touched: np.ndarray,
                      flipped: np.ndarray,
                      max_candidates: int = 50_000_000):
    """Collect (way_id, refs) for ways that are touched or reference
    a flipped node. One zero-shuffle projection scan."""
    t_ref = ray.put(np.asarray(touched, np.int64))
    f_ref = ray.put(np.asarray(flipped, np.int64))

    def pick(t: pa.Table, _t=t_ref, _f=f_ref) -> pa.Table:
        empty = pa.table({
            "way_id": pa.array([], pa.int64()),
            "node_ids": pa.array([], pa.list_(pa.int64()))})
        if len(t) == 0 or "id" not in t.column_names:
            return empty
        tt, ff = ray.get(_t), ray.get(_f)
        ids = t["id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat, offs = _refs_of(t)
        keep = _member(tt, ids) | _row_any(_member(ff, flat), offs)
        sel = t.filter(pa.array(keep))
        return pa.table({
            "way_id": pc.cast(sel["id"], pa.int64()),
            "node_ids": pc.cast(sel["node_ids"],
                                pa.list_(pa.int64()))})

    out = ds.select_columns(["id", "node_ids"]).map_batches(
        pick, batch_format="pyarrow")
    ids_parts, flats, offs_parts = [], [], []
    n = 0
    for b in out.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        if len(t) == 0:
            continue
        ids_parts.append(t["way_id"].to_numpy(zero_copy_only=False)
                         .astype(np.int64))
        fl, of = _refs_of(t)
        flats.append(fl)
        offs_parts.append(of)
        n += len(t)
        if n > max_candidates:
            raise RuntimeError(
                f"cut_incremental: candidate ways exceed "
                f"max_candidates={max_candidates} — the diff is a "
                "re-ingest, run the full cut")
    if not ids_parts:
        return (np.array([], np.int64), np.array([], np.int64),
                np.array([0], np.int64))
    lens = np.concatenate(
        [np.diff(o) for o in offs_parts])
    ids = np.concatenate(ids_parts)
    flat = np.concatenate(flats) if flats else np.array([], np.int64)
    offs = np.concatenate(([0], np.cumsum(lens)))
    return ids, flat, offs


def _collect_members(relations, id_col: str = "id"):
    mem = J.explode(relations.select_columns([id_col, "members"])
                    .map_batches(lambda t: t.rename_columns(
                        ["rel_id", "members"]),
                        batch_format="pyarrow"),
                    ["rel_id"], "members", "m")
    mem = mem.map_batches(
        lambda t: pa.table({
            "rel_id": t["rel_id"],
            "m_type": pc.struct_field(t["m"], "type"),
            "m_ref": pc.struct_field(t["m"], "ref"),
        }), batch_format="pyarrow")
    empty = pa.table({"rel_id": pa.array([], pa.int64()),
                      "m_type": pa.array([], pa.large_string()),
                      "m_ref": pa.array([], pa.int64())})
    tbl = pa.concat_tables(
        list(mem.iter_batches(batch_size=None,
                              batch_format="pyarrow")) or [empty])
    return (tbl["m_type"].to_numpy(zero_copy_only=False),
            tbl["m_ref"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            tbl["rel_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64))


def build_cut_state(nodes, ways, relations, polygon: PolygonIndex,
                    *, id_col: str = "id"):
    """Full cut + maintained state -> (CutState, CutResult).
    Complete mode only (the non-complete M8 rewrite invalidates the
    ref-count invariant)."""
    inside = _inside_node_ids(nodes, polygon, id_col=id_col,
                              lon_col="lon", lat_col="lat",
                              concurrency=None)
    way_pairs = J.explode(
        ways.select_columns([id_col, "node_ids"]).map_batches(
            lambda t: t.rename_columns(["way_id", "node_ids"]),
            batch_format="pyarrow"),
        ["way_id"], "node_ids", "node_id")
    way_ids = np.sort(_kept_way_ids(way_pairs, inside))
    kept_pairs = J.broadcast_is_in(way_pairs, "way_id", way_ids,
                                   mode="semi")
    ref_ids, ref_cnt = _collect_ref_counts(kept_pairs, "node_id")
    node_ids = np.union1d(inside, ref_ids)
    mt, mref, mrel = _collect_members(relations, id_col)
    result = _finish_cut(nodes, ways, relations, mt, mref, mrel,
                         node_ids, way_ids, complete=True,
                         id_col=id_col)
    state = CutState(inside_ids=np.sort(inside), way_ids=way_ids,
                     ref_ids=ref_ids, ref_cnt=ref_cnt,
                     rel_ids=result.rel_ids.astype(np.int64))
    return state, result


def apply_osc_to_cut(new_nodes, new_ways, new_relations, old_ways,
                     change: dict, polygon: PolygonIndex,
                     state: CutState, *, id_col: str = "id",
                     emit_result: bool = True):
    """-> (new CutState, delta dict, CutResult | None).

    `new_*` are the POST-apply corpus (from `apply_osc`); `old_ways`
    is the PRE-apply way table (old ref lists of deleted/modified
    ways are not in the diff); `change` is `parse_osc_xml`'s dict.
    """
    # ---- nodes: driver PIP on the touched rows only
    touched_n, repl_n = _safe_winners(change["node"])
    if len(repl_n):
        lon = repl_n["lon"].to_numpy(zero_copy_only=False)
        lat = repl_n["lat"].to_numpy(zero_copy_only=False)
        rin = polygon.contains(lon, lat)
        new_in_ids = np.sort(repl_n["id"].to_numpy(
            zero_copy_only=False).astype(np.int64)[rin])
    else:
        new_in_ids = np.array([], np.int64)
    old_in_t = _member(state.inside_ids, touched_n)
    new_in_t = _member(new_in_ids, touched_n)
    flipped = touched_n[old_in_t != new_in_t]
    new_inside = np.union1d(
        np.setdiff1d(state.inside_ids, touched_n), new_in_ids)

    # ---- ways: one projection scan for touched/flip-referencing
    touched_w, repl_w = _safe_winners(change["way"])
    surviving_w = np.sort(repl_w["id"].to_numpy(
        zero_copy_only=False).astype(np.int64)) if len(repl_w) \
        else np.array([], np.int64)
    deleted_w = np.setdiff1d(touched_w, surviving_w)
    cand_ids, cand_flat, cand_offs = _collect_way_rows(
        new_ways, touched=touched_w, flipped=flipped)
    kept_now_mask = _row_any(_member(new_inside, cand_flat),
                             cand_offs)
    cand_kept = cand_ids[kept_now_mask]
    cand_drop = cand_ids[~kept_now_mask]
    removed_w = np.union1d(
        np.intersect1d(state.way_ids, deleted_w),
        np.intersect1d(state.way_ids, cand_drop))
    added_w = np.setdiff1d(cand_kept, state.way_ids)
    new_way_ids = np.union1d(
        np.setdiff1d(state.way_ids, removed_w), added_w)

    # ---- ref counts: dec old refs of (kept ∩ touched) and of
    # untouched candidates leaving; inc new refs of every way kept now
    # that is touched or entering
    dec_touched = np.intersect1d(state.way_ids, touched_w)
    # untouched candidates leaving: refs unchanged -> use cand refs
    untouched_mask = ~_member(np.sort(touched_w), cand_ids)
    leave_untouched = (~kept_now_mask) & untouched_mask \
        & _member(state.way_ids, cand_ids)
    enter_untouched = kept_now_mask & untouched_mask \
        & ~_member(state.way_ids, cand_ids)
    # touched ways kept now: always re-add their (new) refs
    touched_kept = kept_now_mask & ~untouched_mask

    def _cand_refs(mask: np.ndarray) -> np.ndarray:
        if not mask.any():
            return np.array([], np.int64)
        sel = np.flatnonzero(mask)
        parts = [cand_flat[cand_offs[i]:cand_offs[i + 1]]
                 for i in sel]
        return np.concatenate(parts) if parts \
            else np.array([], np.int64)

    inc_refs = np.concatenate([_cand_refs(touched_kept),
                               _cand_refs(enter_untouched)])
    dec_refs_untouched = _cand_refs(leave_untouched)
    # old refs of touched ways that WERE kept: scan the old corpus
    if len(dec_touched):
        old_rows = J.broadcast_is_in(
            old_ways.select_columns([id_col, "node_ids"]),
            id_col, dec_touched, mode="semi")
        o_ids, o_cnt = _collect_ref_counts(
            J.explode(old_rows.map_batches(
                lambda t: t.rename_columns(["way_id", "node_ids"]),
                batch_format="pyarrow"),
                ["way_id"], "node_ids", "node_id"), "node_id")
    else:
        o_ids = o_cnt = np.array([], np.int64)

    d_ids_parts = [o_ids, dec_refs_untouched, inc_refs]
    d_cnt_parts = [-o_cnt,
                   -np.ones(len(dec_refs_untouched), np.int64),
                   np.ones(len(inc_refs), np.int64)]
    d_ids = np.concatenate(d_ids_parts)
    d_cnt = np.concatenate(d_cnt_parts)
    ref_ids, ref_cnt = _merge_counts(state.ref_ids, state.ref_cnt,
                                     d_ids, d_cnt)

    node_ids = np.union1d(new_inside, ref_ids)

    # ---- relations: re-close (driver-scale member table)
    mt, mref, mrel = _collect_members(new_relations, id_col)
    result = None
    if emit_result:
        result = _finish_cut(new_nodes, new_ways, new_relations,
                             mt, mref, mrel, node_ids, new_way_ids,
                             complete=True, id_col=id_col)
        rel_ids = result.rel_ids.astype(np.int64)
    else:
        from .cut import _close_relations_driver
        rel_ids = _close_relations_driver(
            mt, mref, mrel, node_ids, new_way_ids, complete=True)

    old_nodes_set = state.node_ids()
    new_state = CutState(inside_ids=new_inside, way_ids=new_way_ids,
                         ref_ids=ref_ids, ref_cnt=ref_cnt,
                         rel_ids=rel_ids)
    delta = {
        "nodes_added": np.setdiff1d(node_ids, old_nodes_set),
        "nodes_removed": np.setdiff1d(old_nodes_set, node_ids),
        "ways_added": added_w,
        "ways_removed": removed_w,
        "rels_added": np.setdiff1d(rel_ids, state.rel_ids),
        "rels_removed": np.setdiff1d(state.rel_ids, rel_ids)}
    return new_state, delta, result

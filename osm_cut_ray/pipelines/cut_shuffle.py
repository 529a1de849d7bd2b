"""Shuffle-strategy cut: the 10^12-row path.

`pipelines.cut` broadcasts its membership id sets (`ray.put` +
`pc.is_in`), which is the right call while the sets fit
(BROADCAST_MAX_KEYS). At full corpus scale the inside-node set is
billions of ids, so every membership decision must instead be a
hash-partitioned join. This module re-expresses J1/J2/M8/J5 as native
`Dataset.join` operations (Ray >= 2.47 hash shuffle) over SLIM
projections — payload columns never transit a shuffle; they re-attach
by a final id join (SURVEY §7.4).

The relation phase intentionally stays on the driver: the relation
graph is ~1e-4 of the corpus (SURVEY J4), and the transitive closure
is a worklist algorithm with data-dependent depth.

List rewrites at scale use explode -> join -> regroup with position
columns (order restored by sorting on pos inside the regroup), instead
of in-batch `is_in` against a broadcast array.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..geometry.polygon import PolygonIndex
from ..stages import join as J
from ..stages.pip import apply_pip

import os
import time


# Partition sizing: every hash join / repartition here spawns one
# aggregator task (actor) per partition, each with a ~100ms-1s fixed
# cost — so the count must track DATA VOLUME, capped by cluster cores.
# cut_shuffle() measures its slim inputs once and pins the value;
# OSM_CUT_PARTITIONS overrides for experiments.
_ROWS_PER_PARTITION = 2_000_000  # slim (int64 id) rows per aggregator
_PARTS_STATE: dict = {"value": None}


def _num_partitions() -> int:
    import ray
    env = os.environ.get("OSM_CUT_PARTITIONS")
    if env:
        return max(2, int(env))
    if _PARTS_STATE["value"]:
        return _PARTS_STATE["value"]
    return max(4, int(ray.cluster_resources().get("CPU", 8)))


def _size_partitions(n_rows: int) -> int:
    import ray
    cpu = int(ray.cluster_resources().get("CPU", 8))
    return int(min(max(4, 2 * cpu),
                   max(8, n_rows // _ROWS_PER_PARTITION + 1)))


_TRACE = bool(os.environ.get("OSM_CUT_TRACE"))


class _Phase:
    """Env-gated wall-clock phase tracing (OSM_CUT_TRACE=1)."""

    def __init__(self):
        self.t0 = time.perf_counter()

    def mark(self, label: str):
        if _TRACE:
            t = time.perf_counter()
            print(f"[cut_shuffle] {label}: {t - self.t0:.2f}s")
            self.t0 = t


def _coerce_single_int64(ds: Dataset, col: str) -> Dataset:
    """Normalize to exactly one int64 column named `col`.

    Ray's sort-based groupby/map_groups emits EMPTY blocks with an
    empty schema for group-less partitions; Acero's hash join then
    fails with "No match for key field" on those blocks. Rebuilding
    every block with an explicit dtype fixes the schema drift."""
    def f(t: pa.Table) -> pa.Table:
        if col not in t.column_names:
            return pa.table({col: pa.array([], pa.int64())})
        return pa.table({col: t[col].cast(pa.int64())})
    # repartition merges away schema-LESS empty Arrow blocks that Ray
    # leaves for group-less partitions and skips UDFs on — Acero's
    # hash join rejects them ("No match for key field"); pyarrow batch
    # format keeps blocks Arrow (pandas blocks slow every shuffle)
    return ds.map_batches(f, batch_format="pyarrow")\
        .repartition(_num_partitions())


def _distinct_keys(ds: Dataset, col: str) -> Dataset:
    return _coerce_single_int64(J.distinct(ds, [col]), col)


def _empty_ids(col: str) -> Dataset:
    import ray.data as rd
    return rd.from_arrow(pa.table({col: pa.array([], pa.int64())}))


def _solid_ids(ds: Dataset, col: str) -> Dataset:
    """Make a MATERIALIZED kept-id set safe to feed a native join.

    Two zero-row edges (both observed): (1) an all-filtered-out set
    materializes to schema-less empty blocks — replace with one
    explicit int64-typed block; (2) an OVER-PARTITIONED tiny set (the
    _coerce repartition targets _num_partitions regardless of rows)
    carries schema-less empty splits that crash downstream joins
    NONDETERMINISTICALLY ("No match for key field" when an aggregator
    partition sees only those) — re-solidify to a data-sized partition
    count so every block has rows. count()/num_blocks() are
    metadata-only on materialized inputs; the re-shuffle only fires
    when the set is small, where it is O(rows).

    NOTE typing alone does not make an EMPTY set joinable: the hash
    aggregator drops zero-row blocks, so an empty side reaches Acero
    schema-less regardless — every native join in this module is
    therefore also count-short-circuited on its materialized sides."""
    n = ds.count()
    if n == 0:
        return _empty_ids(col)
    target = min(_num_partitions(), n // 5000 + 1)
    if target < ds.num_blocks():
        ds = ds.repartition(target).materialize()
    return ds


def _empty_like(ds: Dataset) -> Dataset:
    import ray.data as rd
    return rd.from_arrow(ds.schema().base_schema.empty_table())


def semi_join(left: Dataset, key: str, keys_ds: Dataset,
              keys_col: str | None = None, *,
              keys_distinct: bool = False) -> Dataset:
    """left ⋉ keys. Native Acero hash join for flat schemas; the
    Arrow-native bucketed join when the payload carries nested columns
    (Acero rejects list/map non-key fields). Pass `keys_distinct=True`
    when the key set is distinct BY CONSTRUCTION (the kept-id sets all
    are) — re-distincting an already-unique set costs a full extra
    shuffle per call."""
    keys_col = keys_col or key
    # keys_distinct callers hand over an already-coerced single-int64
    # key Dataset (the materialized kept-id sets) — use it verbatim
    slim = keys_ds if keys_distinct else _distinct_keys(keys_ds, keys_col)
    schema: pa.Schema = left.schema().base_schema
    if keys_distinct and slim.count() == 0:
        # Ray 2.49 native joins crash on an empty side (the aggregator
        # drops zero-row blocks); an empty DISTINCT key set means an
        # empty semi-join by definition. keys_distinct sets are
        # materialized, so count() is metadata-only.
        import ray.data as rd
        return rd.from_arrow(schema.empty_table())
    if any(pa.types.is_nested(f.type) for f in schema):
        return J.bucketed_semi_join(left, key, slim, keys_col,
                                    num_buckets=_num_partitions())
    if keys_col != key:
        slim = slim.map_batches(lambda t: t.rename_columns([key]),
                                batch_format="pyarrow")
    return left.join(slim, join_type="inner",
                     num_partitions=_num_partitions(), on=(key,))


def cut_shuffle(nodes: Dataset, ways: Dataset, relations: Dataset,
                polygon: PolygonIndex, *, complete: bool = True,
                id_col: str = "id") -> dict:
    """Returns dict with Datasets: nodes, ways, relations, and the
    kept-id Datasets (node_ids/way_ids/rel_ids, single `id` column).

    Semantics identical to pipelines.cut.cut (tested for equality);
    only the join strategy differs.
    """
    ph = _Phase()
    # phase 1: PIP -> inside id Dataset (slim: id only)
    flagged = apply_pip(nodes.select_columns([id_col, "lon", "lat"]),
                        polygon)
    inside_ids = _solid_ids(flagged.map_batches(
        lambda t: t.filter(t["inside"]).select([id_col])
        .rename_columns(["node_id"]), batch_format="pyarrow")
        .materialize(), "node_id")  # phase barrier (T5): slim id sets;
    # successive hash joins from contending in one streaming DAG

    ph.mark("pip+inside_ids")
    # phase 2: ways — explode with positions, join inside flags
    pairs = J.explode(
        ways.select_columns([id_col, "node_ids"]).map_batches(
            lambda t: t.rename_columns(["way_id", "node_ids"]),
            batch_format="pyarrow"),
        ["way_id"], "node_ids", "node_id", pos_col="pos").materialize()
    # re-solidify: an explode batch with nothing to emit leaves a
    # zero-row schema-less block in the materialized set; a hash-join
    # partition built only from those crashes Acero ("No match for
    # key field way_id on left side" — observed once under heavy CPU
    # contention even with non-degenerate corpora). `pairs` is the
    # LEFT side of several native joins below, so pay one data-sized
    # repartition barrier here.
    _n0 = pairs.count()
    if _n0:
        pairs = pairs.repartition(
            max(1, min(J.cluster_parts(), _n0 // 5000 + 1))) \
            .materialize()
    # pairs feeds three joins; materializing avoids recomputing the
    # explode per consumer (slim columns only — payloads stay behind)
    # size join partitions to the measured slim-row volume (both sets
    # are materialized, so count() is metadata-only)
    n_pairs, n_inside = pairs.count(), inside_ids.count()
    _PARTS_STATE["value"] = _size_partitions(max(n_pairs, n_inside))
    if n_pairs and n_inside:
        # inside_ids is distinct by construction (unique input node ids)
        hit_pairs = pairs.join(
            inside_ids, join_type="inner",
            num_partitions=_num_partitions(), on=("node_id",))
        way_ids = _solid_ids(
            _distinct_keys(hit_pairs.select_columns(["way_id"]),
                           "way_id").materialize(), "way_id")
    else:  # zero-kept edge: joining an empty side crashes (see above)
        way_ids = _empty_ids("way_id")
    n_ways = way_ids.count()
    ph.mark("way_ids")

    def _kept_pairs():
        return pairs.join(
            way_ids.map_batches(lambda t: t.rename_columns(["way_id"]),
                                batch_format="pyarrow"),
            join_type="inner", num_partitions=_num_partitions(),
            on=("way_id",))

    if complete and n_ways:
        # J2: all refs of kept ways become needed nodes; ONE distinct
        # over the union (inside ∪ referenced) instead of two
        needed = _coerce_single_int64(
            _kept_pairs().select_columns(["node_id"]), "node_id")
        node_ids = _solid_ids(_distinct_keys(
            inside_ids.union(needed), "node_id").materialize(), "node_id")
    else:  # no kept ways -> nothing beyond the inside set is needed
        node_ids = inside_ids

    # emit ways: complete keeps verbatim lists; non-complete rebuilds
    # the list from inside pairs (explode->join->regroup, order by pos)
    out_ways = semi_join(ways, id_col, way_ids, "way_id",
                         keys_distinct=True)
    if not complete and n_ways:
        # kept_pairs is a JOIN OUTPUT: row-less aggregator partitions
        # come back as schema-less empty blocks, which the next join
        # rejects — rebuild the schema and repartition them away
        # (same medicine as _coerce_single_int64 / _norm_mem)
        _PAIR_FIELDS = [("way_id", pa.int64()), ("pos", pa.int64()),
                        ("node_id", pa.int64())]

        def _norm_pairs(t: pa.Table) -> pa.Table:
            return pa.table({n: (t[n].cast(typ) if n in t.column_names
                                 else pa.nulls(0, typ))
                             for n, typ in _PAIR_FIELDS})

        kp = _kept_pairs().map_batches(_norm_pairs,
                                       batch_format="pyarrow")\
            .materialize()  # slim (3 int cols); enables data-sizing
        kp_parts = min(_num_partitions(), kp.count() // 5000 + 1)
        inside_pairs = kp.repartition(kp_parts)\
            .join(inside_ids, join_type="inner",
                  num_partitions=_num_partitions(), on=("node_id",))

        def regroup_bucket(g: pd.DataFrame) -> pa.Table:
            # vectorized list rebuild for EVERY way in the bucket:
            # sort by (way, pos), then offsets -> ListArray (no
            # per-way group call — corpus-scale way counts)
            g = g.sort_values(["way_id", "pos"])
            wid = g["way_id"].to_numpy().astype(np.int64)
            nid = g["node_id"].to_numpy().astype(np.int64)
            starts = np.flatnonzero(
                np.concatenate(([True], wid[1:] != wid[:-1])))
            offsets = np.concatenate((starts, [len(wid)]))
            lst = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), pa.array(nid))
            return pa.table({"way_id": pa.array(wid[starts]),
                             "node_ids": lst})

        rebuilt = J.bucketed_group_apply(inside_pairs, "way_id",
                                         regroup_bucket)
        meta = out_ways.drop_columns(["node_ids"])
        out_ways = J.bucketed_attach_column(
            meta, id_col, rebuilt, "way_id", "node_ids",
            num_buckets=_num_partitions())

    ph.mark("ways_emit")
    # phase 3: relations (driver-side closure, as in pipelines.cut) —
    # member matching joins stay distributed via typed keys
    mem = J.explode(
        relations.select_columns([id_col, "members"]).map_batches(
            lambda t: t.rename_columns(["rel_id", "members"]),
            batch_format="pyarrow"),
        ["rel_id"], "members", "m", pos_col="pos")
    mem = mem.map_batches(
        lambda t: pa.table({
            "rel_id": t["rel_id"], "pos": t["pos"],
            "m_type": pc.struct_field(t["m"], "type"),
            "m_ref": pc.struct_field(t["m"], "ref"),
            "m_role": pc.struct_field(t["m"], "role")}),
        batch_format="pyarrow")

    def typed_key(t: pa.Table, type_arr, ref_arr) -> np.ndarray:
        codes = np.select(
            [np.asarray(type_arr) == "node",
             np.asarray(type_arr) == "way"],
            [0, 1], default=2).astype(np.int64)
        return np.asarray(ref_arr, np.int64) * 4 + codes

    mem_keyed = mem.map_batches(
        lambda t: t.append_column("mkey", pa.array(typed_key(
            t, t["m_type"].to_numpy(zero_copy_only=False),
            t["m_ref"].to_numpy(zero_copy_only=False)))),
        batch_format="pyarrow")

    membership = node_ids.map_batches(
        lambda t: pa.table({"mkey": t["node_id"].to_numpy(
            zero_copy_only=False).astype(np.int64) * 4 + 0}),
        batch_format="pyarrow").union(
        way_ids.map_batches(
            lambda t: pa.table({"mkey": t["way_id"].to_numpy(
                zero_copy_only=False).astype(np.int64) * 4 + 1}),
            batch_format="pyarrow"))

    mem_keyed = mem_keyed.materialize()
    # node_ids/way_ids are distinct and the mkey code spaces disjoint,
    # so membership is distinct by construction — no extra shuffle
    membership = membership.materialize()
    if mem_keyed.count() and membership.count():
        direct_rows = mem_keyed.join(
            membership, join_type="inner",
            num_partitions=_num_partitions(), on=("mkey",))
        direct = {int(r["rel_id"]) for r in
                  direct_rows.select_columns(["rel_id"]).take_all()}
    else:  # no members or nothing kept -> no direct matches
        direct = set()
    edge_rows = mem.map_batches(
        lambda t: t.filter(pc.equal(t["m_type"], "relation"))
        .select(["m_ref", "rel_id"]), batch_format="pyarrow")
    edges = [(int(r["m_ref"]), int(r["rel_id"]))
             for r in edge_rows.take_all()]
    ph.mark("rel_direct+edges")

    if complete:
        kept = set(direct)
        changed = True
        while changed:
            changed = False
            for child, parent in edges:
                if child in kept and parent not in kept:
                    kept.add(parent)
                    changed = True
    else:
        kept = set()
        by_parent: dict[int, list[int]] = {}
        for child, parent in edges:
            by_parent.setdefault(parent, []).append(child)
        all_rels = {int(r["rel_id"])
                    for r in mem.select_columns(["rel_id"]).take_all()}
        for rid in sorted(all_rels):
            if rid in direct or any(c in kept
                                    for c in by_parent.get(rid, ())):
                kept.add(rid)

    import ray.data as rd
    rel_ids = rd.from_arrow(pa.table({
        "rel_id": pa.array(sorted(kept), pa.int64())}))

    # J5 member projection: explode->join membership (incl. kept
    # relations)->regroup by pos
    full_membership = membership.union(
        rel_ids.map_batches(
            lambda t: pa.table({"mkey": t["rel_id"].to_numpy(
                zero_copy_only=False).astype(np.int64) * 4 + 2}),
            batch_format="pyarrow"))
    _MEM_FIELDS = [("rel_id", pa.int64()), ("pos", pa.int64()),
                   ("m_type", pa.large_string()), ("m_ref", pa.int64()),
                   ("m_role", pa.large_string()), ("mkey", pa.int64())]

    def _norm_mem(t: pa.Table) -> pa.Table:
        return pa.table({n: (t[n].cast(typ) if n in t.column_names
                             else pa.nulls(0, typ))
                         for n, typ in _MEM_FIELDS})

    if not kept:  # empty join sides crash (see _solid_ids note)
        kept_mem = rd.from_arrow(_norm_mem(pa.table({})))
    else:
        kept_par = mem_keyed.join(
            rel_ids, join_type="inner", num_partitions=_num_partitions(),
            on=("rel_id",))
        # join output can carry schema-less empty blocks for row-less
        # partitions, which the NEXT Acero join rejects ("No match for
        # key field") — rebuild the schema and repartition them away,
        # DATA-SIZED so tiny kept sets don't re-split into new empties
        # (member rows are ~1e-4 of the corpus, so the materialize
        # barrier is slim)
        kept_par = kept_par.map_batches(_norm_mem, batch_format="pyarrow")\
            .materialize()
        kept_par = kept_par.repartition(
            min(_num_partitions(), kept_par.count() // 5000 + 1))
        kept_mem = kept_par.join(
            full_membership, join_type="inner",
            num_partitions=_num_partitions(), on=("mkey",))
    if not complete:
        # forward-pass visibility (non_complete.erl:90-105): a
        # relation-type member is only in the set when its id precedes
        # the parent's under the declared ascending-id file order
        kept_mem = kept_mem.map_batches(
            lambda t: t.filter(pc.or_(
                pc.invert(pc.equal(t["m_type"], "relation")),
                pc.less(t["m_ref"], t["rel_id"]))),
            batch_format="pyarrow")

    def regroup_members_bucket(g: pd.DataFrame) -> pa.Table:
        # vectorized member-list rebuild for every relation in the
        # bucket: sort by (rel, pos), offsets -> list<struct>
        g = g.sort_values(["rel_id", "pos"])
        rid = g["rel_id"].to_numpy().astype(np.int64)
        starts = np.flatnonzero(
            np.concatenate(([True], rid[1:] != rid[:-1])))
        offsets = np.concatenate((starts, [len(rid)]))
        vals = pa.StructArray.from_arrays(
            [pa.array(g["m_type"].astype(str), pa.large_string()),
             pa.array(g["m_ref"].to_numpy().astype(np.int64)),
             pa.array(g["m_role"].astype(str), pa.large_string())],
            names=["type", "ref", "role"])
        lst = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                       vals)
        return pa.table({"rel_id": pa.array(rid[starts]),
                         "members": lst})

    if kept:
        out_members = J.bucketed_group_apply(kept_mem, "rel_id",
                                             regroup_members_bucket)
    else:  # group_apply on zero rows would come back schema-less
        out_members = rd.from_arrow(pa.table({
            "rel_id": pa.array([], pa.int64()),
            "members": pa.array([], pa.list_(pa.struct(
                [("type", pa.large_string()), ("ref", pa.int64()),
                 ("role", pa.large_string())])))}))
    out_rels_meta = semi_join(relations, id_col, rel_ids, "rel_id",
                              keys_distinct=True)

    ph.mark("rel_members")
    out_nodes = semi_join(nodes, id_col, node_ids, "node_id",
                          keys_distinct=True)

    return {
        "nodes": out_nodes, "ways": out_ways,
        "relations_meta": out_rels_meta, "relation_members": out_members,
        "node_ids": node_ids, "way_ids": way_ids, "rel_ids": rel_ids,
    }

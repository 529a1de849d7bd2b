"""Corpus maintenance tools — the remaining everyday osmium verbs,
Ray-Data-shaped:

- `merge_corpora` (osmium merge): union K corpora of one kind,
  resolving id collisions by highest (version, source-index) — one
  slim-key bucketed fold decides winners, payloads ride the fold
  rows (same contract as the cut's member collect).
- `extract_by_ids` (osmium getid -r): seed object ids per kind,
  recursively complete references (relation -> members fixpoint,
  way -> nodes) with broadcast id-set filters; the closure is the
  cut's relation fixpoint specialized to seeds. Returns filtered
  (nodes, ways, relations).
- `renumber_corpus` (osmium renumber): remap ids per kind to dense
  1..N in ascending old-id order, rewriting way node refs and
  relation member refs through broadcast old->new maps (RAISES past
  `max_broadcast_ids`; a planet renumber shards by id range first).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .join import bucketed_group_apply, solidify


def merge_corpora(datasets: list, *, id_col: str = "id",
                  version_col: str = "version"):
    """Union same-kind datasets; on id collision the row with the
    highest (version, source index) wins — later sources break
    version ties, matching `osmium merge` input-order precedence.
    Null versions sort lowest. -> Dataset (winner rows, original
    schema)."""
    import ray.data

    if not datasets:
        raise ValueError("merge_corpora needs at least one dataset")
    schema = datasets[0].schema().base_schema

    def tag(i):
        def fn(t: pa.Table) -> pa.Table:
            al = pa.table({f.name: t[f.name].cast(f.type)
                           for f in schema})
            return al.append_column(
                "__src", pa.array(np.full(len(t), i, np.int64)))
        return fn

    uni = datasets[0].map_batches(tag(0), batch_format="pyarrow")
    for i, ds in enumerate(datasets[1:], 1):
        uni = uni.union(ds.map_batches(tag(i), batch_format="pyarrow"))

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return schema.empty_table()
        ver = g[version_col].fillna(-1).to_numpy(np.float64) \
            if version_col in g.columns else np.zeros(len(g))
        order = np.lexsort((g["__src"].to_numpy(np.int64), ver,
                            g[id_col].to_numpy(np.int64)))
        gid = g[id_col].to_numpy(np.int64)[order]
        last = np.concatenate((gid[1:] != gid[:-1], [True]))
        keep = order[last]
        out = g.iloc[np.sort(keep)].drop(columns="__src")
        # explicit schema: pandas object columns must land back on
        # the original map/list types, not inference
        return pa.Table.from_pandas(out, schema=schema,
                                    preserve_index=False) \
            .replace_schema_metadata(None)

    return bucketed_group_apply(uni, id_col, fold)


def _bcast_filter(ds, ids: np.ndarray):
    """Keep rows whose id is in the broadcast sorted id set."""
    import ray
    ids = np.unique(np.asarray(ids, np.int64))
    ref = ray.put(ids)

    def filt(t: pa.Table) -> pa.Table:
        want = ray.get(ref)
        if len(want) == 0:
            return t.slice(0, 0)
        have = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.minimum(np.searchsorted(want, have), len(want) - 1)
        return t.filter(pa.array(want[pos] == have))

    return ds.map_batches(filt, batch_format="pyarrow")


def extract_by_ids(nodes, ways, rels, *, node_ids=(), way_ids=(),
                   rel_ids=(), max_rounds: int = 32,
                   max_broadcast_ids: int = 50_000_000):
    """osmium getid -r analog: keep the seed objects plus everything
    they reference, transitively (relation members including nested
    relations, way nodes). Seeds that do not exist simply match
    nothing (osmium's default tolerant mode). -> (nodes, ways, rels)
    filtered Datasets."""
    want_r = np.unique(np.asarray(list(rel_ids), np.int64))
    want_w = set(int(i) for i in way_ids)
    want_n = set(int(i) for i in node_ids)

    # relation->relation fixpoint on the driver over SLIM member rows
    # of currently-wanted relations only (seed closures are tiny next
    # to the corpus; each round is one broadcast filter)
    seen_r: set[int] = set()
    frontier = want_r
    rel_members: list[pa.Table] = []
    for _ in range(max_rounds):
        if len(frontier) == 0:
            break
        if len(seen_r) + len(frontier) > max_broadcast_ids:
            raise RuntimeError("extract_by_ids: relation closure "
                               "exceeds max_broadcast_ids")
        seen_r.update(int(i) for i in frontier)
        sel = _bcast_filter(rels, frontier).map_batches(
            lambda t: t.select(["id", "members"]),
            batch_format="pyarrow")
        parts = [b for b in sel.iter_batches(batch_size=None,
                                             batch_format="pyarrow")
                 if b.num_rows]
        if not parts:
            break
        tab = pa.concat_tables(parts)
        rel_members.append(tab)
        nxt: set[int] = set()
        for mem in tab["members"].to_pylist():
            for m in (mem or []):
                ref = int(m["ref"])
                if m["type"] == "relation" and ref not in seen_r:
                    nxt.add(ref)
                elif m["type"] == "way":
                    want_w.add(ref)
                elif m["type"] == "node":
                    want_n.add(ref)
        frontier = np.asarray(sorted(nxt), np.int64)
    else:
        if len(frontier):
            raise RuntimeError(
                f"extract_by_ids: relation nesting deeper than "
                f"{max_rounds} rounds — raise max_rounds")

    if len(want_w) > max_broadcast_ids:
        raise RuntimeError("extract_by_ids: way set exceeds "
                           "max_broadcast_ids")
    kept_ways = _bcast_filter(ways, np.asarray(sorted(want_w),
                                               np.int64)).materialize()
    # way -> node refs (distributed partial, unique per batch)
    import pyarrow.compute as pc

    def refs(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"id": pa.array([], pa.int64())})
        flat = pc.list_flatten(t["node_ids"]) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"id": pa.array(np.unique(flat))})

    for b in kept_ways.map_batches(refs, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        if b.num_rows:
            want_n.update(b["id"].to_numpy(
                zero_copy_only=False).tolist())
    if len(want_n) > max_broadcast_ids:
        raise RuntimeError("extract_by_ids: node set exceeds "
                           "max_broadcast_ids")
    kept_nodes = _bcast_filter(
        nodes, np.asarray(sorted(want_n), np.int64))
    kept_rels = _bcast_filter(
        rels, np.asarray(sorted(seen_r), np.int64))
    return kept_nodes, kept_ways, kept_rels


def _id_maps(nodes, ways, rels, max_broadcast_ids: int):
    """Per kind: sorted old-id array; new id = 1 + index."""
    maps = []
    for ds in (nodes, ways, rels):
        ids: list[np.ndarray] = []
        for b in ds.map_batches(
                lambda t: pa.table({"id": t["id"]}),
                batch_format="pyarrow").iter_batches(
                batch_size=None, batch_format="pyarrow"):
            if b.num_rows:
                ids.append(b["id"].to_numpy(zero_copy_only=False)
                           .astype(np.int64))
        old = np.unique(np.concatenate(ids)) if ids \
            else np.zeros(0, np.int64)
        if len(old) > max_broadcast_ids:
            raise RuntimeError("renumber_corpus: id space exceeds "
                               "max_broadcast_ids — shard by id "
                               "range first")
        maps.append(old)
    return maps


def renumber_corpus(nodes, ways, rels, *,
                    max_broadcast_ids: int = 50_000_000,
                    on_unknown: str = "raise"):
    """osmium renumber analog: ids become dense 1..N per kind in
    ascending old-id order; way node refs and relation member refs
    rewrite consistently. -> (nodes, ways, rels).

    Dangling refs (ids absent from the corpus): `on_unknown="raise"`
    (default) fails loudly like `osmium renumber` without the object;
    `"shift"` remaps an unknown old id to N + old_id, which can never
    alias a renumbered 1..N id (ADVICE r4: keeping the OLD id could
    silently collide with a new dense id and point at a DIFFERENT
    object)."""
    import ray

    if on_unknown not in ("raise", "shift"):
        raise ValueError("on_unknown must be 'raise' or 'shift'")

    n_map, w_map, r_map = _id_maps(nodes, ways, rels,
                                   max_broadcast_ids)
    refs = {"node": ray.put(n_map), "way": ray.put(w_map),
            "relation": ray.put(r_map)}

    def lookup(old: np.ndarray, sorted_ids: np.ndarray) -> np.ndarray:
        n = len(sorted_ids)
        if n == 0:
            known = np.zeros(len(old), bool)
            out = np.zeros(len(old), np.int64)
        else:
            pos = np.minimum(np.searchsorted(sorted_ids, old), n - 1)
            known = sorted_ids[pos] == old
            out = pos + 1
        if known.all():
            return out
        if on_unknown == "raise":
            bad = np.asarray(old)[~known]
            raise RuntimeError(
                f"renumber_corpus: {len(bad)} dangling ref(s) not in "
                f"the corpus (e.g. {bad[:5].tolist()}); pass "
                "on_unknown='shift' to remap them past N")
        return np.where(known, out, n + old)

    def map_nodes(t: pa.Table) -> pa.Table:
        ids = ray.get(refs["node"])
        old = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.set_column(t.schema.get_field_index("id"), "id",
                            pa.array(lookup(old, ids)))

    def map_ways(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        wids = ray.get(refs["way"])
        nids = ray.get(refs["node"])
        old = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = t.set_column(t.schema.get_field_index("id"), "id",
                         pa.array(lookup(old, wids)))
        col = t["node_ids"].combine_chunks()
        lens = pc.fill_null(pc.list_value_length(col), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        new = pa.ListArray.from_arrays(
            pa.array(np.concatenate(([0], np.cumsum(lens))),
                     pa.int32()),
            pa.array(lookup(flat, nids)))
        return t.set_column(t.schema.get_field_index("node_ids"),
                            "node_ids", new)

    def map_rels(t: pa.Table) -> pa.Table:
        rids = ray.get(refs["relation"])
        by_kind = {"node": ray.get(refs["node"]),
                   "way": ray.get(refs["way"]), "relation": rids}
        old = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = t.set_column(t.schema.get_field_index("id"), "id",
                         pa.array(lookup(old, rids)))
        mems = t["members"].to_pylist()
        out = []
        for mem in mems:
            out.append([{**m, "ref": int(lookup(
                np.asarray([m["ref"]], np.int64),
                by_kind[m["type"]])[0])} for m in (mem or [])])
        return t.set_column(
            t.schema.get_field_index("members"), "members",
            pa.array(out, t.schema.field("members").type))

    return (nodes.map_batches(map_nodes, batch_format="pyarrow"),
            ways.map_batches(map_ways, batch_format="pyarrow"),
            rels.map_batches(map_rels, batch_format="pyarrow"))


def check_refs(nodes, ways, rels, *, check_relations: bool = True,
               num_buckets: int = 64, sample: int = 5) -> dict:
    """`osmium check-refs` analog: verify referential completeness —
    every way node ref resolves to a node, every relation member to
    an object of its kind (relation members against the relation
    table itself).

    Fully distributed: slim (parent, ref) explodes + one bucketed
    ANTI-join per kind (`join.bucketed_semi_join`); only counts and
    id samples reach the driver. -> report dict:
    {complete, missing_way_node_refs, ways_affected,
     missing_member_refs: {kind: n}, samples: {...}}."""
    import pyarrow.compute as pc

    from .join import bucketed_semi_join, distinct

    def node_ref_rows(t: pa.Table) -> pa.Table:
        col = t["node_ids"].combine_chunks()
        lens = pc.fill_null(pc.list_value_length(col), 0)\
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)\
            .astype(np.int64)
        wid = np.repeat(t["id"].to_numpy(zero_copy_only=False)
                        .astype(np.int64), lens)
        return pa.table({"parent": wid, "ref": flat})

    way_refs = ways.map_batches(node_ref_rows,
                                batch_format="pyarrow").materialize()
    node_ids = nodes.select_columns(["id"]).materialize()
    dangling = bucketed_semi_join(way_refs, "ref", node_ids, "id",
                                  num_buckets=num_buckets,
                                  mode="anti").materialize()
    n_dangling = dangling.count()
    ways_affected = distinct(
        dangling.select_columns(["parent"]), ["parent"]).count() \
        if n_dangling else 0
    samples = {"way_node_refs": sorted(
        r["ref"] for r in dangling.take(sample))} \
        if n_dangling else {"way_node_refs": []}

    missing_members: dict[str, int] = {}
    if check_relations:
        def member_rows(kind: str):
            def fn(t: pa.Table) -> pa.Table:
                col = t["members"].combine_chunks()
                flat = pc.list_flatten(col)
                if len(flat) == 0:
                    return pa.table({"parent": pa.array([], pa.int64()),
                                     "ref": pa.array([], pa.int64())})
                par = pc.list_parent_indices(col)\
                    .to_numpy(zero_copy_only=False)
                rid = t["id"].to_numpy(zero_copy_only=False)\
                    .astype(np.int64)[par]
                typ = flat.field("type").to_numpy(zero_copy_only=False)
                ref = flat.field("ref").to_numpy(zero_copy_only=False)\
                    .astype(np.int64)
                sel = typ == kind
                return pa.table({"parent": rid[sel], "ref": ref[sel]})
            return fn

        id_sides = {"node": node_ids,
                    "way": ways.select_columns(["id"]).materialize(),
                    "relation": rels.select_columns(["id"])
                    .materialize()}
        for kind, side in id_sides.items():
            mrefs = rels.map_batches(member_rows(kind),
                                     batch_format="pyarrow")\
                .materialize()
            if mrefs.count() == 0:
                missing_members[kind] = 0
                samples[f"member_{kind}"] = []
                continue
            miss = bucketed_semi_join(mrefs, "ref", side, "id",
                                      num_buckets=num_buckets,
                                      mode="anti").materialize()
            missing_members[kind] = miss.count()
            samples[f"member_{kind}"] = sorted(
                r["ref"] for r in miss.take(sample)) \
                if missing_members[kind] else []

    total_missing = n_dangling + sum(missing_members.values())
    return {"complete": total_missing == 0,
            "missing_way_node_refs": int(n_dangling),
            "ways_affected": int(ways_affected),
            "missing_member_refs": missing_members,
            "samples": samples}

"""The operator-coverage query suite + DuckDB oracle SQL.

Each entry is a full Ray Data pipeline over the sf parquet tables plus
(where SQL-expressible) an equivalent ANSI-SQL string for the driver's
DuckDB parity check (row count + schema + order-insensitive value
hash). Column names match exactly between both sides.

Determinism discipline (see derive.py): dyadic coordinates, convex
oracle polygon, int64-quantized aggregate inputs, rounded cosines with
id tie-breaks.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Min, Sum

from ..geometry import cells as CellsMod
from ..geometry.geotag import decode_geotag
from ..geometry.polygon import PolygonIndex
from ..sources.images import decode_stage_batch, images_batch_from_keys
from ..sources.tables import sf_path
from ..stages import join as J
from ..stages import window as W
from ..stages.dedup import embedding_dup_pairs, minhash_lsh_pairs
from ..stages.knn import knn_brute, knn_ivf
from ..stages.pip import apply_pip, default_pool_size
from ..stages.text import LangId, TextStats, md5_fingerprint
from . import derive as D
from . import osm_derive as OD
from .cut import cut

_STAGE_SINGLETONS: dict = {}


def _cached_stage(cls):
    """Task-mode wrapper for zero-arg stage classes whose setup is
    O(1) (compiled regexes, constant tables): construct once per
    worker process instead of paying an actor pool's cold start per
    map_batches call site."""
    def fn(batch):
        st = _STAGE_SINGLETONS.get(cls)
        if st is None:
            st = _STAGE_SINGLETONS[cls] = cls()
        return st(batch)
    fn.__name__ = f"cached_{cls.__name__}"
    return fn


QUERIES: dict[str, Callable] = {}
ORACLES: dict[str, str] = {}


def q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn
    return deco


def collect(ds) -> pa.Table:
    parts = list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not parts:
        return pa.table({})
    return pa.concat_tables(parts, promote_options="default")


def _read(sf_dir: str, table: str, columns=None):
    from ..sources.tables import strip_schema_metadata
    return strip_schema_metadata(
        rd.read_parquet(sf_path(sf_dir, table), columns=columns))


# ======================================================================
# spatial: PIP + tiles (M6, cell assignment)
# ======================================================================

_PENTAGON_IDX = None


def pentagon_index() -> PolygonIndex:
    global _PENTAGON_IDX
    if _PENTAGON_IDX is None:
        _PENTAGON_IDX = PolygonIndex.compile([("include", D.PENTAGON)])
    return _PENTAGON_IDX


_PTS_CTE = (f"pts AS (SELECT event_id AS id, {D.sql_lon('event_id')} AS lon,"
            f" {D.sql_lat('event_id')} AS lat FROM events)")


@q("pip_points", f"""
WITH {_PTS_CTE}
SELECT id, lon, lat, {D.sql_convex_pip()} AS inside FROM pts
""")
def pip_points(sf_dir: str):
    nodes = OD.derive_nodes(sf_dir)
    return collect(apply_pip(nodes, pentagon_index()))


@q("tile_assign_grid", f"""
WITH {_PTS_CTE}
SELECT id, {D.sql_grid_cell()} AS cell FROM pts
""")
def tile_assign_grid(sf_dir: str):
    nodes = OD.derive_nodes(sf_dir)
    return collect(nodes.map_batches(
        lambda t: pa.table({
            "id": t["id"],
            "cell": CellsMod.grid_cell(
                t["lon"].to_numpy(), t["lat"].to_numpy(), D.GRID_DEG)}),
        batch_format="pyarrow"))


@q("cell_pyramid_counts", f"""
WITH {_PTS_CTE},
cellc AS (SELECT {D.sql_grid_cell()} AS cell, count(*) AS n
          FROM pts GROUP BY cell),
lv AS (SELECT * FROM (VALUES (0, 1), (1, 2), (2, 4), (3, 8))
       l(level, f))
SELECT l.level,
       ((cell // 4294967296) // f) * 4294967296
         + ((cell % 4294967296) // f) AS pcell,
       CAST(sum(n) AS BIGINT) AS n
FROM cellc, lv l GROUP BY 1, 2
""")
def cell_pyramid_counts(sf_dir: str):
    """Raster tile pyramid: per-cell counts at the fine grid, rolled
    up 3 more zoom levels (2x/4x/8x coarser) — the map-tile zoom
    aggregation. The rollups aggregate the FINE COUNTS (bounded by the
    grid), never re-scanning the point corpus per level."""
    from ray.data.aggregate import Sum as _Sum
    nodes = OD.derive_nodes(sf_dir)
    fine_partial = nodes.map_batches(
        lambda t: pa.table(dict(zip(
            ["cell", "n"],
            (lambda c: (np.unique(c, return_counts=True)))(
                CellsMod.grid_cell(t["lon"].to_numpy(),
                                   t["lat"].to_numpy(), D.GRID_DEG))))),
        batch_format="pyarrow").map_batches(
        lambda t: pa.table({"cell": t["cell"].cast(pa.int64()),
                            "n": t["n"].cast(pa.int64())}),
        batch_format="pyarrow").repartition(J.cluster_parts(floor=32))
    # repartition first: the partial combiner leaves ~2 fat blocks
    # (single-row-group parquet) and a 2-block aggregate serializes;
    # width tracks cluster cores (downstream is groupby, not Acero,
    # so over-split empties are skipped harmlessly)
    fine = fine_partial.groupby("cell").aggregate(
        _Sum("n", alias_name="n")).map_batches(
        lambda t: pa.table({"cell": t["cell"].cast(pa.int64()),
                            "n": t["n"].cast(pa.int64())})
        if "cell" in t.column_names
        else pa.table({"cell": pa.array([], pa.int64()),
                       "n": pa.array([], pa.int64())}),
        batch_format="pyarrow").repartition(J.cluster_parts(floor=32))
    # no materialize: the rollup consumes the fine counts once, so the
    # whole pyramid streams through one pipelined plan

    def rollup(t: pa.Table) -> pa.Table:
        cell = t["cell"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        ix, iy = cell // 4294967296, cell % 4294967296
        levels, pcells, ns = [], [], []
        for level, f in ((0, 1), (1, 2), (2, 4), (3, 8)):
            levels.append(np.full(len(cell), level, np.int32))
            pcells.append((ix // f) * 4294967296 + iy // f)
            ns.append(n)
        return pa.table({"level": np.concatenate(levels),
                         "pcell": np.concatenate(pcells),
                         "n": np.concatenate(ns)})

    out = fine.map_batches(rollup, batch_format="pyarrow")\
        .groupby(["level", "pcell"]).aggregate(
        _Sum("n", alias_name="n"))
    return collect(out).cast(pa.schema([
        ("level", pa.int32()), ("pcell", pa.int64()),
        ("n", pa.int64())]))


def _shifted_pentagon(p: int) -> list[tuple[float, float]]:
    dx = 30.0 * p - 30.0
    return [(x + dx, y) for x, y in D.PENTAGON]


def _raster_vector_sql() -> str:
    cases = []
    for p in range(3):
        pred = D.sql_convex_pip("cx", "cy", _shifted_pentagon(p))
        cases.append(f"SELECT cell, {p} AS poly_id FROM tiles WHERE {pred}")
    return f"""
WITH {_PTS_CTE},
cells AS (SELECT DISTINCT {D.sql_grid_cell()} AS cell FROM pts),
tiles AS (SELECT cell,
  ((cell // 4294967296) + 0.5) * {D.GRID_DEG} - 180.0 AS cx,
  ((cell % 4294967296) + 0.5) * {D.GRID_DEG} - 90.0 AS cy FROM cells)
{' UNION ALL '.join(cases)}
"""


@q("raster_vector_join", _raster_vector_sql())
def raster_vector_join(sf_dir: str):
    """Raster-tile <-> vector-polygon join: tiles (grid cells of the
    point corpus) matched to the polygons containing their centers.
    Engine path: distinct cells via hash groupby, then the real
    ray-cast kernel per polygon over tile centers (cell-key equi-join
    shape per SURVEY J-graft)."""
    nodes = OD.derive_nodes(sf_dir)
    # distributed pre-pass: per-batch unique cells (the scan is the
    # big side); the global distinct cell set is bounded by the grid
    # (<= 720x360 at 0.5 deg) so the finalize is driver-side numpy —
    # no per-group shuffle needed for a provably-tiny result.
    partial = nodes.map_batches(
        lambda t: pa.table({"cell": np.unique(CellsMod.grid_cell(
            t["lon"].to_numpy(), t["lat"].to_numpy(), D.GRID_DEG))}),
        batch_format="pyarrow")
    cell = np.unique(np.concatenate(
        [b["cell"].to_numpy(zero_copy_only=False)
         for b in partial.iter_batches(batch_size=None,
                                       batch_format="pyarrow")]))
    polys = [PolygonIndex.compile([("include", _shifted_pentagon(p))])
             for p in range(3)]
    cx = ((cell // 4294967296) + 0.5) * D.GRID_DEG - 180.0
    cy = ((cell % 4294967296) + 0.5) * D.GRID_DEG - 90.0
    out_c, out_p = [], []
    for p, idx in enumerate(polys):
        hit = idx.contains(cx, cy)
        out_c.append(cell[hit])
        out_p.append(np.full(int(hit.sum()), p, np.int32))
    return pa.table({"cell": np.concatenate(out_c),
                     "poly_id": np.concatenate(out_p)})


_QLON, _QLAT = D.sql_quantized_lonlat("img_key")


@q("image_tile_assign", f"""
WITH imgs AS (SELECT {D.SQL_IMAGE_ID} AS img_key FROM lineitem)
SELECT printf('img%08d', img_key) AS image_id,
       {D.sql_grid_cell(_QLON, _QLAT)} AS cell,
       printf('caption for img%08d', img_key) AS caption
FROM imgs
""")
def image_tile_assign(sf_dir: str):
    """Flagship graft slice: synthesize the input_hint image table from
    lineitem keys, route the geotag through the int64 phash, assign
    tiles. The oracle replays the phash quantization in SQL."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
    imgs = li.map_batches(
        lambda t: images_batch_from_keys(D.image_ids_from_lineitem(t)),
        batch_format="pyarrow")

    def assign(t: pa.Table) -> pa.Table:
        lon, lat = decode_geotag(t["phash"].to_numpy(zero_copy_only=False))
        return pa.table({
            "image_id": t["image_id"],
            "cell": CellsMod.grid_cell(lon, lat, D.GRID_DEG),
            "caption": t["caption"]})

    return collect(imgs.map_batches(assign, batch_format="pyarrow"))


@q("image_decode_meta")  # no SQL oracle: codec not expressible in SQL
def image_decode_meta(sf_dir: str):
    """Multimodal decode stage: actor pool decodes the binary column,
    enforces the per-row invariant (exact/PSNR>=40dB), emits features."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
    imgs = li.map_batches(
        lambda t: images_batch_from_keys(D.image_ids_from_lineitem(t)),
        batch_format="pyarrow")
    dec = imgs.map_batches(decode_stage_batch, batch_format="pyarrow",
                           batch_size=2048)
    return collect(dec.select_columns(
        ["image_id", "dec_w", "dec_h", "mean_px"]))


# ======================================================================
# the cut itself (J1-J5) vs a recursive-CTE oracle
# ======================================================================

def _cut_ctes(complete: bool) -> str:
    node_src = "final_nodes" if complete else "inside"
    return f"""
{_PTS_CTE},
inside AS (SELECT id FROM pts WHERE {D.sql_convex_pip()}),
wp AS (SELECT user_id AS way_id, event_id AS node_id FROM events),
kept_ways AS (
  SELECT way_id FROM wp GROUP BY way_id
  HAVING bool_or(node_id IN (SELECT id FROM inside))),
-- NB: under WITH RECURSIVE, DuckDB gives UNION inside ANY cte the
-- recursive-iteration (non-deduplicating) semantics — use explicit
-- DISTINCT over UNION ALL for plain set union.
final_nodes AS (
  SELECT DISTINCT id FROM (
    SELECT id FROM inside
    UNION ALL
    SELECT node_id AS id FROM wp
    WHERE way_id IN (SELECT way_id FROM kept_ways)) u),
users AS (SELECT DISTINCT user_id AS rel_id FROM events),
nm AS (SELECT user_id AS rel_id, min(event_id) AS node_ref
       FROM events GROUP BY user_id),
direct AS (
  SELECT rel_id FROM users
  WHERE rel_id IN (SELECT way_id FROM kept_ways)
  UNION
  SELECT rel_id FROM nm WHERE rel_id % 2 = 1
    AND node_ref IN (SELECT id FROM {node_src})),
rec AS (
  SELECT rel_id FROM direct
  UNION
  SELECT u.rel_id FROM users u
  JOIN rec r ON u.rel_id = r.rel_id + {D.REL_STEP})
"""


_CUT_CACHE: dict = {}
_PAIRS_CACHE: dict = {}


def _run_cut(sf_dir: str, complete: bool):
    """Session memo: the four cut queries share one cut execution per
    (sf_dir, mode) — the driver gate runs them back to back."""
    key = (sf_dir, complete, OD._session_token())
    if key not in _CUT_CACHE:
        nodes = OD.derive_nodes(sf_dir)
        ways = OD.derive_ways(sf_dir)
        rels = OD.derive_relations(sf_dir)
        _CUT_CACHE[key] = cut(nodes, ways, rels, pentagon_index(),
                              complete=complete)
    return _CUT_CACHE[key]


def _minhash_pairs_cached(sf_dir: str):
    key = (sf_dir, OD._session_token())
    if key not in _PAIRS_CACHE:
        _PAIRS_CACHE[key] = minhash_lsh_pairs(_docs2(sf_dir))
    return _PAIRS_CACHE[key]


@q("cut_complete_kept", f"""
WITH RECURSIVE {_cut_ctes(True)}
SELECT 'node' AS elem_type, id FROM final_nodes
UNION ALL SELECT 'way', way_id FROM kept_ways
UNION ALL SELECT 'relation', rel_id FROM rec
""")
def cut_complete_kept(sf_dir: str):
    return _run_cut(sf_dir, True).kept_table()


@q("cut_shuffle_kept", ORACLES["cut_complete_kept"])
def cut_shuffle_kept(sf_dir: str):
    """Shuffle-strategy cut (pipelines/cut_shuffle.py): the beyond-
    broadcast id-set path. Same oracle SQL as cut_complete_kept — the
    two join strategies are required to be result-identical."""
    from .cut_shuffle import cut_shuffle
    s = cut_shuffle(OD.derive_nodes(sf_dir), OD.derive_ways(sf_dir),
                    OD.derive_relations(sf_dir), pentagon_index(),
                    complete=True)

    def ids(ds, col):
        parts = [t[col].to_numpy(zero_copy_only=False)
                 for t in ds.iter_batches(batch_size=None,
                                          batch_format="pyarrow")
                 if col in t.column_names and len(t)]
        return np.sort(np.concatenate(parts).astype(np.int64)) \
            if parts else np.array([], np.int64)

    n = ids(s["node_ids"], "node_id")
    w = ids(s["way_ids"], "way_id")
    r = ids(s["rel_ids"], "rel_id")
    return pa.table({
        "elem_type": (["node"] * len(n) + ["way"] * len(w)
                      + ["relation"] * len(r)),
        "id": np.concatenate([n, w, r]).astype(np.int64)})


@q("cut_noncomplete_kept", f"""
WITH RECURSIVE {_cut_ctes(False)}
SELECT 'node' AS elem_type, id FROM inside
UNION ALL SELECT 'way', way_id FROM kept_ways
UNION ALL SELECT 'relation', rel_id FROM rec
""")
def cut_noncomplete_kept(sf_dir: str):
    return _run_cut(sf_dir, False).kept_table()


@q("cut_noncomplete_way_pairs", f"""
WITH RECURSIVE {_cut_ctes(False)}
SELECT DISTINCT way_id, node_id FROM wp
WHERE way_id IN (SELECT way_id FROM kept_ways)
  AND node_id IN (SELECT id FROM inside)
""")
def cut_noncomplete_way_pairs(sf_dir: str):
    res = _run_cut(sf_dir, False)
    pairs = J.explode(
        res.ways.map_batches(
            lambda t: pa.table({"way_id": t["id"],
                                "node_ids": t["node_ids"]}),
            batch_format="pyarrow"),
        ["way_id"], "node_ids", "node_id")
    tbl = collect(pairs)
    return tbl.group_by(["way_id", "node_id"]).aggregate([])


@q("cut_complete_members", f"""
WITH RECURSIVE {_cut_ctes(True)}
SELECT rel_id, m_type, m_ref FROM (
  SELECT u.rel_id, 'way' AS m_type, u.rel_id AS m_ref FROM users u
    WHERE u.rel_id IN (SELECT way_id FROM kept_ways)
  UNION ALL
  SELECT nm.rel_id, 'node', nm.node_ref FROM nm
    WHERE nm.rel_id % 2 = 1
      AND nm.node_ref IN (SELECT id FROM final_nodes)
  UNION ALL
  SELECT u.rel_id, 'relation', u.rel_id - {D.REL_STEP} FROM users u
    WHERE (u.rel_id - {D.REL_STEP}) IN (SELECT rel_id FROM rec)
) m WHERE rel_id IN (SELECT rel_id FROM rec)
""")
def cut_complete_members(sf_dir: str):
    res = _run_cut(sf_dir, True)
    mem = J.explode(
        res.relations.map_batches(
            lambda t: pa.table({"rel_id": t["id"], "members": t["members"]}),
            batch_format="pyarrow"),
        ["rel_id"], "members", "m")
    return collect(mem.map_batches(
        lambda t: pa.table({
            "rel_id": t["rel_id"],
            "m_type": pc.struct_field(t["m"], "type"),
            "m_ref": pc.struct_field(t["m"], "ref")}),
        batch_format="pyarrow"))


# ======================================================================
# relational operator coverage (A1/A2, J-patterns, sorts, unions)
# ======================================================================

def _partial_sum(ds, keys: list[str], quant_cols: dict[str, tuple[str, int]],
                 count_alias: str | None = None):
    """Per-batch int-quantized partial sums (combiner) + global groupby.

    quant_cols: out_name -> (source_col, quant). Sums happen on int64
    so they are order-independent (cross-engine hash-safe).
    """
    def combine(df: pd.DataFrame) -> pd.DataFrame:
        cols = {k: df[k] for k in keys}
        for out, (src, qt) in quant_cols.items():
            cols[out] = np.floor(df[src].to_numpy() * qt).astype(np.int64)
        tmp = pd.DataFrame(cols)
        aggs = {out: (out, "sum") for out in quant_cols}
        if count_alias:
            tmp["__one"] = np.int64(1)
            aggs[count_alias] = ("__one", "sum")
        out = tmp.groupby(keys, as_index=False).agg(**aggs)
        # Arrow out: pandas blocks poison the sort-shuffle (~20x/task)
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    partial = ds.map_batches(combine, batch_format="pandas")
    aggs = [Sum(out, alias_name=out) for out in quant_cols]
    if count_alias:
        aggs.append(Sum(count_alias, alias_name=count_alias))
    return partial.groupby(keys[0] if len(keys) == 1 else keys)\
        .aggregate(*aggs)


@q("q1_lineitem_agg", """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
    AS sum_price_c,
  CAST(sum(CAST(floor(l_discount * 10000) AS BIGINT)) AS BIGINT)
    AS sum_disc_b,
  count(*) AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus
""")
def q1_lineitem_agg(sf_dir: str):
    """A1-style grouped aggregate with per-batch combiner (pre-agg
    before the shuffle, guide §aggregation-at-scale)."""
    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount"])
    return collect(_partial_sum(
        li, ["l_returnflag", "l_linestatus"],
        {"sum_qty_c": ("l_quantity", 100),
         "sum_price_c": ("l_extendedprice", 100),
         "sum_disc_b": ("l_discount", 10000)},
        count_alias="n"))


@q("semi_join_orders", """
SELECT o.o_orderkey FROM orders o WHERE EXISTS
  (SELECT 1 FROM lineitem l
   WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
""")
def semi_join_orders(sf_dir: str):
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    hot = li.map_batches(
        lambda t: t.filter(pc.greater(t["l_quantity"], 45.0))
        .select(["l_orderkey"]), batch_format="pyarrow")
    keys = J.collect_key_array(hot, "l_orderkey")
    orders = _read(sf_dir, "orders", ["o_orderkey"])
    return collect(J.broadcast_is_in(orders, "o_orderkey", keys,
                                     mode="semi"))


@q("anti_join_orders", """
SELECT o.o_orderkey FROM orders o WHERE NOT EXISTS
  (SELECT 1 FROM lineitem l
   WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
""")
def anti_join_orders(sf_dir: str):
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    hot = li.map_batches(
        lambda t: t.filter(pc.greater(t["l_quantity"], 45.0))
        .select(["l_orderkey"]), batch_format="pyarrow")
    keys = J.collect_key_array(hot, "l_orderkey")
    orders = _read(sf_dir, "orders", ["o_orderkey"])
    return collect(J.broadcast_is_in(orders, "o_orderkey", keys,
                                     mode="anti"))


@q("back_join_suppliers", """
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN
  (SELECT DISTINCT l_suppkey FROM lineitem WHERE l_quantity > 49)
""")
def back_join_suppliers(sf_dir: str):
    """J2 shape: distinct needed keys (phase 1 groupby) then back-join
    the payload rows (phase 2)."""
    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_quantity"])
    need = li.map_batches(
        lambda t: t.filter(pc.greater(t["l_quantity"], 49.0))
        .select(["l_suppkey"]), batch_format="pyarrow")
    keys = J.collect_key_array(need, "l_suppkey")
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    return collect(J.broadcast_is_in(sup, "s_suppkey", keys, mode="semi"))


@q("distinct_parts",
   "SELECT DISTINCT l_partkey FROM lineitem")
def distinct_parts(sf_dir: str):
    li = _read(sf_dir, "lineitem", ["l_partkey"])
    return collect(J.distinct(li, ["l_partkey"]))


@q("topk_orders", """
SELECT o_orderkey, CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c
FROM orders ORDER BY price_c DESC, o_orderkey LIMIT 10
""")
def topk_orders(sf_dir: str):
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    quant = orders.map_batches(
        lambda t: pa.table({
            "o_orderkey": t["o_orderkey"],
            "price_c": pc.cast(pc.floor(pc.multiply(
                t["o_totalprice"], 100.0)), pa.int64())}),
        batch_format="pyarrow")
    top = quant.sort(["price_c", "o_orderkey"],
                     descending=[True, False]).limit(10)
    return collect(top)


@q("revenue_by_nation", """
SELECT n_name,
  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
    AS revenue_c,
  count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""")
def revenue_by_nation(sf_dir: str):
    """Broadcast dimension join, Arrow-native: the customer->nation
    lookup ships ONCE as (sorted custkeys, int32 nation CODES) — no
    Python-object name array per batch — codes flow through the
    combiner+groupby, and the 25-row result decodes code->name on the
    driver (round-1 verdict item: keep the stage Arrow-native)."""
    cust = collect(_read(sf_dir, "customer", ["c_custkey", "c_nationkey"]))
    nat = collect(_read(sf_dir, "nation", ["n_nationkey", "n_name"]))
    nat_names = nat["n_name"].to_pylist()
    code_of = {int(k): i for i, k in
               enumerate(nat["n_nationkey"].to_pylist())}
    ck = cust["c_custkey"].to_numpy()
    order_idx = np.argsort(ck)
    ck_sorted = ck[order_idx]
    codes_sorted = np.array(
        [code_of[int(x)] for x in
         cust["c_nationkey"].to_numpy()[order_idx]], np.int32)
    lookup_ref = ray.put((ck_sorted, codes_sorted))

    def attach(t: pa.Table) -> pa.Table:
        keys, codes = ray.get(lookup_ref)  # zero-copy plasma views
        pos = np.searchsorted(
            keys, t["o_custkey"].to_numpy(zero_copy_only=False))
        return pa.table({"n_code": pa.array(codes[pos]),
                         "o_totalprice": t["o_totalprice"]})

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    with_n = orders.map_batches(attach, batch_format="pyarrow")
    agg = collect(_partial_sum(with_n, ["n_code"],
                               {"revenue_c": ("o_totalprice", 100)},
                               count_alias="n_orders"))
    codes = agg["n_code"].to_numpy(zero_copy_only=False)
    return pa.table({
        "n_name": pa.array([nat_names[int(c)] for c in codes]),
        "revenue_c": agg["revenue_c"],
        "n_orders": agg["n_orders"]})


@q("union_keys", """
SELECT 'c' AS src, c_custkey AS key FROM customer
UNION ALL SELECT 's', s_suppkey FROM supplier
""")
def union_keys(sf_dir: str):
    c = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda t: pa.table({
            "src": pa.array(["c"] * len(t)),
            "key": t["c_custkey"]}), batch_format="pyarrow")
    s = _read(sf_dir, "supplier", ["s_suppkey"]).map_batches(
        lambda t: pa.table({
            "src": pa.array(["s"] * len(t)),
            "key": t["s_suppkey"]}), batch_format="pyarrow")
    return collect(c.union(s))


# ======================================================================
# stream-shaped: windows, sessions, JSON/date scalar fns
# ======================================================================

@q("window_tumbling_events", """
SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
  CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_v_q,
  count(*) AS n
FROM events GROUP BY event_type, hour
""")
def window_tumbling_events(sf_dir: str):
    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])
    partial = ev.map_batches(W.tumbling_batch, batch_format="pandas")
    return collect(partial.groupby(["event_type", "hour"]).aggregate(
        Sum("sum_v_q", alias_name="sum_v_q"), Sum("n", alias_name="n")))


@q("sessionize_events", """
WITH s AS (
  SELECT user_id, event_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL THEN 1
         WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1
         ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
t AS (SELECT user_id, event_id,
        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS session_id
      FROM s)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events, min(event_id) AS first_event
FROM t GROUP BY user_id, session_id
""")
def sessionize_events(sf_dir: str):
    """Stateful stream analog: keyed shuffle + ts-ordered scan. Shape:
    64-bucket hash partition + FULLY VECTORIZED sessionization inside
    each bucket (sort by (user, ts, id); a session break is a user
    change or a gap; per-user session ids via cumsum) — Ray group
    overhead is per bucket, not per user (corpus-scale users)."""
    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        new_user = g["user_id"].ne(g["user_id"].shift())
        gap = g["ts"].diff() > pd.Timedelta(minutes=30)
        new_s = (new_user | gap).astype(np.int64)
        sid = new_s.cumsum()
        base = sid.where(new_user).ffill()           # first sid of user
        g = g.assign(session_id=(sid - base + 1).astype(np.int64))
        return g.groupby(["user_id", "session_id"], as_index=False)\
            .agg(n_events=("event_id", "size"),
                 first_event=("event_id", "min"))

    return collect(J.bucketed_group_apply(ev, "user_id", per_bucket))


@q("json_extract_events", """
SELECT event_id, CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS k
FROM events
""")
def json_extract_events(sf_dir: str):
    ev = _read(sf_dir, "events", ["event_id", "props"])

    def ext(df: pd.DataFrame) -> pd.DataFrame:
        k = df["props"].str.extract(r"([0-9]+)", expand=False)\
            .astype(np.int64)
        return pd.DataFrame({"event_id": df["event_id"], "k": k})

    return collect(ev.map_batches(ext, batch_format="pandas"))


@q("orders_by_month", """
SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n
FROM orders GROUP BY month
""")
def orders_by_month(sf_dir: str):
    orders = _read(sf_dir, "orders", ["o_orderdate"])

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        m = df["o_orderdate"].dt.strftime("%Y-%m")
        out = pd.DataFrame({"month": m})
        out["n"] = np.int64(1)
        return out.groupby("month", as_index=False).agg(n=("n", "sum"))

    partial = orders.map_batches(
        lambda df: pa.Table.from_pandas(bucket(df), preserve_index=False)
        .replace_schema_metadata(None),
        batch_format="pandas")
    return collect(partial.groupby("month").aggregate(
        Sum("n", alias_name="n")))


# ======================================================================
# text analysis + dedup family over documents
# ======================================================================

_DOCS2_CTE = """docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 1000000, text FROM documents)"""


def _docs2(sf_dir: str):
    """Documents with planted exact duplicates (ids shifted by 1e6) —
    gives the dedup family real work with a constructible oracle."""
    d = _read(sf_dir, "documents", ["doc_id", "text"])
    dup = d.map_batches(
        lambda t: pa.table({
            "doc_id": pc.add(t["doc_id"], 1000000), "text": t["text"]}),
        batch_format="pyarrow")
    return d.union(dup)


@q("dedup_exact_docs", f"""
WITH {_DOCS2_CTE}
SELECT min(doc_id) AS doc_id FROM docs2 GROUP BY text
""")
def dedup_exact_docs(sf_dir: str):
    """Exact dedup: md5 content hash per batch -> hash-partition
    groupby -> min id per group (hash, not raw text, transits the
    shuffle)."""
    from ..stages.dedup import _spread
    docs = _docs2(sf_dir)
    # spread the 2-fat-block union before the (CPU) hash pass
    hashed = _spread(docs).map_batches(
        lambda df: pa.Table.from_pandas(md5_fingerprint(df),
                                        preserve_index=False)
        .replace_schema_metadata(None),
        batch_format="pandas")
    return collect(hashed.groupby("fp").aggregate(
        Min("doc_id", alias_name="doc_id")).select_columns(["doc_id"]))


@q("token_count_docs", r"""
SELECT doc_id, length(regexp_extract_all(text, '\S+')) AS n_tokens
FROM documents
""")
def token_count_docs(sf_dir: str):
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_tokens": df["text"].str.count(r"\S+").astype(np.int64)})

    return collect(docs.map_batches(f, batch_format="pandas"))


@q("quality_docs", r"""
WITH t AS (SELECT doc_id,
  length(text) AS n_chars_calc,
  length(regexp_extract_all(text, '\S+')) AS n_tokens,
  length(regexp_extract_all(lower(text), '\b(?:the|and|of|to|a)\b'))
    AS n_stop,
  length(regexp_extract_all(text, '[.,!?;:]')) AS n_punct
FROM documents)
SELECT doc_id, n_chars_calc, n_tokens, n_stop, n_punct,
  CASE WHEN n_tokens > 0
       THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END AS stop_ratio,
  CASE WHEN n_chars_calc > 0
       THEN CAST(n_punct AS DOUBLE) / n_chars_calc ELSE 0.0 END
    AS punct_ratio
FROM t
""")
def quality_docs(sf_dir: str):
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return collect(docs.map_batches(_cached_stage(TextStats),
                                    batch_format="pandas"))


_LANG_SQL_COUNTS = """
  length(regexp_extract_all(lower(text), '\\b(?:the|and|of|to|in|is)\\b'))
    AS c_en,
  length(regexp_extract_all(lower(text),
    '\\b(?:der|die|und|das|ist|nicht)\\b')) AS c_de,
  length(regexp_extract_all(lower(text), '\\b(?:le|la|et|les|des|un)\\b'))
    AS c_fr,
  length(regexp_extract_all(lower(text),
    '\\b(?:el|los|las|una|por|que)\\b')) AS c_es,
  length(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS c_zh
"""


@q("lang_id_docs", f"""
WITH t AS (SELECT doc_id, {_LANG_SQL_COUNTS} FROM documents)
SELECT doc_id,
  CASE WHEN c_zh > 0 THEN 'zh'
       WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es THEN 'en'
       WHEN c_de >= c_fr AND c_de >= c_es THEN 'de'
       WHEN c_fr >= c_es THEN 'fr'
       ELSE 'es' END AS lang_pred
FROM t
""")
def lang_id_docs(sf_dir: str):
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return collect(docs.map_batches(_cached_stage(LangId),
                                    batch_format="pandas"))


@q("fingerprint_docs", "SELECT doc_id, md5(text) AS fp FROM documents")
def fingerprint_docs(sf_dir: str):
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return collect(docs.map_batches(md5_fingerprint, batch_format="pandas"))


@q("minhash_dedup_docs", rf"""
WITH {_DOCS2_CTE},
toks AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w
         FROM docs2),
sh AS (SELECT DISTINCT doc_id,
         w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
       FROM toks, UNNEST(range(1, length(w) - 1)) AS t(i)),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
SELECT a_id, b_id FROM inter
JOIN sizes sa ON sa.doc_id = a_id
JOIN sizes sb ON sb.doc_id = b_id
WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
""")
def minhash_dedup_docs(sf_dir: str):
    """MinHash+LSH near-dup detection over the doubled corpus (planted
    exact copies + the generator's own natural near-dups). Oracle =
    true 3-gram-shingle Jaccard >= 0.8 computed in SQL; the LSH recall
    at J>=0.8 with 16 bands x 4 rows makes a miss ~1e-4-improbable per
    pair, and the engine verifies every candidate with exact Jaccard,
    so both sides converge on the true pair set."""
    return _minhash_pairs_cached(sf_dir)


@q("ngram_jaccard_pairs", ORACLES["minhash_dedup_docs"])
def ngram_jaccard_pairs(sf_dir: str):
    """Exact n-gram Jaccard dedup (deterministic sibling of the
    MinHash pipeline; same truth, no probabilistic step): shingle
    explode -> shingle groupby -> pair counting -> J filter."""
    from ..stages.dedup import exact_jaccard_pairs
    return exact_jaccard_pairs(_docs2(sf_dir))


@q("simhash_dup_pairs", rf"""
WITH {_DOCS2_CTE},
toks AS (SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '\S+')) AS tok
         FROM docs2),
th AS (SELECT doc_id, md5_number_lower(tok) AS h FROM toks),
bits AS (SELECT doc_id, b,
           CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END AS v
         FROM th, range(64) r(b)),
votes AS (SELECT doc_id, b, sum(v) AS s FROM bits GROUP BY doc_id, b),
fp AS (SELECT doc_id,
         sum(CASE WHEN s >= 0 THEN (1::UBIGINT << b)
             ELSE 0::UBIGINT END)::UBIGINT AS f
       FROM votes GROUP BY doc_id)
SELECT a.doc_id AS a_id, b.doc_id AS b_id
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.f, b.f)) <= 3
ORDER BY a_id, b_id
""")
def simhash_dup_pairs(sf_dir: str):
    """EXACT SimHash near-dup pairs: md5-token 64-bit SimHash, 4x16-bit
    band candidates (pigeonhole-complete for hamming <= 3), exact
    Hamming verify. The only SQL-replayable SimHash: the token hash is
    DuckDB's md5_number_lower, so the oracle recomputes the identical
    fingerprints and pair set."""
    from ..stages.dedup import simhash_md5_pairs
    return simhash_md5_pairs(_docs2(sf_dir), hamming_threshold=3)


# ======================================================================
# embeddings: similarity search + embedding dedup
# ======================================================================

def _probe_matrix(sf_dir: str, n: int = 10):
    emb = collect(_read(sf_dir, "embeddings", ["vec_id", "embedding"]))
    ids = emb["vec_id"].to_numpy()
    take = np.argsort(ids)[:n]
    mat = np.stack([np.asarray(v, np.float64)
                    for v in emb["embedding"].take(pa.array(take)).to_pylist()])
    return ids[take].astype(np.int64), mat


@q("knn_brute_embeddings", """
WITH probes AS (
  SELECT vec_id AS probe_id, embedding AS pe FROM embeddings
  ORDER BY vec_id LIMIT 10)
SELECT probe_id, neighbor_id, sim FROM (
  SELECT p.probe_id, e.vec_id AS neighbor_id,
    round(
      list_inner_product(CAST(p.pe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
      / (sqrt(list_inner_product(CAST(p.pe AS DOUBLE[]),
                                 CAST(p.pe AS DOUBLE[])))
         * sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                   CAST(e.embedding AS DOUBLE[])))), 6)
      AS sim
  FROM probes p, embeddings e WHERE e.vec_id != p.probe_id) s
QUALIFY row_number() OVER (PARTITION BY probe_id
                           ORDER BY sim DESC, neighbor_id) <= 5
""")
def knn_brute_embeddings(sf_dir: str):
    ids, mat = _probe_matrix(sf_dir)
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return knn_brute(emb, ids, mat, k=5)


def knn_ivf_embeddings(sf_dir: str):
    """ANN scale path (IVF cells + nprobe); approximate by design —
    folded into the `knn_approx` gate entry; recall pinned by
    tests/test_stages.py::test_knn_ivf_recall_vs_brute."""
    ids, mat = _probe_matrix(sf_dir)
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return knn_ivf(emb, ids, mat, k=5)


@q("embedding_dup_pairs", """
SELECT vec_id AS a_id, vec_id + 1000000 AS b_id FROM embeddings
""")
def embedding_dup_pairs_q(sf_dir: str):
    """Embedding-cosine near-dup via hyperplane LSH + exact verify on a
    planted-duplicate corpus (copies at vec_id + 1e6; random 64-dim
    vectors never reach cosine 0.999)."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    dup = emb.map_batches(
        lambda t: pa.table({"vec_id": pc.add(t["vec_id"], 1000000),
                            "embedding": t["embedding"]}),
        batch_format="pyarrow")
    return embedding_dup_pairs(emb.union(dup))


# ======================================================================
# geographic kNN over derived points
# ======================================================================

@q("knn_points_brute", f"""
WITH RECURSIVE {_PTS_CTE},
probes AS (SELECT id AS probe_id, lon AS plon, lat AS plat FROM pts
           WHERE id < 8)
SELECT probe_id, neighbor_id, d2 FROM (
  SELECT p.probe_id, n.id AS neighbor_id,
    (n.lon - p.plon) * (n.lon - p.plon)
      + (n.lat - p.plat) * (n.lat - p.plat) AS d2
  FROM probes p, pts n WHERE n.id != p.probe_id) s
QUALIFY row_number() OVER (PARTITION BY probe_id
                           ORDER BY d2, neighbor_id) <= 5
""")
def knn_points_brute(sf_dir: str):
    """Spatial kNN baseline: exact top-5 nearest points per probe.
    Distances are exact dyadic arithmetic -> identical ordering in SQL.
    Same partial-top-k + merge shape as the embedding kNN."""
    nodes = OD.derive_nodes(sf_dir)
    probes = collect(nodes.map_batches(
        lambda t: t.filter(pc.less(t["id"], 8)), batch_format="pyarrow"))
    p_ids = probes["id"].to_numpy().astype(np.int64)
    p_lon = probes["lon"].to_numpy()
    p_lat = probes["lat"].to_numpy()
    ref = ray.put((p_ids, p_lon, p_lat))

    def partial_fn(t: pa.Table) -> pa.Table:
        # task mode: probe arrays rehydrate zero-copy from plasma;
        # Arrow output keeps the probe_id sort off the pandas slow path
        p_ids, p_lon, p_lat = ray.get(ref)
        ids = t["id"].to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        out_p, out_n, out_d = [], [], []
        for j, pid in enumerate(p_ids):
            d2 = (lon - p_lon[j]) ** 2 + (lat - p_lat[j]) ** 2
            mask = ids != pid
            cid, cd = ids[mask], d2[mask]
            if len(cid) == 0:
                continue
            k = min(5, len(cid))
            top = np.argpartition(cd, k - 1)[:k]
            out_p.append(np.full(k, pid))
            out_n.append(cid[top])
            out_d.append(cd[top])
        if not out_p:
            return pa.table({"probe_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "d2": pa.array([], pa.float64())})
        return pa.table({
            "probe_id": np.concatenate(out_p).astype(np.int64),
            "neighbor_id": np.concatenate(out_n).astype(np.int64),
            "d2": np.concatenate(out_d).astype(np.float64)})

    partial = nodes.map_batches(partial_fn, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g["neighbor_id"].to_numpy(),
                            g["d2"].to_numpy()))[:5]
        return g.iloc[order]

    return collect(partial.groupby("probe_id").map_groups(
        merge, batch_format="pandas"))


def knn_points_cell(sf_dir: str):
    """Cell kNN the scale way: bucket points by hex cell, search each
    probe's cell + ring-1 disk (SURVEY §2.4 graft additions).
    Approximate by design — folded into the `knn_approx` gate entry;
    recall pinned by test_knn_points_cell_recall_vs_brute."""
    nodes = OD.derive_nodes(sf_dir)
    # density-adaptive resolution (cell size must track point density
    # — the knob the north_star's skew section is about): pick the
    # finest res keeping enough candidates per cell from a sample, so
    # the same pipeline runs res ~0 on the sparse global test corpus
    # and res 7-9 at production density.
    sample = collect(nodes.limit(20000))
    res = CellsMod.auto_hex_res(sample["lon"].to_numpy(),
                                sample["lat"].to_numpy(),
                                target_per_cell=8.0)
    bucketed = nodes.map_batches(
        lambda t: pa.table({
            "id": t["id"], "lon": t["lon"], "lat": t["lat"],
            "cell": CellsMod.hex_cell(t["lon"].to_numpy(),
                                      t["lat"].to_numpy(), res)}),
        batch_format="pyarrow")
    probes = collect(bucketed.map_batches(
        lambda t: t.filter(pc.less(t["id"], 8)), batch_format="pyarrow"))
    want: dict[int, list[int]] = {}
    for pid, pcell in zip(probes["id"].to_pylist(),
                          probes["cell"].to_pylist()):
        for c in CellsMod.hex_disk(int(pcell), 1):
            want.setdefault(int(c), []).append(int(pid))
    pmap = {int(i): (float(lo), float(la)) for i, lo, la in zip(
        probes["id"].to_pylist(), probes["lon"].to_pylist(),
        probes["lat"].to_pylist())}
    probe_disks = {}
    for c, pids in want.items():
        for pid in pids:
            probe_disks.setdefault(pid, []).append(c)
    probe_disks = {pid: np.array(sorted(cs), np.int64)
                   for pid, cs in probe_disks.items()}
    ref = ray.put((want, pmap))

    # candidate rows = rows whose cell is in ANY probe's disk (tiny
    # broadcast filter) — then VECTORIZED per-batch probe matching.
    # No per-cell groupby at all: a corpus-scale cell count would pay
    # Ray group overhead for thousands of cells that no probe touches.
    all_disk = np.array(sorted(want), np.int64)
    sub = J.broadcast_is_in(bucketed, "cell", all_disk, mode="semi")

    def partial_fn(t: pa.Table) -> pa.Table:
        w, pm = ray.get(ref)
        ids = t["id"].to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        cell = t["cell"].to_numpy(zero_copy_only=False)
        out_p, out_n, out_d = [], [], []
        for pid, (plon, plat) in pm.items():
            disk = probe_disks.get(pid)
            mask = np.isin(cell, disk) & (ids != pid)
            cid = ids[mask]
            if len(cid) == 0:
                continue
            cd = (lon[mask] - plon) ** 2 + (lat[mask] - plat) ** 2
            k = min(5, len(cid))
            top = np.argpartition(cd, k - 1)[:k]
            out_p.append(np.full(k, pid))
            out_n.append(cid[top])
            out_d.append(cd[top])
        if not out_p:
            return pa.table({"probe_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "d2": pa.array([], pa.float64())})
        return pa.table({
            "probe_id": np.concatenate(out_p).astype(np.int64),
            "neighbor_id": np.concatenate(out_n).astype(np.int64),
            "d2": np.concatenate(out_d).astype(np.float64)})

    partial = sub.map_batches(partial_fn, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g["neighbor_id"].to_numpy(),
                            g["d2"].to_numpy()))[:5]
        return g.iloc[order]

    return collect(partial.groupby("probe_id").map_groups(
        merge, batch_format="pandas"))


@q("knn_approx")  # approximate ANN variants -> rows-only; recall pinned
def knn_approx(sf_dir: str):
    """Both approximate-kNN scale paths in one gate entry (the exact
    siblings `knn_brute_embeddings` / `knn_points_brute` carry the
    oracles): IVF-cell embedding ANN and hex-cell spatial kNN, unioned
    on a (variant, probe_id, neighbor_id, score) schema. Recall >= 0.9
    vs brute is pinned per variant in tests/test_stages.py."""
    ivf = knn_ivf_embeddings(sf_dir)
    cell = knn_points_cell(sf_dir)
    return pa.concat_tables([
        pa.table({"variant": pa.array(["ivf"] * len(ivf)),
                  "probe_id": ivf["probe_id"].cast(pa.int64()),
                  "neighbor_id": ivf["neighbor_id"].cast(pa.int64()),
                  "score": ivf["sim"].cast(pa.float64())}),
        pa.table({"variant": pa.array(["cell"] * len(cell)),
                  "probe_id": cell["probe_id"].cast(pa.int64()),
                  "neighbor_id": cell["neighbor_id"].cast(pa.int64()),
                  "score": cell["d2"].cast(pa.float64())})])


# ======================================================================
# round-1 widening: as-of join, running windows, sampling, group top-k,
# exclude-ring composition, cell indexers
# ======================================================================

@q("asof_join_events", """
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
SELECT p.event_id AS purchase_id, c.event_id AS click_id
FROM purchases p ASOF JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""")
def asof_join_events(sf_dir: str):
    """As-of join (guide: sort within key buckets + merge_asof per
    group): each purchase matched to the user's latest click at or
    before it."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts",
                                  "event_type"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["event_type"] == "purchase"]\
            .sort_values(["ts", "event_id"])
        c = g[g["event_type"] == "click"].sort_values(["ts", "event_id"])
        if p.empty or c.empty:
            return pd.DataFrame({"purchase_id": pd.Series(dtype=np.int64),
                                 "click_id": pd.Series(dtype=np.int64)})
        # ONE vectorized merge_asof for every user in the bucket
        # (by=user_id) — not a per-user group call
        m = pd.merge_asof(p[["ts", "user_id", "event_id"]],
                          c[["ts", "user_id", "event_id"]],
                          on="ts", by="user_id", direction="backward",
                          suffixes=("_p", "_c")).dropna()
        return pd.DataFrame({
            "purchase_id": m["event_id_p"].astype(np.int64),
            "click_id": m["event_id_c"].astype(np.int64)})

    return collect(J.bucketed_group_apply(ev, "user_id", per_bucket))


@q("running_total_orders", """
SELECT o_orderkey,
  CAST(row_number() OVER w AS BIGINT) AS rn,
  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) OVER
       (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_price_c
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""")
def running_total_orders(sf_dir: str):
    """Keyed running window (rank + cumulative sum) via per-key sorted
    group scan — the batch analog of a stream's per-key state."""
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate",
                    "o_totalprice"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized keyed window over the whole bucket: sort by
        # (cust, date, key), then C-speed groupby cumcount/cumsum
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        price_c = np.floor(g["o_totalprice"].to_numpy() * 100)\
            .astype(np.int64)
        grp = g.groupby("o_custkey", sort=False)
        return pd.DataFrame({
            "o_orderkey": g["o_orderkey"].to_numpy(),
            "rn": (grp.cumcount() + 1).to_numpy().astype(np.int64),
            "running_price_c": g.assign(__p=price_c)
            .groupby("o_custkey", sort=False)["__p"].cumsum()
            .to_numpy().astype(np.int64)})

    return collect(J.bucketed_group_apply(orders, "o_custkey",
                                          per_bucket))


@q("sample_lineitem", """
SELECT l_orderkey, l_linenumber FROM lineitem
WHERE ((l_orderkey * 8 + l_linenumber) * 2654435761) % 100 < 10
""")
def sample_lineitem(sf_dir: str):
    """Deterministic hash sampling (seeded sampling the reproducible
    way — NOT random_sample, which cannot be oracle-checked)."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def f(t: pa.Table) -> pa.Table:
        key = t["l_orderkey"].to_numpy(zero_copy_only=False) * 8 \
            + t["l_linenumber"].to_numpy(zero_copy_only=False)
        keep = (key * 2654435761) % 100 < 10
        return t.filter(pa.array(keep))

    return collect(li.map_batches(f, batch_format="pyarrow"))


@q("stratified_sample_orders", """
SELECT o_orderpriority, o_orderkey FROM (
  SELECT o_orderpriority, o_orderkey,
    (o_orderkey * 2654435761) % 4294967296 AS h
  FROM orders) s
QUALIFY row_number() OVER (PARTITION BY o_orderpriority
                           ORDER BY h, o_orderkey) <= 20
""")
def stratified_sample_orders(sf_dir: str):
    """Deterministic stratified sampling: per stratum (order priority)
    keep the 20 hash-smallest keys. The scalable shape: per-batch
    partial top-k per stratum (combiner), then a tiny merge over
    #strata x batches rows — a seeded reservoir analog that is
    reproducible and oracle-checkable, unlike random_sample."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def partial(df: pd.DataFrame) -> pa.Table:
        h = (df["o_orderkey"].to_numpy().astype(np.int64)
             * 2654435761) % 4294967296
        d = pd.DataFrame({"o_orderpriority": df["o_orderpriority"],
                          "o_orderkey": df["o_orderkey"], "h": h})
        d = d.sort_values(["o_orderpriority", "h", "o_orderkey"])
        top = d.groupby("o_orderpriority", sort=False).head(20)
        return pa.Table.from_pandas(top, preserve_index=False) \
            .replace_schema_metadata(None)

    part = orders.map_batches(partial, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "o_orderkey"]).head(20)
        return g[["o_orderpriority", "o_orderkey"]]

    return collect(part.groupby("o_orderpriority").map_groups(
        merge, batch_format="pandas"))  # #strata groups (5): tiny


@q("top2_per_order", """
SELECT l_orderkey, l_linenumber,
       CAST(floor(l_extendedprice * 100) AS BIGINT) AS price_c
FROM lineitem
QUALIFY row_number() OVER (PARTITION BY l_orderkey
                           ORDER BY price_c DESC, l_linenumber) <= 2
""")
def top2_per_order(sf_dir: str):
    """Per-group top-k (rank within key) — groupby + argsort head."""
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_extendedprice"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-key top-k over the bucket: one sort + C-speed
        # groupby head(2) for every order in the bucket
        g = g.assign(price_c=np.floor(
            g["l_extendedprice"].to_numpy() * 100).astype(np.int64))
        g = g.sort_values(["l_orderkey", "price_c", "l_linenumber"],
                          ascending=[True, False, True])
        top = g.groupby("l_orderkey", sort=False).head(2)
        return top[["l_orderkey", "l_linenumber", "price_c"]]

    return collect(J.bucketed_group_apply(li, "l_orderkey", per_bucket))


_HOLE = [(-40.0, -40.0), (40.0, -40.0), (0.0, 20.0)]


@q("pip_with_hole", f"""
WITH {_PTS_CTE}
SELECT id, ({D.sql_convex_pip()}
        AND NOT {D.sql_convex_pip(poly=_HOLE)}) AS inside
FROM pts
""")
def pip_with_hole(sf_dir: str):
    """Include/exclude ring composition (U1/U2,
    src/osm_polygon_compiler.erl:168-180): pentagon minus a triangular
    hole; on-hole-edge points are inside the hole => excluded, which
    the SQL mirrors as NOT(all half-planes >= 0)."""
    idx = PolygonIndex.compile([("include", D.PENTAGON),
                                ("exclude", _HOLE)])
    nodes = OD.derive_nodes(sf_dir)
    return collect(apply_pip(nodes, idx).select_columns(["id", "inside"]))


@q("cell_assign_s2_hex")  # rows-only: S2/hex ids aren't ANSI-expressible
def cell_assign_s2_hex(sf_dir: str):
    """The north-star cell assignment itself: S2 level-12 + hex res
    7-9 ids per point (hierarchy + determinism pinned in
    tests/test_cells.py)."""
    nodes = OD.derive_nodes(sf_dir)
    from ..stages.cells import assign_cells
    return collect(nodes.map_batches(
        lambda t: assign_cells(t), batch_format="pyarrow")
        .select_columns(["id", "s2_12", "hex_7", "hex_8", "hex_9"]))


_PAIR_TRUTH_SQL = rf"""
{_DOCS2_CTE},
toks AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w
         FROM docs2),
sh AS (SELECT DISTINCT doc_id,
         w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
       FROM toks, UNNEST(range(1, length(w) - 1)) AS t(i)),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id),
pairs AS (SELECT a_id, b_id FROM inter
          JOIN sizes sa ON sa.doc_id = a_id
          JOIN sizes sb ON sb.doc_id = b_id
          WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8)
"""


@q("dup_clusters_docs", f"""
WITH RECURSIVE {_PAIR_TRUTH_SQL},
edges AS (SELECT a_id AS u, b_id AS v FROM pairs
          UNION ALL SELECT b_id, a_id FROM pairs),
walk(id, label) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT e.v, w.label FROM walk w JOIN edges e ON e.u = w.id)
SELECT id AS doc_id, min(label) AS cluster_id FROM walk GROUP BY id
""")
def dup_clusters_docs(sf_dir: str):
    """Near-dup clustering: MinHash-LSH pairs -> connected components
    (min-id labels). Oracle: true-Jaccard pairs + recursive min-label
    propagation in SQL."""
    from ..stages.dedup import dup_clusters
    return dup_clusters(_minhash_pairs_cached(sf_dir))


@q("salted_cell_counts_points", f"""
WITH {_PTS_CTE}
SELECT {D.sql_grid_cell()} AS cell, count(*) AS n
FROM pts GROUP BY cell
""")
def salted_cell_counts_points(sf_dir: str):
    """Per-cell row counts THROUGH the hot-cell salting path (histogram
    pre-pass -> salted two-stage aggregate). Result must equal a plain
    GROUP BY — the oracle proves the skew mechanism is lossless. The
    low threshold forces real splitting at test scale."""
    from ..stages.salt import salted_cell_counts
    nodes = OD.derive_nodes(sf_dir)
    tiles = nodes.map_batches(
        lambda t: pa.table({"cell": CellsMod.grid_cell(
            t["lon"].to_numpy(), t["lat"].to_numpy(), D.GRID_DEG)}),
        batch_format="pyarrow")
    return collect(salted_cell_counts(tiles, "cell", hot_threshold=50,
                                      split_factor=8))


@q("window_sliding_events", """
WITH ev2 AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(floor(value * 1000) AS BIGINT) AS vq FROM events),
expd AS (
  SELECT event_type, h AS wstart, vq FROM ev2
  UNION ALL
  SELECT event_type, h - INTERVAL 1 HOUR, vq FROM ev2)
SELECT event_type, strftime(wstart, '%Y-%m-%d %H:00') AS wstart,
  CAST(sum(vq) AS BIGINT) AS sum_v_q, count(*) AS n
FROM expd GROUP BY event_type, wstart
""")
def window_sliding_events(sf_dir: str):
    """Sliding window (2h wide, 1h step): each event lands in two
    windows — vectorized double-emit per batch, then the same
    combiner+groupby as the tumbling path."""
    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        h = df["ts"].dt.floor("h")
        vq = np.floor(df["value"].to_numpy() * 1000).astype(np.int64)
        base = pd.DataFrame({"event_type": df["event_type"],
                             "wstart": h, "vq": vq})
        prev = base.copy()
        prev["wstart"] = prev["wstart"] - pd.Timedelta(hours=1)
        both = pd.concat([base, prev], ignore_index=True)
        both["wstart"] = both["wstart"].dt.strftime("%Y-%m-%d %H:00")
        out = both.groupby(["event_type", "wstart"], as_index=False)\
            .agg(sum_v_q=("vq", "sum"), n=("vq", "size"))
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    partial = ev.map_batches(expand, batch_format="pandas")
    return collect(partial.groupby(["event_type", "wstart"]).aggregate(
        Sum("sum_v_q", alias_name="sum_v_q"), Sum("n", alias_name="n")))


@q("group_concat_ways", """
SELECT user_id AS way_id,
       string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id)
         AS node_csv
FROM events GROUP BY user_id
""")
def group_concat_ways(sf_dir: str):
    """List/group-concat aggregation: collect each way's sorted node
    ids (the columnar regroup half of explode<->regroup), emitted as a
    CSV string so the oracle hash matches exactly."""
    ev = _read(sf_dir, "events", ["user_id", "event_id"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-way concat over the bucket (C-sort + one
        # python join per way, no Ray per-group overhead)
        g = g.sort_values(["user_id", "event_id"])
        out = g.groupby("user_id", sort=False)["event_id"]\
            .agg(lambda x: ",".join(str(int(v)) for v in x))
        return pd.DataFrame({
            "way_id": out.index.to_numpy().astype(np.int64),
            "node_csv": out.to_numpy()})

    return collect(J.bucketed_group_apply(ev, "user_id", per_bucket))


@q("median_quantity", """
SELECT l_returnflag,
  percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS median_qty
FROM lineitem GROUP BY l_returnflag
""")
def median_quantity(sf_dir: str):
    """Grouped exact median (percentile_disc semantics: the lower
    element at even counts — lexsorted element pick, no midpoint
    interpolation, so floats hash-match)."""
    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    # exact median via VALUE HISTOGRAM: l_quantity has a bounded value
    # domain, so per-batch (flag, value, count) partials + one Sum
    # aggregate move only the histogram through the shuffle, and the
    # percentile walk runs on the tiny (flags x values) result — no
    # group ever holds a corpus-fraction of rows (a per-flag
    # map_groups would put 1/3 of lineitem in one task at scale).
    def hist(t: pa.Table) -> pa.Table:
        return t.group_by(["l_returnflag", "l_quantity"])\
            .aggregate([("l_quantity", "count")])\
            .rename_columns(["l_returnflag", "l_quantity", "n"])

    from ray.data.aggregate import Sum as _Sum
    counts = collect(
        li.map_batches(hist, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_quantity"])
        .aggregate(_Sum("n", alias_name="n"))).to_pandas()
    out_f, out_m = [], []
    for flag, g in counts.groupby("l_returnflag"):
        g = g.sort_values("l_quantity")
        cum = g["n"].cumsum().to_numpy()
        target = (int(cum[-1]) - 1) // 2 + 1  # lower element
        idx = int(np.searchsorted(cum, target))
        out_f.append(flag)
        out_m.append(float(g["l_quantity"].to_numpy()[idx]))
    order = np.argsort(np.asarray(out_f))
    return pa.table({
        "l_returnflag": pa.array([out_f[i] for i in order]),
        "median_qty": pa.array([out_m[i] for i in order])})


def hll_distinct_parts(sf_dir: str):
    """Mergeable-sketch aggregation: one HLL per batch, merged on the
    driver — the guide's sketch pattern. Approximate by design, so it
    carries no oracle and no gate slot; the error bound is pinned by
    tests/test_stages.py::test_hll_error_bound against the exact
    distinct count (gate rotation note in COVERAGE.md)."""
    from ..functions.hll import HyperLogLog
    li = _read(sf_dir, "lineitem", ["l_partkey"])

    def sketch(t: pa.Table) -> pa.Table:
        h = HyperLogLog(p=12).add_int64(
            t["l_partkey"].to_numpy(zero_copy_only=False))
        return pa.table({"registers": pa.array(
            [h.registers.tobytes()], pa.binary())})

    merged = None
    from ..functions.hll import HyperLogLog as H
    for b in li.map_batches(sketch, batch_format="pyarrow")\
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        for blob in b["registers"].to_pylist():
            s = H(p=12)
            s.registers = np.frombuffer(blob, np.uint8).copy()
            merged = s if merged is None else merged.merge(s)
    est = merged.estimate() if merged else 0.0
    return pa.table({"approx_distinct_parts": pa.array([est])})


@q("media_features")  # multimodal stub codecs -> rows-only
def media_features(sf_dir: str):
    """Video frame-sampling AND audio feature plumbing in one gate
    entry: binary media columns -> actor-pool decode stages (stride
    frame sampling / RMS+ZCR+duration), unioned on a
    (media_id, kind, feat_a, feat_b) schema. Small batch_size for wide
    binary rows (guide: large payloads need small batches)."""
    from ..sources.media import (AudioFeatureStage, VideoFrameSampleStage,
                                 media_batch_from_keys)
    ev = _read(sf_dir, "events", ["event_id"]).limit(2000)
    vids = ev.map_batches(
        lambda t: media_batch_from_keys(
            t["event_id"].to_numpy(zero_copy_only=False), "video"),
        batch_format="pyarrow", batch_size=256)
    vtab = collect(vids.map_batches(
        VideoFrameSampleStage, fn_constructor_kwargs={"stride": 2},
        batch_format="pyarrow", batch_size=256,
        concurrency=default_pool_size()))
    auds = ev.map_batches(
        lambda t: media_batch_from_keys(
            t["event_id"].to_numpy(zero_copy_only=False), "audio"),
        batch_format="pyarrow", batch_size=256)
    atab = collect(auds.map_batches(
        AudioFeatureStage, batch_format="pyarrow", batch_size=256,
        concurrency=default_pool_size()))
    return pa.concat_tables([
        pa.table({"media_id": vtab["video_id"],
                  "kind": pa.array(["video"] * len(vtab)),
                  "feat_a": vtab["frames_kept"].cast(pa.float64()),
                  "feat_b": vtab["mean_px"].cast(pa.float64())}),
        pa.table({"media_id": atab["audio_id"],
                  "kind": pa.array(["audio"] * len(atab)),
                  "feat_a": atab["rms"].cast(pa.float64()),
                  "feat_b": atab["zcr"].cast(pa.float64())})])


@q("range_join_parts", """
SELECT l.l_orderkey, l.l_linenumber,
  (SELECT count(*) FROM part p
   WHERE p.p_size >= l.l_quantity - 2 AND p.p_size <= l.l_quantity + 2)
    AS n_parts_in_range
FROM lineitem l
""")
def range_join_parts(sf_dir: str):
    """Range join (guide: interval matching): per lineitem, count parts
    whose p_size falls in [qty-2, qty+2] — broadcast the small sorted
    side, vectorized searchsorted interval count per batch (no
    shuffle; at large-large scale, bucket by interval grid instead)."""
    parts = collect(_read(sf_dir, "part", ["p_size"]))
    sizes = np.sort(parts["p_size"].to_numpy().astype(np.float64))
    ref = ray.put(sizes)

    class Stage:
        def __init__(self):
            self.sizes = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            qv = t["l_quantity"].to_numpy(zero_copy_only=False)
            lo = np.searchsorted(self.sizes, qv - 2.0, side="left")
            hi = np.searchsorted(self.sizes, qv + 2.0, side="right")
            return pa.table({
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": t["l_linenumber"],
                "n_parts_in_range": pa.array((hi - lo).astype(np.int64))})

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_quantity"])
    return collect(li.map_batches(Stage, batch_format="pyarrow",
                                  concurrency=default_pool_size()))


def _point_polygon_tag_sql() -> str:
    cases = []
    for p in range(3):
        pred = D.sql_convex_pip(poly=_shifted_pentagon(p))
        cases.append(f"SELECT id, {p} AS poly_id FROM pts WHERE {pred}")
    return f"WITH {_PTS_CTE}\n" + " UNION ALL ".join(cases)


@q("point_polygon_tag", _point_polygon_tag_sql())
def point_polygon_tag(sf_dir: str):
    """Row-level vector join: tag each point with every polygon that
    contains it (multi-polygon PIP in one actor pass — the point-side
    sibling of the tile-level raster_vector_join)."""
    nodes = OD.derive_nodes(sf_dir)
    polys = [PolygonIndex.compile([("include", _shifted_pentagon(p))])
             for p in range(3)]
    ref = ray.put(polys)

    class Tag:
        def __init__(self):
            self.polys = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t["id"].to_numpy(zero_copy_only=False)
            lon = t["lon"].to_numpy(zero_copy_only=False)
            lat = t["lat"].to_numpy(zero_copy_only=False)
            out_i, out_p = [], []
            for p, idx in enumerate(self.polys):
                hit = idx.contains(lon, lat)
                out_i.append(ids[hit])
                out_p.append(np.full(int(hit.sum()), p, np.int32))
            return pa.table({"id": np.concatenate(out_i),
                             "poly_id": np.concatenate(out_p)})

    return collect(nodes.map_batches(Tag, batch_format="pyarrow",
                                     concurrency=default_pool_size()))


# ----------------------------------------------------------------------
# Gate ordering: the driver checks the first 50 suite entries each
# round. The suite is trimmed to EXACTLY 50 (46 oracled + 4 rows-only:
# image_decode_meta, knn_approx, cell_assign_s2_hex, media_features) so
# nothing rotates out, and oracled entries are ordered first so every
# SQL-checked query stays in the gate even if the suite grows (round-2
# verdict item #6; rotation notes in COVERAGE.md).
_ordered = {n: QUERIES[n] for n in QUERIES if n in ORACLES}
_ordered.update({n: QUERIES[n] for n in QUERIES if n not in ORACLES})
QUERIES.clear()
QUERIES.update(_ordered)
del _ordered

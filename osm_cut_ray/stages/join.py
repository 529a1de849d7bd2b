"""Join / explode / distinct building blocks (reference J1-J5 patterns).

The reference holds a single-process membership set and checks ids
against it (src/osm_set.erl:29-63); at Ray scale that state becomes
either a broadcast id array (`ray.put` once + `pc.is_in` per batch —
small side) or an explicit hash-shuffle semi-join (`groupby(key)` over
a tagged union — both sides large). The explode/regroup pair turns
list columns (way node lists, relation member lists) into shuffleable
pair tables and back, the columnar analog of the reference's per-way
`lists:partition` (src/osm_process_complete.erl:86-100).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

# Above this many distinct keys the broadcast path is refused and the
# shuffle path used instead (keys no longer fit comfortably per-actor).
BROADCAST_MAX_KEYS = 20_000_000


# --------------------------------------------------------------- explode

def explode_batch(t: pa.Table, id_cols: list[str], list_col: str,
                  value_col: str = "value",
                  pos_col: str | None = None) -> pa.Table:
    """Vectorized unnest of a list column: one output row per element.

    Pure Arrow/numpy — no Python row loop. Null/empty lists produce no
    rows (matching the reference, which simply iterates the list).
    """
    col = t[list_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lengths = pc.fill_null(pc.list_value_length(col), 0)\
        .to_numpy(zero_copy_only=False).astype(np.int64)
    values = pc.list_flatten(col)
    parent = np.repeat(np.arange(len(t), dtype=np.int64), lengths)
    cols = {c: t[c].take(pa.array(parent)) for c in id_cols}
    cols[value_col] = values
    if pos_col is not None:
        starts = np.zeros(len(t), dtype=np.int64)
        np.cumsum(lengths[:-1], out=starts[1:])
        cols[pos_col] = pa.array(
            np.arange(int(lengths.sum()), dtype=np.int64)
            - np.repeat(starts, lengths))
    return pa.table(cols)


def explode(ds, id_cols: list[str], list_col: str, value_col: str = "value",
            pos_col: str | None = None):
    return ds.map_batches(
        lambda t: explode_batch(t, id_cols, list_col, value_col, pos_col),
        batch_format="pyarrow")


# --------------------------------------------------------------- distinct

def distinct(ds, cols: list[str], num_buckets: int | None = None):
    """Exact distinct = pre-dedup per batch, then ONE hash-bucket
    shuffle with an exact Arrow dedup per bucket.

    The per-batch combiner shrinks the shuffle input (A2:
    src/osm_process_complete.erl:218-227 dedups refs in a gb_set
    before the replay join). The global step routes rows by a 64-bit
    content hash of the key columns (`diff.row_content_hashes` —
    routing only, collisions are harmless: equal rows always share a
    bucket) and drops duplicates per bucket with Arrow group_by at C
    speed. Sorting ~4x-cores bucket ids instead of every distinct
    key measured 54x faster than the former groupby(key).aggregate
    (Count) engine at 4M rows / 156k keys (round 5)."""
    if num_buckets is None:
        num_buckets = default_bucket_count()
    from .diff import row_content_hashes

    def tag(t: pa.Table) -> pa.Table:
        t = t.group_by(cols).aggregate([])  # map-side combiner
        h = row_content_hashes(t, cols).view(np.uint64)
        b = ((h * np.uint64(0x9E3779B97F4A7C15))
             % np.uint64(num_buckets)).view(np.int64)
        return t.append_column("__bucket", pa.array(b))

    def per_bucket(t: pa.Table) -> pa.Table:
        return t.drop_columns(["__bucket"]).group_by(cols)\
            .aggregate([])

    return ds.select_columns(cols)\
        .map_batches(tag, batch_format="pyarrow")\
        .groupby("__bucket")\
        .map_groups(per_bucket, batch_format="pyarrow")


# ----------------------------------------------------- broadcast id joins

def collect_key_array(ds, col: str) -> np.ndarray:
    """Driver-side distinct key collection for the broadcast path.

    Only for sets known to be broadcastable (<= BROADCAST_MAX_KEYS);
    raises otherwise so a pipeline can't silently materialize a huge
    side on the driver.
    """
    parts = [t[col].to_numpy(zero_copy_only=False)
             for t in ds.select_columns([col]).map_batches(
                 lambda t: t.group_by([col]).aggregate([]),
                 batch_format="pyarrow").iter_batches(
                     batch_size=None, batch_format="pyarrow")]
    keys = np.unique(np.concatenate(parts)) if parts else np.array([], np.int64)
    if len(keys) > BROADCAST_MAX_KEYS:
        raise ValueError(
            f"{len(keys)} keys exceed broadcast limit; use shuffle join")
    return keys


class _IsInStage:
    """Actor: holds the broadcast key set, appends/filters via pc.is_in."""

    def __init__(self, keys_ref, col: str, mode: str, out_col: str):
        keys = ray.get(keys_ref) if isinstance(keys_ref, ray.ObjectRef) \
            else keys_ref
        self.keys = pa.array(keys)
        self.col = col
        self.mode = mode
        self.out_col = out_col

    def __call__(self, t: pa.Table) -> pa.Table:
        hit = pc.is_in(t[self.col], value_set=self.keys)
        hit = pc.fill_null(hit, False)
        if self.mode == "semi":
            return t.filter(hit)
        if self.mode == "anti":
            return t.filter(pc.invert(hit))
        return t.append_column(self.out_col, hit)  # mode == "flag"


# per-worker-process memo: rehydrating a broadcast numpy key array is
# a zero-copy plasma view, so task-mode map_batches + this cache beats
# an actor pool's multi-second cold start (one pool per call site!)
_ISIN_CACHE: dict = {}


def broadcast_is_in(ds, col: str, keys: np.ndarray, mode: str = "semi",
                    out_col: str = "hit", concurrency=None,
                    use_actors: bool = False):
    """Semi/anti join or membership flag against a broadcast key set.

    Task-mode by default (state hydration is O(1) zero-copy);
    `use_actors=True` restores the actor pool for callers that want
    pinned state."""
    ref = ray.put(np.asarray(keys))
    if use_actors:
        if concurrency is None:
            from .pip import default_pool_size
            concurrency = default_pool_size()
        return ds.map_batches(
            _IsInStage,
            fn_constructor_kwargs={"keys_ref": ref, "col": col,
                                   "mode": mode, "out_col": out_col},
            batch_format="pyarrow", concurrency=concurrency)

    def fn(t: pa.Table) -> pa.Table:
        key = (ref.hex(), col, mode, out_col)
        stage = _ISIN_CACHE.get(key)
        if stage is None:
            stage = _ISIN_CACHE[key] = _IsInStage(ref, col, mode, out_col)
        return stage(t)

    return ds.map_batches(fn, batch_format="pyarrow")


# ------------------------------------------------------- shuffle joins

def _align_for_union(left, right_keys, key: str):
    """Project both sides to a common (key, __side) schema."""
    lk = left.select_columns([key]).map_batches(
        lambda t: t.append_column("__side", pa.array(np.zeros(len(t), np.int8))),
        batch_format="pyarrow")
    rk = right_keys.select_columns([key]).map_batches(
        lambda t: t.append_column("__side", pa.array(np.ones(len(t), np.int8))),
        batch_format="pyarrow")
    return lk, rk


def shuffle_semi_join_keys(left, right_keys, key: str,
                           num_buckets: int | None = None):
    """Distinct left keys that also appear in right_keys — a pure
    hash-shuffle semi-join on the key column (both sides large).

    Returns a Dataset with the single `key` column. The caller then
    flags/filters the (wide) left rows against this much smaller key
    set, so wide payloads never transit the shuffle (SURVEY §7.4:
    "image bytes must never transit the J1-J5 shuffles").

    Granularity: per BUCKET (`bucketed_group_apply`), never per key —
    Ray's per-group overhead is paid ~4x cores times total, and each
    bucket's membership test is one vectorized `np.isin`. int64 keys
    (the repo-wide bucketed-join contract).
    """
    lk, rk = _align_for_union(left, right_keys, key)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        side = g["__side"].to_numpy()
        vals = g[key].to_numpy()
        out = np.unique(vals[(side == 0)
                             & np.isin(vals, vals[side == 1])])
        return pd.DataFrame({key: out})

    return bucketed_group_apply(lk.union(rk), key, pick,
                                num_buckets=num_buckets)


def shuffle_inner_join(left, right, key: str, num_partitions: int | None = None):
    """General hash equi-join: tagged union -> ONE bucket shuffle ->
    pandas merge per BUCKET (all keys of a bucket joined in one C-speed
    `DataFrame.merge`, never a per-key group task). Portable across Ray
    versions; used when both sides are too large to broadcast. Prefer
    joining slim projections. int64 keys (the repo-wide bucketed-join
    contract); `num_partitions` maps to the bucket count.
    """
    lschema: pa.Schema = left.schema().base_schema
    rschema: pa.Schema = right.schema().base_schema
    lcols = list(lschema.names)
    rcols = list(rschema.names)
    shared = [c for c in rcols if c in lcols and c != key]
    if shared:
        raise ValueError(f"rename overlapping columns first: {shared}")

    # Ray's union does NOT unify differing schemas — pad each side with
    # typed null columns so every block carries the full column set.
    pad_for_left = [(c, rschema.field(c).type) for c in rcols if c != key]
    pad_for_right = [(c, lschema.field(c).type) for c in lcols if c != key]

    def tag(side, pad):
        def f(t: pa.Table) -> pa.Table:
            for c, typ in pad:
                t = t.append_column(c, pa.nulls(len(t), typ))
            return t.select([key] + [c for c in lcols + rcols if c != key])\
                .append_column("__side",
                               pa.array(np.full(len(t), side, np.int8)))
        return f

    lt = left.map_batches(tag(0, pad_for_left), batch_format="pyarrow")
    rt = right.map_batches(tag(1, pad_for_right), batch_format="pyarrow")

    out_cols = lcols + [c for c in rcols if c != key]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == 0]
        rg = g[g["__side"] == 1]
        if lg.empty or rg.empty:
            return pd.DataFrame({c: pd.Series(dtype=g[c].dtype)
                                 for c in out_cols})
        return lg[lcols].merge(rg[[key] + [c for c in rcols if c != key]],
                               on=key)

    return bucketed_group_apply(lt.union(rt), key, merge,
                                num_buckets=num_partitions)


# ---------------------------------------------- Arrow-native bucket joins

def _hash_bucket(arr: np.ndarray, num_buckets: int) -> np.ndarray:
    return ((np.asarray(arr, np.int64) * np.int64(2654435761))
            % np.int64(num_buckets)).astype(np.int64)


def _pad_array(n: int, typ: pa.DataType) -> pa.Array:
    """Placeholder column for the non-payload side of a bucketed join.

    Fixed-width types pad with ZEROS, string/binary with empties —
    never nulls: Ray's groupby shuffle moves blocks through pandas,
    where an int64 column containing any null is promoted to float64,
    silently corrupting full-range 64-bit values (> 2^53) in the
    PAYLOAD rows of the same block. Nested types (list/map/struct)
    keep nulls — pandas holds them as objects, no promotion. Pad
    values are never read: the join drops or replaces them.
    """
    if pa.types.is_integer(typ) or pa.types.is_floating(typ) \
            or pa.types.is_boolean(typ):
        return pa.nulls(n, typ).fill_null(0)
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return pa.nulls(n, typ).fill_null("")
    if pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
        return pa.nulls(n, typ).fill_null(b"")
    return pa.nulls(n, typ)


def bucketed_semi_join(payload, key: str, keys_ds, keys_col: str,
                       num_buckets: int = 64, mode: str = "semi"):
    """payload ⋉ keys (mode="semi") or ▷ keys (mode="anti") as a
    pure-Arrow hash-bucket join.

    Unlike Acero-backed `Dataset.join`, this supports ANY payload
    column types (list/map/struct survive untouched): both sides get a
    `__bucket = hash(key) % B` column, the keys side is padded to the
    payload schema with typed nulls, and each bucket group filters its
    payload rows with `pc.is_in` against its key rows. One sort-shuffle
    on the bucket column; payload bytes move once.
    """
    if mode not in ("semi", "anti"):
        raise ValueError(f"mode must be semi|anti, got {mode!r}")
    schema: pa.Schema = payload.schema().base_schema

    def tag_payload(t: pa.Table) -> pa.Table:
        b = _hash_bucket(t[key].to_numpy(zero_copy_only=False), num_buckets)
        return t.append_column("__bucket", pa.array(b))\
            .append_column("__side", pa.array(np.zeros(len(t), np.int8)))

    def tag_keys(t: pa.Table) -> pa.Table:
        karr = pc.cast(t[keys_col], schema.field(key).type)
        cols = {}
        for f in schema:
            cols[f.name] = karr if f.name == key \
                else _pad_array(len(t), f.type)
        out = pa.table(cols)
        b = _hash_bucket(np.asarray(karr.to_numpy(zero_copy_only=False)),
                         num_buckets)
        return out.append_column("__bucket", pa.array(b))\
            .append_column("__side", pa.array(np.ones(len(t), np.int8)))

    lp = payload.map_batches(tag_payload, batch_format="pyarrow")
    rk = keys_ds.map_batches(tag_keys, batch_format="pyarrow")

    def per_bucket(t: pa.Table) -> pa.Table:
        side = t["__side"]
        keys_in = t.filter(pc.equal(side, 1))[key]
        left = t.filter(pc.equal(side, 0))
        hit = pc.fill_null(pc.is_in(left[key], value_set=keys_in), False)
        if mode == "anti":
            hit = pc.invert(hit)
        return left.filter(hit).drop_columns(["__bucket", "__side"])

    return lp.union(rk).groupby("__bucket").map_groups(
        per_bucket, batch_format="pyarrow")


def bucketed_attach_column(payload, key: str, attach_ds, attach_key: str,
                           attach_col: str, num_buckets: int = 64):
    """Inner-join a single column onto payload by key, Arrow-native.

    attach_ds must have exactly one row per key (e.g. a regrouped list
    column). Payload rows without a match are dropped (inner).
    """
    schema: pa.Schema = payload.schema().base_schema
    attach_type = attach_ds.schema().base_schema.field(attach_col).type

    def tag_payload(t: pa.Table) -> pa.Table:
        b = _hash_bucket(t[key].to_numpy(zero_copy_only=False), num_buckets)
        return t.append_column(attach_col,
                               _pad_array(len(t), attach_type))\
            .append_column("__bucket", pa.array(b))\
            .append_column("__side", pa.array(np.zeros(len(t), np.int8)))

    def tag_attach(t: pa.Table) -> pa.Table:
        karr = pc.cast(t[attach_key], schema.field(key).type)
        cols = {}
        for f in schema:
            cols[f.name] = karr if f.name == key \
                else _pad_array(len(t), f.type)
        cols[attach_col] = t[attach_col]
        out = pa.table(cols)
        b = _hash_bucket(np.asarray(karr.to_numpy(zero_copy_only=False)),
                         num_buckets)
        return out.append_column("__bucket", pa.array(b))\
            .append_column("__side", pa.array(np.ones(len(t), np.int8)))

    def per_bucket(t: pa.Table) -> pa.Table:
        side = t["__side"]
        left = t.filter(pc.equal(side, 0))
        right = t.filter(pc.equal(side, 1))
        lk = left[key].to_numpy(zero_copy_only=False)
        rk = right[key].to_numpy(zero_copy_only=False)
        if len(right) == 0 or len(left) == 0:
            return left.drop_columns(["__bucket", "__side"]).slice(0, 0)
        order = np.argsort(rk, kind="stable")
        pos_in_sorted = np.searchsorted(rk[order], lk)
        pos_in_sorted = np.clip(pos_in_sorted, 0, len(rk) - 1)
        matched = rk[order][pos_in_sorted] == lk
        left = left.filter(pa.array(matched))
        take_idx = order[pos_in_sorted[matched]]
        new_col = right[attach_col].take(pa.array(take_idx))
        i = left.schema.get_field_index(attach_col)
        return left.set_column(i, attach_col, new_col)\
            .drop_columns(["__bucket", "__side"])

    lp = payload.map_batches(tag_payload, batch_format="pyarrow")
    rk = attach_ds.map_batches(tag_attach, batch_format="pyarrow")
    return lp.union(rk).groupby("__bucket").map_groups(
        per_bucket, batch_format="pyarrow")


# ------------------------------------------------------------ bloom filter

class BloomFilter:
    """Vectorized numpy Bloom filter over int64 keys.

    The guide's scale pattern for semi joins when even the key ARRAY is
    too big to broadcast comfortably: ship the filter (bits_per_key ~12
    => ~1.5 bytes/key, ~10x smaller than int64 keys), pre-filter
    batches (no false negatives), and run the exact membership check
    only on the surviving minority.
    """

    _MULS = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                      0x165667B19E3779F9, 0x27D4EB2F165667C5],
                     dtype=np.uint64)

    def __init__(self, keys: np.ndarray, bits_per_key: int = 12,
                 n_hashes: int = 4):
        keys = np.asarray(keys, np.int64).view(np.uint64)
        m = 1
        while m < max(64, len(keys) * bits_per_key):
            m <<= 1
        self.m = np.uint64(m)
        self.n_hashes = n_hashes
        self.words = np.zeros(m // 64, dtype=np.uint64)
        for i in range(n_hashes):
            idx = ((keys * self._MULS[i]) >> np.uint64(17)) % self.m
            np.bitwise_or.at(self.words, (idx >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (idx & np.uint64(63)))

    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, np.int64).view(np.uint64)
        out = np.ones(len(keys), dtype=bool)
        for i in range(self.n_hashes):
            idx = ((keys * self._MULS[i]) >> np.uint64(17)) % self.m
            word = self.words[(idx >> np.uint64(6)).astype(np.int64)]
            out &= ((word >> (idx & np.uint64(63))) & np.uint64(1)) == 1
        return out


def broadcast_bloom_semi_join(ds, col: str, keys: np.ndarray,
                              concurrency=None):
    """Two-stage broadcast semi-join: Bloom pre-filter (tiny broadcast)
    then exact `pc.is_in` on the survivors. Result identical to
    `broadcast_is_in(mode="semi")`; the exact key array only has to be
    consulted for the Bloom-positive minority."""
    if concurrency is None:
        from .pip import default_pool_size
        concurrency = default_pool_size()
    bloom_ref = ray.put(BloomFilter(keys))
    keys_ref = ray.put(np.asarray(keys))

    class Stage:
        def __init__(self):
            self.bloom: BloomFilter = ray.get(bloom_ref)
            self.keys = pa.array(ray.get(keys_ref))

        def __call__(self, t: pa.Table) -> pa.Table:
            maybe = self.bloom.might_contain(
                t[col].to_numpy(zero_copy_only=False))
            cand = t.filter(pa.array(maybe))
            hit = pc.fill_null(
                pc.is_in(cand[col], value_set=self.keys), False)
            return cand.filter(hit)

    return ds.map_batches(Stage, batch_format="pyarrow",
                          concurrency=concurrency)


def solidify(ds, max_parts: int = 32, rows_per_block: int = 5000):
    """Materialize + count + repartition so every output block is
    NON-EMPTY and typed. Two Ray sharp edges this sidesteps (both
    measured): group-less aggregate partitions emit schema-less empty
    blocks that UDFs skip and Acero joins reject; and `repartition(k)`
    with k > row count creates schema-less empty splits with the same
    effect. Returns (dataset, row_count); row_count 0 means the caller
    should short-circuit (a 0-row dataset cannot be made typed here).
    """
    ds = ds.materialize()
    n = ds.count()
    if n == 0:
        return ds, 0
    parts = max(1, min(max_parts, n // rows_per_block + 1))
    # repartition stays LAZY: the consumer's plan executes it; a
    # second materialize here would double the barrier cost
    return ds.repartition(parts), n


# ------------------------------------------------- bucketed group apply

def cluster_parts(mult: int = 1, floor: int = 8, cap: int = 256) -> int:
    """Partition count tracking cluster width (mult x cores, clamped):
    the knob for repartition/join widths that must scale with the
    cluster instead of a hardcoded literal. Callers whose data can be
    tiny should pass the result through `solidify(max_parts=...)` so
    the count is also clamped by measured rows (k > rows would create
    schema-less empty splits, the Acero-join poison)."""
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return int(min(cap, max(floor, mult * ncpu)))


def default_bucket_count() -> int:
    """Bucket count for bucketed group/join patterns: ~4 buckets per
    cluster core (floor 64) so each bucket's rows fit one group task's
    heap even as the cluster — and the corpus — scales."""
    ncpu = int(ray.cluster_resources().get("CPU", 16))
    return max(64, 4 * ncpu)


def bucketed_group_apply(ds, key_col: str, fn,
                         num_buckets: int | None = None,
                         max_key_rows: int | None = None):
    """Per-key transforms at the right granularity: hash-partition the
    int64 key into `num_buckets` buckets (default: cluster-adaptive,
    ~4x cores), ONE sort shuffle on the bucket key, then
    `fn(bucket_df)` — which must handle ALL keys in its bucket
    vectorized (sort + pandas groupby inside, C speed).

    This replaces `groupby(key).map_groups(per_key_fn)` for hot paths:
    Ray's per-group overhead (~1ms) is paid per BUCKET instead of per
    key (unbounded at corpus scale). Correct whenever fn commutes
    with key-partitioning — true for any per-key transform, since a
    key's rows all land in one bucket.

    `max_key_rows` surfaces corpus-scale keys (the repo cap contract:
    RAISE, never silently straggle): a single key exceeding it in one
    bucket task aborts with advice to split the key (e.g. the traj
    ops' `window=`) or raise the cap.
    """
    if num_buckets is None:
        num_buckets = default_bucket_count()
    def tag(t: pa.Table) -> pa.Table:
        b = ((t[key_col].to_numpy(zero_copy_only=False)
              .astype(np.int64).view(np.uint64))
             * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets)
        return t.append_column("__bucket", pa.array(b.view(np.int64)))

    def apply(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__bucket"])
        if max_key_rows is not None and len(g) > max_key_rows:
            vc = g[key_col].value_counts()
            if int(vc.iloc[0]) > max_key_rows:
                raise ValueError(
                    f"key {vc.index[0]} holds {int(vc.iloc[0])} rows "
                    f"in one bucket task (> max_key_rows="
                    f"{max_key_rows}); split the key (e.g. the traj "
                    "ops' window=) or raise the cap")
        return fn(g)

    return ds.map_batches(tag, batch_format="pyarrow")\
        .groupby("__bucket").map_groups(apply, batch_format="pandas")

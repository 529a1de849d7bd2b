"""k-center greedy coreset selection (Gonzalez 1985 farthest-point
traversal; the diversity-selection baseline of Sener & Savarese 2018
"Active Learning for CNNs: A Core-Set Approach") over an embedding
column — select k rows that 2-approximate the optimal k-center cover,
the standard "diverse subset" pass of training-data curation.

Execution shape (designed for 10^9-row corpora):
- the per-row state is ONE float64 column `min_d` (squared L2 to the
  nearest chosen center) that lives in the Dataset — never a driver
  vector;
- each round broadcasts ONLY the newest center vector (`ray.put`,
  d floats) and runs one map_batches that folds it into `min_d`,
  plus one slim per-block (max min_d, argmax id) partial projection
  — the driver reduces #blocks rows, picks the global farthest point
  (ties -> smallest id: deterministic and partition-invariant, since
  per-row distances are computed independently of partitioning);
- k driver-bounded rounds, each materialized (k is small — a coreset
  budget — and `max_k` RAISES past the cap).

Distances use the literal ((x - c)^2).sum() float64 expression — the
brute test replays the SAME expression, so selected ids AND radii are
bit-identical, not merely close.

Returns the selection order with the coverage radius sequence
(max-min squared distance when each center was chosen), which is
non-increasing — the pinned Gonzalez invariant.

Reference scope note: the reference engine has no selection ops; this
joins dsir/select_budget/mixture as the geometry-aware selection
member of the family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def _vec_mat(t: pa.Table, vec_col: str) -> np.ndarray:
    col = t[vec_col].combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0)
    flat = col.flatten().to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    offs = col.offsets.to_numpy(zero_copy_only=False)
    d = int(offs[1] - offs[0]) if len(offs) > 1 else 0
    return flat.reshape(len(t), d) if d else flat.reshape(len(t), 0)


def k_center_greedy(ds, *, id_col: str = "vec_id",
                    vec_col: str = "embedding", k: int,
                    seed_id: int | None = None,
                    max_k: int = 4096):
    """-> (selected Dataset (rank, id, radius), final_state Dataset
    (id, min_d)). `radius` is the global max-min squared L2 at the
    moment each center was picked (radius[0] = inf encoded as NaN for
    the seed). Stops early at n rows if k > n."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if k > max_k:
        raise RuntimeError(
            f"k={k} exceeds max_k={max_k}; the driver holds k center "
            "vectors and runs k rounds — raise the cap only with a "
            "matching budget")
    import ray.data as rd

    state = ds.map_batches(
        lambda t: pa.table({
            "id": pa.compute.cast(t[id_col], pa.int64()),
            "vec": t[vec_col],
            "min_d": pa.array(
                np.full(len(t), np.inf, np.float64))})
        if len(t) and id_col in t.column_names
        else pa.table({
            "id": pa.array([], pa.int64()),
            "vec": pa.array([], pa.list_(pa.float32())),
            "min_d": pa.array([], pa.float64())}),
        batch_format="pyarrow").materialize()
    n = state.count()
    if n == 0:
        empty = pa.table({"rank": pa.array([], pa.int64()),
                          "id": pa.array([], pa.int64()),
                          "radius": pa.array([], pa.float64())})
        return rd.from_arrow(empty), state

    # seed: smallest id unless given
    if seed_id is None:
        parts = state.map_batches(
            lambda t: pa.table({"m": pa.array(
                [int(pa.compute.min(t["id"]).as_py())]
                if len(t) else [], pa.int64())}),
            batch_format="pyarrow")
        ids = [r["m"] for r in parts.take_all()]
        seed_id = int(min(ids))
    chosen = [(0, int(seed_id), float("nan"))]

    def center_vec(cid: int) -> np.ndarray:
        rows = state.filter(expr=f"id == {cid}").take_all()
        if not rows:
            raise ValueError(f"seed_id {cid} not present")
        return np.asarray(rows[0]["vec"], np.float64)

    cvec = center_vec(int(seed_id))

    for rank in range(1, min(k, n)):
        cref = ray.put(cvec)

        def upd(t: pa.Table, _c=cref) -> pa.Table:
            if len(t) == 0 or "id" not in t.column_names:
                return t
            c = ray.get(_c)
            x = _vec_mat(t, "vec")
            d = ((x - c[None, :]) ** 2).sum(axis=1)
            md = np.minimum(
                t["min_d"].to_numpy(zero_copy_only=False), d)
            return pa.table({"id": t["id"], "vec": t["vec"],
                             "min_d": pa.array(md)})

        state = state.map_batches(upd,
                                  batch_format="pyarrow") \
            .materialize()

        def block_max(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "id" not in t.column_names:
                return pa.table({
                    "d": pa.array([], pa.float64()),
                    "id": pa.array([], pa.int64()),
                    "vec": pa.array([], t.schema.field("vec").type
                                    if "vec" in t.column_names
                                    else pa.list_(pa.float32()))})
            md = t["min_d"].to_numpy(zero_copy_only=False)
            ids = t["id"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            best = int(np.lexsort((ids, -md))[0])
            # rebuild the single winning row (an Arrow slice keeps
            # a view of the whole buffer through serialization)
            one = t["vec"].slice(best, 1).to_pylist()[0]
            vec_t = t.schema.field("vec").type
            return pa.table({
                "d": pa.array([float(md[best])]),
                "id": pa.array([int(ids[best])]),
                "vec": pa.array([one], vec_t)})

        parts = state.map_batches(
            block_max, batch_format="pyarrow").take_all()
        best = max(parts, key=lambda p: (p["d"], -p["id"]))
        best_d, best_id = float(best["d"]), int(best["id"])
        if best_d <= 0.0:
            break  # every remaining point duplicates a center
        chosen.append((rank, best_id, best_d))
        cvec = np.asarray(best["vec"], np.float64)

    sel = pa.table({
        "rank": pa.array([c[0] for c in chosen], pa.int64()),
        "id": pa.array([c[1] for c in chosen], pa.int64()),
        "radius": pa.array([c[2] for c in chosen], pa.float64())})
    final = state.map_batches(
        lambda t: pa.table({"id": t["id"], "min_d": t["min_d"]})
        if len(t) and "id" in t.column_names
        else pa.table({"id": pa.array([], pa.int64()),
                       "min_d": pa.array([], pa.float64())}),
        batch_format="pyarrow")
    return rd.from_arrow(sel), final

"""Distributed grid DBSCAN over point tables (planar degrees).

The eps/sqrt(2) grid trick (published exact-Euclidean-DBSCAN line of
work, e.g. Gan & Tao's grid formulation): with cell size c =
eps/sqrt(2), every two points in one cell are within eps, so
  - all core points of a cell belong to one cluster, represented by
    the cell's MIN core id;
  - cluster merging reduces to edges between CELLS (any core-core
    pair within eps across two cells merges their reps), so the
    union-find runs over non-empty core cells, not points.

Ray-Data shape:
  1. flag pass: each point is replicated to its own cell plus the
     <= 24 two-ring neighbor cells whose rectangle lies within eps of
     it (vectorized per-offset pruning — typically ~6 copies, not
     25); ONE bucketed shuffle whose per-cell vectorized distance
     counts emit the home rows WITH their core flag — the flagged
     point table falls straight out (no separate id-join re-attach).
  2. a second replicate+shuffle — halo NON-core replicas dropped
     map-side, they feed no predicate — emits per cell: its rep (min
     home-core id), cell-cell edges (halo core within eps of a home
     core), and border rows (non-core home point -> home cell of
     each core neighbor; a NOISE sentinel when none).
  3. cell edges + reps are collected to the driver for union-find
     (bounded by #non-empty-core CELLS, orders below #points; the
     shared `dup_clusters_distributed` fallback applies if a corpus
     ever breaks that bound) and the cell->label map is broadcast
     via `ray.put`.
  4. final labels: cores look their cell label up map-side; border
     rows aggregate min label per id (deterministic border rule —
     see below); noise gets cluster = -1.

Determinism contract (pinned by tests/test_cluster.py): core and
noise sets equal textbook DBSCAN exactly; a BORDER point (non-core
within eps of >= 1 core) joins the cluster with the MINIMUM label
among its core neighbors — textbook DBSCAN leaves that assignment
scan-order-dependent, this engine pins the deterministic variant.
Cluster labels are the min core id of the cluster.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .dedup import dup_clusters
from .join import bucketed_attach_column, bucketed_group_apply
from .snap import _cell_key

_NOISE = np.int64(-1)
_FAR = np.int64(np.iinfo(np.int64).max)
_OFFS = [(dx, dy) for dx in range(-2, 3) for dy in range(-2, 3)]


def _copies(t: pa.Table, eps: float, c: float,
            extra: tuple[str, ...] = ()) -> pa.Table:
    """Replicate each point to every cell whose rectangle is within
    eps (its own + pruned two-ring); adds ckey / home_ckey / home."""
    x = t["x"].to_numpy(zero_copy_only=False)
    y = t["y"].to_numpy(zero_copy_only=False)
    pid = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ix = np.floor(x / c).astype(np.int64)
    iy = np.floor(y / c).astype(np.int64)
    home_key = _cell_key(ix, iy)
    cols = {name: t[name].to_numpy(zero_copy_only=False)
            for name in extra}
    out_key, out_idx, out_home = [], [], []
    for dx, dy in _OFFS:
        if dx == 0 and dy == 0:
            out_key.append(home_key)
            out_idx.append(np.arange(len(x), dtype=np.int64))
            out_home.append(np.ones(len(x), np.int8))
            continue
        cx0 = (ix + dx) * c
        cy0 = (iy + dy) * c
        ddx = np.maximum(np.maximum(cx0 - x, x - (cx0 + c)), 0.0)
        ddy = np.maximum(np.maximum(cy0 - y, y - (cy0 + c)), 0.0)
        m = np.flatnonzero(np.hypot(ddx, ddy) <= eps)
        if len(m) == 0:
            continue
        out_key.append(_cell_key(ix[m] + dx, iy[m] + dy))
        out_idx.append(m)
        out_home.append(np.zeros(len(m), np.int8))
    key = np.concatenate(out_key)
    idx = np.concatenate(out_idx)
    data = {"ckey": pa.array(key),
            "home_ckey": pa.array(home_key[idx]),
            "id": pa.array(pid[idx]),
            "x": pa.array(x[idx]), "y": pa.array(y[idx]),
            "home": pa.array(np.concatenate(out_home))}
    for name, arr in cols.items():
        data[name] = pa.array(arr[idx])
    return pa.table(data)


def _cell_slices(ck: np.ndarray):
    starts = np.concatenate(
        ([0], np.flatnonzero(ck[1:] != ck[:-1]) + 1, [len(ck)]))
    return starts


def _size_groups(starts: np.ndarray, budget: int = 4_000_000):
    """Yield (cell_indices, size) stacks of same-size cells, chunked
    so a (m, s, s) distance stack stays under `budget` floats —
    the per-shape-group vectorization that removes the Python
    loop-per-cell (cells are numerous and tiny at corpus scale)."""
    sizes = np.diff(starts)
    order = np.argsort(sizes, kind="stable")
    ssorted = sizes[order]
    gstarts = np.concatenate(
        ([0], np.flatnonzero(ssorted[1:] != ssorted[:-1]) + 1,
         [len(ssorted)]))
    for g in range(len(gstarts) - 1):
        a, b = int(gstarts[g]), int(gstarts[g + 1])
        s = int(ssorted[a])
        step = max(1, budget // (s * s))
        for lo in range(a, b, step):
            yield order[lo:min(lo + step, b)], s


def _flag_pass(points_ds, eps: float, c: float, min_pts: int):
    """ONE ckey-bucket shuffle -> Dataset (id, x, y, core): every
    point exactly once (its home bucket holds its complete
    eps-neighborhood, so |N_eps(p)| — and hence the core flag — is
    decided there). Carrying the home row's coordinates through the
    bucket makes the output the flagged point table directly,
    replacing the former count pass + separate id-join re-attach
    (two shuffles + two materializations fused into one)."""

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"id": pa.array([], pa.int64()),
                          "x": pa.array([], pa.float64()),
                          "y": pa.array([], pa.float64()),
                          "core": pa.array([], pa.int8())})
        if len(g) == 0:
            return empty
        g = g.sort_values("ckey", kind="mergesort")
        ck = g["ckey"].to_numpy(np.int64)
        x = g["x"].to_numpy(np.float64)
        y = g["y"].to_numpy(np.float64)
        pid = g["id"].to_numpy(np.int64)
        home = g["home"].to_numpy(np.int8) == 1
        starts = _cell_slices(ck)
        out_id, out_x, out_y, out_c = [], [], [], []
        for cells, s in _size_groups(starts):
            idx = starts[cells][:, None] + np.arange(s)     # (m, s)
            X, Y = x[idx], y[idx]
            d = np.hypot(X[:, :, None] - X[:, None, :],
                         Y[:, :, None] - Y[:, None, :])
            cnt = (d <= eps).sum(axis=2)                    # every row
            hm = home[idx]
            out_id.append(pid[idx][hm])
            out_x.append(X[hm])
            out_y.append(Y[hm])
            out_c.append((cnt[hm] >= min_pts).astype(np.int8))
        if not out_id:
            return empty
        return pa.table({"id": pa.array(np.concatenate(out_id)),
                         "x": pa.array(np.concatenate(out_x)),
                         "y": pa.array(np.concatenate(out_y)),
                         "core": pa.array(np.concatenate(out_c))})

    rows = points_ds.map_batches(lambda t: _copies(t, eps, c),
                                 batch_format="pyarrow")
    return bucketed_group_apply(rows, "ckey", per_bucket)


def _topo_pass(core_pts, eps: float, c: float):
    """-> Dataset (kind, k1, k2): kind 0 = cell rep (ckey, min core
    id); kind 1 = cell edge (ckey, other ckey); kind 2 = border row
    (point id, core-neighbor home ckey, or _NOISE when none)."""

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"kind": pa.array([], pa.int8()),
                          "k1": pa.array([], pa.int64()),
                          "k2": pa.array([], pa.int64())})
        if len(g) == 0:
            return empty
        g = g.sort_values("ckey", kind="mergesort")
        ck = g["ckey"].to_numpy(np.int64)
        hk = g["home_ckey"].to_numpy(np.int64)
        x = g["x"].to_numpy(np.float64)
        y = g["y"].to_numpy(np.float64)
        pid = g["id"].to_numpy(np.int64)
        home = g["home"].to_numpy(np.int8) == 1
        core = g["core"].to_numpy(np.int8) == 1
        starts = _cell_slices(ck)
        kinds, k1s, k2s = [], [], []

        def emit(kind, a, b):
            kinds.append(np.full(len(a), kind, np.int8))
            k1s.append(np.asarray(a, np.int64))
            k2s.append(np.asarray(b, np.int64))

        for cells, s in _size_groups(starts):
            idx = starts[cells][:, None] + np.arange(s)    # (m, s)
            X, Y = x[idx], y[idx]
            D = np.hypot(X[:, :, None] - X[:, None, :],
                         Y[:, :, None] - Y[:, None, :]) <= eps
            HM, CO = home[idx], core[idx]
            PID, HK = pid[idx], hk[idx]
            cell_of = ck[starts[cells]]                    # (m,)
            hc = HM & CO                                   # home cores
            has_hc = hc.any(axis=1)
            if has_hc.any():
                rep = np.where(hc, PID, _FAR).min(axis=1)
                emit(0, cell_of[has_hc], rep[has_hc])
                halo_c = ~HM & CO
                nearj = (D & hc[:, :, None]
                         & halo_c[:, None, :]).any(axis=1)  # (m, s)
                mi, ji = np.nonzero(nearj)
                if len(mi):
                    e2 = np.unique(
                        np.stack([cell_of[mi], HK[mi, ji]]), axis=1)
                    emit(1, e2[0], e2[1])
            bp = HM & ~CO                     # non-core home points
            if bp.any():
                nearb = D & bp[:, :, None] & CO[:, None, :]
                mi, ii, jj = np.nonzero(nearb)
                if len(mi):
                    pairs = np.unique(
                        np.stack([PID[mi, ii], HK[mi, jj]]), axis=1)
                    emit(2, pairs[0], pairs[1])
                lone = bp & ~nearb.any(axis=2)
                li, lj = np.nonzero(lone)
                if len(li):
                    emit(2, PID[li, lj], np.full(len(li), _NOISE))
        if not kinds:
            return empty
        return pa.table({"kind": pa.array(np.concatenate(kinds)),
                         "k1": pa.array(np.concatenate(k1s)),
                         "k2": pa.array(np.concatenate(k2s))})

    def rep(t: pa.Table) -> pa.Table:
        tt = _copies(t, eps, c, extra=("core",))
        # halo NON-core replicas feed no topo predicate (edges need
        # halo CORES, border rows need HOME non-cores): drop them
        # before the shuffle — the one real volume cut available here
        keep = (tt["home"].to_numpy(zero_copy_only=False) == 1) \
            | (tt["core"].to_numpy(zero_copy_only=False) == 1)
        return tt.filter(pa.array(keep))

    rows = core_pts.map_batches(rep, batch_format="pyarrow")
    return bucketed_group_apply(rows, "ckey", per_bucket)


def dbscan_points(points_ds, *, eps: float, min_pts: int,
                  id_col: str = "id", x_col: str = "lon",
                  y_col: str = "lat"):
    """Distributed DBSCAN -> Dataset (id, cluster, is_core): cluster
    is the min core id of the cluster, -1 for noise; border
    assignment follows the deterministic min-label rule (module
    docstring). `points_ds` must have unique int64 ids."""
    c = eps / np.sqrt(2.0)

    def norm(t: pa.Table) -> pa.Table:
        return pa.table({
            "id": t[id_col].cast(pa.int64()),
            "x": t[x_col].cast(pa.float64()),
            "y": t[y_col].cast(pa.float64())})

    import ray.data  # noqa: F401  (aggregate.Min below)

    pts = points_ds.map_batches(norm, batch_format="pyarrow") \
        .materialize()
    if pts.count() == 0:  # zero-row short-circuit (join poison guard)
        return ray.data.from_arrow(pa.table({
            "id": pa.array([], pa.int64()),
            "cluster": pa.array([], pa.int64()),
            "is_core": pa.array([], pa.bool_())}))
    core_pts = _flag_pass(pts, eps, c, min_pts).materialize()
    topo = _topo_pass(core_pts, eps, c).materialize()

    # cells + edges: bounded by non-empty core cells, not points
    reps: dict[int, int] = {}
    edges_a, edges_b = [], []
    for b in topo.iter_batches(batch_size=None, batch_format="pyarrow"):
        kind = b["kind"].to_numpy(zero_copy_only=False)
        k1 = b["k1"].to_numpy(zero_copy_only=False)
        k2 = b["k2"].to_numpy(zero_copy_only=False)
        rm = kind == 0
        for ckk, rep in zip(k1[rm].tolist(), k2[rm].tolist()):
            reps[ckk] = rep  # one rep row per cell (home cell unique)
        em = kind == 1
        edges_a.append(k1[em])
        edges_b.append(k2[em])
    ea = np.concatenate(edges_a) if edges_a else np.array([], np.int64)
    eb = np.concatenate(edges_b) if edges_b else np.array([], np.int64)
    comp_of: dict[int, int] = {k: k for k in reps}
    if len(ea):
        cl = dup_clusters(pa.table({"a_id": pa.array(ea),
                                    "b_id": pa.array(eb)}))
        for cid, comp in zip(cl["doc_id"].to_pylist(),
                             cl["cluster_id"].to_pylist()):
            comp_of[cid] = comp
    # label(component) = min rep over member cells
    comp_label: dict[int, int] = {}
    for cell, comp in comp_of.items():
        r = reps[cell]
        if comp not in comp_label or r < comp_label[comp]:
            comp_label[comp] = r
    cell_keys = np.fromiter(comp_of.keys(), np.int64, len(comp_of))
    cell_lbls = np.fromiter(
        (comp_label[comp_of[k]] for k in comp_of), np.int64,
        len(comp_of))
    order = np.argsort(cell_keys)
    ref = ray.put((cell_keys[order], cell_lbls[order]))

    def _lookup(keys: np.ndarray) -> np.ndarray:
        ks, ls = ray.get(ref)
        pos = np.searchsorted(ks, keys)
        pos = np.clip(pos, 0, max(len(ks) - 1, 0))
        out = np.full(len(keys), _FAR, np.int64)
        if len(ks):
            hit = ks[pos] == keys
            out[hit] = ls[pos[hit]]
        return out

    def core_rows(t: pa.Table) -> pa.Table:
        empty = pa.table({"id": pa.array([], pa.int64()),
                          "cluster": pa.array([], pa.int64()),
                          "is_core": pa.array([], pa.bool_())})
        co = t["core"].to_numpy(zero_copy_only=False) == 1
        if not co.any():
            return empty
        x = t["x"].to_numpy(zero_copy_only=False)[co]
        y = t["y"].to_numpy(zero_copy_only=False)[co]
        key = _cell_key(np.floor(x / c).astype(np.int64),
                        np.floor(y / c).astype(np.int64))
        return pa.table({
            "id": t["id"].filter(pa.array(co)),
            "cluster": pa.array(_lookup(key)),
            "is_core": pa.array(np.ones(int(co.sum()), bool))})

    cores = core_pts.map_batches(core_rows, batch_format="pyarrow")

    def border_partial(t: pa.Table) -> pa.Table:
        m = t["kind"].to_numpy(zero_copy_only=False) == 2
        pid = t["k1"].to_numpy(zero_copy_only=False)[m]
        ck = t["k2"].to_numpy(zero_copy_only=False)[m]
        lbl = np.full(len(ck), _FAR, np.int64)
        real = ck != _NOISE
        lbl[real] = _lookup(ck[real])
        return pa.table({"id": pa.array(pid.astype(np.int64)),
                         "lbl": pa.array(lbl)})

    bparts = topo.map_batches(border_partial, batch_format="pyarrow")
    bmin = bparts.groupby("id").aggregate(
        ray.data.aggregate.Min("lbl", alias_name="lbl"))

    def border_rows(t: pa.Table) -> pa.Table:
        lbl = t["lbl"].to_numpy(zero_copy_only=False).astype(np.int64)
        lbl = np.where(lbl == _FAR, _NOISE, lbl)
        return pa.table({
            "id": t["id"].cast(pa.int64()),
            "cluster": pa.array(lbl),
            "is_core": pa.array(np.zeros(len(lbl), bool))})

    borders = bmin.map_batches(border_rows, batch_format="pyarrow")
    return cores.union(borders)


def _hull(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Andrew monotone chain -> CCW hull vertex indices (degenerate
    inputs: all distinct points, in x-then-y order)."""
    order = np.lexsort((y, x))
    pts = np.stack([x[order], y[order]], axis=1)
    uniq = np.concatenate(([True], (np.diff(pts, axis=0) != 0)
                           .any(axis=1)))
    order = order[uniq]
    pts = pts[uniq]
    n = len(pts)
    if n <= 2:
        return order

    def half(idx_iter):
        out: list[int] = []
        for i in idx_iter:
            while len(out) >= 2:
                ox, oy = pts[out[-2]]
                ax, ay = pts[out[-1]]
                if (ax - ox) * (pts[i, 1] - oy) \
                        - (ay - oy) * (pts[i, 0] - ox) <= 0:
                    out.pop()
                else:
                    break
            out.append(i)
        return out

    lower = half(range(n))
    upper = half(range(n - 1, -1, -1))
    return order[np.asarray(lower[:-1] + upper[:-1], np.int64)]


def cluster_hulls(labeled_ds, points_ds, *, id_col: str = "id",
                  x_col: str = "lon", y_col: str = "lat"):
    """Per-cluster convex hulls + summary over `dbscan_points` output:
    -> Dataset (cluster, n_pts, cx, cy, hull_x, hull_y) with the CCW
    hull as list<double> columns. Noise (cluster -1) is excluded. One
    bucketed join to attach coordinates + one cluster-bucket shuffle;
    the monotone-chain scan is per cluster (hulls are inherently
    sequential), everything else vectorized."""
    import pandas as pd
    import pyarrow.compute as pc

    from .join import bucketed_attach_column, bucketed_group_apply
    lab = labeled_ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t["cluster"], 0))
        .select(["id", "cluster"]),
        batch_format="pyarrow").materialize()

    def _coord(col, name):
        return points_ds.map_batches(
            lambda t, c=col, n=name: pa.table({
                "id": t[id_col].cast(pa.int64()),
                n: t[c].cast(pa.float64())}),
            batch_format="pyarrow")

    both = bucketed_attach_column(lab, "id", _coord(x_col, "__x"),
                                  "id", "__x").materialize()
    both = bucketed_attach_column(both, "id", _coord(y_col, "__y"),
                                  "id", "__y")

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({
                "cluster": pa.array([], pa.int64()),
                "n_pts": pa.array([], pa.int64()),
                "cx": pa.array([], pa.float64()),
                "cy": pa.array([], pa.float64()),
                "hull_x": pa.array([], pa.list_(pa.float64())),
                "hull_y": pa.array([], pa.list_(pa.float64()))})
        g = g.sort_values("cluster", kind="mergesort")
        cl = g["cluster"].to_numpy(np.int64)
        x = g["__x"].to_numpy(np.float64)
        y = g["__y"].to_numpy(np.float64)
        starts = np.concatenate(
            ([0], np.flatnonzero(cl[1:] != cl[:-1]) + 1, [len(cl)]))
        rows = {"cluster": [], "n_pts": [], "cx": [], "cy": [],
                "hull_x": [], "hull_y": []}
        for k in range(len(starts) - 1):
            s, e = int(starts[k]), int(starts[k + 1])
            hi = _hull(x[s:e], y[s:e])
            rows["cluster"].append(cl[s])
            rows["n_pts"].append(e - s)
            rows["cx"].append(float(x[s:e].mean()))
            rows["cy"].append(float(y[s:e].mean()))
            rows["hull_x"].append(x[s:e][hi])
            rows["hull_y"].append(y[s:e][hi])
        return pa.table({
            "cluster": pa.array(np.asarray(rows["cluster"], np.int64)),
            "n_pts": pa.array(np.asarray(rows["n_pts"], np.int64)),
            "cx": pa.array(rows["cx"], pa.float64()),
            "cy": pa.array(rows["cy"], pa.float64()),
            "hull_x": pa.array(rows["hull_x"], pa.list_(pa.float64())),
            "hull_y": pa.array(rows["hull_y"], pa.list_(pa.float64()))})

    return bucketed_group_apply(both, "cluster", per_bucket)

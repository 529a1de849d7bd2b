"""Privacy-risk audit: k-anonymity and l-diversity over
quasi-identifier (QI) columns — the re-identification gate a corpus
pass runs before release (Sweeney 2002, k-anonymity; Machanavajjhala
2007, l-diversity). A row's QI tuple (e.g. zip+age+gender) is
k-anonymous if at least k rows share it; its sensitive column is
l-diverse if the group carries >= l distinct sensitive values.

Ray-Data shape: ONE slim shuffle. The QI tuple is hashed to int64
map-side with the shared vectorized Arrow row hash
(`stages/diff.py:row_content_hashes` — any column types, no Python
loops), batches pre-aggregate to unique (qh, sensitive-hash) pairs
(bounded by distinct pairs per batch, not rows), then one
`bucketed_group_apply` fold emits one row per QI group. Sensitive
values transit only as 8-byte hashes; payload text never shuffles.
The driver report is a handful of scalar aggregates over the group
rows (never the corpus).

Reference anchor: generalizes the reference's per-key accumulation
(src/osm_cut.erl set-union pass) to privacy-group accounting.
Cross-checked against DuckDB GROUP BY in tests/test_anonymity.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import join as J
from .diff import row_content_hashes
from .join import bucketed_group_apply


def qi_groups(ds, *, qi_cols: list[str],
              sensitive_col: str | None = None,
              num_buckets: int | None = None):
    """-> Dataset, one row per distinct QI tuple:
    (*qi_cols, group_size:int64, l_diversity:int64) —
    l_diversity is the distinct sensitive-value count per group, or
    group_size when `sensitive_col` is None (every row its own
    value, the degenerate upper bound)."""
    if not qi_cols:
        raise ValueError("qi_cols must name at least one column")
    # pandas-block datasets expose a PandasBlockSchema; normalize to
    # Arrow first (the identity map is zero-copy for Arrow blocks)
    ds = ds.map_batches(lambda t: t, batch_format="pyarrow")
    schema: pa.Schema = ds.schema().base_schema
    for c in qi_cols + ([sensitive_col] if sensitive_col else []):
        if c not in schema.names:
            raise ValueError(f"column {c!r} not in dataset schema")
    qi_types = [(c, schema.field(c).type) for c in qi_cols]

    def empty() -> pa.Table:
        cols = {"qh": pa.array([], pa.int64())}
        for c, t in qi_types:
            cols[c] = pa.array([], t)
        cols["sh"] = pa.array([], pa.int64())
        cols["cnt"] = pa.array([], pa.int64())
        return pa.table(cols)

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or qi_cols[0] not in t.column_names:
            return empty()
        qh = row_content_hashes(t, qi_cols)
        if sensitive_col is not None:
            sh = row_content_hashes(t, [sensitive_col])
        else:
            # placeholder; the fold sets l_diversity = group_size
            sh = np.zeros(t.num_rows, dtype=np.int64)
        # pre-aggregate to unique (qh, sh) pairs with counts; one
        # representative row index per pair carries the QI values
        order = np.lexsort((sh, qh))
        qh_s, sh_s = qh[order], sh[order]
        new = np.concatenate(([True], (qh_s[1:] != qh_s[:-1])
                              | (sh_s[1:] != sh_s[:-1])))
        gid = np.cumsum(new) - 1
        cnt = np.bincount(gid).astype(np.int64)
        rep = order[new]
        cols = {"qh": pa.array(qh_s[new])}
        for c, _t in qi_types:
            cols[c] = t[c].take(pa.array(rep))
        cols["sh"] = pa.array(sh_s[new])
        cols["cnt"] = pa.array(cnt)
        return pa.table(cols)

    def fold(g: pd.DataFrame) -> pa.Table:
        out_empty_cols = {c: pa.array([], t) for c, t in qi_types}
        out_empty_cols["group_size"] = pa.array([], pa.int64())
        out_empty_cols["l_diversity"] = pa.array([], pa.int64())
        if len(g) == 0:
            return pa.table(out_empty_cols)
        agg = g.groupby("qh").agg(
            group_size=("cnt", "sum"), l_diversity=("sh", "nunique"))
        if sensitive_col is None:
            agg["l_diversity"] = agg["group_size"]
        rep = g.drop_duplicates("qh").set_index("qh")
        rep = rep.loc[agg.index]
        cols = {}
        for c, t in qi_types:
            cols[c] = pa.array(rep[c].to_numpy(), type=t)
        cols["group_size"] = pa.array(
            agg["group_size"].to_numpy(np.int64))
        cols["l_diversity"] = pa.array(
            agg["l_diversity"].to_numpy(np.int64))
        return pa.table(cols)

    slimmed = ds.map_batches(slim, batch_format="pyarrow")
    return bucketed_group_apply(slimmed, "qh", fold,
                                num_buckets=num_buckets)


def k_anonymity_report(ds, *, qi_cols: list[str],
                       sensitive_col: str | None = None,
                       k_threshold: int = 5, l_threshold: int = 2,
                       num_buckets: int | None = None):
    """-> (groups Dataset, report dict). The report is computed from
    scalar aggregates over the per-group rows:

    k_anonymity       min group size (the dataset's k)
    l_diversity       min distinct sensitive values per group
    n_rows/n_groups   totals
    rows_at_risk      rows in groups smaller than `k_threshold`
    rows_low_diversity rows in groups below `l_threshold` (only when
                      a sensitive column is given)
    """
    from ray.data.aggregate import Max, Min, Sum

    groups, n_groups = J.solidify(qi_groups(
        ds, qi_cols=qi_cols, sensitive_col=sensitive_col,
        num_buckets=num_buckets))
    if n_groups == 0:
        report = {"n_rows": 0, "n_groups": 0, "k_anonymity": 0,
                  "l_diversity": 0, "rows_at_risk": 0,
                  "rows_low_diversity": 0,
                  "k_threshold": k_threshold,
                  "l_threshold": l_threshold}
        return groups, report
    groups = groups.materialize()

    def risk_cols(t: pa.Table) -> pa.Table:
        gs = t["group_size"].to_numpy(zero_copy_only=False)
        ld = t["l_diversity"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "__risk", pa.array(np.where(gs < k_threshold, gs, 0)
                               .astype(np.int64))) \
            .append_column(
            "__lowdiv", pa.array(np.where(ld < l_threshold, gs, 0)
                                 .astype(np.int64)))

    agg = groups.map_batches(risk_cols, batch_format="pyarrow") \
        .aggregate(Sum("group_size", alias_name="n_rows"),
                   Min("group_size", alias_name="k_anon"),
                   Min("l_diversity", alias_name="l_div"),
                   Max("group_size", alias_name="max_group"),
                   Sum("__risk", alias_name="rows_at_risk"),
                   Sum("__lowdiv", alias_name="rows_low_diversity"))
    report = {
        "n_rows": int(agg["n_rows"]),
        "n_groups": int(n_groups),
        "k_anonymity": int(agg["k_anon"]),
        "l_diversity": (int(agg["l_div"]) if sensitive_col is not None
                        else None),
        "max_group": int(agg["max_group"]),
        "rows_at_risk": int(agg["rows_at_risk"]),
        "rows_low_diversity": (int(agg["rows_low_diversity"])
                               if sensitive_col is not None else 0),
        "k_threshold": k_threshold,
        "l_threshold": l_threshold,
    }
    return groups, report


def suppress_below_k(ds, *, qi_cols: list[str], k: int,
                     num_buckets: int | None = None):
    """k-anonymize by suppression: drop every row whose QI group has
    fewer than k members (the standard release gate). Two passes over
    the QI hash only: the small under-k hash set is collected and
    broadcast (bounded: <= n_rows/1 distinct under-k groups, each a
    single int64 — cap via the report first if in doubt), rows never
    shuffle."""
    from .join import broadcast_is_in

    groups, n_g = J.solidify(qi_groups(ds, qi_cols=qi_cols,
                                       num_buckets=num_buckets))
    if n_g == 0:
        return ds
    # rebuild the group hash from the group's own QI values (the
    # fold emits one representative row per group, same hash input)
    def bad_hashes(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"qh": pa.array([], pa.int64())})
        keep = t.filter(pa.array(
            t["group_size"].to_numpy(zero_copy_only=False) < k))
        return pa.table({"qh": pa.array(
            row_content_hashes(keep, qi_cols))})

    bad = np.concatenate(
        [b["qh"].to_numpy(zero_copy_only=False)
         for b in groups.map_batches(
             bad_hashes, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow")]
        or [np.array([], np.int64)]).astype(np.int64)

    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("__qh", pa.array([], pa.int64()))
        return t.append_column(
            "__qh", pa.array(row_content_hashes(t, qi_cols)))

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    kept = broadcast_is_in(tagged, "__qh", bad, mode="anti")
    return kept.map_batches(lambda t: t.drop_columns(["__qh"]),
                            batch_format="pyarrow")

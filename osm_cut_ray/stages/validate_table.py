"""Declarative table-constraint audit (the Great-Expectations /
dbt-test shape): run a list of data-quality constraints over a
Dataset and get one exact violation count per constraint — the
ingest gate a 100-TB pipeline runs before accepting a new drop.

Constraint kinds (each a dict with "kind", "column" and params):

- not_null                          — null rows violate
- range    (min=, max=, either optional) — non-null rows outside
- regex    (pattern=, RE2)          — non-null rows w/o a match
- in_set   (values=[...])           — non-null rows outside the set
- unique                            — duplicate non-null rows beyond
                                      the first of each value
- ref_integrity (ref=<name>, ref_column=) — non-null rows whose key
  is absent from `ref_tables[name]`'s ref_column (nulls skipped, the
  SQL FK convention)
- dtype    (type=<str>)             — schema mismatch (0/1)

100-TB shape: ALL block-local kinds (not_null/range/regex/in_set)
are evaluated in ONE zero-shuffle map pass emitting a single partial
row per block (2 int64s per constraint), driver-summed. `unique`
costs one slim column distinct; `ref_integrity` is one bucketed
anti-join over the slim key column. Counts are exact int64 — the
whole report is DuckDB-pinned in tests/test_validate_table.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_KINDS = ("not_null", "range", "regex", "in_set", "unique",
          "ref_integrity", "dtype")


def _check(cs: list[dict], ref_tables) -> None:
    for c in cs:
        kind = c.get("kind")
        if kind not in _KINDS:
            raise ValueError(f"unknown constraint kind {kind!r}")
        if "column" not in c:
            raise ValueError(f"constraint {c} missing 'column'")
        if kind == "range" and c.get("min") is None \
                and c.get("max") is None:
            raise ValueError("range constraint needs min and/or max")
        if kind == "regex" and not c.get("pattern"):
            raise ValueError("regex constraint needs pattern")
        if kind == "in_set" and not c.get("values"):
            raise ValueError("in_set constraint needs values")
        if kind == "dtype" and not c.get("type"):
            raise ValueError("dtype constraint needs type")
        if kind == "ref_integrity":
            if not c.get("ref") or not c.get("ref_column"):
                raise ValueError(
                    "ref_integrity needs ref= (a ref_tables key) "
                    "and ref_column=")
            if not ref_tables or c["ref"] not in ref_tables:
                raise ValueError(
                    f"ref table {c.get('ref')!r} not in ref_tables")


def _local_counts(t: pa.Table, cs: list[dict]) -> list[tuple[int, int]]:
    """-> [(checked, violations)] for the block-local constraints in
    order; cross-table kinds get (0, 0) placeholders."""
    out = []
    for c in cs:
        kind = c["kind"]
        if kind in ("unique", "ref_integrity", "dtype"):
            out.append((0, 0))
            continue
        col = t[c["column"]]
        n = t.num_rows
        null_n = col.null_count
        if kind == "not_null":
            out.append((n, null_n))
            continue
        valid = pc.drop_null(col)
        nn = len(valid)
        if nn == 0:
            out.append((0, 0))
            continue
        if kind == "range":
            bad = np.zeros(nn, bool)
            vals = valid.to_numpy(zero_copy_only=False)
            if c.get("min") is not None:
                bad |= vals < c["min"]
            if c.get("max") is not None:
                bad |= vals > c["max"]
            out.append((nn, int(bad.sum())))
        elif kind == "regex":
            if not (pa.types.is_string(col.type)
                    or pa.types.is_large_string(col.type)):
                raise ValueError(
                    f"regex constraint on non-string column "
                    f"{c['column']!r} ({col.type}) — cast it first")
            hit = pc.match_substring_regex(valid, c["pattern"])
            out.append((nn, nn - int(pc.sum(pc.cast(
                hit, pa.int64())).as_py() or 0)))
        else:  # in_set
            hit = pc.is_in(valid, value_set=pa.array(c["values"]))
            out.append((nn, nn - int(pc.sum(pc.cast(
                pc.fill_null(hit, False), pa.int64())).as_py() or 0)))
    return out


def _slim_nonnull(ds, col: str):
    def fn(t: pa.Table) -> pa.Table:
        return pa.table({col: pc.drop_null(t[col])})
    return ds.map_batches(fn, batch_format="pyarrow")


def validate_table(ds, constraints: list[dict], *,
                   ref_tables: dict | None = None,
                   num_buckets: int = 64) -> pa.Table:
    """-> pa.Table (name, kind, column, checked, violations, passed)
    — one row per constraint, exact counts, input order."""
    from .join import bucketed_semi_join, distinct

    cs = list(constraints)
    _check(cs, ref_tables)
    k = len(cs)

    def partial(t: pa.Table) -> pa.Table:
        counts = _local_counts(t, cs)
        flat = np.array([x for cv in counts for x in cv], np.int64)
        return pa.table({"p": pa.array([flat], pa.list_(pa.int64()))})

    totals = np.zeros(2 * k, np.int64)
    for t in ds.map_batches(partial, batch_format="pyarrow")\
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        for row in t["p"].to_pylist():
            totals += np.asarray(row, np.int64)

    schema = ds.schema()
    names, kinds, cols, checked, viol = [], [], [], [], []
    for i, c in enumerate(cs):
        kind, col = c["kind"], c["column"]
        names.append(c.get("name") or f"{kind}:{col}")
        kinds.append(kind)
        cols.append(col)
        if kind in ("not_null", "range", "regex", "in_set"):
            checked.append(int(totals[2 * i]))
            viol.append(int(totals[2 * i + 1]))
        elif kind == "dtype":
            idx = schema.names.index(col) if col in schema.names else -1
            ok = idx >= 0 and str(schema.types[idx]) == c["type"]
            checked.append(0)
            viol.append(0 if ok else 1)
        elif kind == "unique":
            slim = _slim_nonnull(ds, col)
            n = slim.count()
            nd = distinct(slim, [col]).count()
            checked.append(int(n))
            viol.append(int(n - nd))
        else:  # ref_integrity
            slim = _slim_nonnull(ds, col)
            refs = ref_tables[c["ref"]].select_columns(
                [c["ref_column"]])
            dangling = bucketed_semi_join(
                slim, col, refs, c["ref_column"],
                num_buckets=num_buckets, mode="anti")
            checked.append(int(slim.count()))
            viol.append(int(dangling.count()))
    return pa.table({
        "name": pa.array(names, pa.string()),
        "kind": pa.array(kinds, pa.string()),
        "column": pa.array(cols, pa.string()),
        "checked": pa.array(checked, pa.int64()),
        "violations": pa.array(viol, pa.int64()),
        "passed": pa.array([v == 0 for v in viol], pa.bool_())})

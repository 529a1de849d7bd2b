"""Pipeline observability: turn `Dataset.stats()` prose into a
stage table (the `EXPLAIN ANALYZE` a pipeline author reads before
resizing `concurrency` / `batch_size`).

`stage_report(ds)` executes the dataset if needed and returns one
row per operator with wall time, block count and rows produced —
parsed tolerantly from the stats text (Ray's format drifts between
releases; unparsed lines surface in the `detail` column rather than
being dropped)."""

from __future__ import annotations

import re

import pyarrow as pa

_OP_RE = re.compile(r"^Operator (\d+) (.+?):")
_TIME_RE = re.compile(
    r"([\d.]+)(ms|s|us|m(?:in)?)\b")
_BLOCKS_RE = re.compile(r"(\d+) blocks? (?:produced|executed)")
_ROWS_RE = re.compile(r"([\d,]+) rows? produced")


def _to_sec(val: str, unit: str) -> float:
    f = float(val)
    return {"us": f / 1e6, "ms": f / 1e3, "s": f,
            "m": f * 60, "min": f * 60}[unit]


def stage_report(ds) -> pa.Table:
    """-> pa.Table (operator, name, wall_s, n_blocks, rows, detail).
    Executes the dataset (stats exist only after execution)."""
    ds = ds.materialize()
    text = ds.stats()
    ops, names, walls, blocks, rows, details = [], [], [], [], [], []
    cur = None
    for line in text.splitlines():
        m = _OP_RE.match(line.strip())
        if m:
            if cur is not None:
                ops.append(cur[0]); names.append(cur[1])
                walls.append(cur[2]); blocks.append(cur[3])
                rows.append(cur[4]); details.append(cur[5])
            cur = [int(m.group(1)), m.group(2), None, None, None, ""]
            b = _BLOCKS_RE.search(line)
            if b:
                cur[3] = int(b.group(1))
            t = _TIME_RE.search(line[m.end():])
            if t:
                cur[2] = _to_sec(t.group(1), t.group(2))
            continue
        if cur is None:
            continue
        s = line.strip()
        if s.startswith("* Total time"):
            t = _TIME_RE.search(s)
            if t:
                cur[2] = _to_sec(t.group(1), t.group(2))
        elif "rows produced" in s:
            r = _ROWS_RE.search(s)
            if r:
                cur[4] = int(r.group(1).replace(",", ""))
        elif s.startswith("* ") and len(cur[5]) < 400:
            cur[5] += s[2:] + "; "
    if cur is not None:
        ops.append(cur[0]); names.append(cur[1])
        walls.append(cur[2]); blocks.append(cur[3])
        rows.append(cur[4]); details.append(cur[5])
    return pa.table({
        "operator": pa.array(ops, pa.int64()),
        "name": pa.array(names, pa.large_string()),
        "wall_s": pa.array(walls, pa.float64()),
        "n_blocks": pa.array(blocks, pa.int64()),
        "rows": pa.array(rows, pa.int64()),
        "detail": pa.array([d.strip() for d in details],
                           pa.large_string())})


def print_report(ds) -> None:
    t = stage_report(ds)
    for r in t.to_pylist():
        wall = f"{r['wall_s']:.3f}s" if r["wall_s"] is not None \
            else "?"
        print(f"op{r['operator']:>3} {wall:>10}  "
              f"blocks={r['n_blocks']}  rows={r['rows']}  "
              f"{r['name']}")

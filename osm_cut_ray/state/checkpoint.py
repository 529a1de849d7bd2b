"""Per-partition checkpoint manifests + resumable runs (north_rule:
"resumable from checkpoint with per-partition lineage + metrics").

The reference has no resume — a supervisor restart loses all state
(src/osm_supervisor.erl:56-61, restart is NOT resume). At 100 TB that
is unacceptable, so the engine adds the standard batch-resume layout:

    out_dir/
      <shard_id>/            # one directory per input shard
        part-*.parquet       # the shard's output (written to a tmp
                             # dir, atomically renamed)
      _manifests/<shard_id>.json   # written LAST; its existence marks
                                   # the shard complete

A manifest records lineage (input fingerprint: path, size, mtime),
stage params, row counters and wall time. On re-run, shards whose
manifest matches the current input fingerprint and params are skipped;
anything else (missing, stale fingerprint, changed params) is
recomputed. Output rename + manifest-last ordering make a crash
mid-shard leave only ignorable tmp dirs.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Callable
from dataclasses import asdict, dataclass, field


@dataclass
class Manifest:
    shard_id: str
    input_path: str
    input_size: int
    input_mtime: float
    params: dict
    rows_in: int
    rows_out: int
    wall_sec: float
    finished_at: float
    engine_version: str = "osm_cut_ray-0.1.0"
    counters: dict = field(default_factory=dict)


def _fingerprint(path: str) -> tuple[int, float]:
    st = os.stat(path)
    return st.st_size, st.st_mtime


def _manifest_path(out_dir: str, shard_id: str) -> str:
    return os.path.join(out_dir, "_manifests", f"{shard_id}.json")


def load_manifest(out_dir: str, shard_id: str) -> Manifest | None:
    p = _manifest_path(out_dir, shard_id)
    if not os.path.exists(p):
        return None
    with open(p, encoding="utf-8") as f:
        return Manifest(**json.load(f))


def is_complete(out_dir: str, shard_id: str, input_path: str,
                params: dict) -> bool:
    m = load_manifest(out_dir, shard_id)
    if m is None:
        return False
    size, mtime = _fingerprint(input_path)
    return (m.input_size == size and m.input_mtime == mtime
            and m.params == params)


def run_resumable(shards: list[tuple[str, str]],
                  process: Callable[[str], "object"],
                  out_dir: str, params: dict | None = None,
                  counters_fn: Callable[[str], dict] | None = None) -> dict:
    """Process input shards resumably.

    shards: [(shard_id, input_path)]. `process(input_path)` returns a
    Ray Dataset whose output is written under out_dir/<shard_id>/.
    Returns a report {completed, skipped, rows_out, wall_sec}.
    """
    params = params or {}
    os.makedirs(os.path.join(out_dir, "_manifests"), exist_ok=True)
    report = {"completed": [], "skipped": [], "rows_out": 0, "wall_sec": 0.0}
    t_all = time.time()
    for shard_id, input_path in shards:
        if is_complete(out_dir, shard_id, input_path, params):
            m = load_manifest(out_dir, shard_id)
            report["skipped"].append(shard_id)
            report["rows_out"] += m.rows_out
            continue
        t0 = time.time()
        ds = process(input_path)
        final_dir = os.path.join(out_dir, shard_id)
        tmp_dir = final_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        # pre-create: an all-rows-dropped shard writes ZERO files and
        # Ray then leaves no directory at all — the empty dir is still
        # a valid (0-row) committed output
        os.makedirs(tmp_dir, exist_ok=True)
        ds.write_parquet(tmp_dir)
        rows_out = sum(
            _parquet_rows(os.path.join(tmp_dir, f))
            for f in os.listdir(tmp_dir) if f.endswith(".parquet"))
        shutil.rmtree(final_dir, ignore_errors=True)
        os.replace(tmp_dir, final_dir)
        size, mtime = _fingerprint(input_path)
        man = Manifest(
            shard_id=shard_id, input_path=input_path, input_size=size,
            input_mtime=mtime, params=params,
            rows_in=_parquet_rows(input_path), rows_out=rows_out,
            wall_sec=round(time.time() - t0, 3), finished_at=time.time(),
            counters=counters_fn(shard_id) if counters_fn else {})
        mp = _manifest_path(out_dir, shard_id)
        with open(mp + ".tmp", "w", encoding="utf-8") as f:
            json.dump(asdict(man), f, indent=1)
        os.replace(mp + ".tmp", mp)  # manifest-last commit point
        report["completed"].append(shard_id)
        report["rows_out"] += rows_out
    report["wall_sec"] = round(time.time() - t_all, 3)
    return report


def _parquet_rows(path: str) -> int:
    import pyarrow.parquet as pq
    try:
        return pq.read_metadata(path).num_rows
    except Exception:
        return 0

"""Resumable tile-pyramid materialization: render the base density
level from a point corpus, roll up to zmin, and write every level as
partitioned parquet — the repo's resumable-output contract
(state/checkpoint.py) applied to the raster family: one directory +
manifest per LEVEL, atomic tmp->rename writes, completed levels are
skipped on re-run and the rollup READS a completed child level back
from parquet instead of recomputing it (so a crash between levels
costs only the unfinished level).

The manifest fingerprints the render parameters and the child level's
tile count (each level depends only on the one below); the point
corpus itself has no file fingerprint — re-running over a DIFFERENT
corpus into the same out_dir must change `params` (e.g. pass a
corpus tag), the same discipline `run_resumable` callers follow.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from ..stages.tiles import render_density_tiles, tile_pyramid_level


def _level_dir(out_dir: str, z: int) -> str:
    return os.path.join(out_dir, f"z={z}")


def _manifest_path(out_dir: str, z: int) -> str:
    return os.path.join(out_dir, "_manifests", f"z{z}.json")


def _load(out_dir: str, z: int) -> dict | None:
    p = _manifest_path(out_dir, z)
    if not os.path.exists(p):
        return None
    with open(p, encoding="utf-8") as f:
        return json.load(f)


def write_tile_pyramid(points_ds, out_dir: str, *, zmax: int,
                       zmin: int = 0, tile_px: int = 256,
                       log_scale: bool = True,
                       corpus_tag: str = "", x_col: str = "lon",
                       y_col: str = "lat") -> dict:
    """-> report {written: [z...], skipped: [z...], n_tiles: {z: n}}."""
    if zmin > zmax:
        raise ValueError("zmin must be <= zmax")
    import ray.data

    os.makedirs(os.path.join(out_dir, "_manifests"), exist_ok=True)
    params = {"tile_px": tile_px, "log_scale": log_scale,
              "corpus_tag": corpus_tag, "zmax": zmax}
    report = {"written": [], "skipped": [], "n_tiles": {}}
    # fingerprint chain: each level records its CHILD's finished_at,
    # so rebuilding any level cascades invalidation upward (a count
    # proxy could silently skip a parent of changed-but-same-count
    # content)
    child_fp = None
    cur = None      # in-memory Dataset of the previously built level
    for z in range(zmax, zmin - 1, -1):
        m = _load(out_dir, z)
        want = dict(params, z=z, child_fp=child_fp)
        if m is not None and m.get("params") == want:
            report["skipped"].append(z)
            report["n_tiles"][z] = m["n_tiles"]
            child_fp = m["finished_at"]
            cur = None  # force read-back if the next level needs it
            continue
        if z == zmax:
            tiles = render_density_tiles(
                points_ds, zoom=z, tile_px=tile_px,
                log_scale=log_scale, x_col=x_col, y_col=y_col)
        else:
            if cur is None:  # resume: child level sits on disk
                cur = ray.data.read_parquet(_level_dir(out_dir, z + 1))
            tiles = tile_pyramid_level(cur)
        t0 = time.time()
        tiles = tiles.materialize()
        n = tiles.count()
        dest = _level_dir(out_dir, z)
        tmp = dest + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(dest, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        if n:
            tiles.write_parquet(tmp)
        os.rename(tmp, dest)
        fin = time.time()
        with open(_manifest_path(out_dir, z), "w",
                  encoding="utf-8") as f:  # manifest LAST (atomic-ish)
            json.dump({"params": want, "n_tiles": n,
                       "wall_sec": round(fin - t0, 3),
                       "finished_at": fin}, f)
        report["written"].append(z)
        report["n_tiles"][z] = n
        child_fp = fin
        cur = tiles
    return report

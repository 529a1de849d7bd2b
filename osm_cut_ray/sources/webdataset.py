"""WebDataset-style tar shard sink + source for the image corpus.

Training loaders for image+caption data consume sharded tar archives
(the public WebDataset convention: one basename per sample, one file
per field — ``<key>.img`` raw encoded image, ``<key>.txt`` caption,
``<key>.json`` scalar metadata). This module writes an
input_hint-shaped Dataset to that layout and reads it back, so the
curated output of `pipelines/curate_images.py` can feed a trainer
directly.

Scale shape: each `map_batches` task turns ONE batch into ONE tar
written atomically (tmp + rename) — shards stream out in parallel,
nothing is collected on the driver, and the returned manifest rows
(shard path, row count, byte size) are the only thing that transits.
Shard names derive from the first/last image_id in the batch, so
re-running an identical pipeline overwrites the same shard files
idempotently rather than accumulating duplicates. Tar member metadata
(mtime/uid/gid) is zeroed: byte-identical shards for identical inputs.

Reading is the mirror: a Dataset of shard paths, one `map_batches`
task untars each shard back into input_hint rows.
"""

from __future__ import annotations

import io
import json
import os
import tarfile

import numpy as np
import pyarrow as pa


def _tar_add(tf: tarfile.TarFile, name: str, payload: bytes) -> None:
    info = tarfile.TarInfo(name)
    info.size = len(payload)
    info.mtime = 0
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    tf.addfile(info, io.BytesIO(payload))


def write_shard_batch(t: pa.Table, out_dir: str) -> pa.Table:
    """One batch -> one tar shard; returns its manifest row."""
    empty = pa.table({"shard": pa.array([], pa.string()),
                      "rows": pa.array([], pa.int64()),
                      "bytes": pa.array([], pa.int64())})
    if len(t) == 0 or "image_id" not in t.column_names:
        return empty
    ids = t["image_id"].to_pylist()
    name = f"shard-{ids[0]}-{ids[-1]}-{len(ids)}.tar"
    path = os.path.join(out_dir, name)
    tmp = path + ".tmp"
    blobs = t["bytes"].to_pylist()
    caps = t["caption"].to_pylist()
    meta_cols = {c: t[c].to_pylist() for c in ("w", "h", "fmt", "phash")
                 if c in t.column_names}
    with tarfile.open(tmp, "w") as tf:
        for i, key in enumerate(ids):
            _tar_add(tf, f"{key}.img", blobs[i] or b"")
            _tar_add(tf, f"{key}.txt",
                     (caps[i] or "").encode("utf-8"))
            meta = {c: v[i] for c, v in meta_cols.items()}
            _tar_add(tf, f"{key}.json",
                     json.dumps(meta, sort_keys=True).encode("utf-8"))
    os.replace(tmp, path)
    return pa.table({"shard": pa.array([name]),
                     "rows": pa.array([len(ids)], pa.int64()),
                     "bytes": pa.array([os.path.getsize(path)],
                                       pa.int64())})


def write_wds_shards(images_ds, out_dir: str, *,
                     rows_per_shard: int = 10_000,
                     shuffle_seed: int | None = None) -> pa.Table:
    """Write an input_hint-shaped Dataset as WebDataset tar shards.
    Returns the shard manifest table (shard, rows, bytes).

    `shuffle_seed` runs a seeded global `random_shuffle` first so
    samples land in random shards (what training ingestion wants).
    This is the ONE place the pipeline deliberately shuffles payload
    bytes — it is the export, there is nothing downstream to spare."""
    os.makedirs(out_dir, exist_ok=True)
    if shuffle_seed is not None:
        images_ds = images_ds.random_shuffle(seed=shuffle_seed)
    manifest = images_ds.map_batches(
        lambda t: write_shard_batch(t, out_dir),
        batch_format="pyarrow", batch_size=rows_per_shard)
    parts = [b for b in manifest.iter_batches(batch_size=None,
                                              batch_format="pyarrow")
             if b.num_rows]
    out = pa.concat_tables(parts) if parts else pa.table({
        "shard": pa.array([], pa.string()),
        "rows": pa.array([], pa.int64()),
        "bytes": pa.array([], pa.int64())})
    out = out.sort_by("shard")
    # shard-list file (what loaders consume); tiny, driver-side
    mpath = os.path.join(out_dir, "_manifest.json")
    with open(mpath + ".tmp", "w", encoding="utf-8") as f:
        json.dump({"shards": out["shard"].to_pylist(),
                   "rows": out["rows"].to_pylist(),
                   "bytes": out["bytes"].to_pylist()}, f, indent=1)
    os.replace(mpath + ".tmp", mpath)
    return out


def read_shard(path: str) -> pa.Table:
    """One tar shard -> input_hint-shaped table (row order = the
    writer's sample order)."""
    samples: dict[str, dict] = {}
    order: list[str] = []
    with tarfile.open(path, "r") as tf:
        for m in tf:
            key, dot, field = m.name.rpartition(".")
            if not dot:
                continue
            buf = tf.extractfile(m).read()
            if key not in samples:
                samples[key] = {}
                order.append(key)
            samples[key][field] = buf
    ids, blobs, ws, hs, fmts, caps, phs = [], [], [], [], [], [], []
    for key in order:
        s = samples[key]
        meta = json.loads(s.get("json", b"{}"))
        ids.append(key)
        blobs.append(s.get("img", b""))
        caps.append(s.get("txt", b"").decode("utf-8"))
        ws.append(meta.get("w", 0))
        hs.append(meta.get("h", 0))
        fmts.append(meta.get("fmt", ""))
        phs.append(meta.get("phash", 0))
    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "w": pa.array(np.asarray(ws, np.int32)),
        "h": pa.array(np.asarray(hs, np.int32)),
        "fmt": pa.array(fmts, pa.string()),
        "caption": pa.array(caps, pa.string()),
        "phash": pa.array(np.asarray(phs, np.int64)),
    })


def read_wds_shards(shard_paths):
    """tar shard paths -> input_hint-shaped Dataset (one read task per
    shard; shards stream independently)."""
    import ray.data as rd
    paths = sorted(str(p) for p in shard_paths)

    def fn(t: pa.Table) -> pa.Table:
        outs = [read_shard(p) for p in t["path"].to_pylist()]
        outs = [o for o in outs if len(o)]
        return pa.concat_tables(outs) if outs else read_shard_empty()

    return rd.from_arrow(pa.table({"path": pa.array(paths)})) \
        .repartition(max(1, len(paths))) \
        .map_batches(fn, batch_format="pyarrow")


def read_shard_empty() -> pa.Table:
    from ..pipelines.curate_images import EMPTY_HINT
    return EMPTY_HINT

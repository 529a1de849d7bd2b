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


def export_packed_wds(images_ds, out_dir: str, *, batch_size: int,
                      batches_per_shard: int = 64,
                      step: float = 0.25, max_abs: float = 2.0,
                      id_prefix_len: int = 3,
                      max_broadcast_assign: int = 50_000_000) -> pa.Table:
    """Export the corpus as ASPECT-PACKED training shards: every
    `batch_size` consecutive samples in a shard share an aspect-ratio
    bucket (stages/batching.py assignment), so the loader can consume
    fixed-shape batches with zero re-grouping.

    Layout: one tar per `batches_per_shard` training batches, named
    ``packed-ab<bucket>-<chunk>.tar``; sample order inside a shard is
    (batch_seq, slot). Scale shape: the slim assignment attaches to
    the payload either via one broadcast (`ray.put` + searchsorted)
    when it fits, or via ONE Arrow-native bucketed join past
    `max_broadcast_assign`; either way payload bytes shuffle exactly
    once (the terminal grouping — this is the export). Returns the
    manifest table (shard, rows, bytes).
    """
    import ray

    from ..pipelines.curate_images import parse_image_ids
    from ..stages import join as J
    from ..stages.batching import pack_training_batches

    os.makedirs(out_dir, exist_ok=True)
    if batch_size > 1024 or batches_per_shard * batch_size > (1 << 30):
        raise ValueError("batch_size <= 1024 and shard < 2^30 rows")
    assign = pack_training_batches(
        images_ds, batch_size=batch_size, step=step, max_abs=max_abs,
        id_prefix_len=id_prefix_len).materialize()

    # single packed position key: (ab+512) << 40 | batch_seq << 10 | slot
    def pack_pos(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "pos_key": pa.array([], pa.int64())})
        ab = t["ab"].to_numpy(zero_copy_only=False) + np.int64(512)
        pos = ((ab << np.int64(40))
               | (t["batch_seq"].to_numpy(zero_copy_only=False)
                  << np.int64(10))
               | t["slot"].to_numpy(zero_copy_only=False))
        return pa.table({"doc_id": t["doc_id"],
                         "pos_key": pa.array(pos)})

    pos_ds = assign.map_batches(pack_pos, batch_format="pyarrow")
    n_assigned = assign.count()

    if n_assigned <= max_broadcast_assign:
        ids_l, pos_l = [], []
        for b in pos_ds.iter_batches(batch_size=None,
                                     batch_format="pyarrow"):
            if b.num_rows:
                ids_l.append(b["doc_id"].to_numpy(zero_copy_only=False))
                pos_l.append(b["pos_key"].to_numpy(zero_copy_only=False))
        ids = np.concatenate(ids_l) if ids_l else np.array([], np.int64)
        pos = np.concatenate(pos_l) if pos_l else np.array([], np.int64)
        order = np.argsort(ids)
        ref = ray.put((ids[order], pos[order]))

        def attach(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "image_id" not in t.column_names:
                from ..pipelines.curate_images import EMPTY_HINT
                return EMPTY_HINT.append_column(
                    "pos_key", pa.array([], pa.int64()))
            k, p = ray.get(ref)
            rid = parse_image_ids(t["image_id"], id_prefix_len)
            loc = np.searchsorted(k, rid)
            loc_c = np.minimum(loc, max(0, len(k) - 1))
            hit = (k[loc_c] == rid) if len(k) \
                else np.zeros(len(t), bool)
            out = t.append_column(
                "pos_key", pa.array(np.where(hit, p[loc_c], -1)))
            out = out.filter(pa.array(hit))
            if len(out):
                return out
            from ..pipelines.curate_images import EMPTY_HINT
            return EMPTY_HINT.append_column(
                "pos_key", pa.array([], pa.int64()))

        tagged = images_ds.map_batches(attach, batch_format="pyarrow")
    else:
        def tag_id(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "image_id" not in t.column_names:
                from ..pipelines.curate_images import EMPTY_HINT
                return EMPTY_HINT.append_column(
                    "__gid", pa.array([], pa.int64()))
            return t.append_column("__gid", pa.array(
                parse_image_ids(t["image_id"], id_prefix_len)))

        base_schema = images_ds.schema().base_schema

        def restore(t: pa.Table) -> pa.Table:
            # the groupby shuffle inside the bucketed join promotes
            # null-padded int columns to float64 (pandas blocks);
            # cast every column back to the payload schema exactly
            import pyarrow.compute as pc
            cols = {f.name: pc.cast(t[f.name], f.type)
                    for f in base_schema}
            cols["pos_key"] = pc.cast(t["pos_key"], pa.int64())
            return pa.table(cols)

        tagged = J.bucketed_attach_column(
            images_ds.map_batches(tag_id, batch_format="pyarrow"),
            "__gid", pos_ds, "doc_id", "pos_key").map_batches(
            restore, batch_format="pyarrow")

    def add_shard_key(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column("__shard", pa.array([], pa.int64()))
        # the bucketed-join path's null padding can surface pos_key as
        # float64 (pandas groupby-shuffle int-with-nulls promotion);
        # values are < 2^51 so the int64 cast is exact
        pos = t["pos_key"].to_numpy(zero_copy_only=False)\
            .astype(np.int64)
        t = t.set_column(t.schema.get_field_index("pos_key"),
                         "pos_key", pa.array(pos))
        ab = pos >> np.int64(40)
        chunk = (pos >> np.int64(10)) & np.int64((1 << 30) - 1)
        chunk = chunk // np.int64(batches_per_shard)
        return t.append_column(
            "__shard", pa.array((ab << np.int64(30)) | chunk))

    keyed = tagged.map_batches(add_shard_key, batch_format="pyarrow")

    import pandas as pd

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for sk, rows in g.groupby("__shard", sort=True):
            rows = rows.sort_values("pos_key")
            ab = int(sk) >> 30
            chunk = int(sk) & ((1 << 30) - 1)
            name = f"packed-ab{ab - 512:+03d}-{chunk:06d}.tar"
            tbl = pa.Table.from_pandas(
                rows.drop(columns=["pos_key", "__shard"]),
                preserve_index=False)
            path = os.path.join(out_dir, name)
            tmp = path + ".tmp"
            ids = tbl["image_id"].to_pylist()
            blobs = tbl["bytes"].to_pylist()
            caps = tbl["caption"].to_pylist() \
                if "caption" in tbl.column_names else [""] * len(ids)
            meta_cols = {c: tbl[c].to_pylist()
                         for c in ("w", "h", "fmt", "phash")
                         if c in tbl.column_names}
            with tarfile.open(tmp, "w") as tf:
                for i, key in enumerate(ids):
                    _tar_add(tf, f"{key}.img", blobs[i] or b"")
                    _tar_add(tf, f"{key}.txt",
                             (caps[i] or "").encode("utf-8"))
                    meta = {c: v[i] for c, v in meta_cols.items()}
                    _tar_add(tf, f"{key}.json",
                             json.dumps(meta,
                                        sort_keys=True).encode("utf-8"))
            os.replace(tmp, path)
            outs.append((name, len(ids), os.path.getsize(path)))
        return pd.DataFrame(outs, columns=["shard", "rows", "bytes"]) \
            if outs else pd.DataFrame({"shard": pd.Series(dtype=str),
                                       "rows": pd.Series(dtype=np.int64),
                                       "bytes": pd.Series(dtype=np.int64)})

    from ..stages.join import bucketed_group_apply
    manifest = bucketed_group_apply(keyed, "__shard", write_group)
    parts = [b for b in manifest.iter_batches(batch_size=None,
                                              batch_format="pyarrow")
             if b.num_rows]
    out = pa.concat_tables(parts) if parts else pa.table({
        "shard": pa.array([], pa.string()),
        "rows": pa.array([], pa.int64()),
        "bytes": pa.array([], pa.int64())})
    out = out.sort_by("shard")
    mpath = os.path.join(out_dir, "_manifest.json")
    with open(mpath + ".tmp", "w", encoding="utf-8") as f:
        json.dump({"shards": out["shard"].to_pylist(),
                   "rows": out["rows"].to_pylist(),
                   "bytes": out["bytes"].to_pylist(),
                   "batch_size": batch_size,
                   "batches_per_shard": batches_per_shard}, f, indent=1)
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

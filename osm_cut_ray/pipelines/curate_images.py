"""End-to-end image-corpus curation: the composed pipeline the
north_star's 10^12-row image+caption table actually runs, combining
both graft axes — the SPATIAL gate (ray-casting PIP on the phash
geotag, reference semantics from src/osm_process_complete.erl:67-83)
and the IMAGE-payload hygiene family (exact dup, perceptual-hash
near-dup, quality scores, caption gates, thumbnail resize).

Same two-phase shape as `pipelines/curate.py` (documents):

1. GLOBAL DECISION PASSES over slim projections — exact-dup
   non-representatives (md5 of the encoded bytes, bucketed keep-min
   groups) and aHash near-dup non-representatives (banded Hamming
   pairs -> connected components, keep min id). Only (id, hash) pairs
   transit these shuffles; image bytes never do.
2. A PER-SHARD RESUMABLE REWRITE (`state/checkpoint.py` manifests)
   streaming every shard through ONE `map_batches` stage that applies
   every per-row gate in cheap-to-expensive order — broadcast drop-id
   anti-join and polygon test and caption gates BEFORE the decode, so
   blobs of dropped rows are never decompressed — then decodes the
   survivors once, applies the pixel-quality gate, and (optionally)
   thumbnails them in the same pass. Output keeps the exact
   input_hint schema, so curated shards compose with every other
   image stage.

The drop-id set and compiled polygon broadcast once via `ray.put`
(zero-copy numpy rehydrate per worker), never per batch.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..geometry.polygon import PolygonIndex
from ..sources.images import encode_image
from ..sources.tables import strip_schema_metadata
from ..stages import join as J
from ..stages.dedup import _spread, dup_clusters
from ..stages.image_dedup import image_dup_pairs
from ..stages.image_quality import decode_by_shape, quality_keep_mask, \
    quality_stack
from ..stages.text import CJK_RE, LANG_RES, TOKEN_RE
from ..state.checkpoint import run_resumable

EMPTY_HINT = pa.table({
    "image_id": pa.array([], pa.string()),
    "bytes": pa.array([], pa.binary()),
    "w": pa.array([], pa.int32()), "h": pa.array([], pa.int32()),
    "fmt": pa.array([], pa.string()),
    "caption": pa.array([], pa.string()),
    "phash": pa.array([], pa.int64()),
})


def parse_image_ids(col: pa.Array, id_prefix_len: int = 3) -> np.ndarray:
    """'img%08d'-convention image_id column -> int64 ids (the same
    parse `stages/image_dedup.py:image_fingerprints` uses)."""
    import pyarrow.compute as pc
    return pc.cast(pc.utf8_slice_codeunits(
        col, id_prefix_len, np.iinfo(np.int32).max),
        pa.int64()).to_numpy(zero_copy_only=False)


def _collect_ids(ds) -> np.ndarray:
    ids = [b["doc_id"].to_numpy(zero_copy_only=False)
           for b in ds.iter_batches(batch_size=None, batch_format="pyarrow")
           if b.num_rows]
    return np.concatenate(ids).astype(np.int64) if ids \
        else np.array([], np.int64)


def exact_dup_image_drop_ids(images_ds, *,
                             id_prefix_len: int = 3) -> np.ndarray:
    """Image ids whose encoded bytes are byte-identical to a smaller
    id's. md5-low64 per batch; one bucketed keep-min group pass —
    only (hash, id) transits the shuffle."""
    def h(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "image_id" not in t.column_names:
            return pa.table({"h": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64())})
        hs = np.fromiter(
            (int.from_bytes(hashlib.md5(b).digest()[8:], "little")
             for b in t["bytes"].to_pylist()),
            np.uint64, len(t))
        return pa.table({
            "h": pa.array(hs.view(np.int64)),
            "doc_id": pa.array(parse_image_ids(t["image_id"],
                                               id_prefix_len))})

    hashed = _spread(images_ds).map_batches(h, batch_format="pyarrow")

    def drops(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64)})
        g = g.sort_values(["h", "doc_id"])
        dup = g["h"].to_numpy() == np.roll(g["h"].to_numpy(), 1)
        dup[0] = False
        return pd.DataFrame({"doc_id": g["doc_id"].to_numpy()[dup]})

    return _collect_ids(J.bucketed_group_apply(hashed, "h", drops))


def near_dup_image_drop_ids(images_ds, *, hamming_threshold: int = 3,
                            id_prefix_len: int = 3) -> np.ndarray:
    """Non-representative members of perceptual-hash near-dup clusters
    (keep the min id of each connected component)."""
    pairs = image_dup_pairs(images_ds,
                            hamming_threshold=hamming_threshold,
                            id_prefix_len=id_prefix_len)
    if len(pairs) == 0:
        return np.array([], np.int64)
    cl = dup_clusters(pairs)
    doc = cl["doc_id"].to_numpy(zero_copy_only=False)
    rep = cl["cluster_id"].to_numpy(zero_copy_only=False)
    return doc[doc != rep].astype(np.int64)


class ImageCurateStage:
    """The per-shard single-pass gate+rewrite stage.

    Gate order is cheap-to-expensive so dropped rows are never
    decoded: (1) broadcast drop-id anti-join, (2) polygon PIP on the
    phash geotag (include-ring bbox pre-mask, then the y-band CSR
    kernel), (3) caption token-count + language allow-list, (4) decode
    survivors once, pixel-quality gate, (5) optional thumbnail resize
    reusing the already-decoded pixels. Emits the input_hint schema.

    Broadcast state (drop ids, compiled polygon) is hydrated from
    `ray.put` refs once per worker — zero-copy numpy views."""

    def __init__(self, *, drop_ref=None, index_ref=None,
                 langs: tuple[str, ...] = ("en",),
                 min_caption_tokens: int = 2,
                 min_entropy: float = 0.5, min_contrast: float = 0.01,
                 max_extreme_frac: float = 0.9,
                 min_brightness: float = 0.02,
                 max_brightness: float = 0.98,
                 min_clip_score: float | None = None,
                 resize_target: int | None = None,
                 id_prefix_len: int = 3):
        def _get(ref):
            return ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        self.drop = _get(drop_ref)
        self.idx: PolygonIndex | None = _get(index_ref)
        self.langs = tuple(langs)
        self.min_caption_tokens = min_caption_tokens
        self.q = dict(min_entropy=min_entropy, min_contrast=min_contrast,
                      max_extreme_frac=max_extreme_frac,
                      min_brightness=min_brightness,
                      max_brightness=max_brightness)
        self.min_clip_score = min_clip_score
        self.resize_target = resize_target
        self.id_prefix_len = id_prefix_len

    def _caption_keep(self, captions: pd.Series) -> np.ndarray:
        n_tok = captions.str.count(TOKEN_RE).to_numpy()
        low = captions.str.lower()
        counts = {k: low.str.count(v).to_numpy()
                  for k, v in LANG_RES.items()}
        c_zh = captions.str.count(CJK_RE).to_numpy()
        en, de, fr, es = (counts["en"], counts["de"], counts["fr"],
                          counts["es"])
        lang = np.select(               # == stages.text.LangId
            [c_zh > 0,
             (en >= de) & (en >= fr) & (en >= es),
             (de >= fr) & (de >= es),
             fr >= es],
            ["zh", "en", "de", "fr"], default="es")
        return np.isin(lang, list(self.langs)) \
            & (n_tok >= self.min_caption_tokens)

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..geometry.geotag import decode_geotag
        from ..sources.images import resize_stack
        if len(t) == 0 or "image_id" not in t.column_names:
            return EMPTY_HINT
        keep = np.ones(len(t), bool)
        if self.drop is not None and len(self.drop):
            ids = parse_image_ids(t["image_id"], self.id_prefix_len)
            keep &= ~np.isin(ids, self.drop)
        if self.idx is not None:
            lon, lat = decode_geotag(
                t["phash"].to_numpy(zero_copy_only=False))
            xmin, ymin, xmax, ymax = self.idx.bbox
            cand = keep & (lon >= xmin) & (lon <= xmax) \
                & (lat >= ymin) & (lat <= ymax)
            inside = np.zeros(len(t), bool)
            if cand.any():
                inside[cand] = self.idx.contains(lon[cand], lat[cand])
            keep &= inside
        if keep.any():
            cap = pd.Series(t["caption"].to_pylist()).astype(str)
            keep &= self._caption_keep(cap)
        t = t.filter(pa.array(keep))
        if len(t) == 0:
            return EMPTY_HINT
        # decode ONCE for quality gate + clip gate + optional resize
        pixels, by_shape = decode_by_shape(t["bytes"].to_pylist())
        qkeep = np.ones(len(t), bool)
        for _, idxs in by_shape.items():
            idx = np.asarray(idxs, np.int64)
            scores = quality_stack(np.stack([pixels[i] for i in idxs]))
            qkeep[idx] = quality_keep_mask(scores, **self.q)
        if self.min_clip_score is not None:
            from ..stages.image_embed import EMBED_DIM, embed_captions, \
                embed_stack
            ie = np.empty((len(t), EMBED_DIM), np.float64)
            for _, idxs in by_shape.items():
                idx = np.asarray(idxs, np.int64)
                ie[idx] = embed_stack(np.stack([pixels[i] for i in idxs]))
            ce = embed_captions([c if c is not None else ""
                                 for c in t["caption"].to_pylist()])
            qkeep &= (ie * ce).sum(axis=1) >= self.min_clip_score
        if self.resize_target is None:
            out = t.filter(pa.array(qkeep))
            return out if len(out) else EMPTY_HINT
        # thumbnail the survivors from the already-decoded pixels
        kept = np.flatnonzero(qkeep)
        if len(kept) == 0:
            return EMPTY_HINT
        fmts = t["fmt"].to_pylist()
        bufs = t["bytes"].to_pylist()
        out_bufs: list = [None] * len(kept)
        out_w = np.empty(len(kept), np.int32)
        out_h = np.empty(len(kept), np.int32)
        pos = {int(i): j for j, i in enumerate(kept)}
        tgt = self.resize_target
        for (h, w), idxs in by_shape.items():
            live = [i for i in idxs if i in pos]
            if not live:
                continue
            side = max(h, w)
            if side <= tgt:
                for i in live:
                    out_bufs[pos[i]] = bufs[i]      # byte passthrough
                    out_h[pos[i]], out_w[pos[i]] = h, w
                continue
            oh = max(1, (h * tgt + side // 2) // side)
            ow = max(1, (w * tgt + side // 2) // side)
            small = resize_stack(np.stack([pixels[i] for i in live]),
                                 oh, ow)
            for j, i in enumerate(live):
                out_bufs[pos[i]] = encode_image(small[j], fmts[i])
                out_h[pos[i]], out_w[pos[i]] = oh, ow
        sel = t.take(pa.array(kept))
        return pa.table({
            "image_id": sel["image_id"],
            "bytes": pa.array(out_bufs, pa.binary()),
            "w": pa.array(out_w), "h": pa.array(out_h),
            "fmt": sel["fmt"], "caption": sel["caption"],
            "phash": sel["phash"],
        })


def curate_images(input_paths, out_dir: str, *,
                  polygon: PolygonIndex | None = None,
                  hamming_threshold: int = 3,
                  langs: tuple[str, ...] = ("en",),
                  min_caption_tokens: int = 2,
                  min_entropy: float = 0.5, min_contrast: float = 0.01,
                  max_extreme_frac: float = 0.9,
                  min_brightness: float = 0.02,
                  max_brightness: float = 0.98,
                  min_clip_score: float | None = None,
                  resize_target: int | None = None,
                  ref_index=None, ref_hamming: int = 3,
                  id_prefix_len: int = 3) -> dict:
    """Curate an input_hint-shaped image corpus into `out_dir` (one
    parquet directory per input shard, manifest-last checkpoints).
    Returns the resume report extended with per-cause drop counters.

    input_paths: list of parquet shard paths, each with the exact
    input_hint columns; image ids must be globally unique."""
    cols = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    images = strip_schema_metadata(
        rd.read_parquet(list(input_paths), columns=cols))

    exact = exact_dup_image_drop_ids(images, id_prefix_len=id_prefix_len)
    near = near_dup_image_drop_ids(images,
                                   hamming_threshold=hamming_threshold,
                                   id_prefix_len=id_prefix_len)
    ref_dups = np.array([], np.int64)
    if ref_index is not None:
        # cross-corpus gate (stages/image_dedup.py:RefFpIndex): one
        # more global SLIM pass — fingerprints probe the broadcast
        # index map-side and only dup ids reach the driver, so the
        # per-shard rewrite keeps its single decode pass
        from ..stages.image_dedup import image_fingerprints
        idx_ref = ray.put(ref_index)

        def probe(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return pa.table({"doc_id": pa.array([], pa.int64())})
            idx = ray.get(idx_ref)
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            fps = t["fp"].to_numpy(zero_copy_only=False)
            hit, _ref, trunc = idx.query(fps, ref_hamming)
            if trunc:
                print(f"curate_images ref gate: {trunc} candidates "
                      f"truncated")
            return pa.table({"doc_id": pa.array(
                ids[hit].astype(np.int64))})

        hits = image_fingerprints(images, id_prefix_len=id_prefix_len) \
            .map_batches(probe, batch_format="pyarrow")
        parts = [b["doc_id"].to_numpy(zero_copy_only=False)
                 for b in hits.iter_batches(batch_size=None,
                                            batch_format="pyarrow")
                 if b.num_rows]
        ref_dups = np.concatenate(parts).astype(np.int64) if parts \
            else np.array([], np.int64)
    drop = np.unique(np.concatenate([exact, near, ref_dups])) \
        if len(exact) + len(near) + len(ref_dups) \
        else np.array([], np.int64)
    drop_ref = ray.put(drop)
    index_ref = ray.put(polygon) if polygon is not None else None

    params = {"hamming_threshold": hamming_threshold,
              "langs": list(langs),
              "min_caption_tokens": min_caption_tokens,
              "min_entropy": min_entropy, "min_contrast": min_contrast,
              "max_extreme_frac": max_extreme_frac,
              "min_brightness": min_brightness,
              "max_brightness": max_brightness,
              "min_clip_score": min_clip_score,
              "resize_target": resize_target,
              "polygon_bbox": list(polygon.bbox) if polygon else None,
              "ref_hamming": ref_hamming if ref_index is not None
              else None,
              "n_ref": int(len(ref_index.ids))
              if ref_index is not None else None}

    def process(path: str):
        shard = strip_schema_metadata(rd.read_parquet(path, columns=cols))
        stage = dict(drop_ref=drop_ref, index_ref=index_ref,
                     langs=langs, min_caption_tokens=min_caption_tokens,
                     min_entropy=min_entropy, min_contrast=min_contrast,
                     max_extreme_frac=max_extreme_frac,
                     min_brightness=min_brightness,
                     max_brightness=max_brightness,
                     min_clip_score=min_clip_score,
                     resize_target=resize_target,
                     id_prefix_len=id_prefix_len)

        def fn(t: pa.Table) -> pa.Table:
            return ImageCurateStage(**stage)(t)

        return shard.map_batches(fn, batch_format="pyarrow")

    shards = [(os.path.splitext(os.path.basename(p))[0] or f"s{i}", p)
              for i, p in enumerate(input_paths)]
    report = run_resumable(shards, process, out_dir, params=params)
    report["n_drop_exact_dup"] = int(len(exact))
    report["n_drop_near_dup"] = int(len(near))
    report["n_drop_ref_dup"] = int(len(ref_dups))
    return report

"""Flagship pipeline (north_star shape): stream the image+caption
corpus, decode geotags from phash, assign H3-style hex (res 7-9) + S2
cells, run PIP against the cut polygon in an actor pool, keep contained
rows.

Lifecycle mirrors SURVEY §3.4: config -> build polygon index (driver)
-> read -> map_batches chain (decode geotag -> assign cells -> PIP
actor pool) -> filter -> write/collect.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..geometry.polygon import PolygonIndex
from ..sources.images import images_batch_from_keys
from ..sources.tables import sf_path
from ..stages.cells import assign_cells
from ..stages.pip import apply_pip
from . import derive as D
from ..state.checkpoint import run_resumable


def image_corpus(sf_dir: str, include_bytes: bool = True):
    """input_hint-shaped corpus synthesized from lineitem keys."""
    li = rd.read_parquet(sf_path(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_linenumber"])

    def build(t: pa.Table) -> pa.Table:
        return images_batch_from_keys(D.image_ids_from_lineitem(t),
                                      with_bytes=include_bytes)

    return li.map_batches(build, batch_format="pyarrow")


def flagship(sf_dir: str, *, polygon: PolygonIndex | None = None,
             concurrency=None, include_bytes: bool = False,
             s2_level: int = 12, hex_resolutions=(7, 8, 9)):
    """Returns the contained rows with cell columns attached.

    `include_bytes=False` keeps the wide binary column out of the
    PIP/shuffle path (SURVEY §7.4: payloads never transit shuffles;
    re-attach by image_id when needed).
    """
    polygon = polygon or PolygonIndex.compile([("include", D.PENTAGON)])
    corpus = image_corpus(sf_dir, include_bytes=include_bytes)
    tagged = corpus.map_batches(
        lambda t: assign_cells(t, from_phash=True, s2_level=s2_level,
                               hex_resolutions=hex_resolutions),
        batch_format="pyarrow")
    flagged = apply_pip(tagged, polygon, concurrency=concurrency)
    return flagged.map_batches(lambda t: t.filter(t["inside"]),
                               batch_format="pyarrow")


def flagship_resumable(sf_dir: str, out_dir: str, *, polygon=None,
                       params_version: str = "flagship-v1") -> dict:
    """Checkpointed flagship run: one output partition per input shard
    (here: per source parquet file; at production scale, per Lance
    fragment / file group). A re-run skips shards whose manifest
    matches the input fingerprint + params (north_rule resumability).
    """
    import glob
    import os
    shards = [(os.path.splitext(os.path.basename(p))[0] + f"-{i}", p)
              for i, p in enumerate(sorted(glob.glob(
                  os.path.join(sf_dir, "lineitem*.parquet"))))]

    def process(path: str):
        li = rd.read_parquet(path, columns=["l_orderkey", "l_linenumber"])
        poly = polygon or PolygonIndex.compile([("include", D.PENTAGON)])
        from ..sources.images import images_batch_from_keys
        corpus = li.map_batches(
            lambda t: images_batch_from_keys(
                D.image_ids_from_lineitem(t), with_bytes=False),
            batch_format="pyarrow")
        tagged = corpus.map_batches(
            lambda t: assign_cells(t, from_phash=True),
            batch_format="pyarrow")
        flagged = apply_pip(tagged, poly)
        return flagged.map_batches(lambda t: t.filter(t["inside"]),
                                   batch_format="pyarrow")

    return run_resumable(shards, process, out_dir,
                         params={"version": params_version})

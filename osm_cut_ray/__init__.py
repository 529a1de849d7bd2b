"""osm_cut_ray — a Ray-Data-native spatial cut + tiling engine.

A from-scratch rebuild of the capabilities of the reference engine
(borovsky/osm-cut, an Erlang streaming polygon-cut tool) re-expressed as
idiomatic Ray Data pipelines:

- ``geometry``   — pure-numpy polygon compile + vectorized ray-cast PIP
                   (exact reference tie rules), S2 / hex cell indexers.
- ``sources``    — parquet/lance table readers, synthetic image corpus,
                   OSM-shaped fixture tables, .poly file parser.
- ``stages``     — ``map_batches``-ready transforms: PIP actor pool, cell
                   assignment, kNN, dedup family, text analysis, image
                   decode plumbing, windowed aggregates.
- ``pipelines``  — the flagship cut pipelines (complete / non-complete
                   object retention), spatial joins, derivations.
- ``state``      — per-partition checkpoint manifests + resume.

Reference semantics are cited per-function as ``file:line`` into
``/root/reference`` (read-only). No code is copied from the reference —
it is an Erlang codebase; everything here is written Ray-Data-first.
"""

__version__ = "0.1.0"

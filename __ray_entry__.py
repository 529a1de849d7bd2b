"""Driver contract for the osm_cut_ray engine (Ray Data target).

The driver initialises Ray BEFORE importing this module; nothing here
(nor in the library) calls ray.init()/ray.shutdown().

- entry(): flagship image-corpus cut pipeline at sf0.001.
- queries(): every implemented operator/pipeline from SURVEY.md §2 as
  `name -> callable(sf_dir)`.
- oracle_sql(): matching DuckDB SQL for the SQL-expressible subset
  (non-SQL ops — codec, LSH internals, approximate kNN — are
  rows-only by design and verified in tests/ instead).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: image corpus -> geotag decode -> cell assign -> PIP cut."""
    from osm_cut_ray.pipelines.flagship import flagship
    return flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from osm_cut_ray.pipelines.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from osm_cut_ray.pipelines.queries import ORACLES
    return dict(ORACLES)

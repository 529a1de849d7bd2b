"""Tag editing — pinned against a per-row Python replay."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from osm_cut_ray.stages.tag_edit import edit_tags


def _tags_table(rows):
    tags_t = pa.map_(pa.large_string(), pa.large_string())
    return pa.table({
        "id": pa.array(range(1, len(rows) + 1), pa.int64()),
        "tags": pa.array(rows, tags_t)})


ROWS = [
    [("highway", "residential"), ("name", "A St")],
    [("building", "yes")],
    [],
    [("highway", "service"), ("oneway", "yes"), ("name", "B Rd")],
    [("landuse", "grass")],
]


def _replay(rows, rename, drop, set_tags):
    out = []
    for r in rows:
        pairs = [(rename.get(k, k), v) for k, v in r]
        gone = set(drop) | set(set_tags)
        pairs = [(k, v) for k, v in pairs if k not in gone]
        pairs += sorted(set_tags.items())
        out.append(pairs)
    return out


@pytest.mark.parametrize("rename,drop,set_tags", [
    ({"highway": "road"}, [], {}),
    ({}, ["name"], {}),
    ({}, [], {"source": "import", "checked": "yes"}),
    ({"landuse": "land"}, ["oneway"], {"highway": "path"}),
])
def test_matches_replay(ray_session, rename, drop, set_tags):
    ds = ray.data.from_arrow(_tags_table(ROWS)).repartition(3)
    got = edit_tags(ds, rename=rename, drop=drop,
                    set_tags=set_tags).to_pandas()\
        .sort_values("id").reset_index(drop=True)
    exp = _replay(ROWS, rename, drop, set_tags)
    for i, pairs in enumerate(exp):
        g = [(k, v) for k, v in got.loc[i, "tags"]]
        assert g == pairs, (i, g, pairs)


def test_noop_returns_input(ray_session):
    ds = ray.data.from_arrow(_tags_table(ROWS))
    got = edit_tags(ds).to_pandas()
    for i, r in enumerate(ROWS):
        assert [(k, v) for k, v in got.loc[i, "tags"]] == r


def test_fixture_ways_roundtrip(ray_session):
    from osm_cut_ray.sources.osm_fixture import fixture_ways
    ds = ray.data.from_arrow(fixture_ways()).repartition(2)
    before = {r["id"]: dict(r["tags"] or [])
              for r in fixture_ways().to_pylist()}
    got = edit_tags(ds, set_tags={"audited": "r5"}).to_pandas()
    for r in got.itertuples():
        d = dict(r.tags)
        assert d.pop("audited") == "r5"
        assert d == before[int(r.id)]

"""The reference end-to-end golden fixture as Arrow tables.

Mirrors /root/reference/test/processor_SUITE_data/osm/1.osm (6 nodes,
2 ways, 4 relations) and poly/simple.poly (triangle (0,0) (5,0) (10,5))
so the golden assertions from test/processor_SUITE.erl:176-264 port 1:1
(see FIXTURES.md §2/§5).
"""

from __future__ import annotations

import pyarrow as pa

NODE_SCHEMA = pa.schema([
    ("id", pa.int64()),
    ("lon", pa.float64()),
    ("lat", pa.float64()),
    ("tags", pa.map_(pa.large_string(), pa.large_string())),
])

WAY_SCHEMA = pa.schema([
    ("id", pa.int64()),
    ("node_ids", pa.list_(pa.int64())),
    ("tags", pa.map_(pa.large_string(), pa.large_string())),
])

REL_SCHEMA = pa.schema([
    ("id", pa.int64()),
    ("members", pa.list_(pa.struct([
        ("type", pa.large_string()),
        ("ref", pa.int64()),
        ("role", pa.large_string()),
    ]))),
    ("tags", pa.map_(pa.large_string(), pa.large_string())),
])


def fixture_nodes() -> pa.Table:
    # 1.osm:3-13
    rows = [
        (1, 0.0, 0.0, []),
        (2, 5.0, 0.0, []),
        (3, 10.0, 5.0, [("name", "Node3"), ("amenity", "pub")]),
        (4, 10.0, 10.0, [("barrier", "gate")]),
        (5, 0.0, 10.0, []),
        (6, 15.0, 15.0, []),
    ]
    return pa.table({
        "id": [r[0] for r in rows],
        "lon": [r[1] for r in rows],
        "lat": [r[2] for r in rows],
        "tags": [r[3] for r in rows],
    }, schema=NODE_SCHEMA)


def fixture_ways() -> pa.Table:
    # 1.osm:15-27: way 1 = [1,2,3,4,1]; way 2 = [4]
    return pa.table({
        "id": [1, 2],
        "node_ids": [[1, 2, 3, 4, 1], [4]],
        "tags": [[("access", "private"), ("highway", "service")], []],
    }, schema=WAY_SCHEMA)


def fixture_relations() -> pa.Table:
    # 1.osm:29-49
    members = [
        [{"type": "way", "ref": 1, "role": "outer"},
         {"type": "node", "ref": 6, "role": "admin_centre"}],
        [{"type": "node", "ref": 4, "role": ""}],
        [{"type": "way", "ref": 2, "role": ""}],
        [{"type": "relation", "ref": 2, "role": ""},
         {"type": "relation", "ref": 3, "role": ""}],
    ]
    tags = [
        [("admin_level", "8"), ("boundary", "administrative"),
         ("name", "Warsaw"), ("type", "boundary")],
        [], [], [],
    ]
    return pa.table({"id": [1, 2, 3, 4], "members": members, "tags": tags},
                    schema=REL_SCHEMA)


# simple.poly triangle (processor_SUITE_data/poly/simple.poly:1-7)
FIXTURE_POLY = [("include", [(0.0, 0.0), (5.0, 0.0), (10.0, 5.0)])]

import numpy as np
import pyarrow as pa

NODE_SCHEMA = pa.schema([("id", pa.int64()), ("lon", pa.float64()),
                         ("lat", pa.float64())])
WAY_SCHEMA = pa.schema([("id", pa.int64()),
                        ("node_ids", pa.list_(pa.int64()))])
MEM = pa.struct([("type", pa.large_string()), ("ref", pa.int64()),
                 ("role", pa.large_string())])
REL_SCHEMA = pa.schema([("id", pa.int64()),
                        ("members", pa.list_(MEM))])

NODE_CHG = NODE_SCHEMA.append(pa.field("op", pa.large_string())) \
    .append(pa.field("seq", pa.int64()))
WAY_CHG = WAY_SCHEMA.append(pa.field("op", pa.large_string())) \
    .append(pa.field("seq", pa.int64()))
REL_CHG = REL_SCHEMA.append(pa.field("op", pa.large_string())) \
    .append(pa.field("seq", pa.int64()))


def _poly():
    from osm_cut_ray.geometry.polygon import PolygonIndex
    return PolygonIndex.compile(
        [("include", [(2.0, 2.0), (8.0, 2.0), (8.0, 8.0),
                      (2.0, 8.0)])])


def _corpus(rng, n=200, m=60, r=10):
    ids = np.arange(1, n + 1, dtype=np.int64)
    nodes = pa.table({
        "id": ids,
        "lon": rng.uniform(-2, 12, n),
        "lat": rng.uniform(-2, 12, n)}, schema=NODE_SCHEMA)
    ways = pa.Table.from_pylist([
        {"id": int(w),
         "node_ids": rng.choice(
             ids, size=int(rng.integers(2, 7)),
             replace=False).tolist()}
        for w in range(1, m + 1)], schema=WAY_SCHEMA)
    rels = pa.Table.from_pylist([
        {"id": int(k),
         "members": [
             {"type": "node", "ref": int(rng.integers(1, n + 1)),
              "role": ""},
             {"type": "way", "ref": int(rng.integers(1, m + 1)),
              "role": "outer"}]
         + ([{"type": "relation", "ref": int(rng.integers(1, k)),
              "role": "sub"}] if k > 1 and rng.random() < 0.4
            else [])}
        for k in range(1, r + 1)], schema=REL_SCHEMA)
    return nodes, ways, rels


def _to_table(ds, schema):
    bs = [pa.table(b)
          for b in ds.iter_batches(batch_format="pyarrow")]
    if not bs:
        return schema.empty_table()
    t = pa.concat_tables(bs)
    return pa.table({f.name: t[f.name].combine_chunks().cast(f.type)
                     for f in schema})


def _empty_change():
    return {"node": NODE_CHG.empty_table(),
            "way": WAY_CHG.empty_table(),
            "relation": REL_CHG.empty_table()}


def _assert_state_equals_fresh(ray_session, state, nodes_t, ways_t,
                               rels_t, poly):
    import ray.data as rd

    from osm_cut_ray.pipelines.cut_incremental import build_cut_state

    fresh, _ = build_cut_state(rd.from_arrow(nodes_t),
                               rd.from_arrow(ways_t),
                               rd.from_arrow(rels_t), poly)
    assert np.array_equal(state.inside_ids, fresh.inside_ids)
    assert np.array_equal(state.way_ids, fresh.way_ids)
    assert np.array_equal(state.ref_ids, fresh.ref_ids)
    assert np.array_equal(state.ref_cnt, fresh.ref_cnt)
    assert np.array_equal(state.rel_ids, fresh.rel_ids)


def _apply_tables(nodes_t, ways_t, rels_t, change):
    import ray.data as rd

    from osm_cut_ray.sources.osm_change import apply_change

    out = []
    for t, schema, kind in ((nodes_t, NODE_SCHEMA, "node"),
                            (ways_t, WAY_SCHEMA, "way"),
                            (rels_t, REL_SCHEMA, "relation")):
        ds = rd.from_arrow(t)
        if change[kind].num_rows:
            ds = apply_change(ds, change[kind])
        out.append(_to_table(ds, schema))
    return tuple(out)


def test_build_cut_state_matches_cut(ray_session):
    import ray.data as rd

    from osm_cut_ray.pipelines.cut import cut
    from osm_cut_ray.pipelines.cut_incremental import build_cut_state

    rng = np.random.default_rng(12)
    nodes_t, ways_t, rels_t = _corpus(rng)
    poly = _poly()
    state, result = build_cut_state(
        rd.from_arrow(nodes_t), rd.from_arrow(ways_t),
        rd.from_arrow(rels_t), poly)
    full = cut(rd.from_arrow(nodes_t), rd.from_arrow(ways_t),
               rd.from_arrow(rels_t), poly, complete=True)
    assert np.array_equal(np.sort(state.node_ids()),
                          np.sort(full.node_ids))
    assert np.array_equal(np.sort(state.way_ids),
                          np.sort(full.way_ids))
    assert np.array_equal(np.sort(state.rel_ids),
                          np.sort(full.rel_ids))
    assert result.nodes.count() == len(
        np.intersect1d(full.node_ids,
                       nodes_t["id"].to_numpy()))


def test_incremental_scripted_ops(ray_session):
    import ray.data as rd

    from osm_cut_ray.pipelines.cut_incremental import (
        apply_osc_to_cut, build_cut_state)

    rng = np.random.default_rng(77)
    nodes_t, ways_t, rels_t = _corpus(rng)
    poly = _poly()
    state, _ = build_cut_state(rd.from_arrow(nodes_t),
                               rd.from_arrow(ways_t),
                               rd.from_arrow(rels_t), poly)

    # scripted ops: node moves in/out, node create in/out, node
    # delete (incl. one still referenced by a kept way), way
    # create/modify/delete, relation create/delete
    kept_way = int(state.way_ids[0])
    ref_node = int(state.ref_ids[0])
    inside_node = int(state.inside_ids[0])
    outside_pool = np.setdiff1d(
        nodes_t["id"].to_numpy(), state.node_ids())
    outside_node = int(outside_pool[0]) if len(outside_pool) \
        else int(nodes_t["id"][0].as_py())
    change = {
        "node": pa.Table.from_pylist([
            {"id": inside_node, "lon": -1.0, "lat": -1.0,
             "op": "modify", "seq": 0},              # moves OUT
            {"id": outside_node, "lon": 5.0, "lat": 5.0,
             "op": "modify", "seq": 1},              # moves IN
            {"id": 9001, "lon": 4.0, "lat": 4.0,
             "op": "create", "seq": 2},              # new inside
            {"id": 9002, "lon": -3.0, "lat": -3.0,
             "op": "create", "seq": 3},              # new outside
            {"id": ref_node, "op": "delete", "seq": 4,
             "lon": float("nan"), "lat": float("nan")},
        ], schema=NODE_CHG),
        "way": pa.Table.from_pylist([
            {"id": 7001, "node_ids": [9001, 9002],
             "op": "create", "seq": 5},              # kept (9001 in)
            {"id": kept_way, "node_ids": [9002],
             "op": "modify", "seq": 6},              # likely leaves
            {"id": int(state.way_ids[-1]), "op": "delete",
             "node_ids": [], "seq": 7},
        ], schema=WAY_CHG),
        "relation": pa.Table.from_pylist([
            {"id": 501, "members": [
                {"type": "way", "ref": 7001, "role": ""}],
             "op": "create", "seq": 8},
        ], schema=REL_CHG),
    }

    new_nodes, new_ways, new_rels = _apply_tables(
        nodes_t, ways_t, rels_t, change)
    new_state, delta, result = apply_osc_to_cut(
        rd.from_arrow(new_nodes), rd.from_arrow(new_ways),
        rd.from_arrow(new_rels), rd.from_arrow(ways_t),
        change, poly, state)
    _assert_state_equals_fresh(ray_session, new_state, new_nodes,
                               new_ways, new_rels, poly)
    # the created way + its inside node entered; relation 501 kept
    assert 7001 in new_state.way_ids
    assert 9001 in new_state.inside_ids
    assert 501 in new_state.rel_ids
    # delta consistency: old ± delta == new
    assert np.array_equal(
        np.union1d(np.setdiff1d(state.node_ids(),
                                delta["nodes_removed"]),
                   delta["nodes_added"]),
        new_state.node_ids())
    assert np.array_equal(
        np.union1d(np.setdiff1d(state.way_ids,
                                delta["ways_removed"]),
                   delta["ways_added"]),
        new_state.way_ids)
    # the emitted result matches the state sets
    assert np.array_equal(np.sort(result.way_ids),
                          new_state.way_ids)


def test_incremental_randomized_two_rounds(ray_session):
    import ray.data as rd

    from osm_cut_ray.pipelines.cut_incremental import (
        apply_osc_to_cut, build_cut_state)

    poly = _poly()
    for seed in (1, 2, 3):
        rng = np.random.default_rng(seed)
        nodes_t, ways_t, rels_t = _corpus(rng, n=150, m=50, r=8)
        state, _ = build_cut_state(rd.from_arrow(nodes_t),
                                   rd.from_arrow(ways_t),
                                   rd.from_arrow(rels_t), poly)
        next_id = 10_000
        for rnd in range(2):
            node_rows, way_rows, rel_rows = [], [], []
            seq = 0
            nid = nodes_t["id"].to_numpy()
            wid = ways_t["id"].to_numpy()
            rid = rels_t["id"].to_numpy()
            for _ in range(8):  # node ops
                u = rng.random()
                if u < 0.4 and len(nid):
                    node_rows.append({
                        "id": int(rng.choice(nid)),
                        "lon": float(rng.uniform(-2, 12)),
                        "lat": float(rng.uniform(-2, 12)),
                        "op": "modify", "seq": seq})
                elif u < 0.7:
                    node_rows.append({
                        "id": next_id,
                        "lon": float(rng.uniform(-2, 12)),
                        "lat": float(rng.uniform(-2, 12)),
                        "op": "create", "seq": seq})
                    next_id += 1
                elif len(nid):
                    node_rows.append({
                        "id": int(rng.choice(nid)),
                        "lon": float("nan"), "lat": float("nan"),
                        "op": "delete", "seq": seq})
                seq += 1
            pool = np.concatenate([nid, np.arange(10_000, next_id)])
            for _ in range(4):  # way ops
                u = rng.random()
                refs = rng.choice(
                    pool, size=int(rng.integers(2, 6)),
                    replace=False).tolist()
                if u < 0.4 and len(wid):
                    way_rows.append({
                        "id": int(rng.choice(wid)),
                        "node_ids": [int(x) for x in refs],
                        "op": "modify", "seq": seq})
                elif u < 0.7:
                    way_rows.append({
                        "id": next_id,
                        "node_ids": [int(x) for x in refs],
                        "op": "create", "seq": seq})
                    next_id += 1
                elif len(wid):
                    way_rows.append({
                        "id": int(rng.choice(wid)),
                        "node_ids": [], "op": "delete", "seq": seq})
                seq += 1
            if rng.random() < 0.7 and len(rid):  # relation op
                rel_rows.append({
                    "id": int(rng.choice(rid)),
                    "members": [{"type": "node",
                                 "ref": int(rng.choice(pool)),
                                 "role": ""}],
                    "op": "modify", "seq": seq})
                seq += 1
            change = {
                "node": pa.Table.from_pylist(node_rows,
                                             schema=NODE_CHG),
                "way": pa.Table.from_pylist(way_rows,
                                            schema=WAY_CHG),
                "relation": pa.Table.from_pylist(rel_rows,
                                                 schema=REL_CHG)}
            new_nodes, new_ways, new_rels = _apply_tables(
                nodes_t, ways_t, rels_t, change)
            state, delta, _ = apply_osc_to_cut(
                rd.from_arrow(new_nodes), rd.from_arrow(new_ways),
                rd.from_arrow(new_rels), rd.from_arrow(ways_t),
                change, poly, state, emit_result=False)
            _assert_state_equals_fresh(
                ray_session, state, new_nodes, new_ways, new_rels,
                poly)
            nodes_t, ways_t, rels_t = new_nodes, new_ways, new_rels


def test_incremental_empty_change_is_identity(ray_session):
    import ray.data as rd

    from osm_cut_ray.pipelines.cut_incremental import (
        apply_osc_to_cut, build_cut_state)

    rng = np.random.default_rng(5)
    nodes_t, ways_t, rels_t = _corpus(rng, n=80, m=20, r=4)
    poly = _poly()
    state, _ = build_cut_state(rd.from_arrow(nodes_t),
                               rd.from_arrow(ways_t),
                               rd.from_arrow(rels_t), poly)
    new_state, delta, _ = apply_osc_to_cut(
        rd.from_arrow(nodes_t), rd.from_arrow(ways_t),
        rd.from_arrow(rels_t), rd.from_arrow(ways_t),
        _empty_change(), poly, state, emit_result=False)
    assert np.array_equal(new_state.inside_ids, state.inside_ids)
    assert np.array_equal(new_state.way_ids, state.way_ids)
    assert np.array_equal(new_state.ref_cnt, state.ref_cnt)
    for v in delta.values():
        assert len(v) == 0

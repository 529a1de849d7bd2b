"""stage_report — parses live Ray stats into a stage table."""

import ray

from osm_cut_ray.pipelines.explain import print_report, stage_report


def test_stage_report_live(ray_session):
    import ray.data as rd
    ds = rd.range(50_000)\
        .map_batches(lambda t: t, batch_format="pyarrow")\
        .groupby("id").count()
    t = stage_report(ds)
    names = " ".join(t["name"].to_pylist())
    assert t.num_rows >= 2
    assert "MapBatches" in names and "Aggregate" in names
    walls = [w for w in t["wall_s"].to_pylist() if w is not None]
    assert walls and all(w >= 0 for w in walls)
    # operators are ordered and unique
    ops = t["operator"].to_pylist()
    assert ops == sorted(set(ops))


def test_print_report_smoke(ray_session, capsys):
    import ray.data as rd
    print_report(rd.range(1000))
    out = capsys.readouterr().out
    assert "op" in out and "ReadRange" in out

import numpy as np
import pyarrow as pa
import pytest


def _brute_nms(boxes, iou_thr):
    """Reference greedy NMS: python loops, no vectorization.
    boxes = list of (id, x0, y0, x1, y1, score) -> set of kept ids."""

    def iou(a, b):
        iw = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
        ih = max(0.0, min(a[4], b[4]) - max(a[2], b[2]))
        inter = iw * ih
        aa = (a[3] - a[1]) * (a[4] - a[2])
        ab = (b[3] - b[1]) * (b[4] - b[2])
        return inter / (aa + ab - inter)

    kept = []
    for b in sorted(boxes, key=lambda r: (-r[5], r[0])):
        if all(iou(b, k) <= iou_thr for k in kept):
            kept.append(b)
    return {k[0] for k in kept}


def _rand_boxes(rng, n, span=40.0, max_side=1.0, tie_scores=False):
    x0 = rng.uniform(0, span, n)
    y0 = rng.uniform(0, span, n)
    w = rng.uniform(0.1, max_side, n)
    h = rng.uniform(0.1, max_side, n)
    sc = (np.round(rng.uniform(0, 1, n), 1) if tie_scores
          else rng.uniform(0, 1, n))
    ids = rng.permutation(n).astype(np.int64)
    return [(int(ids[i]), float(x0[i]), float(y0[i]),
             float(x0[i] + w[i]), float(y0[i] + h[i]), float(sc[i]))
            for i in range(n)]


def test_greedy_kernel_matches_brute():
    from osm_cut_ray.stages.nms import greedy_nms

    rng = np.random.default_rng(7)
    for trial in range(20):
        boxes = _rand_boxes(rng, int(rng.integers(1, 120)),
                            span=6.0, tie_scores=trial % 2 == 0)
        thr = float(rng.uniform(0.05, 0.7))
        a = np.array([b[1:] for b in boxes])
        ids = np.array([b[0] for b in boxes], np.int64)
        keep = greedy_nms(a[:, 0], a[:, 1], a[:, 2], a[:, 3],
                          a[:, 4], ids, thr)
        assert set(ids[keep].tolist()) == _brute_nms(boxes, thr), trial


def test_nms_per_image_matches_brute(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.nms import nms_per_image

    rng = np.random.default_rng(11)
    rows, truth = [], set()
    bid = 0
    for img in range(25):
        boxes = []
        for _ in range(int(rng.integers(0, 40))):
            x0, y0 = rng.uniform(0, 8, 2)
            w, h = rng.uniform(0.2, 2.0, 2)
            boxes.append((bid, x0, y0, x0 + w, y0 + h,
                          float(np.round(rng.uniform(0, 1), 1))))
            bid += 1
        for b in boxes:
            rows.append((img, *b))
        truth |= _brute_nms(boxes, 0.3)
    arr = np.array(rows, np.float64)
    ds = rd.from_arrow(pa.table({
        "image_id": arr[:, 0].astype(np.int64),
        "box_id": arr[:, 1].astype(np.int64),
        "x0": arr[:, 2], "y0": arr[:, 3], "x1": arr[:, 4],
        "y1": arr[:, 5], "score": arr[:, 6]})).repartition(7)
    out = nms_per_image(ds, iou_threshold=0.3)
    tab = pa.concat_tables(
        [b for b in out.iter_batches(batch_size=None,
                                     batch_format="pyarrow")
         if b.num_rows])
    assert set(tab["box_id"].to_pylist()) == truth
    assert set(tab.schema.names) == {"image_id", "box_id", "x0", "y0",
                                     "x1", "y1", "score"}


def _canvas_ds(rd, boxes):
    arr = np.array([b[1:] for b in boxes], np.float64)
    ids = np.array([b[0] for b in boxes], np.int64)
    return rd.from_arrow(pa.table({
        "box_id": ids, "x0": arr[:, 0], "y0": arr[:, 1],
        "x1": arr[:, 2], "y1": arr[:, 3],
        "score": arr[:, 4]})).repartition(5)


def test_nms_canvas_matches_global_greedy(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.nms import nms_canvas

    rng = np.random.default_rng(3)
    for trial in range(4):
        # clustered boxes force deep local conflicts ACROSS cell
        # borders; cell_size barely over max side stresses ghosting
        boxes = []
        bid = 0
        for c in range(30):
            cx, cy = rng.uniform(0, 30, 2)
            for _ in range(int(rng.integers(1, 14))):
                x0 = cx + rng.uniform(-1.2, 1.2)
                y0 = cy + rng.uniform(-1.2, 1.2)
                w, h = rng.uniform(0.3, 1.5, 2)
                boxes.append((bid, x0, y0, x0 + w, y0 + h,
                              float(np.round(rng.uniform(0, 1), 1))))
                bid += 1
        thr = float(rng.uniform(0.1, 0.5))
        out = nms_canvas(_canvas_ds(rd, boxes), iou_threshold=thr,
                         cell_size=1.6)
        tab = pa.concat_tables(
            [b for b in out.iter_batches(batch_size=None,
                                         batch_format="pyarrow")
             if b.num_rows])
        assert set(tab["box_id"].to_pylist()) == _brute_nms(boxes, thr), \
            (trial, thr)


def test_nms_canvas_chain_needs_rounds_and_raises(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.nms import nms_canvas

    # a suppression chain: box k overlaps only box k+1; scores
    # descend, so greedy keeps even indices — depth-n chain
    boxes = [(k, k * 0.6, 0.0, k * 0.6 + 1.0, 1.0, 1.0 - 0.01 * k)
             for k in range(9)]
    out = nms_canvas(_canvas_ds(rd, boxes), iou_threshold=0.2,
                     cell_size=1.05)
    tab = pa.concat_tables(list(out.iter_batches(
        batch_size=None, batch_format="pyarrow")))
    assert sorted(tab["box_id"].to_pylist()) == [0, 2, 4, 6, 8]
    with pytest.raises(RuntimeError, match="rounds exhausted"):
        nms_canvas(_canvas_ds(rd, boxes), iou_threshold=0.2,
                   cell_size=1.05, max_rounds=2)


def test_nms_canvas_cell_size_validated(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.nms import nms_canvas

    boxes = [(0, 0.0, 0.0, 5.0, 1.0, 0.9)]
    with pytest.raises(RuntimeError, match="cell_size"):
        nms_canvas(_canvas_ds(rd, boxes), iou_threshold=0.5,
                   cell_size=1.05)


def test_nms_rejects_degenerate_boxes(ray_session):
    """ADVICE r4: a zero-area box gives IoU 0/0 = NaN, and NaN
    comparisons suppress unrelated boxes — both entry points must
    validate the positive-area precondition."""
    import numpy as np
    import pytest
    import ray

    from osm_cut_ray.stages.nms import greedy_nms, nms_canvas

    with pytest.raises(ValueError, match="degenerate"):
        greedy_nms(np.array([0.0, 1.0]), np.array([0.0, 1.0]),
                   np.array([0.0, 2.0]), np.array([1.0, 2.0]),
                   np.array([0.9, 0.8]), np.array([1, 2]), 0.5)
    rows = [{"box_id": 1, "x0": 0.0, "y0": 0.0, "x1": 0.0,
             "y1": 1.0, "score": 0.9}]
    with pytest.raises(Exception, match="degenerate"):
        nms_canvas(ray.data.from_items(rows), cell_size=4.0,
                   iou_threshold=0.5).materialize()

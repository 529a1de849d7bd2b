"""Saliency-crop pins: window argmax == brute nested-loop scan,
stage schema/composability, passthrough and per-axis clamping."""

import numpy as np
import pyarrow as pa

from osm_cut_ray.sources.images import decode_image, encode_image


def _brute_window(img: np.ndarray, ch: int, cw: int):
    """Nested-loop max-saliency window (first row-major maximizer)."""
    from osm_cut_ray.stages.image_filter import sobel_stack

    sal = sobel_stack(img[None])[0]
    best, by, bx = -1.0, 0, 0
    for y in range(img.shape[0] - ch + 1):
        for x in range(img.shape[1] - cw + 1):
            s = sal[y:y + ch, x:x + cw].sum()
            if s > best:
                best, by, bx = s, y, x
    return by, bx


def test_saliency_windows_match_brute():
    from osm_cut_ray.stages.image_crop import saliency_windows

    rng = np.random.default_rng(4)
    stack = rng.integers(0, 256, (6, 24, 31), dtype=np.uint8) \
        .astype(np.uint8)
    ys, xs = saliency_windows(stack, 9, 13)
    for i in range(len(stack)):
        by, bx = _brute_window(stack[i], 9, 13)
        assert (ys[i], xs[i]) == (by, bx), i


def test_saliency_windows_tie_break_row_major():
    from osm_cut_ray.stages.image_crop import saliency_windows

    # constant image: every window ties at 0 -> (0, 0)
    stack = np.full((2, 10, 10), 7, np.uint8)
    ys, xs = saliency_windows(stack, 4, 4)
    assert (ys == 0).all() and (xs == 0).all()


def test_crop_stage_schema_and_content(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.image_crop import saliency_crop

    rng = np.random.default_rng(11)
    rows = []
    for k in range(30):
        h, w = (16, 20) if k % 2 else (28, 24)
        px = rng.integers(0, 256, (h, w), dtype=np.uint8)
        rows.append({
            "image_id": f"img{k:04d}",
            "bytes": encode_image(px, "fpng"),
            "w": w, "h": h, "fmt": "fpng",
            "caption": f"cap {k}", "phash": k * 17})
    ds = rd.from_items(rows).repartition(4)
    out = pa.concat_tables(
        [pa.table(b) for b in
         saliency_crop(ds, crop_w=10, crop_h=8, concurrency=2)
         .iter_batches(batch_format="pyarrow")])
    assert out.num_rows == 30
    assert set(out.column_names) == {
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
        "crop_x", "crop_y"}
    by_id = {out["image_id"][i].as_py(): i for i in range(30)}
    for r in rows:
        i = by_id[r["image_id"]]
        px, fmt = decode_image(out["bytes"][i].as_py())
        assert fmt == "fpng"
        assert px.shape == (8, 10)
        # content equals the window cut from the original at
        # (crop_y, crop_x)
        src, _ = decode_image(r["bytes"])
        y = out["crop_y"][i].as_py()
        x = out["crop_x"][i].as_py()
        assert (px == src[y:y + 8, x:x + 10]).all()


def test_crop_stage_passthrough_and_clamp(ray_session):
    import ray.data as rd

    from osm_cut_ray.stages.image_crop import saliency_crop

    rng = np.random.default_rng(2)
    small = rng.integers(0, 256, (6, 7), dtype=np.uint8)
    narrow = rng.integers(0, 256, (30, 7), dtype=np.uint8)  # tall
    rows = [
        {"image_id": "s", "bytes": encode_image(small, "fpng"),
         "w": 7, "h": 6, "fmt": "fpng", "caption": "", "phash": 0},
        {"image_id": "n", "bytes": encode_image(narrow, "fpng"),
         "w": 7, "h": 30, "fmt": "fpng", "caption": "", "phash": 1},
    ]
    out = {r["image_id"]: r for r in
           saliency_crop(rd.from_items(rows), crop_w=10, crop_h=8,
                         concurrency=1).take_all()}
    # fully smaller: untouched bytes, zero offsets
    assert out["s"]["bytes"] == rows[0]["bytes"]
    assert out["s"]["w"] == 7 and out["s"]["h"] == 6
    assert out["s"]["crop_x"] == 0 and out["s"]["crop_y"] == 0
    # narrower than crop_w but taller than crop_h: clamps x-axis,
    # crops y-axis only
    px, _ = decode_image(out["n"]["bytes"])
    assert px.shape == (8, 7)
    assert out["n"]["crop_x"] == 0

import numpy as np
import pyarrow as pa


def _brute_equalize(img):
    """Wikipedia formula, dict/loop implementation."""
    h, w = img.shape
    hist = {}
    for v in img.ravel():
        hist[int(v)] = hist.get(int(v), 0) + 1
    cdf, c = {}, 0
    for v in range(256):
        c += hist.get(v, 0)
        cdf[v] = c
    cdf_min = min(cdf[v] for v in range(256) if cdf[v] > 0)
    denom = h * w - cdf_min
    if denom == 0:
        return img.copy()
    out = np.empty_like(img)
    for i in range(h):
        for j in range(w):
            out[i, j] = int(round(
                (cdf[int(img[i, j])] - cdf_min) / denom * 255.0))
    return out


def _brute_sobel(img):
    f = img.astype(np.float64)
    h, w = img.shape
    pad = np.zeros((h + 2, w + 2))
    pad[1:-1, 1:-1] = f
    pad[0, 1:-1], pad[-1, 1:-1] = f[0], f[-1]
    pad[1:-1, 0], pad[1:-1, -1] = f[:, 0], f[:, -1]
    pad[0, 0], pad[0, -1] = f[0, 0], f[0, -1]
    pad[-1, 0], pad[-1, -1] = f[-1, 0], f[-1, -1]
    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], float)
    ky = kx.T
    out = np.zeros((h, w))
    for i in range(h):
        for j in range(w):
            win = pad[i:i + 3, j:j + 3]
            out[i, j] = np.hypot((win * kx).sum(), (win * ky).sum())
    return out


def _brute_otsu(img):
    best_t, best_s = 0, -1.0
    pix = img.ravel().astype(np.float64)
    n = len(pix)
    for t in range(256):
        c0 = pix[pix <= t]
        c1 = pix[pix > t]
        if len(c0) == 0 or len(c1) == 0:
            s = -1.0
        else:
            w0 = len(c0) / n
            s = w0 * (1 - w0) * (c0.mean() - c1.mean()) ** 2
        if s > best_s:
            best_s, best_t = s, t
    return best_t


def _imgs(rng, n=8, shape=(12, 9)):
    out = [rng.integers(0, 256, shape).astype(np.uint8)
           for _ in range(n - 2)]
    out.append(np.full(shape, 7, np.uint8))          # constant
    out.append((rng.integers(0, 2, shape) * 255).astype(np.uint8))
    return np.stack(out)


def test_equalize_matches_published_formula():
    from osm_cut_ray.stages.image_filter import equalize_stack

    rng = np.random.default_rng(13)
    stack = _imgs(rng)
    got = equalize_stack(stack)
    for k in range(len(stack)):
        np.testing.assert_array_equal(got[k], _brute_equalize(stack[k]))


def test_sobel_matches_brute_convolution():
    from osm_cut_ray.stages.image_filter import sobel_stack

    rng = np.random.default_rng(14)
    stack = _imgs(rng, shape=(7, 11))
    got = sobel_stack(stack)
    for k in range(len(stack)):
        np.testing.assert_allclose(got[k], _brute_sobel(stack[k]),
                                   atol=1e-9)


def test_otsu_matches_brute_and_tie_rule():
    from osm_cut_ray.stages.image_filter import otsu_threshold_stack

    rng = np.random.default_rng(15)
    stack = _imgs(rng)
    got = otsu_threshold_stack(stack)
    for k in range(len(stack)):
        assert int(got[k]) == _brute_otsu(stack[k]), k


def test_image_filter_stage_composes(ray_session):
    import ray.data as rd

    from osm_cut_ray.sources.images import (decode_image,
                                            images_batch_from_keys)
    from osm_cut_ray.stages.image_filter import (ImageFilterStage,
                                                 equalize_stack)

    keys = np.arange(64, dtype=np.int64)
    corpus = rd.from_arrow(images_batch_from_keys(keys)).repartition(4)
    out = corpus.map_batches(ImageFilterStage("equalize"),
                             batch_format="pyarrow", batch_size=16)
    tabs = pa.concat_tables([b for b in out.iter_batches(
        batch_size=None, batch_format="pyarrow") if b.num_rows])
    src = images_batch_from_keys(keys)
    assert set(tabs.schema.names) == set(src.schema.names)
    assert tabs.num_rows == 64
    by_id = {tabs["image_id"][i].as_py(): tabs["bytes"][i].as_py()
             for i in range(64)}
    # fpng rows roundtrip the kernel exactly; fjpg re-encode is lossy
    # by design, so compare through one extra quantize step
    for i in range(64):
        iid = src["image_id"][i].as_py()
        px, fmt = decode_image(src["bytes"][i].as_py())
        exp = equalize_stack(px[None])[0]
        got, _ = decode_image(by_id[iid])
        if fmt == "fpng":
            np.testing.assert_array_equal(got, exp)
        else:
            np.testing.assert_array_equal(got, (exp // 4) * 4 + 1)
    # binarize output is two-valued
    out2 = corpus.map_batches(ImageFilterStage("otsu_binarize"),
                              batch_format="pyarrow", batch_size=16)
    t2 = pa.concat_tables([b for b in out2.iter_batches(
        batch_size=None, batch_format="pyarrow") if b.num_rows])
    px, fmt = decode_image(t2["bytes"][0].as_py())
    vals = set(np.unique(px).tolist())
    if fmt == "fpng":
        assert vals <= {0, 255}
    else:
        assert vals <= {1, 253}  # lossy quantize of {0, 255}

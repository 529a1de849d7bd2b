"""Synthetic image corpus at the exact `input_hint` shape (FIXTURES.md §1):

    image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
    caption:string, phash:int64

No real codec libraries exist in this container (no PIL/cv2), so the
codec is a clearly-marked deterministic stand-in ("fpng" lossless,
"fjpg" lossy-quantized) with REAL Ray-side plumbing: binary Arrow
columns, per-actor codec state, batched decode, PSNR verification.
The lossy path quantizes pixels to 4 levels-steps, giving PSNR ≈ 47 dB
(>= the 40 dB gate the north_star's per-row invariant requires).

Swap `encode_image`/`decode_image` for a real codec on a cluster with
PIL — the pipeline stages don't change.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..geometry.geotag import encode_geotag
from ..pipelines.derive import lat_of, lon_of

_MAGIC_LOSSLESS = b"FPNG"
_MAGIC_LOSSY = b"FJPG"
_SIZES = np.array([16, 32, 64], dtype=np.int32)


def pixels_for_key(key: int, w: int, h: int) -> np.ndarray:
    """Deterministic gradient+checker test pattern (uint8, h x w)."""
    xx = np.arange(w, dtype=np.int64)[None, :]
    yy = np.arange(h, dtype=np.int64)[:, None]
    return ((3 * xx + 7 * yy + ((xx // 4) ^ (yy // 4)) * 17 + key)
            % 256).astype(np.uint8)


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    h, w = pixels.shape
    head = (_MAGIC_LOSSLESS if fmt == "fpng" else _MAGIC_LOSSY) \
        + int(w).to_bytes(4, "little") + int(h).to_bytes(4, "little")
    if fmt == "fpng":
        payload = pixels.tobytes()
    elif fmt == "fjpg":
        payload = (pixels // 4).astype(np.uint8).tobytes()  # lossy quantize
    else:
        raise NotImplementedError(
            f"real codec '{fmt}' not available in this container — "
            "plug PIL/libjpeg here on a full cluster")
    return head + zlib.compress(payload, 1)


def decode_image(buf: bytes) -> tuple[np.ndarray, str]:
    magic, w, h = buf[:4], int.from_bytes(buf[4:8], "little"), \
        int.from_bytes(buf[8:12], "little")
    raw = np.frombuffer(zlib.decompress(buf[12:]), np.uint8).reshape(h, w)
    if magic == _MAGIC_LOSSLESS:
        return raw, "fpng"
    if magic == _MAGIC_LOSSY:
        # dequantize midpoint; raw <= 63 so uint8 math never wraps
        return raw * np.uint8(4) + np.uint8(1), "fjpg"
    raise NotImplementedError("unknown image container")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 ** 2 / mse)


def images_batch_from_keys(keys: np.ndarray,
                           with_bytes: bool = True) -> pa.Table:
    """Vectorized synthesis of an input_hint-shaped batch from int64 keys.

    Geotags ride in `phash` (FIXTURES.md §1): lon/lat derive from the
    key via the shared dyadic formulas, then quantize through
    encode_geotag — identical to what the SQL oracle replays.
    `with_bytes=False` skips blob encoding for benchmarks that measure
    the metadata path (PIP + tile assign) rather than codec cost.
    """
    import pyarrow.compute as pc
    keys = np.asarray(keys, np.int64)
    lon = lon_of(keys)
    lat = lat_of(keys)
    ph = encode_geotag(lon, lat)
    w = _SIZES[keys % 3]
    fmt = np.where(keys % 3 == 0, "fjpg", "fpng")
    # vectorized 'img%08d' via Arrow kernels (no per-row Python)
    padded = pc.utf8_lpad(pc.cast(pa.array(keys), pa.string()), 8, "0")
    image_id = pc.binary_join_element_wise("img", padded, "")
    caption = pc.binary_join_element_wise("caption for ", image_id, "")
    cols = {
        "image_id": image_id,
        "w": pa.array(w, pa.int32()),
        "h": pa.array(w, pa.int32()),
        "fmt": pa.array(fmt.tolist()),
        "caption": caption,
        "phash": pa.array(ph),
    }
    if with_bytes:
        blobs = [encode_image(pixels_for_key(k, wi, wi), f)
                 for k, wi, f in zip(keys.tolist(), w.tolist(), fmt.tolist())]
        cols = {"image_id": cols["image_id"],
                "bytes": pa.array(blobs, pa.binary()), **{
                    k: v for k, v in cols.items() if k != "image_id"}}
    return pa.table(cols)


class ImageDecodeStage:
    """Actor-pool decode stage (multimodal plumbing, SURVEY §2.3-style).

    Decodes the binary column, checks the per-row invariant (exact for
    lossless, PSNR >= 40 dB for lossy, vs the deterministic reference
    pattern), and emits compact features: mean pixel, decoded w/h,
    psnr_db. Batched; codec state lives in __init__.
    """

    def __init__(self, check_invariant: bool = True):
        self.check = check_invariant
        self._base: dict[tuple[int, int], np.ndarray] = {}

    def _base_pattern(self, h: int, w: int) -> np.ndarray:
        """Key-independent part of the reference pattern, cached per
        actor as uint8: pixels_for_key(key) == base + (key % 256) with
        natural uint8 wraparound standing in for the % 256."""
        if (h, w) not in self._base:
            xx = np.arange(w, dtype=np.int64)[None, :]
            yy = np.arange(h, dtype=np.int64)[:, None]
            self._base[(h, w)] = ((3 * xx + 7 * yy
                                   + ((xx // 4) ^ (yy // 4)) * 17)
                                  % 256).astype(np.uint8)
        return self._base[(h, w)]

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        bufs = t["bytes"].to_pylist()
        n = len(bufs)
        mean_px = np.empty(n, np.float64)
        dw = np.empty(n, np.int32)
        dh = np.empty(n, np.int32)
        ps = np.full(n, np.nan, np.float64)
        # per-row zlib decode is inherent to the codec; everything else
        # (ids, reference pattern, PSNR, means) is vectorized per shape
        pixels: list = [None] * n
        lossless = np.empty(n, bool)
        by_shape: dict[tuple[int, int], list[int]] = {}
        for i, buf in enumerate(bufs):
            px, fmt = decode_image(buf)
            pixels[i] = px
            lossless[i] = fmt == "fpng"
            by_shape.setdefault(px.shape, []).append(i)
        if self.check and n:
            keys = pc.cast(pc.utf8_slice_codeunits(
                t["image_id"], 3, np.iinfo(np.int32).max),
                pa.int64()).to_numpy(zero_copy_only=False)
        for shape, idxs in by_shape.items():
            idx = np.asarray(idxs, np.int64)
            stack = np.stack([pixels[i] for i in idxs])      # (m, h, w)
            dh[idx], dw[idx] = shape[0], shape[1]
            mean_px[idx] = stack.mean(axis=(1, 2))
            if not self.check:
                continue
            # uint8 wraparound == mod-256: refs stays (m, h, w) uint8
            refs = (self._base_pattern(*shape)[None]
                    + (keys[idx] % 256).astype(np.uint8)[:, None, None])
            bad = lossless[idx] & (stack != refs).any(axis=(1, 2))
            if bad.any():
                i0 = idx[bad][0]
                raise ValueError("lossless roundtrip mismatch "
                                 f"{t['image_id'][i0].as_py()}")
            d = stack.astype(np.int16) - refs
            mse = (d.astype(np.int32) * d).mean(axis=(1, 2))
            p = np.where(mse == 0, 99.0,
                         10.0 * np.log10(255.0 ** 2
                                         / np.where(mse == 0, 1.0, mse)))
            if (p < 40.0).any():
                i0 = idx[p < 40.0][0]
                raise ValueError(f"PSNR {p.min():.1f} < 40 dB for "
                                 f"{t['image_id'][i0].as_py()}")
            ps[idx] = p
        return pa.table({
            "image_id": t["image_id"],
            "caption": t["caption"],
            "phash": t["phash"],
            "dec_w": pa.array(dw), "dec_h": pa.array(dh),
            "mean_px": pa.array(mean_px), "psnr_db": pa.array(ps),
        })


def resize_stack(stack: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Vectorized downsample of a same-shape image stack (m, h, w).

    Area (block-mean) resampling when the scale divides evenly — the
    power-of-two thumbnail path — else nearest-neighbor via floor index
    mapping. Deterministic: means round half-up (floor(x + 0.5)), not
    numpy banker's rounding.
    """
    m, h, w = stack.shape
    if (out_h, out_w) == (h, w):
        return stack
    if h % out_h == 0 and w % out_w == 0:
        fy, fx = h // out_h, w // out_w
        mean = stack.reshape(m, out_h, fy, out_w, fx) \
            .mean(axis=(2, 4), dtype=np.float64)
        return np.floor(mean + 0.5).astype(np.uint8)
    yi = np.arange(out_h, dtype=np.int64) * h // out_h
    xi = np.arange(out_w, dtype=np.int64) * w // out_w
    return stack[:, yi][:, :, xi]


class ImageResizeStage:
    """Actor-pool resize/thumbnail stage (the north_star's multimodal
    decode/feature-extract/RESIZE/frame-sample family).

    Decodes the binary column, downsamples every image whose max side
    exceeds `target` (aspect-preserving), re-encodes in the row's own
    format, and emits the same input_hint schema with updated
    bytes/w/h — so the output composes with every other image stage
    (flagship, ImageDecodeStage, image_dedup). Per-row zlib
    encode/decode is inherent to the codec; the resample itself is
    vectorized per shape group. Images already at/below `target` pass
    through untouched (bytes included).
    """

    def __init__(self, target: int = 16):
        if target < 1:
            raise ValueError("target must be >= 1")
        self.target = target

    def _out_shape(self, h: int, w: int) -> tuple[int, int]:
        side = max(h, w)
        if side <= self.target:
            return h, w
        # round half-up keeps aspect within 1px and never hits 0
        return (max(1, (h * self.target + side // 2) // side),
                max(1, (w * self.target + side // 2) // side))

    def __call__(self, t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return t
        bufs = t["bytes"].to_pylist()
        fmts = t["fmt"].to_pylist()
        out_bufs: list = list(bufs)          # default: passthrough
        out_w = np.empty(n, np.int32)
        out_h = np.empty(n, np.int32)
        pixels: list = [None] * n
        by_shape: dict[tuple[int, int], list[int]] = {}
        for i, buf in enumerate(bufs):
            px, _ = decode_image(buf)
            pixels[i] = px
            by_shape.setdefault(px.shape, []).append(i)
        for (h, w), idxs in by_shape.items():
            oh, ow = self._out_shape(h, w)
            idx = np.asarray(idxs, np.int64)
            out_h[idx], out_w[idx] = oh, ow
            if (oh, ow) == (h, w):
                continue
            small = resize_stack(np.stack([pixels[i] for i in idxs]),
                                 oh, ow)
            for j, i in enumerate(idxs):
                out_bufs[i] = encode_image(small[j], fmts[i])
        return pa.table({
            "image_id": t["image_id"],
            "bytes": pa.array(out_bufs, pa.binary()),
            "w": pa.array(out_w), "h": pa.array(out_h),
            "fmt": t["fmt"], "caption": t["caption"],
            "phash": t["phash"],
        })


# per-worker-process singleton for task-mode map_batches: the stage's
# only state is the cached base patterns (3 shapes), so tasks + this
# memo beat an actor pool's cold start
_DECODE_SINGLETON: dict = {}


def decode_stage_batch(t: pa.Table, check_invariant: bool = True) -> pa.Table:
    st = _DECODE_SINGLETON.get(check_invariant)
    if st is None:
        st = _DECODE_SINGLETON[check_invariant] = \
            ImageDecodeStage(check_invariant)
    return st(t)

"""Mergeable sketches beyond HLL: Count-Min, Misra-Gries heavy
hitters, and KLL quantiles — the guide's "one serialized sketch per
batch, merge the blobs" aggregation pattern (`functions/hll.py` is the
fourth member).

All are public-paper algorithms (Cormode-Muthukrishnan CM sketch;
Misra-Gries / Agarwal et al. mergeable summaries; Karnin-Lang-Liberty
KLL), pure numpy, deterministic (no RNG at add/merge time), and
byte-serializable so a Dataset pass emits one tiny blob per batch and
the driver (or a tree-reduce) merges #batches blobs — corpus size
never matters, only batch count.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

_MULS = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                  0x165667B19E3779F9, 0x27D4EB2F165667C5,
                  0x85EBCA77C2B2AE63, 0xFF51AFD7ED558CCD],
                 dtype=np.uint64)


class CountMin:
    """Count-Min frequency sketch over int64 keys.

    `estimate` never underestimates; overestimate <= 2N/width with
    probability 1 - 2^-depth per query (public CM bound).
    """

    def __init__(self, width: int = 4096, depth: int = 4):
        assert width & (width - 1) == 0, "width must be a power of two"
        assert depth <= len(_MULS)
        self.width = width
        self.depth = depth
        self.table = np.zeros((depth, width), np.int64)
        self.n = 0

    def _idx(self, keys: np.ndarray, row: int) -> np.ndarray:
        u = np.asarray(keys, np.int64).view(np.uint64)
        return (((u * _MULS[row]) >> np.uint64(17))
                % np.uint64(self.width)).astype(np.int64)

    def add_int64(self, keys: np.ndarray,
                  counts: np.ndarray | None = None) -> "CountMin":
        if len(keys) == 0:
            return self
        w = np.ones(len(keys), np.int64) if counts is None \
            else np.asarray(counts, np.int64)
        for r in range(self.depth):
            np.add.at(self.table[r], self._idx(keys, r), w)
        self.n += int(w.sum())
        return self

    def estimate(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.array([], np.int64)
        est = np.full(len(keys), np.iinfo(np.int64).max, np.int64)
        for r in range(self.depth):
            np.minimum(est, self.table[r][self._idx(keys, r)], out=est)
        return est

    def merge(self, other: "CountMin") -> "CountMin":
        assert (self.width, self.depth) == (other.width, other.depth)
        self.table += other.table
        self.n += other.n
        return self

    def to_bytes(self) -> bytes:
        return struct.pack("<iiq", self.width, self.depth, self.n) \
            + self.table.tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "CountMin":
        width, depth, n = struct.unpack_from("<iiq", buf)
        sk = cls(width, depth)
        sk.n = n
        sk.table = np.frombuffer(buf, np.int64, width * depth,
                                 offset=16).reshape(depth, width).copy()
        return sk


class MisraGries:
    """Misra-Gries heavy-hitter summary over int64 keys (k counters).

    Mergeable (Agarwal et al.): estimates UNDERCOUNT by at most
    N/(k+1), so every key with true count > N/(k+1) is present — the
    deterministic heavy-hitter guarantee. Per-batch adds are
    vectorized via np.unique counting; the counter dict holds <= k
    entries at all times.
    """

    def __init__(self, k: int = 64):
        self.k = k
        self.counts: dict[int, int] = {}
        self.n = 0

    def _shrink(self) -> None:
        if len(self.counts) <= self.k:
            return
        vals = np.fromiter(self.counts.values(), np.int64,
                           len(self.counts))
        # subtract the (k+1)-th largest count, drop non-positives —
        # the batched form of MG's decrement-all step
        thr = int(np.partition(vals, -(self.k + 1))[-(self.k + 1)])
        self.counts = {key: c - thr for key, c in self.counts.items()
                       if c - thr > 0}

    def add_int64(self, keys: np.ndarray) -> "MisraGries":
        if len(keys) == 0:
            return self
        uniq, cnt = np.unique(np.asarray(keys, np.int64),
                              return_counts=True)
        for key, c in zip(uniq.tolist(), cnt.tolist()):
            self.counts[key] = self.counts.get(key, 0) + c
        self.n += int(len(keys))
        self._shrink()
        return self

    def merge(self, other: "MisraGries") -> "MisraGries":
        assert self.k == other.k
        for key, c in other.counts.items():
            self.counts[key] = self.counts.get(key, 0) + c
        self.n += other.n
        self._shrink()
        return self

    def heavy_hitters(self, min_frac: float = 0.01) -> dict[int, int]:
        """Keys whose ESTIMATED count >= min_frac * n (superset-safe:
        a key with true count >= min_frac*n + n/(k+1) is guaranteed
        present; estimates are lower bounds)."""
        thr = min_frac * self.n
        return {key: c for key, c in self.counts.items() if c >= thr}

    def to_bytes(self) -> bytes:
        keys = np.fromiter(self.counts.keys(), np.int64, len(self.counts))
        vals = np.fromiter(self.counts.values(), np.int64, len(self.counts))
        return struct.pack("<iqq", self.k, self.n, len(keys)) \
            + keys.tobytes() + vals.tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "MisraGries":
        k, n, m = struct.unpack_from("<iqq", buf)
        sk = cls(k)
        sk.n = n
        keys = np.frombuffer(buf, np.int64, m, offset=20)
        vals = np.frombuffer(buf, np.int64, m, offset=20 + 8 * m)
        sk.counts = dict(zip(keys.tolist(), vals.tolist()))
        return sk


class KLL:
    """KLL quantile sketch over float64 values (Karnin-Lang-Liberty).

    Deterministic variant: compaction keeps odd/even-indexed elements
    of the SORTED level alternately (a per-level flip bit), so the
    same input always yields the same sketch — rank error is
    O(1/k) * n with the randomness replaced by the alternation (the
    published derandomized-KLL trick; empirical bound pinned in
    tests). Level l elements carry weight 2^l.
    """

    C = 2.0 / 3.0

    def __init__(self, k: int = 200):
        self.k = k
        self.levels: list[np.ndarray] = [np.array([], np.float64)]
        self.flips: list[bool] = [False]
        self.n = 0

    def _cap(self, level: int) -> int:
        # top level gets k, lower levels shrink geometrically
        h = len(self.levels)
        return max(2, int(np.ceil(self.k * self.C ** (h - 1 - level))))

    def _compress(self) -> None:
        while sum(len(a) for a in self.levels) \
                > sum(self._cap(i) for i in range(len(self.levels))):
            for lv in range(len(self.levels)):
                if len(self.levels[lv]) > self._cap(lv):
                    a = np.sort(self.levels[lv])
                    # compact an EVEN count so total weight is exactly
                    # conserved (each promoted item, weight 2^(l+1),
                    # stands for a pair); an odd straggler stays put
                    resid = a[-1:] if len(a) % 2 else a[:0]
                    a = a[:len(a) - len(resid)]
                    off = 1 if self.flips[lv] else 0
                    self.flips[lv] = not self.flips[lv]
                    promoted = a[off::2]
                    self.levels[lv] = resid.copy()
                    if lv + 1 == len(self.levels):
                        self.levels.append(np.array([], np.float64))
                        self.flips.append(False)
                    self.levels[lv + 1] = np.concatenate(
                        [self.levels[lv + 1], promoted])
                    break
            else:
                break

    def add(self, values: np.ndarray) -> "KLL":
        v = np.asarray(values, np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return self
        self.n += int(len(v))
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()
        return self

    def merge(self, other: "KLL") -> "KLL":
        assert self.k == other.k
        while len(self.levels) < len(other.levels):
            self.levels.append(np.array([], np.float64))
            self.flips.append(False)
        for lv, a in enumerate(other.levels):
            self.levels[lv] = np.concatenate([self.levels[lv], a])
        self.n += other.n
        self._compress()
        return self

    def quantile(self, q: float) -> float:
        vals_l, wts_l = [], []
        for lv, a in enumerate(self.levels):
            if len(a):
                vals_l.append(a)
                wts_l.append(np.full(len(a), 1 << lv, np.int64))
        if not vals_l:
            return float("nan")
        vals = np.concatenate(vals_l)
        wts = np.concatenate(wts_l)
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        cum = np.cumsum(wts)
        target = q * cum[-1]
        return float(vals[min(int(np.searchsorted(cum, target)),
                              len(vals) - 1)])

    def to_bytes(self) -> bytes:
        lens = np.array([len(a) for a in self.levels], np.int64)
        flips = np.array(self.flips, np.uint8)
        head = struct.pack("<iqi", self.k, self.n, len(self.levels))
        return head + lens.tobytes() + flips.tobytes() \
            + np.concatenate(self.levels).tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "KLL":
        k, n, h = struct.unpack_from("<iqi", buf)
        sk = cls(k)
        sk.n = n
        off = 16
        lens = np.frombuffer(buf, np.int64, h, offset=off)
        off += 8 * h
        sk.flips = np.frombuffer(buf, np.uint8, h, offset=off)\
            .astype(bool).tolist()
        off += h
        flat = np.frombuffer(buf, np.float64, int(lens.sum()), offset=off)
        sk.levels, pos = [], 0
        for ln in lens.tolist():
            sk.levels.append(flat[pos:pos + ln].copy())
            pos += ln
        return sk


def sketch_dataset(ds, col: str, cls, *, value_kind: str = "int64",
                   **kwargs):
    """Run a mergeable sketch over one Dataset column: one sketch blob
    per batch (map-side, vectorized add), driver merges #batches blobs
    — the corpus streams; only KB-sized register blobs move.

    cls: CountMin | MisraGries | KLL (anything with add/merge/
    to_bytes/from_bytes). value_kind: 'int64' (add_int64) or 'float'
    (KLL.add). Returns the merged sketch (None for an empty dataset).
    """
    add_name = "add" if value_kind == "float" else "add_int64"

    def per_batch(t: pa.Table) -> pa.Table:
        if len(t) == 0 or col not in t.column_names:
            return pa.table({"blob": pa.array([], pa.binary())})
        sk = cls(**kwargs)
        getattr(sk, add_name)(t[col].to_numpy(zero_copy_only=False))
        return pa.table({"blob": pa.array([sk.to_bytes()], pa.binary())})

    merged = None
    for b in ds.map_batches(per_batch, batch_format="pyarrow")\
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        for blob in b["blob"].to_pylist():
            sk = cls.from_bytes(blob)
            merged = sk if merged is None else merged.merge(sk)
    return merged

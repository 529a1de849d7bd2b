"""HyperLogLog distinct-count sketch (mergeable, per the guide's
"emit one serialized sketch per batch and merge" aggregation pattern).

Standard HLL with 2^p registers and the bias-corrected estimator from
the public Flajolet et al. / Heule et al. papers. Pure numpy.
"""

from __future__ import annotations

import numpy as np


class HyperLogLog:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)
        if p >= 7:
            self.alpha = 0.7213 / (1.0 + 1.079 / self.m)
        else:
            self.alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213)

    def add_hashed(self, h: np.ndarray) -> "HyperLogLog":
        """h: uint64 hashes of the values (already well-mixed)."""
        h = np.asarray(h, np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = leading zeros of the remaining bits + 1
        rank = np.zeros(len(h), dtype=np.uint8)
        cur = rest
        for shift in (32, 16, 8, 4, 2, 1):
            mask = cur < (np.uint64(1) << np.uint64(64 - shift))
            rank[mask] += shift
            cur = np.where(mask, cur << np.uint64(shift), cur)
        rank += 1
        np.maximum.at(self.registers, idx, rank)
        return self

    def add_int64(self, values: np.ndarray) -> "HyperLogLog":
        v = np.asarray(values, np.int64).view(np.uint64)
        h = v * np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(29)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(32)
        return self.add_hashed(h)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "HyperLogLog":
        sk = cls(p=buf[0])
        sk.registers = np.frombuffer(buf, np.uint8, sk.m, offset=1).copy()
        return sk

    def estimate(self) -> float:
        inv = np.exp2(-self.registers.astype(np.float64)).sum()
        e = self.alpha * self.m * self.m / inv
        if e <= 2.5 * self.m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                e = self.m * np.log(self.m / zeros)  # linear counting
        return float(e)

"""Mergeable sketches: HyperLogLog distinct-count (Flajolet et al. 2007,
with the standard small-range linear-counting correction).

The scale pattern (ray_guide "Aggregation at scale"): each ``map_batches``
task emits ONE serialized sketch per batch; sketches merge by elementwise
max — a tiny driver-side reduce replaces a full distinct shuffle. With
p=14 (16384 byte registers) the standard error is ~1.04/√2¹⁴ ≈ 0.81%.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np


class HyperLogLog:
    def __init__(self, p: int = 14):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    @staticmethod
    def _hash64(value) -> int:
        return int.from_bytes(
            hashlib.blake2b(str(value).encode("utf-8"), digest_size=8).digest(), "little"
        )

    def add(self, value) -> None:
        h = self._hash64(value)
        idx = h & (self.m - 1)
        w = h >> self.p
        # rank = position of leftmost 1-bit in the remaining 64-p bits
        rank = (64 - self.p) - w.bit_length() + 1
        if rank > self.registers[idx]:
            self.registers[idx] = rank

    def add_many(self, values) -> None:
        for v in values:
            self.add(v)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        raw = alpha * m * m / float(np.sum(np.exp2(-self.registers.astype(np.float64))))
        if raw <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return m * math.log(m / zeros)  # linear counting
        return raw

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "HyperLogLog":
        h = cls(data[0])
        h.registers = np.frombuffer(data[1:], dtype=np.uint8).copy()
        return h


def approx_distinct(ds, col: str, p: int = 14) -> float:
    """Approximate COUNT(DISTINCT col): one HLL per batch, merged on the
    driver. No shuffle; payload per batch = 2^p bytes."""
    import pyarrow as pa

    def sketch_batch(batch: pa.Table) -> pa.Table:
        h = HyperLogLog(p)
        h.add_many(batch.column(col).to_pylist())
        return pa.table({"sketch": pa.array([h.to_bytes()], pa.binary())})

    merged = HyperLogLog(p)
    for b in ds.map_batches(sketch_batch, batch_format="pyarrow").iter_batches(
        batch_size=1024, batch_format="pyarrow"
    ):
        for raw in b.column("sketch").to_pylist():
            merged.merge(HyperLogLog.from_bytes(raw))
    return merged.estimate()

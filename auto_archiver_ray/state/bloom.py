"""Counting-free Bloom filter over 32-byte digests (numpy bit array).

The frontier's URL-seen structure (north rule: "bloom/cuckoo URL-seen").
Keys are sha256 digests of canonical URLs (urlkit.url_seen_key), so the k
probe positions are sliced straight out of the digest bytes — no extra
hashing, fully deterministic across processes, and snapshots are just the
bit array bytes.

Sizing: m = -n·ln(p)/ln(2)², k = m/n·ln(2) (standard optima). At the
10^10-URL design point with 256 shards, each shard holds ~4×10^7 keys;
p=1e-4 → ~96 MB of bits per shard — comfortably in actor heap.
"""

from __future__ import annotations

import math

import numpy as np


class BloomFilter:
    def __init__(self, capacity: int, error_rate: float = 1e-4):
        self.capacity = capacity
        self.error_rate = error_rate
        m = max(64, int(-capacity * math.log(error_rate) / (math.log(2) ** 2)))
        self.num_bits = ((m + 63) // 64) * 64
        self.num_hashes = max(1, round(self.num_bits / capacity * math.log(2)))
        # digest provides 32 bytes = eight 4-byte probe slots; cap k at 8
        self.num_hashes = min(self.num_hashes, 8)
        self.bits = np.zeros(self.num_bits // 8, dtype=np.uint8)
        self.count = 0

    def _positions(self, digest: bytes) -> list[int]:
        return [
            int.from_bytes(digest[4 * i : 4 * i + 4], "little") % self.num_bits
            for i in range(self.num_hashes)
        ]

    def add(self, digest: bytes) -> bool:
        """Add; returns True if the key was (probably) already present."""
        pos = self._positions(digest)
        present = all(self.bits[p >> 3] & (1 << (p & 7)) for p in pos)
        if not present:
            for p in pos:
                self.bits[p >> 3] |= 1 << (p & 7)
            self.count += 1
        return present

    def __contains__(self, digest: bytes) -> bool:
        return all(self.bits[p >> 3] & (1 << (p & 7)) for p in self._positions(digest))

    def add_batch(self, digests: list[bytes]) -> list[bool]:
        """Vector add; returns is_new per digest (inverse of `add`)."""
        return [not self.add(d) for d in digests]

    # ------------------------------------------------------------------ io
    def to_bytes(self) -> bytes:
        header = f"{self.capacity}:{self.error_rate}:{self.count}".encode() + b"\n"
        return header + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        header, _, body = data.partition(b"\n")
        cap_s, err_s, count_s = header.decode().split(":")
        bf = cls(int(cap_s), float(err_s))
        bf.bits = np.frombuffer(body, dtype=np.uint8).copy()
        bf.count = int(count_s)
        return bf

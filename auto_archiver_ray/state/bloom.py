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

    # ------------------------------------------------------------ vectorized
    @staticmethod
    def _as_matrix(digests) -> np.ndarray:
        """(n, digest_len) uint8 matrix from list[bytes] OR an ndarray
        already in that shape (the zero-copy wire format — the driver sends
        one array per shard instead of n Python bytes objects)."""
        if isinstance(digests, np.ndarray):
            return digests
        n = len(digests)
        return np.frombuffer(b"".join(digests), dtype=np.uint8).reshape(n, -1)

    def _pos_matrix(self, raw: np.ndarray) -> np.ndarray:
        """(n, k) probe positions from the digest bytes — no per-key Python
        hashing (the frontier hot path; ~10⁶+ keys/s per shard)."""
        n = raw.shape[0]
        u32 = raw[:, : 4 * self.num_hashes].copy().view("<u4").reshape(n, self.num_hashes)
        return (u32 % np.uint32(self.num_bits)).astype(np.int64)

    def contains_batch(self, digests) -> np.ndarray:
        raw = self._as_matrix(digests)
        if raw.shape[0] == 0:
            return np.zeros(0, dtype=bool)
        pos = self._pos_matrix(raw)
        byte_idx = pos >> 3
        masks = np.left_shift(np.uint8(1), (pos & 7).astype(np.uint8))
        return ((self.bits[byte_idx] & masks) == masks).all(axis=1)

    def add_batch(self, digests) -> list[bool]:
        """Vectorized test-and-insert; returns is_new per digest. Within-batch
        repeats of the same digest: the first occurrence is new, the rest are
        duplicates (identical to sequential `add` calls)."""
        raw = self._as_matrix(digests)
        n = raw.shape[0]
        if n == 0:
            return []
        _, first_idx, inverse = np.unique(raw, axis=0, return_index=True, return_inverse=True)
        # numpy 2.0.x returns the inverse shaped (n,1); flatten before fancy
        # indexing or new_uniq[inverse] silently broadcasts to (n,n)
        inverse = np.asarray(inverse).reshape(-1)
        uniq = raw[first_idx]
        present = self.contains_batch(uniq)
        new_uniq = ~present
        if new_uniq.any():
            pos = self._pos_matrix(uniq[new_uniq])
            byte_idx = pos >> 3
            masks = np.left_shift(np.uint8(1), (pos & 7).astype(np.uint8))
            np.bitwise_or.at(self.bits, byte_idx.ravel(), masks.ravel())
            self.count += int(new_uniq.sum())
        # row is new iff it is the FIRST occurrence of a newly-inserted digest
        is_first = np.zeros(n, dtype=bool)
        is_first[first_idx] = True
        return (is_first & new_uniq[inverse]).tolist()

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

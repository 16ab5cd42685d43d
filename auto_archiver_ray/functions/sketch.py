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


class CountMinSketch:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) over string keys:
    ``depth`` rows of ``width`` int64 counters; point estimate = min over
    rows (one-sided: estimate >= true count, always).

    All hashing is derived from pd.util.hash_array's keyed siphash (one C
    call per batch, deterministic across processes) + a splitmix64 mix for
    the second hash — positions row r = (h1 + r*h2) mod width, h2 forced
    odd. Counter merges are integer ADDS, so the merged sketch — and every
    estimate read from it — is bit-identical under any batch composition,
    merge order, or retry."""

    def __init__(self, depth: int = 4, width: int = 8192):
        self.depth = depth
        self.width = width
        self.counts = np.zeros((depth, width), dtype=np.int64)

    @staticmethod
    def _h1h2(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        import pandas as pd

        h1 = pd.util.hash_array(np.asarray(values, dtype=object), categorize=False)
        z = h1 + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h2 = (z ^ (z >> np.uint64(31))) | np.uint64(1)
        return h1, h2

    def _positions(self, values: np.ndarray) -> np.ndarray:
        """(n, depth) counter columns per value."""
        h1, h2 = self._h1h2(values)
        rows = np.arange(self.depth, dtype=np.uint64)[None, :]
        return ((h1[:, None] + rows * h2[:, None]) % np.uint64(self.width)).astype(np.int64)

    def add_many(self, values, counts) -> None:
        v = np.asarray(values, dtype=object)
        if v.size == 0:
            return
        c = np.asarray(counts, dtype=np.int64)
        pos = self._positions(v)
        for r in range(self.depth):
            np.add.at(self.counts[r], pos[:, r], c)

    def estimate(self, values) -> np.ndarray:
        v = np.asarray(values, dtype=object)
        if v.size == 0:
            return np.zeros(0, dtype=np.int64)
        pos = self._positions(v)
        ests = np.stack([self.counts[r][pos[:, r]] for r in range(self.depth)])
        return ests.min(axis=0)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.depth, self.width) == (other.depth, other.width)
        self.counts += other.counts
        return self

    def to_bytes(self) -> bytes:
        return bytes([self.depth]) + self.width.to_bytes(4, "little") + self.counts.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountMinSketch":
        s = cls(data[0], int.from_bytes(data[1:5], "little"))
        s.counts = np.frombuffer(data[5:], dtype=np.int64).reshape(s.depth, s.width).copy()
        return s


def heavy_hitters(
    ds,
    text_col: str = "text",
    phi: float = 0.002,
    depth: int = 4,
    width: int = 8192,
    batch_size: int = 4096,
):
    """phi-heavy-hitters over the whitespace token stream, CMS-based and
    batch-invariant — the bounded-memory sibling of the exact term reduce
    (q_doc_top_terms) for vocabularies that do NOT fit anywhere:

    1. one CMS per batch (depth x width int64, 256 KB) — a tree merge
       (map_batches over sketch rows, then a tiny driver fold) produces
       THE corpus sketch; integer adds make it composition-independent;
    2. a second streamed pass estimates each batch's distinct terms
       against the broadcast merged sketch and emits those with
       estimate >= ceil(phi * total_tokens). Because estimate >= true
       count (one-sided error), every TRUE phi-heavy term is emitted —
       candidate recall is exact; over-counted extras rank by the same
       deterministic estimate.

    Returns (term, est_count) for the candidate union, sorted by
    (est_count DESC, term ASC). Driver holds only sketches and the
    candidate set (<= corpus_tokens/T terms by construction)."""
    import pyarrow as pa
    import ray

    from collections import Counter

    def sketch_batch(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        total = 0
        for t in batch.column(text_col).to_pylist():
            toks = (t or "").split()
            total += len(toks)
            c.update(toks)
        s = CountMinSketch(depth, width)
        s.add_many(np.asarray(list(c.keys()), dtype=object), np.fromiter(c.values(), dtype=np.int64, count=len(c)))
        return pa.table(
            {
                "sketch": pa.array([s.to_bytes()], pa.binary()),
                "n_tokens": pa.array([total], pa.int64()),
            }
        )

    def merge_rows(batch: pa.Table) -> pa.Table:
        s = CountMinSketch(depth, width)
        for raw in batch.column("sketch").to_pylist():
            s.merge(CountMinSketch.from_bytes(raw))
        n = sum(batch.column("n_tokens").to_pylist())
        return pa.table(
            {
                "sketch": pa.array([s.to_bytes()], pa.binary()),
                "n_tokens": pa.array([n], pa.int64()),
            }
        )

    sketches = ds.map_batches(sketch_batch, batch_format="pyarrow", batch_size=batch_size)
    # distributed tree level: 64 batch-sketches -> 1 (driver then folds the
    # handful of level-1 rows; at 100 TB add levels, each a map_batches)
    level1 = sketches.map_batches(merge_rows, batch_format="pyarrow", batch_size=64)
    merged = CountMinSketch(depth, width)
    total_tokens = 0
    for b in level1.iter_batches(batch_size=256, batch_format="pyarrow"):
        for raw in b.column("sketch").to_pylist():
            merged.merge(CountMinSketch.from_bytes(raw))
        total_tokens += sum(b.column("n_tokens").to_pylist())
    threshold = max(1, int(np.ceil(phi * total_tokens)))
    cms_ref = ray.put(merged.to_bytes())

    def candidates(batch: pa.Table) -> pa.Table:
        s = CountMinSketch.from_bytes(ray.get(cms_ref))
        terms: set = set()
        for t in batch.column(text_col).to_pylist():
            terms.update((t or "").split())
        tv = np.asarray(sorted(terms), dtype=object)
        est = s.estimate(tv)
        keep = est >= threshold
        return pa.table(
            {
                "term": pa.array(tv[keep].tolist(), pa.string()),
                "est_count": pa.array(est[keep], pa.int64()),
            }
        )

    import pandas as pd

    cand = ds.map_batches(candidates, batch_format="pyarrow", batch_size=batch_size).to_pandas()
    out = cand.drop_duplicates("term").sort_values(
        ["est_count", "term"], ascending=[False, True], kind="mergesort"
    )
    return out.reset_index(drop=True), threshold, total_tokens


# --- KMV (k minimum values / bottom-k) sketch -------------------------------
#
# Bar-Yossef et al. 2002: the k smallest 64-bit hash values of a key set are
# a mergeable, ORDER-INDEPENDENT summary — merge = union → keep k smallest —
# and yield the distinct-count estimate (k-1)·2^64 // v_k (exact integer
# rational, so a DuckDB oracle compares value-exact; when fewer than k
# distinct hashes exist the sketch IS the set and the count is exact).
# The hash is DuckDB's md5_number_lower (last 8 md5 digest bytes,
# little-endian — the repo-wide 64-bit convention, stages/sample.py).

KMV_K = 64


def md5_u64(value: str) -> int:
    """Lower 64 bits of md5 — bit-identical to DuckDB ``md5_number_lower``."""
    d = hashlib.md5(str(value).encode("utf-8")).digest()
    return int.from_bytes(d[8:16], "little")


def kmv_bottomk(values, k: int = KMV_K) -> np.ndarray:
    """Bottom-k distinct u64 hashes of ``values`` (sorted ascending)."""
    hs = np.unique(np.asarray([md5_u64(v) for v in values], dtype=np.uint64))
    return hs[:k]


def kmv_merge(parts: list[np.ndarray], k: int = KMV_K) -> np.ndarray:
    """Union of bottom-k parts → global bottom-k (associative+commutative:
    min-k of a union is a pure function of the input SET, so any merge tree
    over any block layout produces the identical array)."""
    if not parts:
        return np.array([], dtype=np.uint64)
    return np.unique(np.concatenate(parts))[:k]


def kmv_estimate(bottomk: np.ndarray, k: int = KMV_K) -> int:
    """Distinct-count estimate; exact when the sketch holds < k hashes."""
    if len(bottomk) < k:
        return int(len(bottomk))
    vk = int(bottomk[k - 1])
    return ((k - 1) * (1 << 64)) // vk

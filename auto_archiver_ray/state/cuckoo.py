"""Cuckoo filter over 32-byte digests — the deletable sibling of
:mod:`state.bloom` (north rule: "bloom/cuckoo URL-seen").

Same role and wire contract as BloomFilter (add_batch → is_new flags,
contains_batch, to_bytes/from_bytes snapshots) plus ``delete_batch``:
a fingerprint can be REMOVED, which a Bloom bit array cannot do without
counting. That is the re-crawl admission primitive — forget a URL whose
archived copy was detected deleted and the frontier will admit it again.

Layout (Fan et al. 2014): ``nbuckets`` (power of two) buckets × 4 slots
of 16-bit fingerprints, 0 = empty. All randomness is derived from the
key digest itself, so behavior is bit-deterministic across processes and
replays — a requirement for checkpoint/resume identity:

- fingerprint  = first 2 digest bytes, forced nonzero
- bucket i1    = digest bytes 4:8 mod nbuckets
- bucket i2    = i1 XOR h(fp)   (partner; XOR makes the pair symmetric,
                 so membership/delete need only the stored fp + index)
- eviction     = deterministic LCG seeded by (fp, kick round) picks the
                 slot to displace; max 500 kicks then the filter reports
                 itself full (callers must treat that as a hard error —
                 a seen-filter that drops keys would re-crawl forever).

At 4 slots × 16-bit fp the classic load limit is ~95%; sizing picks
nbuckets so capacity sits at 84% load (the paper's safe high-load point
for b=4). Memory: 2 bytes/slot → 10^10 URLs over 256 shards ≈ 93 MB of
table per shard at 84% load — the same heap class as the Bloom.
"""

from __future__ import annotations

import numpy as np

_MAX_KICKS = 500
_SLOTS = 4
# odd multiplier for the fp -> partner-offset mix (splitmix-ish)
_FP_MIX = np.uint64(0x9E3779B97F4A7C15)


class CuckooFull(RuntimeError):
    """Insertion failed after the kick budget — the filter is over-loaded.

    A URL-seen structure MUST NOT silently drop keys (the crawl would
    re-admit them forever), so this is an error, not a bool."""


class CuckooFilter:
    def __init__(self, capacity: int):
        self.capacity = capacity
        want = max(64, int(capacity / (_SLOTS * 0.84)))
        nb = 1
        while nb < want:
            nb <<= 1
        self.nbuckets = nb
        self.table = np.zeros((nb, _SLOTS), dtype=np.uint16)
        self.count = 0

    # ------------------------------------------------------------- keying
    @staticmethod
    def _as_matrix(digests) -> np.ndarray:
        if isinstance(digests, np.ndarray):
            return digests
        n = len(digests)
        return np.frombuffer(b"".join(digests), dtype=np.uint8).reshape(n, -1)

    def _fp_i1(self, raw: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(fingerprint, primary bucket) per digest row, vectorized."""
        fp = raw[:, :2].copy().view("<u2").reshape(-1).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)
        i1 = (
            raw[:, 4:8].copy().view("<u4").reshape(-1).astype(np.uint64)
            % np.uint64(self.nbuckets)
        ).astype(np.int64)
        return fp, i1

    def _partner(self, fp: np.ndarray, idx: np.ndarray) -> np.ndarray:
        """i XOR h(fp): involutive, so it maps i1<->i2."""
        h = (fp.astype(np.uint64) * _FP_MIX) >> np.uint64(48)
        return (idx.astype(np.uint64) ^ (h % np.uint64(self.nbuckets))).astype(np.int64) % self.nbuckets

    # ------------------------------------------------------------ scalar core
    def _partner_scalar(self, fp: int, idx: int) -> int:
        h = ((fp * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF) >> 48
        return idx ^ (h % self.nbuckets)

    def _insert_kick(self, fp: int, i1: int, i2: int) -> None:
        """Slow path: both buckets full — deterministic kick walk seeded by
        the fingerprint. Rare below ~80% load; writes the table directly."""
        t = self.table
        idx = i1 if (fp & 1) else i2
        cur = fp
        state = fp | 1
        for _ in range(_MAX_KICKS):
            state = (state * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
            slot = (state >> 60) & (_SLOTS - 1)
            victim = int(t[idx, slot])
            t[idx, slot] = cur
            cur = victim
            idx = self._partner_scalar(cur, idx)
            row = t[idx]
            empty = np.nonzero(row == 0)[0]
            if empty.size:
                row[empty[0]] = cur
                return
        raise CuckooFull(
            f"cuckoo filter full at count={self.count}/{self.capacity} — resize the shard"
        )

    # ------------------------------------------------------------ batch API
    def contains_batch(self, digests) -> np.ndarray:
        raw = self._as_matrix(digests)
        if raw.shape[0] == 0:
            return np.zeros(0, dtype=bool)
        fp, i1 = self._fp_i1(raw)
        i2 = self._partner(fp, i1)
        in1 = (self.table[i1] == fp[:, None]).any(axis=1)
        in2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return in1 | in2

    def add_batch(self, digests) -> list[bool]:
        """Test-and-insert; returns is_new per digest with the same
        within-batch repeat semantics as BloomFilter.add_batch (first
        occurrence new, repeats duplicate)."""
        raw = self._as_matrix(digests)
        n = raw.shape[0]
        if n == 0:
            return []
        fp, i1 = self._fp_i1(raw)
        i2 = self._partner(fp, i1)
        out = np.zeros(n, dtype=bool)
        # vectorized membership pre-check, then batch-dedupe on (fp, i1)
        # (i2 is a function of the pair, so equal pairs ARE equal keys to
        # the filter — first occurrence wins, Bloom add_batch parity)
        present = self.contains_batch(raw)
        key = i1.astype(np.uint64) * np.uint64(1 << 16) + fp.astype(np.uint64)
        _, first_idx = np.unique(key, return_index=True)
        cand_mask = np.zeros(n, dtype=bool)
        cand_mask[first_idx] = True
        cand_mask &= ~present
        cand = np.nonzero(cand_mask)[0]
        if cand.size == 0:
            return out.tolist()
        # vectorized placement: 2 buckets x _SLOTS rounds; within a round,
        # at most one pending key per bucket claims the slot (np.unique
        # first-occurrence), the rest retry next round — O(batch) table
        # touches total, never O(table)
        pending = cand
        t = self.table
        for bucket_arr in (i1, i2):
            for s in range(_SLOTS):
                if pending.size == 0:
                    break
                b = bucket_arr[pending]
                free = t[b, s] == 0
                if not free.any():
                    continue
                fp_idx = pending[free]
                fb = bucket_arr[fp_idx]
                _, ufirst = np.unique(fb, return_index=True)
                winners = fp_idx[ufirst]
                t[bucket_arr[winners], s] = fp[winners]
                out[winners] = True
                placed = np.zeros(n, dtype=bool)
                placed[winners] = True
                pending = pending[~placed[pending]]
        # leftovers: both buckets full (or lost every slot race) — scalar
        # kick walk per key, rare below ~80% load
        fpl, i1l, i2l = fp.tolist(), i1.tolist(), i2.tolist()
        for j in pending.tolist():
            f, a, b = fpl[j], i1l[j], i2l[j]
            row_a, row_b = t[a], t[b]
            if (row_a == f).any() or (row_b == f).any():
                # an earlier same-fp neighbor landed here this batch
                continue
            ea = np.nonzero(row_a == 0)[0]
            if ea.size:
                row_a[ea[0]] = f
            else:
                eb = np.nonzero(row_b == 0)[0]
                if eb.size:
                    row_b[eb[0]] = f
                else:
                    self._insert_kick(f, a, b)
            out[j] = True
        self.count += int(out.sum())
        return out.tolist()

    def add(self, digest: bytes) -> bool:
        """Add; returns True if (probably) already present — Bloom parity."""
        return not self.add_batch([digest])[0]

    def __contains__(self, digest: bytes) -> bool:
        return bool(self.contains_batch([digest])[0])

    def delete_batch(self, digests) -> list[bool]:
        """Remove one stored fingerprint per present digest; returns
        was_present flags. Deleting a never-added key is safe (False) up
        to the filter's false-positive rate — callers should only delete
        keys they themselves admitted (the crawl ledger guarantees it)."""
        raw = self._as_matrix(digests)
        n = raw.shape[0]
        if n == 0:
            return []
        fp, i1 = self._fp_i1(raw)
        i2 = self._partner(fp, i1)
        out = []
        for j in range(n):
            hit = False
            for idx in (int(i1[j]), int(i2[j])):
                slots = np.nonzero(self.table[idx] == fp[j])[0]
                if slots.size:
                    self.table[idx, slots[0]] = 0
                    hit = True
                    break
            if hit:
                self.count -= 1
            out.append(hit)
        return out

    # ------------------------------------------------------------------ io
    def to_bytes(self) -> bytes:
        header = f"{self.capacity}:{self.count}".encode() + b"\n"
        return header + self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        header, _, body = data.partition(b"\n")
        cap_s, count_s = header.decode().split(":")
        cf = cls(int(cap_s))
        cf.table = np.frombuffer(body, dtype=np.uint16).reshape(cf.nbuckets, _SLOTS).copy()
        cf.count = int(count_s)
        return cf

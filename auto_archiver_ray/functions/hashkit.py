"""Content-hash kernels.

Parity targets:
- ``content_hash`` reproduces the reference's chunked file hashing
  (ref:utils/misc.py:53-61) applied to in-memory bytes — chunking is a
  memory optimization there, the digest is identical.
- ``tagged_hash`` reproduces hash_enricher's ``"<ALGO>:<hex>"`` format
  (ref:modules/hash_enricher/hash_enricher.py:25-42); golden digests pinned
  by tests/test_hashkit.py mirror ref:tests/enrichers/test_hash_enricher.py:8-28.
"""

from __future__ import annotations

import hashlib

_ALGOS = {
    "SHA-256": hashlib.sha256,
    "SHA3-512": hashlib.sha3_512,
}


def content_hash(data: bytes, algorithm: str = "SHA-256") -> str:
    """Hex digest of ``data``; empty string for unknown algorithms
    (mirroring hash_enricher's silent-empty contract,
    ref:modules/hash_enricher/hash_enricher.py:35-42)."""
    ctor = _ALGOS.get(algorithm)
    if ctor is None:
        return ""
    h = ctor()
    h.update(data)
    return h.hexdigest()


def tagged_hash(data: bytes, algorithm: str = "SHA-256") -> str:
    """``"<ALGO>:<hex>"`` as written into media rows by the hash enricher."""
    hd = content_hash(data, algorithm)
    return f"{algorithm}:{hd}" if hd else ""


def hash_batch(payloads: list[bytes | None], algorithm: str = "SHA-256") -> list[str]:
    """Vector form; None payloads hash to "" (media without a file is
    skipped by the reference, ref:modules/hash_enricher/hash_enricher.py:28-31)."""
    ctor = _ALGOS.get(algorithm)
    if ctor is None:
        return [""] * len(payloads)
    out = []
    for p in payloads:
        if p is None:
            out.append("")
        else:
            h = ctor()
            h.update(p)
            out.append(h.hexdigest())
    return out

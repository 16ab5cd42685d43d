"""Result-merge kernels: the fold semantics of the extractor try-chain.

Parity targets:
- ``merge_results`` reproduces ``Metadata.merge`` (ref:core/metadata.py:37-64):
  non-empty right status wins; scalar keys overwrite; dict/set keys union
  (right wins on dict key conflict); list keys concatenate; media lists
  concatenate.
- ``choose_most_complete`` reproduces ref:core/metadata.py:221-235:
  first result with strictly more media wins; on media-count tie, strictly
  more metadata keys wins; earliest element wins all remaining ties.
- ``dedup_media_by_hash`` reproduces ``remove_duplicate_media_by_hash``
  (ref:core/metadata.py:170-198) over in-memory media structs: keep first
  occurrence per content hash, computing missing hashes from payload bytes.

These operate on plain dicts (one "result" = {"status": str, "metadata":
dict, "media": list[dict]}) so they can run inside ``map_batches`` and
``groupby().map_groups`` without custom classes crossing the object store.
"""

from __future__ import annotations

import hashlib
from typing import Any


def merge_results(left: dict[str, Any], right: dict[str, Any] | None) -> dict[str, Any]:
    """Fold ``right`` into ``left`` (mutates and returns left)."""
    if not right:
        return left
    rstatus = right.get("status") or ""
    if rstatus:
        left["status"] = rstatus
    lmeta = left.setdefault("metadata", {})
    for k, v in right.get("metadata", {}).items():
        if not isinstance(v, (dict, list, set)) or k not in lmeta:
            lmeta[k] = v
        elif isinstance(v, (dict, set)):
            lmeta[k] = lmeta[k] | v
        elif isinstance(v, list):
            lmeta[k] = lmeta[k] + v
    left.setdefault("media", []).extend(right.get("media", []))
    return left


def is_success(status: str) -> bool:
    """Parity: ref:core/metadata.py:95-96 — substring test."""
    return "success" in status


# bookkeeping keys ignored by the emptiness test (ref:core/metadata.py:98-102)
_BOOKKEEPING_KEYS = frozenset(
    ["_processed_at", "url", "original_url", "total_bytes", "total_size", "archive_duration_seconds"]
)


def is_empty(result: dict) -> bool:
    """True when a result archived nothing meaningful: not a success, no
    media, and no metadata keys beyond bookkeeping.
    Parity: ref:core/metadata.py:98-102."""
    meaningful = set(result.get("metadata", {})) - _BOOKKEEPING_KEYS
    return (
        not is_success(result.get("status", ""))
        and len(result.get("media", [])) == 0
        and len(meaningful) == 0
    )


def choose_most_complete(results: list[dict[str, Any]]) -> dict[str, Any] | None:
    if not results:
        return None
    best = results[0]
    for r in results[1:]:
        if len(r.get("media", [])) > len(best.get("media", [])):
            best = r
        elif len(r.get("media", [])) == len(best.get("media", [])) and len(
            r.get("metadata", {})
        ) > len(best.get("metadata", {})):
            best = r
    return best


def dedup_media_by_hash(media: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """Keep first media per content hash; media with no payload and no hash
    pass through (mirrors the no-filename passthrough,
    ref:core/metadata.py:185-187)."""
    seen: set[str] = set()
    out: list[dict[str, Any]] = []
    for m in media:
        h = m.get("hash") or ""
        if not h:
            payload = m.get("payload")
            if payload is None:
                out.append(m)
                continue
            h = hashlib.sha256(payload).hexdigest()
        if h in seen:
            continue
        seen.add(h)
        out.append(m)
    return out

"""Storage-key generation policies.

Parity: ref:core/storage.py:80-114 — ``path_generator ∈ {flat, url, random}``
× ``filename_generator ∈ {random, static}``. Differences by design:

- "random" is re-expressed as *deterministic* key derivation from
  (url, media-id) content hashes — ``random_str`` (ref:utils/misc.py:48-50)
  would break Ray task retry idempotency and resume lineage (SURVEY.md §7.5).
  Same shape (24 hex chars), stable across re-execution.
- "static" keeps the reference's exact semantics: first 24 chars of the
  content hash (ref:core/storage.py:105-109).
"""

from __future__ import annotations

import hashlib
import posixpath
import re

_SLUG_KEEP_RE = re.compile(r"[^a-z0-9]+")


def slugify(value: str) -> str:
    """Deterministic ASCII slug (lowercase, runs of non-alphanumerics → '-')."""
    return _SLUG_KEEP_RE.sub("-", value.lower()).strip("-")


def _derived24(*parts: str) -> str:
    h = hashlib.sha256("\x1f".join(parts).encode("utf-8")).hexdigest()
    return h[:24]


def hierarchical_path(url: str, max_segment: int = 64, max_depth: int = 8) -> str:
    """GDrive-style folder-tree path: host + url path segments, each
    slugified, nested. This is the portable half of GDriveStorage's keying
    (ref:modules/gdrive_storage/gdrive_storage.py:62-95: the media key is
    split on the path separator and each segment becomes a Drive folder
    resolved-or-created under its parent; the Drive API calls themselves
    are not portable). Query/fragment excluded; depth and per-segment
    length capped so hostile URLs can't mint unbounded trees."""
    from urllib.parse import urlparse

    p = urlparse(url)
    segs = [p.netloc] + [s for s in p.path.split("/") if s]
    segs = [slugify(s)[:max_segment] for s in segs[:max_depth]]
    segs = [s for s in segs if s]
    return posixpath.join(*segs) if segs else ""


def folder_walk(key: str) -> tuple[list[str], str]:
    """(folder segments in create order, filename) — the upload walk of
    ref:gdrive_storage.py:83-95 (each segment resolved-or-created under its
    parent, file stored in the deepest folder)."""
    parts = [p for p in key.split("/") if p]
    if not parts:
        return [], ""
    return parts[:-1], parts[-1]


def storage_key(
    url: str,
    media_id: str,
    ext: str,
    content_hash_hex: str,
    folder: str = "",
    path_generator: str = "flat",
    filename_generator: str = "static",
) -> str:
    """Build the storage key ``<folder>/<path>/<filename><ext>``.

    path: flat → "", url → slugify(url)[:70], random → deterministic 24-hex
    derived from the url, folders → GDrive-style nested folder tree from
    the url's host + path segments (:func:`hierarchical_path`). filename:
    static → content_hash[:24], random → deterministic 24-hex derived from
    (url, media_id).
    """
    if path_generator == "flat":
        path = ""
    elif path_generator == "url":
        path = slugify(url)[:70]
    elif path_generator == "random":
        path = _derived24("path", url)
    elif path_generator == "folders":
        path = hierarchical_path(url)
    else:
        raise ValueError(f"Invalid path_generator: {path_generator}")

    if filename_generator == "static":
        filename = content_hash_hex[:24]
    elif filename_generator == "random":
        filename = _derived24("file", url, media_id)
    else:
        raise ValueError(f"Invalid filename_generator: {filename_generator}")

    return posixpath.join(folder, path, f"{filename}{ext}")

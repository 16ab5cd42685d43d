"""Blob-storage sink: write media payloads to content-addressed keys.

The reference's storage contract (ref:core/storage.py:43-114): generate a
key per media file, upload, record the CDN url; the S3 variant skips uploads
whose content hash already exists under ``no-dups/`` (ref:modules/s3_storage/
s3_storage.py:50-73). Ray-native shape:

1. global content dedup FIRST (`dedup.exact_dedup` on sha256) — one shuffle
   of (hash, id) pairs replaces O(N) remote existence probes;
2. the surviving rows' payloads are written inside a sink ``map_batches``
   (each task writes its own batch's blobs — embarrassingly parallel, no
   driver involvement), returning (storage_key, blob_path, cdn_url) rows.

Local-directory backend only in this sandbox (the LocalStorage semantics,
ref:modules/local_storage/local_storage.py:11-46 incl. the path-length
guard); S3 would swap ``_write_one`` for a boto3 put.
"""

from __future__ import annotations

import os

import pyarrow as pa

MAX_PATH = 255  # local_storage.py length guard


def write_blobs_stage(root: str, cdn_prefix: str = "file://"):
    """map_batches sink: rows with (storage_key, payload) → written blobs +
    (storage_key, blob_path, cdn_url, n_bytes) rows."""

    def fn(batch: pa.Table) -> pa.Table:
        keys = batch.column("storage_key").to_pylist()
        payloads = batch.column("payload").to_pylist()
        paths, urls, sizes = [], [], []
        for k, p in zip(keys, payloads):
            rel = k if len(os.path.join(root, k)) <= MAX_PATH else k[-(MAX_PATH - len(root) - 1) :]
            dest = os.path.join(root, rel)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            tmp = dest + ".tmp"
            with open(tmp, "wb") as f:
                f.write(p or b"")
            os.replace(tmp, dest)  # idempotent on retry
            paths.append(dest)
            urls.append(f"{cdn_prefix}{dest}")
            sizes.append(len(p or b""))
        return pa.table(
            {
                "storage_key": pa.array(keys, pa.string()),
                "blob_path": pa.array(paths, pa.string()),
                "cdn_url": pa.array(urls, pa.string()),
                "n_bytes": pa.array(sizes, pa.int64()),
            }
        )

    return fn


def store_media(ds, root: str, key_col: str = "storage_key", id_col: str = "media_url_hash"):
    """Content-dedup then parallel blob write; returns the written-manifest
    Dataset."""
    from .dedup import exact_dedup

    deduped = exact_dedup(ds, key_col, id_col)
    return deduped.map_batches(write_blobs_stage(root), batch_format="pyarrow")

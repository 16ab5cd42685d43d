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


def store_warc(
    ds,
    root: str,
    url_col: str = "url",
    payload_col: str = "html",
    ts_col: str = "warc_ts",
    content_type: str = "text/html",
    batch_size: int = 256,
    gz: bool = True,
    revisit_col: str | None = None,
):
    """Distributed WARC sink — the archive-output surface the reference
    reaches through browsertrix WACZ (one archive per URL,
    ref:modules/wacz_extractor_enricher/wacz_extractor_enricher.py:75-110);
    at corpus scale the standard layout is many multi-record ``.warc.gz``
    shard files (the Common Crawl convention), which is what this writes.

    Each batch serializes its rows as WARC/1.0 response records
    (:func:`..functions.warckit.build_record` — deterministic record ids,
    ``WARC-Date`` from ``ts_col``), each record its own gzip MEMBER
    (``mtime=0`` — byte-deterministic; per-record members keep any record
    independently seekable, the standard convention), and the batch lands
    as ONE content-addressed shard: name = blake2b of the member bytes, so
    a Ray task retry re-writes the identical file instead of duplicating
    records (the resumable-output contract; write is tmp+rename atomic).
    Returns the manifest Dataset ``(url, warc_file, payload_sha256,
    payload_len)`` — the join-back key for downstream stages.  Roundtrip
    contract (oracle-checked by q_archive_warc): reading the shards back
    with :func:`..sources.warc.read_warc_records` yields byte-identical
    payloads per url."""

    def fn(batch: pa.Table) -> pa.Table:
        return write_warc_shard(
            batch,
            root,
            url_col=url_col,
            payload_col=payload_col,
            ts_col=ts_col,
            content_type=content_type,
            gz=gz,
            revisit_col=revisit_col,
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def write_warc_shard(
    batch: pa.Table,
    root: str,
    url_col: str = "url",
    payload_col: str = "html",
    ts_col: str = "warc_ts",
    content_type: str = "text/html",
    gz: bool = True,
    revisit_col: str | None = None,
) -> pa.Table:
    """Serialize one Arrow batch as a content-addressed WARC shard file and
    return its manifest table (the :func:`store_warc` kernel, also used as
    an in-loop tee by the crawl pipelines' ``warc_root`` sink). The shard
    name is the blake2b of its bytes, so a retry (or a resumed epoch
    re-fetch) re-writes the identical file — idempotent by construction."""
    import gzip
    import hashlib
    import io

    from ..functions import warckit

    urls = batch.column(url_col).to_pylist()
    payloads = batch.column(payload_col).to_pylist()
    refers = (
        batch.column(revisit_col).to_pylist()
        if revisit_col and revisit_col in batch.column_names
        else [""] * len(urls)
    )
    dates = None
    if ts_col and ts_col in batch.column_names:
        dates = [
            t.strftime("%Y-%m-%dT%H:%M:%SZ") if t is not None else "2024-01-01T00:00:00Z"
            for t in batch.column(ts_col).to_pylist()
        ]
    members, shas, lens = [], [], []
    for i, (u, p) in enumerate(zip(urls, payloads)):
        p = p or b""
        sha_hex = hashlib.sha256(p).hexdigest()
        if refers[i]:
            # WARC/1.1 revisit (identical-payload-digest profile): the
            # duplicate payload is NOT stored again — the record carries the
            # digest and points at the record that holds the bytes.
            rec = warckit.build_record(
                "revisit",
                u,
                b"",
                warc_date=dates[i] if dates else "2024-01-01T00:00:00Z",
                extra_headers={
                    "WARC-Refers-To-Target-URI": str(refers[i]),
                    "WARC-Payload-Digest": f"sha256:{sha_hex}",
                    "WARC-Profile": "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest",
                },
            )
        else:
            body = warckit.build_http_response(p, content_type)
            rec = warckit.build_record(
                "response",
                u,
                body,
                warc_date=dates[i] if dates else "2024-01-01T00:00:00Z",
            )
        if gz:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                g.write(rec)
            rec = buf.getvalue()
        members.append(rec)
        shas.append(sha_hex)
        lens.append(len(p))
    blob = b"".join(members)
    name = (
        hashlib.blake2b(blob, digest_size=16).hexdigest()
        + (".warc.gz" if gz else ".warc")
    )
    os.makedirs(root, exist_ok=True)
    dest = os.path.join(root, name)
    if not os.path.exists(dest):  # content-addressed: retry writes same file
        tmp = dest + f".tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, dest)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_file": pa.array([name] * len(urls), pa.string()),
            "payload_sha256": pa.array(shas, pa.string()),
            "payload_len": pa.array(lens, pa.int64()),
        }
    )


def store_jsonl(ds, root: str, cols: list[str], batch_size: int = 1024, gz: bool = True):
    """Distributed JSONL shard sink — the training-data delivery format
    (one JSON object per line, the layout every LLM data loader ingests),
    completing the sink family beside partitioned parquet and
    :func:`store_warc`. Same resumable-output contract: each batch
    serializes its rows (keys in ``cols`` order, ``sort_keys`` off so the
    column contract is explicit, compact separators, ``ensure_ascii=False``
    so multibyte text stays readable) into ONE content-addressed shard —
    name = blake2b of the bytes, tmp+rename atomic, so task retries
    re-write the identical file instead of duplicating rows. Returns the
    manifest Dataset ``(jsonl_file, n_rows, bytes)``, one row per shard.

    Roundtrip contract (oracle-checked by q_doc_jsonl_export):
    ``json.loads`` per line recovers every value exactly — writer
    escaping and reader parsing must invert."""

    def fn(batch: pa.Table) -> pa.Table:
        return write_jsonl_shard(batch, root, cols, gz=gz)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def write_jsonl_shard(batch: pa.Table, root: str, cols: list[str], gz: bool = True) -> pa.Table:
    """Serialize one Arrow batch as a content-addressed ``.jsonl[.gz]``
    shard and return its one-row manifest (the :func:`store_jsonl`
    kernel)."""
    import gzip
    import hashlib
    import io
    import json

    col_lists = [batch.column(c).to_pylist() for c in cols]
    lines = []
    for vals in zip(*col_lists):
        obj = dict(zip(cols, vals))
        lines.append(json.dumps(obj, ensure_ascii=False, separators=(",", ":")))
    blob = ("\n".join(lines) + "\n").encode("utf-8") if lines else b""
    if gz:
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
            g.write(blob)
        out = buf.getvalue()
    else:
        out = blob
    name = hashlib.blake2b(out, digest_size=16).hexdigest() + (".jsonl.gz" if gz else ".jsonl")
    os.makedirs(root, exist_ok=True)
    dest = os.path.join(root, name)
    if not os.path.exists(dest):  # content-addressed: retry writes same file
        tmp = dest + f".tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(out)
        os.replace(tmp, dest)
    return pa.table(
        {
            "jsonl_file": pa.array([name], pa.string()),
            "n_rows": pa.array([batch.num_rows], pa.int64()),
            "bytes": pa.array([len(out)], pa.int64()),
        }
    )


def read_jsonl_shards(root: str):
    """Independent reader for :func:`store_jsonl` output: a Dataset over
    the shard FILES (parallel read — one task per shard), each task
    parsing its lines back to rows. The q_doc_jsonl_export oracle compares
    this READBACK against the source, so the writer cannot self-verify."""
    import glob as _glob

    import ray.data as rd

    files = sorted(_glob.glob(os.path.join(root, "*.jsonl*")))

    def parse(batch: pa.Table) -> pa.Table:
        import gzip
        import json

        rows: list[dict] = []
        for path in batch.column("path").to_pylist():
            op = gzip.open if path.endswith(".gz") else open
            with op(path, "rt", encoding="utf-8") as f:
                for line in f:
                    if line.strip():
                        rows.append(json.loads(line))
        if not rows:
            return pa.table({})
        keys = list(rows[0].keys())
        return pa.table({k: pa.array([r[k] for r in rows]) for k in keys})

    return rd.from_items([{"path": p} for p in files]).map_batches(
        parse, batch_format="pyarrow", batch_size=1
    )

"""Pure WARC/1.0 + WACZ record parsing and writing (stdlib only).

The reference's main offline-archive media path iterates WARC records out
of a browsertrix WACZ, filters responses by URL relevance + media mimetype,
dedups by seen URL, and reads pages.jsonl for title/text
(ref:modules/wacz_extractor_enricher/wacz_extractor_enricher.py:156-266).
This module supplies the record-level plumbing; the Ray Data source lives
in sources/warc.py and the media semantics in stages/media.py
(wacz_media_plan).

Format notes (public WARC/1.0 spec, ISO 28500):
- a WARC file is a sequence of records; each record is a header block
  (``WARC/1.0`` version line + ``Name: value`` lines, CRLF line ends)
  terminated by an empty line, then exactly ``Content-Length`` bytes of
  body, then CRLF CRLF;
- ``.warc.gz`` files are CONCATENATED gzip members (one per record, per
  spec recommendation); ``zlib`` is run member-by-member so the whole file
  never has to be decompressed as one blob;
- ``response`` record bodies are full HTTP responses: status line, header
  lines, empty line, payload. ``Content-Type`` for media filtering is the
  HTTP header, not the WARC header.
- a WACZ is a zip with ``archive/*.warc.gz`` chunks and
  ``pages/pages.jsonl`` (one JSON object per page: url/title/text).
"""

from __future__ import annotations

import io
import json
import zipfile
import zlib
from dataclasses import dataclass, field

_CRLF = b"\r\n"


@dataclass
class WarcRecord:
    rec_type: str
    headers: dict[str, str]
    body: bytes
    offset: int = 0
    # response records only — parsed HTTP parts
    http_status: int | None = None
    http_headers: dict[str, str] = field(default_factory=dict)
    payload: bytes = b""

    @property
    def target_uri(self) -> str:
        return self.headers.get("WARC-Target-URI", "")

    @property
    def warc_content_type(self) -> str:
        return self.headers.get("Content-Type", "")


def _parse_http_response(body: bytes) -> tuple[int | None, dict[str, str], bytes]:
    head, sep, payload = body.partition(_CRLF + _CRLF)
    if not sep:
        return None, {}, body
    lines = head.split(_CRLF)
    status = None
    try:
        parts = lines[0].split(None, 2)
        if parts and parts[0].startswith(b"HTTP/"):
            status = int(parts[1])
    except (IndexError, ValueError):
        return None, {}, body
    hdrs: dict[str, str] = {}
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        if _:
            hdrs[k.decode("latin-1").strip()] = v.decode("latin-1").strip()
    return status, hdrs, payload


def iter_warc_records(data: bytes):
    """Yield WarcRecord from raw (uncompressed) WARC bytes."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            return
        header_blob = data[pos:hdr_end]
        lines = header_blob.split(_CRLF)
        if not lines or not lines[0].startswith(b"WARC/"):
            return
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(b":")
            if _:
                headers[k.decode("latin-1").strip()] = v.decode("latin-1").strip()
        length = int(headers.get("Content-Length", "0"))
        body_start = hdr_end + 4
        body = data[body_start : body_start + length]
        rec = WarcRecord(
            rec_type=headers.get("WARC-Type", ""),
            headers=headers,
            body=body,
            offset=pos,
        )
        if rec.rec_type == "response":
            rec.http_status, rec.http_headers, rec.payload = _parse_http_response(body)
        else:
            rec.payload = body
        yield rec
        pos = body_start + length
        # record terminator
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2


def gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the .warc.gz layout)."""
    out = []
    while data:
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out.append(d.decompress(data))
        out.append(d.flush())
        data = d.unused_data
    return b"".join(out)


def parse_warc_bytes(data: bytes, gz: bool | None = None):
    """iter_warc_records over raw or gzipped bytes (auto-detect by magic)."""
    if gz is None:
        gz = data[:2] == b"\x1f\x8b"
    if gz:
        data = gunzip_members(data)
    return iter_warc_records(data)


# ---------------------------------------------------------------------------
# Writing (the WARC sink + deterministic test fixtures)
# ---------------------------------------------------------------------------


def build_record(
    rec_type: str,
    target_uri: str,
    body: bytes,
    warc_date: str = "2024-01-01T00:00:00Z",
    content_type: str = "application/http; msgtype=response",
    extra_headers: dict[str, str] | None = None,
) -> bytes:
    """Serialize one WARC/1.0 record (deterministic: record id derives from
    the uri+date, never a random uuid — retry/lineage-safe)."""
    import hashlib

    rid = hashlib.sha256(f"{rec_type}|{target_uri}|{warc_date}".encode()).hexdigest()[:32]
    headers = [
        ("WARC-Type", rec_type),
        ("WARC-Record-ID", f"<urn:uuid:{rid}>"),
        ("WARC-Date", warc_date),
        ("WARC-Target-URI", target_uri),
        ("Content-Type", content_type),
        ("Content-Length", str(len(body))),
    ]
    if extra_headers:
        headers.extend(extra_headers.items())
    head = b"WARC/1.0" + _CRLF + _CRLF.join(
        f"{k}: {v}".encode("latin-1") for k, v in headers
    ) + _CRLF + _CRLF
    return head + body + _CRLF + _CRLF


def build_http_response(payload: bytes, content_type: str, status: int = 200) -> bytes:
    return (
        f"HTTP/1.1 {status} OK".encode() + _CRLF
        + f"Content-Type: {content_type}".encode() + _CRLF
        + f"Content-Length: {len(payload)}".encode() + _CRLF + _CRLF
        + payload
    )


def write_wacz(
    path: str,
    warc_bytes: bytes,
    pages: list[dict] | None = None,
    gz_chunks: int = 1,
) -> str:
    """Assemble a minimal WACZ: archive/data-N.warc.gz chunk(s) +
    pages/pages.jsonl. ``gz_chunks`` > 1 splits the warc into several gzip
    chunk files (the browsertrix layout the reference merges back,
    ref:wacz_extractor_enricher.py:188-196)."""
    import gzip

    recs = warc_bytes
    chunk_size = max(1, (len(recs) + gz_chunks - 1) // gz_chunks)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as z:
        for i in range(gz_chunks):
            chunk = recs[i * chunk_size : (i + 1) * chunk_size]
            if not chunk:
                continue
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                g.write(chunk)
            z.writestr(f"archive/data-{i:03d}.warc.gz", buf.getvalue())
        if pages is not None:
            z.writestr(
                "pages/pages.jsonl",
                "\n".join(json.dumps(p, sort_keys=True) for p in pages) + "\n",
            )
    return path


def read_wacz_warc_bytes(path: str) -> bytes:
    """Merged, decompressed WARC stream of a WACZ (chunks merged in sorted
    filename order — exactly the reference's merge,
    ref:wacz_extractor_enricher.py:188-196)."""
    out = []
    with zipfile.ZipFile(path) as z:
        names = sorted(n for n in z.namelist() if n.startswith("archive/") and n.endswith(".gz"))
        merged = b"".join(z.read(n) for n in names)
    return gunzip_members(merged)


def read_wacz_pages(path: str) -> list[dict]:
    """pages.jsonl objects (url/title/text) of a WACZ."""
    with zipfile.ZipFile(path) as z:
        try:
            blob = z.read("pages/pages.jsonl")
        except KeyError:
            return []
    return [json.loads(ln) for ln in blob.decode("utf-8").splitlines() if ln.strip()]

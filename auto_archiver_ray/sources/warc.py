"""WARC / WACZ sources: offline web archives as Ray Datasets.

The reference's WACZ extract path shells out to browsertrix, merges the
archive's .warc.gz chunks, and iterates records with warcio
(ref:modules/wacz_extractor_enricher/wacz_extractor_enricher.py:176-266).
Here the record walk is a Ray Data source: one read task per archive file
(the Common-Crawl partitioning unit — WARC files are the natural ~1 GB
shard), each task parsing its file's records into Arrow rows with the
pure-stdlib parser in functions/warckit.py. Record PAYLOADS stay in the
row only until the first projection — the media-plan stage drops them to a
byte length before any shuffle (wide-binary-rows discipline).

Record schema:
    warc_file:string, rec_offset:int64, rec_type:string, target_uri:string,
    warc_content_type:string, http_status:int64, http_content_type:string,
    payload:binary
"""

from __future__ import annotations

import os

import pyarrow as pa

from ..functions import warckit


def _records_table(path: str, data: bytes, with_payload: bool) -> pa.Table:
    f, off, rt, uri, wct, hs, hct, pl, pln = [], [], [], [], [], [], [], [], []
    ref, dig = [], []
    base = os.path.basename(path)
    for rec in warckit.parse_warc_bytes(data):
        f.append(base)
        off.append(rec.offset)
        rt.append(rec.rec_type)
        uri.append(rec.target_uri)
        wct.append(rec.warc_content_type)
        hs.append(rec.http_status if rec.http_status is not None else -1)
        hct.append(rec.http_headers.get("Content-Type", ""))
        pl.append(rec.payload if with_payload else b"")
        pln.append(len(rec.payload))
        ref.append(rec.headers.get("WARC-Refers-To-Target-URI", ""))
        dig.append(rec.headers.get("WARC-Payload-Digest", ""))
    return pa.table(
        {
            "warc_file": pa.array(f, pa.string()),
            "rec_offset": pa.array(off, pa.int64()),
            "rec_type": pa.array(rt, pa.string()),
            "target_uri": pa.array(uri, pa.string()),
            "warc_content_type": pa.array(wct, pa.string()),
            "http_status": pa.array(hs, pa.int64()),
            "http_content_type": pa.array(hct, pa.string()),
            "payload": pa.array(pl, pa.binary()),
            "payload_len": pa.array(pln, pa.int64()),
            "refers_to": pa.array(ref, pa.string()),
            "payload_digest": pa.array(dig, pa.string()),
        }
    )


def read_warc_records(paths: str | list[str], with_payload: bool = True):
    """Dataset of WARC records — one parse task per .warc/.warc.gz file."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        tables = [
            _records_table(p, d, with_payload)
            for p, d in zip(batch.column("path").to_pylist(), batch.column("bytes").to_pylist())
        ]
        return pa.concat_tables(tables) if tables else _records_table("", b"", with_payload)

    return ds.map_batches(parse, batch_format="pyarrow")


def read_wacz_records(paths: str | list[str], with_payload: bool = True):
    """Dataset of WARC records from WACZ archives (chunk merge inside the
    read task, ref:wacz_extractor_enricher.py:188-196)."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        import io
        import zipfile

        tables = []
        for p, d in zip(batch.column("path").to_pylist(), batch.column("bytes").to_pylist()):
            with zipfile.ZipFile(io.BytesIO(d)) as z:
                names = sorted(
                    n for n in z.namelist() if n.startswith("archive/") and n.endswith(".gz")
                )
                merged = b"".join(z.read(n) for n in names)
            tables.append(_records_table(p, warckit.gunzip_members(merged), with_payload))
        return pa.concat_tables(tables) if tables else _records_table("", b"", with_payload)

    return ds.map_batches(parse, batch_format="pyarrow")


def read_wacz_pages(paths: str | list[str]):
    """Dataset over WACZ pages.jsonl entries: (wacz_file, url, title, text) —
    the title/text merge source (ref:wacz_extractor_enricher.py:164-173)."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        import io
        import json
        import zipfile

        wf, u, t, x = [], [], [], []
        for p, d in zip(batch.column("path").to_pylist(), batch.column("bytes").to_pylist()):
            base = os.path.basename(p)
            with zipfile.ZipFile(io.BytesIO(d)) as z:
                try:
                    blob = z.read("pages/pages.jsonl")
                except KeyError:
                    continue
            for ln in blob.decode("utf-8").splitlines():
                if not ln.strip():
                    continue
                obj = json.loads(ln)
                wf.append(base)
                u.append(obj.get("url", ""))
                t.append(obj.get("title", ""))
                x.append(obj.get("text", ""))
        return pa.table(
            {
                "wacz_file": pa.array(wf, pa.string()),
                "url": pa.array(u, pa.string()),
                "title": pa.array(t, pa.string()),
                "text": pa.array(x, pa.string()),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Deterministic fixture WACZ archives (tests + the DuckDB oracle's ground
# truth; no external data — everything derives from the fixed spec below)
# ---------------------------------------------------------------------------

WACZ_FIXTURE_ROOT = "/tmp/aar_wacz_v1"

# (target_uri, http_content_type, payload_tag) per archive; payload bytes
# derive from the tag so sizes are stable. Mix: media, duplicate URL,
# irrelevant (favicon/.svg/profile_images), non-media mimetype, twitter
# name= rewrite case, plus screenshot 'resource' records and one 'request'.
_FIXTURE_SPEC = {
    "fixture-a.wacz": {
        "responses": [
            ("https://site00.example.org/img/a.jpg", "image/jpeg", "a1"),
            ("https://site00.example.org/v/clip.mp4", "video/mp4", "a2"),
            ("https://site00.example.org/img/a.jpg", "image/jpeg", "a3"),  # dup URL → seen-skip
            ("https://site00.example.org/favicon.ico", "image/x-icon", "a4"),  # irrelevant
            ("https://site00.example.org/page.html", "text/html; charset=utf-8", "a5"),  # non-media
            ("https://pbs.twimg.com/media/abc?format=jpg&name=small", "image/jpeg", "a6"),  # name= rewrite
            ("https://site00.example.org/logo.svg", "image/svg+xml", "a7"),  # irrelevant suffix
            ("https://site00.example.org/audio/pod.mp3", "audio/mpeg", "a8"),
        ],
        "screenshots": ["https://site00.example.org/", "https://site00.example.org/p/1"],
        "pages": [
            {"url": "https://site00.example.org/", "title": "Site zero", "text": "hello world zero"},
        ],
    },
    "fixture-b.wacz": {
        "responses": [
            ("https://pbs.twimg.com/profile_images/u/x_400x400.jpg", "image/jpeg", "b1"),  # irrelevant
            ("https://site01.example.org/img/b-first.png", "image/png", "b2"),
            ("https://site01.example.org/img/b-first.png", "image/png", "b3"),  # dup
            ("https://site01.example.org/img/late.gif", "image/gif", "b4"),
            ("https://site01.example.org/doc.pdf", "application/pdf", "b5"),  # non-media
        ],
        "screenshots": [],
        "pages": [
            {"url": "https://site01.example.org/", "title": "Site one", "text": "hello world one"},
        ],
    },
}


def ensure_fixture_wacz(root: str = WACZ_FIXTURE_ROOT) -> dict:
    """Idempotently build the fixture WACZ archives and a parsed-records
    parquet (the oracle's ground-truth table). Returns {"wacz": [paths],
    "records_parquet": path}."""
    import pyarrow.parquet as pq

    records_pq = os.path.join(root, "records.parquet")
    paths = [os.path.join(root, name) for name in sorted(_FIXTURE_SPEC)]
    if os.path.isdir(root) and os.path.exists(records_pq):
        return {"wacz": paths, "records_parquet": records_pq}
    tmp = f"{root}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    tables = []
    for name in sorted(_FIXTURE_SPEC):
        spec = _FIXTURE_SPEC[name]
        recs = []
        day = 1
        for uri, ct, tag in spec["responses"]:
            payload = (tag * 17).encode()
            body = warckit.build_http_response(payload, ct)
            recs.append(
                warckit.build_record(
                    "response", uri, body, warc_date=f"2024-01-{day:02d}T00:00:00Z"
                )
            )
            day += 1
        for uri in spec["screenshots"]:
            recs.append(
                warckit.build_record(
                    "resource",
                    uri,
                    b"\x89PNG_fixture_bytes",
                    warc_date=f"2024-01-{day:02d}T00:00:00Z",
                    content_type="image/png",
                )
            )
            day += 1
        # one request record — must be ignored by the media walk
        recs.append(
            warckit.build_record(
                "request",
                spec["responses"][0][0],
                b"GET / HTTP/1.1\r\n\r\n",
                content_type="application/http; msgtype=request",
            )
        )
        warc = b"".join(recs)
        warckit.write_wacz(os.path.join(tmp, name), warc, pages=spec["pages"], gz_chunks=2)
        tables.append(_records_table(name, warc, with_payload=False).drop_columns(["payload"]))
    import pyarrow as pa_mod

    pq.write_table(pa_mod.concat_tables(tables), os.path.join(tmp, "records.parquet"))
    try:
        os.rename(tmp, root)
    except OSError:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return {"wacz": paths, "records_parquet": records_pq}

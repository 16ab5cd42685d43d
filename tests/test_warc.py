"""WARC/WACZ source tests: pure parser round-trip, chunked-gzip merge,
pages.jsonl, and the media-walk semantics of the reference
(ref:modules/wacz_extractor_enricher/wacz_extractor_enricher.py:176-266)."""

import pandas as pd
import pytest

from auto_archiver_ray.functions import warckit


def test_warc_roundtrip_plain_and_gz():
    recs = [
        warckit.build_record(
            "response",
            "https://a.example.org/x.jpg",
            warckit.build_http_response(b"JPEGDATA", "image/jpeg"),
        ),
        warckit.build_record(
            "resource", "https://a.example.org/", b"PNGDATA", content_type="image/png"
        ),
        warckit.build_record(
            "request", "https://a.example.org/x.jpg", b"GET /x.jpg HTTP/1.1\r\n\r\n",
            content_type="application/http; msgtype=request",
        ),
    ]
    blob = b"".join(recs)
    parsed = list(warckit.iter_warc_records(blob))
    assert [r.rec_type for r in parsed] == ["response", "resource", "request"]
    r0 = parsed[0]
    assert r0.target_uri == "https://a.example.org/x.jpg"
    assert r0.http_status == 200
    assert r0.http_headers["Content-Type"] == "image/jpeg"
    assert r0.payload == b"JPEGDATA"
    assert parsed[1].warc_content_type == "image/png"
    assert parsed[1].payload == b"PNGDATA"
    # offsets strictly increasing, first at 0
    offs = [r.offset for r in parsed]
    assert offs[0] == 0 and offs == sorted(offs) and len(set(offs)) == 3

    # gzip: single member and concatenated members both parse identically
    import gzip as _gzip
    import io

    one = io.BytesIO()
    with _gzip.GzipFile(fileobj=one, mode="wb", mtime=0) as g:
        g.write(blob)
    assert [r.target_uri for r in warckit.parse_warc_bytes(one.getvalue())] == [
        r.target_uri for r in parsed
    ]
    members = b""
    for rec in recs:
        buf = io.BytesIO()
        with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
            g.write(rec)
        members += buf.getvalue()
    assert [r.target_uri for r in warckit.parse_warc_bytes(members)] == [
        r.target_uri for r in parsed
    ]


def test_wacz_chunk_merge_and_pages(tmp_path):
    recs = b"".join(
        warckit.build_record(
            "response",
            f"https://b.example.org/{i}.png",
            warckit.build_http_response(b"P" * (10 + i), "image/png"),
        )
        for i in range(5)
    )
    path = str(tmp_path / "t.wacz")
    warckit.write_wacz(path, recs, pages=[{"url": "https://b.example.org/", "title": "T", "text": "tx"}], gz_chunks=3)
    # merged+decompressed bytes identical to the original stream
    assert warckit.read_wacz_warc_bytes(path) == recs
    pages = warckit.read_wacz_pages(path)
    assert pages == [{"url": "https://b.example.org/", "title": "T", "text": "tx"}]


@pytest.mark.usefixtures("ray_session")
def test_wacz_media_plan_semantics():
    """Fixture archives through the Ray source + media plan: seen-set dedup,
    relevance filter, mimetype filter, sequential keys, twitter rewrite."""
    from auto_archiver_ray.sources.warc import ensure_fixture_wacz, read_wacz_records, read_wacz_pages
    from auto_archiver_ray.stages.media import wacz_media_plan

    fx = ensure_fixture_wacz()
    recs = read_wacz_records(fx["wacz"])
    plan = wacz_media_plan(recs).to_pandas().sort_values(["warc_file", "rec_offset"]).reset_index(drop=True)

    a = plan[plan["warc_file"] == "fixture-a.wacz"]
    media_a = a[a["kind"] == "media"]
    # dup a.jpg admitted once; favicon/.svg/text-html excluded; keys sequential
    assert list(media_a["media_key"]) == ["warc-file-0.jpg", "warc-file-1.mp4", "warc-file-2.jpg", "warc-file-3.mp3"]
    tw = media_a[media_a["media_key"] == "warc-file-2.jpg"].iloc[0]
    assert tw["src"] == "https://pbs.twimg.com/media/abc?format=jpg&name=orig"
    assert tw["src_alternative"] == "https://pbs.twimg.com/media/abc?format=jpg&name=small"
    assert list(a[a["kind"] == "screenshot"]["media_key"]) == [
        "browsertrix-screenshot-0", "browsertrix-screenshot-1",
    ]

    b = plan[plan["warc_file"] == "fixture-b.wacz"]
    assert list(b["media_key"]) == ["warc-file-0.png", "warc-file-1.gif"]  # profile_images + pdf excluded

    pages = read_wacz_pages(fx["wacz"]).to_pandas().sort_values("wacz_file")
    assert list(pages["title"]) == ["Site zero", "Site one"]


@pytest.mark.usefixtures("ray_session")
def test_seen_check_precedes_mimetype_filter():
    """Reference quirk: a URL first seen with a NON-media mimetype is not
    added to the seen set, so a later media-typed occurrence IS kept."""
    from auto_archiver_ray.sources.warc import _records_table
    from auto_archiver_ray.stages.media import wacz_media_plan
    import ray.data as rd

    recs = b"".join(
        [
            warckit.build_record(
                "response", "https://c.example.org/thing",
                warckit.build_http_response(b"<html>", "text/html"),
            ),
            warckit.build_record(
                "response", "https://c.example.org/thing",
                warckit.build_http_response(b"JPEG", "image/jpeg"),
                warc_date="2024-01-02T00:00:00Z",
            ),
        ]
    )
    tbl = _records_table("q.warc", recs, with_payload=False)
    plan = wacz_media_plan(rd.from_arrow(tbl)).to_pandas()
    assert len(plan) == 1
    assert plan["media_key"].iloc[0] == "warc-file-0.jpg"


@pytest.mark.usefixtures("ray_session")
def test_merge_wacz_pages_overwrites_nonempty():
    import ray.data as rd

    from auto_archiver_ray.sources.warc import ensure_fixture_wacz, read_wacz_pages
    from auto_archiver_ray.stages.media import merge_wacz_pages

    fx = ensure_fixture_wacz()
    rows = rd.from_items(
        [
            {"url": "https://site00.example.org/", "title": "old", "text_extracted": "old text"},
            {"url": "https://nowhere.example.org/", "title": "keep", "text_extracted": "keep text"},
        ]
    )
    out = (
        merge_wacz_pages(rows, read_wacz_pages(fx["wacz"]))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert list(out["title"]) == ["keep", "Site zero"]
    assert list(out["text_extracted"]) == ["keep text", "hello world zero"]


@pytest.mark.usefixtures("ray_session")
def test_store_warc_roundtrip_and_idempotence(tmp_path):
    """The WARC sink contract: shards read back byte-identical through the
    independent parser, and re-running writes the SAME content-addressed
    files (retry/resume safety) instead of duplicating records."""
    import hashlib
    import os
    from datetime import datetime, timezone

    import ray.data as rd

    from auto_archiver_ray.sources.warc import read_warc_records
    from auto_archiver_ray.stages.storage import store_warc

    rows = [
        {
            "url": f"https://h{i % 3}.example.org/p/{i}",
            "warc_ts": datetime(2024, 1, 1 + i, tzinfo=timezone.utc),
            "html": f"<html><body>payload {i} é</body></html>".encode("utf-8"),
        }
        for i in range(7)
    ]
    root = str(tmp_path / "warc")
    manifest = store_warc(rd.from_items(rows), root, batch_size=3).to_pandas()
    assert len(manifest) == 7
    files1 = sorted(set(manifest["warc_file"]))
    on_disk1 = sorted(os.listdir(root))
    assert files1 == on_disk1  # every manifest shard exists, nothing extra

    back = (
        read_warc_records([os.path.join(root, f) for f in files1])
        .to_pandas()
        .sort_values("target_uri")
        .reset_index(drop=True)
    )
    assert len(back) == 7
    assert (back["rec_type"] == "response").all()
    assert (back["http_status"] == 200).all()
    by_url = {r["url"]: r for r in rows}
    for _, rec in back.iterrows():
        src = by_url[rec["target_uri"]]
        assert bytes(rec["payload"]) == src["html"]  # byte-identical roundtrip
        assert rec["payload_len"] == len(src["html"])
    # manifest hashes match source payloads
    for _, m in manifest.iterrows():
        assert m["payload_sha256"] == hashlib.sha256(by_url[m["url"]]["html"]).hexdigest()

    # idempotence: same input again -> same shard names, same file count
    manifest2 = store_warc(rd.from_items(rows), root, batch_size=3).to_pandas()
    assert sorted(set(manifest2["warc_file"])) == files1
    assert sorted(os.listdir(root)) == on_disk1


@pytest.mark.usefixtures("ray_session")
def test_store_warc_dates_from_ts_column():
    import gzip

    import ray.data as rd
    from datetime import datetime, timezone

    from auto_archiver_ray.functions import warckit
    from auto_archiver_ray.stages.storage import store_warc
    import tempfile, os

    with tempfile.TemporaryDirectory() as root:
        rows = [
            {
                "url": "https://a.example.org/",
                "warc_ts": datetime(2023, 5, 6, 7, 8, 9, tzinfo=timezone.utc),
                "html": b"<html>x</html>",
            }
        ]
        m = store_warc(rd.from_items(rows), root).to_pandas()
        raw = open(os.path.join(root, m["warc_file"].iloc[0]), "rb").read()
        recs = list(warckit.parse_warc_bytes(raw))
        assert len(recs) == 1
        assert recs[0].headers["WARC-Date"] == "2023-05-06T07:08:09Z"


@pytest.mark.usefixtures("ray_session")
def test_store_jsonl_roundtrip_and_idempotence(tmp_path):
    """JSONL sink: independent readback recovers every value exactly
    (multibyte text, quotes, newline-free framing), a second write adds NO
    files (content addressing), and the manifest row counts sum to the
    input."""
    import os

    import pyarrow as pa
    import ray.data as rd

    from auto_archiver_ray.stages.storage import read_jsonl_shards, store_jsonl

    root = str(tmp_path / "jsonl")
    src = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "lang": pa.array(["ru", "es", "en"], pa.string()),
            "text": pa.array(['Ее "вот" если', "línea\ttab", ""], pa.string()),
        }
    )
    ds = rd.from_arrow(src)
    man1 = store_jsonl(ds, root, ["doc_id", "lang", "text"], batch_size=2).to_pandas()
    assert int(man1["n_rows"].sum()) == 3
    files1 = sorted(os.listdir(root))

    back = (
        read_jsonl_shards(root)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(back, src.to_pandas(), check_dtype=False)

    store_jsonl(ds, root, ["doc_id", "lang", "text"], batch_size=2).to_pandas()
    assert sorted(os.listdir(root)) == files1  # retry/idempotence: same shard set


@pytest.mark.usefixtures("ray_session")
def test_warc_revisit_shard_idempotent_and_mixed():
    """write_warc_shard with revisit_col: (a) re-writing the identical
    batch produces the identical content-addressed file set (retry
    idempotence), (b) a mixed batch yields one response + one revisit
    whose refers/digest headers parse back exactly."""
    import glob
    import hashlib
    import shutil
    import uuid

    import pyarrow as pa

    from auto_archiver_ray.functions import warckit
    from auto_archiver_ray.stages.storage import write_warc_shard

    root = f"/tmp/aar_warc_idem_{uuid.uuid4().hex[:8]}"
    payload = b"<html>same bytes</html>"
    batch = pa.table(
        {
            "url": pa.array(["http://a.org/1", "http://b.org/2"], pa.string()),
            "html": pa.array([payload, payload], pa.binary()),
            "refers": pa.array(["", "http://a.org/1"], pa.string()),
        }
    )
    try:
        m1 = write_warc_shard(batch, root, ts_col=None, revisit_col="refers")
        files1 = sorted(glob.glob(f"{root}/*.warc.gz"))
        m2 = write_warc_shard(batch, root, ts_col=None, revisit_col="refers")
        files2 = sorted(glob.glob(f"{root}/*.warc.gz"))
        assert files1 == files2 and len(files1) == 1, "retry duplicated the shard"
        assert m1.column("warc_file").to_pylist() == m2.column("warc_file").to_pylist()

        data = warckit.gunzip_members(open(files1[0], "rb").read())
        recs = list(warckit.parse_warc_bytes(data))
        assert [r.rec_type for r in recs] == ["response", "revisit"]
        assert recs[0].payload == payload
        rv = recs[1]
        assert rv.headers["WARC-Refers-To-Target-URI"] == "http://a.org/1"
        assert rv.headers["WARC-Payload-Digest"] == (
            "sha256:" + hashlib.sha256(payload).hexdigest()
        )
        assert rv.payload == b"", "revisit stored duplicate bytes"
    finally:
        shutil.rmtree(root, ignore_errors=True)

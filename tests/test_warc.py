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

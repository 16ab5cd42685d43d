"""Extractor chain tests: dispatch, merge-fold, dropin registration,
platform parsers."""

import pyarrow as pa

from auto_archiver_ray.stages import extract


def _batch(url, html, platform):
    return pa.table(
        {
            "url": [url],
            "platform": [platform],
            "html": pa.array([html], pa.binary()),
        }
    )


def test_generic_parser():
    html = b"<html><head><title>T</title></head><body><p>hello world</p><img src='https://a.com/x.jpg'></body></html>"
    res = extract.generic_parser("https://a.com/p", html)
    assert res["status"] == "generic: success"
    assert res["title"] == "T"
    assert res["text"] == "T hello world"
    assert res["media_links"] == ["https://a.com/x.jpg"]


def test_telegram_parser_requires_media():
    no_media = b"<html><body><p>just text</p></body></html>"
    res = extract.telegram_parser("https://t.me/c/1/2", no_media)
    assert res["status"] == ""  # fails → chain falls through to generic
    out = extract.extract_one("https://t.me/c/1/2", "telegram", no_media)
    assert out["status"] == "generic: success"
    assert out["text"] == "just text"

    with_media = b"<div style=\"background:url('https://t.me/i.jpg')\"></div><p>x</p>"
    res2 = extract.telegram_parser("https://t.me/c/1/2", with_media)
    assert res2["status"] == "telegram: success"


def test_twitter_parser_best_quality():
    html = b"<img src='https://pbs.twimg.com/media/a.jpg?name=small'><p>t</p>"
    out = extract.extract_one("https://twitter.com/x/status/1", "twitter", html)
    assert out["status"] == "twitter: success"
    assert out["media_links"] == ["https://pbs.twimg.com/media/a.jpg?name=orig"]


def test_youtube_parser_duration():
    html = b"<time datetime='2024-01-01'>2:30</time><p>v</p>"
    out = extract.extract_one("https://youtube.com/watch?v=1", "youtube", html)
    assert out["status"] == "youtube: success"
    assert out["duration"] == 150.0


def test_parser_exception_continues_chain():
    def boom(url, html):
        raise RuntimeError("nope")

    extract.register_parser("vk", boom, prepend=True)
    out = extract.extract_one("https://vk.com/p", "vk", b"<p>ok</p>")
    assert out["status"] == "generic: success"
    assert out["text"] == "ok"
    # cleanup the registration
    extract.PARSER_CHAINS.pop("vk")


def test_nothing_archived_status():
    def nothing(url, html):
        return {"status": "", "title": "", "text": "", "timestamp": "", "media_links": []}

    extract.PARSER_CHAINS["reddit"] = (nothing,)
    out = extract.extract_one("https://reddit.com/r/x", "reddit", b"<p>y</p>")
    assert out["status"] == "nothing archived"  # ref:core/orchestrator.py:658-659
    extract.PARSER_CHAINS.pop("reddit")


def test_extract_stage_batch_columns():
    st = extract.ExtractStage()
    out = st(_batch("https://youtube.com/w", b"<time datetime='x'>1:00</time><p>v</p>", "youtube"))
    assert out.column("duration").to_pylist() == [60.0]
    assert "html" not in out.column_names
    assert out.column("status").to_pylist() == ["youtube: success"]

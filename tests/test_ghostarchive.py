"""Ghostarchive enricher portable-half parity (closes the round-3 'partial':
the href normalization / response parse / redirect detection the reference
computes locally, plus the distributed gating flow). Parity targets mirror
ref:tests/enrichers/test_ghostarchive_enricher.py."""

import pytest

from auto_archiver_ray.functions import ghostarchive as ga


def test_normalize_archive_href_parity():
    # relative → absolutized
    assert ga.normalize_archive_href("/archive/Abc12") == "https://ghostarchive.org/archive/Abc12"
    # http → https upgrade
    assert (
        ga.normalize_archive_href("http://ghostarchive.org/archive/Xyz99")
        == "https://ghostarchive.org/archive/Xyz99"
    )
    # already-https passthrough
    assert (
        ga.normalize_archive_href("https://ghostarchive.org/archive/Ok1")
        == "https://ghostarchive.org/archive/Ok1"
    )
    # replay links rejected even when they contain /archive/
    assert ga.normalize_archive_href("/replay/archive/Abc") is None
    assert ga.normalize_archive_href("https://ghostarchive.org/replay/Abc/archive/X") is None
    # foreign hosts rejected
    assert ga.normalize_archive_href("https://evil.example/archive/Abc12") is None
    assert ga.normalize_archive_href("no-archive-here") is None


def test_parse_archive_url_skips_replay_links():
    html = (
        '<a href="/replay/Bad1">replay</a>'
        '<a href="/archive/Valid1">archive</a>'
        '<a href="/archive/Later2">later</a>'
    )
    assert ga.parse_archive_url(html) == "https://ghostarchive.org/archive/Valid1"
    assert ga.parse_archive_url("<p>no links</p>") is None
    assert ga.parse_archive_url("") is None


def test_archive_url_from_redirect_strips_query():
    assert (
        ga.archive_url_from_redirect("https://ghostarchive.org/archive/NewId1?src=form")
        == "https://ghostarchive.org/archive/NewId1"
    )
    assert ga.archive_url_from_redirect("https://ghostarchive.org/") is None


def test_ghostarchive_enrich_flow(ray_session):
    """Auth-walled urls skipped, already-archived anti-joined away, the
    rest get a deterministic archive url joined back."""
    import hashlib

    import pyarrow as pa
    import ray.data as rd

    from auto_archiver_ray.stages.externaljob import ShardedJobGateway

    urls = [
        "https://example.org/a",
        "https://example.org/b",
        "https://www.instagram.com/p/123",  # auth wall → skipped
        "https://t.me/c/chan/42",  # auth wall → skipped
        "https://example.org/done",  # already archived → anti-joined
    ]
    ds = rd.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    already = rd.from_arrow(pa.table({"url": pa.array(["https://example.org/done"], pa.string())}))
    gw = ShardedJobGateway(num_shards=2, polls_to_done=1)
    out = ga.ghostarchive_enrich(ds, already, gw, url_col="url").to_pandas()
    gw.shutdown()
    assert sorted(out["url"]) == ["https://example.org/a", "https://example.org/b"]
    for _, r in out.iterrows():
        want = "https://archive.example/" + hashlib.sha256(r["url"].encode()).hexdigest()[:16]
        assert r["ghostarchive"] == want

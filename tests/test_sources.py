"""Feeder tests — semantics mirror ref:tests/feeders/test_csv_feeder.py and
the gsheet feeder's status-filter contract."""

import pandas as pd
import pytest

from auto_archiver_ray.sources.seeds import (
    CELL_TRUNCATE,
    join_back_results,
    parse_csv_seeds,
    sheet_seeds,
)

CSV_WITH_HEADERS = "webpages,other data\nhttps://example.com/1/,data 1\nhttps://example.com/2/,data 2\nnot-a-url,data 3\n"
CSV_NO_HEADERS = "https://example.com/1/,data 1\nhttps://example.com/2/,data 2\n"


def test_csv_with_headers_by_name():
    assert parse_csv_seeds(CSV_WITH_HEADERS, "webpages") == [
        "https://example.com/1/",
        "https://example.com/2/",
    ]


def test_csv_with_headers_default_column():
    # header row skipped because first cell isn't a URL
    assert parse_csv_seeds(CSV_WITH_HEADERS) == ["https://example.com/1/", "https://example.com/2/"]


def test_csv_no_headers():
    # first row IS data → kept ("rewind" semantics, csv_feeder.py:29-31)
    assert parse_csv_seeds(CSV_NO_HEADERS) == ["https://example.com/1/", "https://example.com/2/"]


def test_csv_non_default_column():
    text = "data,link\nx,https://example.com/a\ny,https://example.com/b\n"
    assert parse_csv_seeds(text, "link") == ["https://example.com/a", "https://example.com/b"]
    assert parse_csv_seeds(text, 1) == ["https://example.com/a", "https://example.com/b"]


def test_csv_missing_named_column():
    assert parse_csv_seeds(CSV_WITH_HEADERS, "nope") == []


def test_csv_empty():
    assert parse_csv_seeds("") == []


@pytest.mark.usefixtures("ray_session")
def test_sheet_seeds_status_filter():
    ledger = pd.DataFrame(
        {
            "row_id": [2, 3, 4, 5],
            "link": [
                "https://a.com/1",
                "https://a.com/2",
                "not a url",
                "https://a.com/3",
            ],
            "archive status": ["", "done", "", ""],
            "destination folder": ["f1", "", "", ""],
        }
    )
    ds = sheet_seeds(ledger)
    df = ds.to_pandas().sort_values("row_id")
    # row 3 skipped (non-empty status), row 4 skipped (invalid url)
    assert df["row_id"].tolist() == [2, 5]
    assert df["folder"].tolist() == ["f1", ""]


def test_join_back_results():
    ledger = pd.DataFrame(
        {"row_id": [2, 3], "link": ["https://a.com/1", "https://a.com/2"], "archive status": ["", ""]}
    )
    results = pd.DataFrame(
        {
            "row_id": [2],
            "status": ["generic: success"],
            "title": ["T"],
            "text_extracted": ["x" * (CELL_TRUNCATE + 10)],
            "timestamp": ["2024-01-01T00:00:00+00:00"],
            "content_hash": ["SHA-256:ab"],
            "pdq_hash": ["cd"],
        }
    )
    out = join_back_results(ledger, results)
    r2 = out[out.row_id == 2].iloc[0]
    assert r2["archive status"] == "generic: success"
    assert len(r2["text content"]) == CELL_TRUNCATE  # 50k cell truncation
    assert r2["hash"] == "SHA-256:ab"
    assert out[out.row_id == 3].iloc[0]["archive status"] == ""


# ---------------------------------------------------------------------------
# Sitemap feeder
# ---------------------------------------------------------------------------


def test_parse_sitemap_urlset():
    from auto_archiver_ray.sources.seeds import parse_sitemap

    xml = (
        b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        b"<url><loc>https://a.com/p?x=1&amp;y=2</loc>"
        b"<lastmod>2024-01-02</lastmod><priority>0.8</priority></url>"
        b"<url><loc>https://b.org/q</loc></url>"
        b"</urlset>"
    )
    df = parse_sitemap(xml, source="s1")
    assert list(df["kind"]) == ["url", "url"]
    assert df.iloc[0]["url"] == "https://a.com/p?x=1&y=2"  # XML-unescaped
    assert df.iloc[0]["lastmod"] == "2024-01-02"
    assert df.iloc[0]["priority"] == "0.8"
    assert df.iloc[1]["lastmod"] == "" and df.iloc[1]["priority"] == ""
    assert (df["source"] == "s1").all()
    assert int(df["n_skipped"].sum()) == 0


def test_parse_sitemap_index_and_skips():
    from auto_archiver_ray.sources.seeds import parse_sitemap

    xml = (
        b"<sitemapindex>"
        b"<sitemap><loc>/tmp/a.xml</loc></sitemap>"
        b"<sitemap></sitemap>"  # no loc -> skipped, counted
        b"<sitemap><loc>/tmp/b.xml</loc></sitemap>"
        b"</sitemapindex>"
    )
    df = parse_sitemap(xml)
    assert list(df.loc[df["kind"] == "sitemap", "url"]) == ["/tmp/a.xml", "/tmp/b.xml"]
    assert int(df["n_skipped"].sum()) == 1


def test_parse_sitemap_url_gate_and_malformed():
    from auto_archiver_ray.sources.seeds import parse_sitemap

    # non-http locs in a urlset are skipped and counted
    xml = (
        b"<urlset><url><loc>ftp://x/y</loc></url>"
        b"<url><loc>https://ok.com/</loc></url></urlset>"
    )
    df = parse_sitemap(xml)
    assert list(df.loc[df["kind"] == "url", "url"]) == ["https://ok.com/"]
    assert int(df["n_skipped"].sum()) == 1
    # malformed XML -> one error row, never a raise
    bad = parse_sitemap(b"<urlset><url>")
    assert list(bad["kind"]) == ["error"] and int(bad["n_skipped"].sum()) == 1


def test_sitemaps_from_robots():
    from auto_archiver_ray.sources.seeds import sitemaps_from_robots

    text = (
        "User-agent: *\nDisallow: /private\n"
        "Sitemap: https://a.com/sitemap.xml  # trailing comment\n"
        "sitemap: https://a.com/sitemap2.xml\n"
        "Sitemap: https://a.com/sitemap.xml\n"  # duplicate dropped
        "Crawl-delay: 2\n"
    )
    assert sitemaps_from_robots(text) == [
        "https://a.com/sitemap.xml",
        "https://a.com/sitemap2.xml",
    ]


@pytest.mark.usefixtures("ray_session")
def test_sitemap_seeds_reads_files(tmp_path):
    from auto_archiver_ray.sources.seeds import sitemap_seeds

    p1 = tmp_path / "s1.xml"
    p1.write_text(
        "<urlset><url><loc>https://a.com/1</loc><lastmod>5</lastmod></url></urlset>"
    )
    p2 = tmp_path / "s2.xml"
    p2.write_text("<urlset><url><loc>https://b.org/2</loc></url></urlset>")
    df = sitemap_seeds([str(p1), str(p2)]).to_pandas()
    urls = sorted(df.loc[df["kind"] == "url", "url"])
    assert urls == ["https://a.com/1", "https://b.org/2"]
    srcs = set(df["source"])
    assert any("s1.xml" in s for s in srcs) and any("s2.xml" in s for s in srcs)

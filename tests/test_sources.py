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

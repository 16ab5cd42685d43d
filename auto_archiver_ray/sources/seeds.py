"""Seed feeders — the reference's feeder family as Dataset sources.

- ``items_seeds``  ~ CLIFeeder (ref:modules/cli_feeder/cli_feeder.py:6-18):
  a list of URLs → Dataset.
- ``csv_seeds``    ~ CSVFeeder (ref:modules/csv_feeder/csv_feeder.py:9-38):
  header autodetect, URL column by name or index, invalid URLs skipped.
- ``sheet_seeds``  ~ the GsheetsFeederDB feeder half
  (ref:modules/gsheet_feeder_db/gsheet_feeder_db.py:53-106): a ledger table
  (FIXTURES.md F3) filtered to rows with empty ``archive status``, carrying
  (row_id, folder) context as ordinary columns.
- ``join_back_results`` ~ the gsheet ``done`` write-back
  (ref:modules/gsheet_feeder_db/gsheet_feeder_db.py:132-198): results
  broadcast-joined to the seed ledger on row_id, producing the updated
  ledger table (cell truncation at 50k chars mirrors
  ref:modules/gsheet_feeder_db/gworksheet.py:105).
"""

from __future__ import annotations

import csv as _csv
import io

import pandas as pd
import pyarrow as pa

from ..functions import urlkit

CELL_TRUNCATE = 50_000  # gworksheet.py:105


def _url_or_none(url: str) -> str | None:
    """The reference's url_or_none gate (yt-dlp's: scheme+netloc present)."""
    if not isinstance(url, str):
        return None
    u = url.strip()
    if u.startswith(("http://", "https://")) and len(u.split("://", 1)[1]) > 0:
        return u
    return None


def items_seeds(urls: list[str]):
    import ray.data as rd

    return rd.from_items([{"url": u} for u in urls])


def parse_csv_seeds(text: str, column: str | int | None = None) -> list[str]:
    """Pure-python CSV seed parse with the reference's header semantics:
    if ``column`` is a string, the first row must be a header containing it;
    if int/None, the first row is treated as header only when its cell at
    that index is not a URL; invalid URL rows are skipped.
    Parity: ref:modules/csv_feeder/csv_feeder.py:12-38."""
    reader = _csv.reader(io.StringIO(text))
    try:
        first_row = next(reader)
    except StopIteration:
        return []
    url_column = column if column is not None else 0
    rows = list(reader)
    if isinstance(url_column, str):
        try:
            url_column = first_row.index(url_column)
        except ValueError:
            return []  # named column missing → no rows (reference logs+returns)
    elif _url_or_none(first_row[url_column]):
        rows = [first_row] + rows  # no header: first row is data ("rewind")
    out = []
    for row in rows:
        if url_column >= len(row):
            continue
        if not _url_or_none(row[url_column]):
            continue
        out.append(row[url_column])
    return out


def csv_seeds(paths: list[str] | str, column: str | int | None = None):
    """Dataset of seed URLs from CSV file(s)."""
    import ray.data as rd

    if isinstance(paths, str):
        paths = [paths]
    urls: list[str] = []
    for p in paths:
        with open(p, "r") as f:
            urls.extend(parse_csv_seeds(f.read(), column))
    return rd.from_items([{"url": u} for u in urls])


SHEET_RESULT_COLUMNS = [
    # write-back columns of the ledger (gsheet_feeder_db.py:141-189)
    "archive status",
    "archive location",
    "archive date",
    "upload title",
    "text content",
    "upload timestamp",
    "hash",
    "perceptual hashes",
]


def sheet_seeds(ledger: pd.DataFrame, url_col: str = "link", status_col: str = "archive status"):
    """Rows still to process: empty/missing status + valid-looking URL.
    Keeps (row_id, url, folder) — the _context columns."""
    import ray.data as rd

    df = ledger.copy()
    if status_col not in df.columns:
        df[status_col] = ""
    todo = df[(df[status_col].fillna("") == "") & df[url_col].map(lambda u: bool(_url_or_none(u)))]
    out = pd.DataFrame(
        {
            "row_id": todo["row_id"].astype("int64"),
            "url": todo[url_col],
            "folder": todo.get("destination folder", pd.Series("", index=todo.index)).fillna(""),
        }
    )
    return rd.from_pandas(out) if len(out) else rd.from_items([])


def join_back_results(ledger: pd.DataFrame, results_ds, url_col: str = "link") -> pd.DataFrame:
    """Produce the updated ledger: results joined back on row_id (broadcast —
    the seed ledger is the small side), result fields written into the
    write-back columns, long text truncated to the 50k cell limit."""
    res = results_ds.to_pandas() if hasattr(results_ds, "to_pandas") else results_ds
    out = ledger.copy()
    for c in SHEET_RESULT_COLUMNS:
        if c not in out.columns:
            out[c] = ""
    by_row = res.set_index("row_id")
    for row_id, r in by_row.iterrows():
        mask = out["row_id"] == row_id
        out.loc[mask, "archive status"] = r.get("status", "")
        out.loc[mask, "upload title"] = str(r.get("title", ""))[:CELL_TRUNCATE]
        out.loc[mask, "text content"] = str(r.get("text_extracted", ""))[:CELL_TRUNCATE]
        out.loc[mask, "upload timestamp"] = str(r.get("timestamp", ""))
        out.loc[mask, "hash"] = str(r.get("content_hash", ""))
        out.loc[mask, "perceptual hashes"] = str(r.get("pdq_hash", ""))
        out.loc[mask, "archive location"] = str(r.get("storage_key", r.get("url_hash", "")))
        out.loc[mask, "archive date"] = str(r.get("archive_date", ""))
    return out

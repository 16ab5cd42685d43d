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


# ---------------------------------------------------------------------------
# Sitemap feeder — XML urlset / sitemapindex seeds for the crawl plane
# ---------------------------------------------------------------------------
#
# The reference feeds flat URL lists (CLI / CSV / sheet); a web-scale crawl
# additionally bootstraps from sitemaps (robots.txt `Sitemap:` lines point
# at them). Parsing is pure stdlib ElementTree over bytes already on disk /
# in the object store — fetching the XML is the same network edge every
# other source stubs. Shapes:
#
# - <urlset><url><loc>…</loc><lastmod>…</lastmod><priority>…</priority>
#   → one seed row per <url> with loc/lastmod/priority columns.
# - <sitemapindex><sitemap><loc>…</loc> → child sitemap references
#   (returned as rows with kind='sitemap', for the caller to stage as the
#   next read — one level per pass keeps the op a flat map, no recursion
#   inside a task).
# - malformed XML / entries without <loc> are skipped and COUNTED
#   (n_skipped on the parse-error row), never silent.


def parse_sitemap(xml_bytes: bytes, source: str = "") -> pd.DataFrame:
    """Parse one sitemap document into a DataFrame with columns
    (kind, url, lastmod, priority, source, n_skipped). kind is 'url' for
    urlset entries, 'sitemap' for sitemapindex children, 'error' for an
    unparseable document (one row, n_skipped=1)."""
    import xml.etree.ElementTree as ET

    def rows(kind, url, lastmod="", priority="", skipped=0):
        return {
            "kind": kind,
            "url": url,
            "lastmod": lastmod,
            "priority": priority,
            "source": source,
            "n_skipped": skipped,
        }

    try:
        root = ET.fromstring(xml_bytes)
    except ET.ParseError:
        return pd.DataFrame([rows("error", "", skipped=1)])

    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    out, skipped = [], 0
    tag = local(root.tag)
    child_kind = "sitemap" if tag == "sitemapindex" else "url"
    for el in root:
        loc, lastmod, priority = None, "", ""
        for f in el:
            name = local(f.tag)
            if name == "loc":
                loc = (f.text or "").strip()
            elif name == "lastmod":
                lastmod = (f.text or "").strip()
            elif name == "priority":
                priority = (f.text or "").strip()
        if not loc or (child_kind == "url" and _url_or_none(loc) is None):
            skipped += 1
            continue
        out.append(rows(child_kind, loc, lastmod, priority))
    if skipped:
        out.append(rows("error", "", skipped=skipped))
    return pd.DataFrame(
        out, columns=["kind", "url", "lastmod", "priority", "source", "n_skipped"]
    )


def sitemap_seeds(paths: list[str]):
    """Dataset of seed rows from sitemap XML files: read_binary_files →
    per-file parse (flat map, vector-friendly; one ElementTree pass per
    document). Returns ALL rows — filter kind='url' for seeds, kind=
    'sitemap' for child sitemaps to stage into the next call (the caller
    drives one level per pass; sitemap indexes are one level deep by
    spec), kind='error' rows carry the skip counts."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)

    def parse_batch(batch: pd.DataFrame) -> pd.DataFrame:
        frames = [
            parse_sitemap(b, source=p) for p, b in zip(batch["path"], batch["bytes"])
        ]
        return pd.concat(frames, ignore_index=True) if frames else parse_sitemap(b"")

    return ds.map_batches(parse_batch, batch_format="pandas")


def sitemaps_from_robots(text: str) -> list[str]:
    """`Sitemap:` directives from a robots.txt body (they sit outside
    user-agent groups per the spec; case-insensitive key, order kept,
    duplicates dropped)."""
    out: list[str] = []
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        if key.strip().lower() == "sitemap":
            u = val.strip()
            if u and u not in out:
                out.append(u)
    return out

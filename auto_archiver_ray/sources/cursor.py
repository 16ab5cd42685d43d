"""Cursor-paginated incremental source — the Atlos feeder pattern.

The reference polls ``/api/v2/source_material`` with an opaque cursor until
exhaustion, yielding only unprocessed, visible, non-pending items, and
writes processed/status metadata back per item
(ref:modules/atlos_feeder_db_storage/atlos_feeder_db_storage.py:45-105).

Ray-native shape: the unbounded remote feed becomes a sequence of bounded
EPOCH datasets — each call to :func:`cursor_epochs` drains the service from
its last cursor, batching pages into ``from_items`` datasets that flow into
the normal frontier/archive pipeline; the write-back half is a sink stage
posting per-item results to the service. The service itself is an injected
callable (``fetch_page(cursor) -> (results, next_cursor)``) — in production
an HTTP session per actor, here a stub actor with the same contract.
"""

from __future__ import annotations

from typing import Any, Callable


def atlos_item_admissible(item: dict) -> bool:
    """The feeder's admission filter, verbatim semantics
    (ref:atlos_feeder_db_storage.py:53-58): non-empty source_url, not
    already processed by us, visible, not processing/pending."""
    return (
        item.get("source_url") not in [None, ""]
        and not item.get("metadata", {}).get("auto_archiver", {}).get("processed", False)
        and item.get("visibility") == "visible"
        and item.get("status") not in ["processing", "pending"]
    )


def drain_cursor(fetch_page: Callable[[Any], tuple[list[dict], Any]], cursor: Any = None):
    """Iterate (item, page_cursor) over the cursor feed until ``results`` is
    empty or the cursor comes back None (ref:atlos_feeder_db_storage.py:45-61).

    ``page_cursor`` is the cursor that FETCHES the page the item came from —
    restarting the poll from it replays that whole page (at-least-once), so
    an epoch boundary that falls mid-page can never lose the page's tail."""
    while True:
        results, next_cursor = fetch_page(cursor)
        for item in results:
            if atlos_item_admissible(item):
                yield {"url": item["source_url"], "atlos_id": item["id"]}, cursor
        if not results or next_cursor is None:
            return
        cursor = next_cursor


def cursor_epochs(
    fetch_page: Callable[[Any], tuple[list[dict], Any]],
    epoch_size: int = 1024,
    start_cursor: Any = None,
):
    """Yield (Dataset, resume_cursor) epochs from a cursor feed. Each epoch
    holds up to ``epoch_size`` admitted seed rows (url, atlos_id).

    Resume protocol (at-least-once): ``resume_cursor`` is the cursor of the
    page containing the epoch's FIRST item — never the after-page cursor of
    a partially consumed page, which would skip items of that page carried
    into the next epoch. Persist an epoch's resume_cursor strictly AFTER the
    previous epoch has been fully processed; a killed run restarted from the
    persisted cursor replays the unfinished epoch in full (plus at most one
    already-seen page tail), and the frontier's seen-filter dedups the
    replayed overlap — exactly how the reference relies on its processed
    flag."""
    import ray.data as rd

    rows: list[dict] = []
    epoch_cursor = start_cursor  # page cursor of the current buffer's first row
    for row, page_cur in drain_cursor(fetch_page, start_cursor):
        if not rows:
            epoch_cursor = page_cur
        rows.append(row)
        if len(rows) >= epoch_size:
            yield rd.from_items(rows), epoch_cursor
            rows = []
    if rows:
        yield rd.from_items(rows), epoch_cursor


def results_write_back(results_ds, post_result: Callable[[Any, dict], None], id_col: str = "atlos_id"):
    """The db half (ref:atlos_feeder_db_storage.py:65-105): per finished
    item, post {processed: True, status, results}. Runs as a sink
    map_batches (batched per block); items without an id are skipped."""
    import pyarrow as pa

    def sink(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist() if id_col in batch.column_names else []
        statuses = (
            batch.column("status").to_pylist() if "status" in batch.column_names else [""] * len(ids)
        )
        n = 0
        for i, s in zip(ids, statuses):
            if i in (None, ""):
                continue
            ok = isinstance(s, str) and "success" in s
            post_result(
                i,
                {"processed": True, "status": "success" if ok else "error"},
            )
            n += 1
        return pa.table({"n_posted": pa.array([n], pa.int64())})

    return results_ds.map_batches(sink, batch_format="pyarrow")


def make_stub_service(items: list[dict], page_size: int = 3):
    """In-sandbox stand-in for the remote API: a named-tuple of
    (fetch_page, post_result, posted) with cursor = integer offset."""
    posted: dict = {}

    def fetch_page(cursor):
        start = int(cursor or 0)
        page = items[start : start + page_size]
        next_cursor = start + page_size if start + page_size < len(items) else None
        return page, next_cursor

    def post_result(item_id, payload):
        posted[item_id] = payload

    return fetch_page, post_result, posted

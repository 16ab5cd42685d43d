"""Formatter stages: JSON serialization column + HTML report column.

Parity:
- ``json_format`` mirrors json_enricher's full-metadata dump
  (ref:modules/json_enricher/json_enricher.py:9-17) with the reference's
  JSON style (ensure_ascii=False, indent=4, datetimes via str —
  ref:utils/misc.py:27-36), emitted as a ``metadata_json`` column instead of
  a sidecar file.
- ``HtmlReportStage`` mirrors html_formatter (ref:modules/html_formatter/
  html_formatter.py:17-55): template compiled once per actor (the reference
  builds its Jinja env once in setup, :21-33); here a minimal deterministic
  renderer (no Jinja dependency) produces the per-row ``report_html`` column
  and its self-hash (the formatter hashes its own output, :49-53).
"""

from __future__ import annotations

import hashlib
import html as _htmllib
import json

import pyarrow as pa

_REPORT_COLUMNS = ("url", "title", "status", "timestamp", "text_extracted")


def json_format(batch: pa.Table, exclude_cols: tuple[str, ...] = ("html",)) -> pa.Table:
    cols = [c for c in batch.column_names if c not in exclude_cols]
    data = {c: batch.column(c).to_pylist() for c in cols}
    n = batch.num_rows
    out = []
    for i in range(n):
        row = {c: data[c][i] for c in cols}
        out.append(json.dumps(row, ensure_ascii=False, indent=4, default=str))
    return batch.append_column("metadata_json", pa.array(out, pa.string()))


class HtmlReportStage:
    """Actor-pool formatter: row → report_html + report_hash columns."""

    def __init__(self, algorithm: str = "SHA-256"):
        self.algorithm = algorithm

    def _render(self, row: dict) -> str:
        parts = ["<!DOCTYPE html><html><head><meta charset='utf-8'>"]
        title = _htmllib.escape(str(row.get("title") or row.get("url") or ""))
        parts.append(f"<title>{title}</title></head><body>")
        parts.append(f"<h1>{title}</h1><table>")
        for c in _REPORT_COLUMNS:
            if c in row and row[c] is not None:
                parts.append(
                    f"<tr><th>{_htmllib.escape(c)}</th><td>{_htmllib.escape(str(row[c]))}</td></tr>"
                )
        parts.append("</table></body></html>")
        return "".join(parts)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {c: batch.column(c).to_pylist() for c in batch.column_names if c in _REPORT_COLUMNS}
        n = batch.num_rows
        htmls, hashes = [], []
        for i in range(n):
            doc = self._render({c: v[i] for c, v in cols.items()})
            htmls.append(doc)
            hashes.append(
                f"{self.algorithm}:{hashlib.sha256(doc.encode('utf-8')).hexdigest()}"
            )
        return batch.append_column("report_html", pa.array(htmls, pa.string())).append_column(
            "report_hash", pa.array(hashes, pa.string())
        )


_RENDERER: HtmlReportStage | None = None


def html_report_batch(batch: pa.Table) -> pa.Table:
    """Task-based formatter stage: renderer cached at module level per
    worker process (the once-per-worker init the reference gets from its
    setup() Jinja env, ref:modules/html_formatter/html_formatter.py:21-33) —
    no actor pool needed, so the stage scales elastically with free CPUs."""
    global _RENDERER
    if _RENDERER is None:
        _RENDERER = HtmlReportStage()
    return _RENDERER(batch)

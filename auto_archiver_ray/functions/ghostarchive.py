"""Ghostarchive enricher — the portable half.

The reference submits URLs to ghostarchive.org through a Cloudflare-gated
web form (headless browser) and parses HTML responses
(ref:modules/ghostarchive_enricher/ghostarchive_enricher.py). The browser
and network cannot exist in this sandbox; what CAN be ported exactly is
everything the reference computes locally:

- ``normalize_archive_href`` — accept only ``/archive/...`` links (never
  ``/replay/``), absolutize relative hrefs, upgrade http→https, reject
  foreign hosts (ref::45-56);
- ``parse_archive_url`` — first normalized anchor href in a response page
  (ref::120-127), regex-based (no bs4 in this container — the anchor-href
  scan reuses the same pattern the extract plane uses);
- ``archive_url_from_redirect`` — the ``/archive/{id}`` redirect detector
  with query stripping (ref::104-109);
- the enrich gating — skip auth-walled urls, keep an existing enrichment,
  search-before-submit (ref::129-158) — expressed as the distributed flow
  in :func:`ghostarchive_enrich`: auth-wall filter → anti-join against
  already-archived keys → sharded submit/poll gateway → join back.
"""

from __future__ import annotations

import re

from .textkit import _A_HREF_RE  # ONE anchor-href pattern across planes

GHOSTARCHIVE_BASE = "https://ghostarchive.org"
ARCHIVE_URL_PATTERN = re.compile(r"/archive/([A-Za-z0-9]+)")


def normalize_archive_href(href: str) -> str | None:
    """Parity: ref:ghostarchive_enricher.py:45-56 (same branch order)."""
    if "/archive/" not in href or "/replay/" in href:
        return None
    if href.startswith("/"):
        return f"{GHOSTARCHIVE_BASE}{href}"
    if href.startswith("http://ghostarchive.org"):
        return href.replace("http://", "https://")
    if href.startswith("https://ghostarchive.org"):
        return href
    return None


def parse_archive_url(html: str) -> str | None:
    """First normalized ``/archive/`` anchor in a response page
    (ref::120-127; anchor scan in document order, replay links skipped)."""
    for href in _A_HREF_RE.findall(html or ""):
        u = normalize_archive_href(href)
        if u:
            return u
    return None


def archive_url_from_redirect(current_url: str) -> str | None:
    """The redirect-watch success test: a url containing ``/archive/{id}``
    is the archive, query-stripped (ref::104-109)."""
    if ARCHIVE_URL_PATTERN.search(current_url or ""):
        return current_url.split("?")[0]
    return None


def ghostarchive_enrich(
    ds,
    already_archived,
    gateway,
    url_col: str = "url",
    out_col: str = "ghostarchive",
):
    """Distributed enrich flow over a pages Dataset:

    1. drop auth-walled urls (ref::130-133 skips them);
    2. anti-join against ``already_archived`` (url, archive_url) — the
       reference's "already been executed" short-circuit (ref::135-137),
       as a sharded key-set anti-join so no driver-resident url set;
    3. submit survivors to the sharded external-job gateway (the
       Cloudflare-gated form submission in production; deterministic stub
       artifact here) and join the archive urls back as ``out_col``.

    Returns the enriched Dataset of previously-unarchived rows."""
    import pyarrow as pa

    from ..functions import urlkit
    from ..stages.join import anti_join

    def drop_auth_wall(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col).to_pylist()
        keep = [not urlkit.is_auth_wall(u or "") for u in urls]
        return batch.filter(pa.array(keep))

    fresh = ds.map_batches(drop_auth_wall, batch_format="pyarrow", batch_size=4096)
    if already_archived is not None:
        fresh = anti_join(
            fresh, already_archived.select_columns([url_col]), on=url_col, strategy="sharded"
        )
    submitted = fresh.map_batches(
        gateway.submit_stage(key_col=url_col), batch_format="pyarrow", batch_size=2048
    )
    submitted = submitted.materialize()  # submissions happen once, pre-poll
    gateway.poll_all_until_done()
    return submitted.map_batches(
        gateway.join_results_stage(out_col=out_col), batch_format="pyarrow", batch_size=2048
    )

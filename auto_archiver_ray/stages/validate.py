"""URL validation + canonicalization stage (the pipeline's stage 1).

Mirrors the orchestrator's per-item ``clean → check_url_or_raise →
sanitize`` preamble (ref:core/orchestrator.py:600-615) as a vectorized
``map_batches`` kernel: errors become a ``valid/invalid_reason`` column pair
instead of exceptions, and every row gains the frontier keys
(``url_canon``, ``host``, ``url_hash``) plus routing columns
(``platform``, ``auth_wall``).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions import urlkit


def validate_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    import hashlib
    from ipaddress import ip_address
    from urllib.parse import parse_qsl, urlencode, urlparse, urlunparse

    from ..functions.urlkit import _PLATFORM_DOMAIN_RULES, _TRACKER_PARAMS

    urls = batch.column(url_col).to_pylist()
    n = len(urls)
    # flat (needle, name) pairs: plain `in` checks beat a genexpr-any per
    # rule per row (the is_relevant_url lesson)
    flat_rules = [(x, name) for needles, name in _PLATFORM_DOMAIN_RULES for x in needles]
    valid = [False] * n
    reason = [""] * n
    cleaned = [""] * n
    canon = [""] * n
    host = [""] * n
    url_hash = [""] * n
    platform = [""] * n
    auth_wall = [False] * n
    # single-parse fast path: one urlparse per row instead of the five the
    # naive composition of urlkit functions would make — behavior pinned
    # equal to urlkit.{check_url,clean_url,canonicalize,...} by the urlkit
    # unit tests and the q_pages_* oracles
    for i, u in enumerate(urls):
        if not (u.startswith("http://") or u.startswith("https://")):
            reason[i] = "bad_scheme"
            continue
        parts = urlparse(u)
        h = parts.hostname
        if not h:
            reason[i] = "no_hostname"
            continue
        if h == "localhost":
            reason[i] = "localhost"
            continue
        # every valid IP literal starts with a digit (v4) or contains a
        # colon (v6) — skip the exception-heavy ip_address() attempt for
        # ordinary domain names (the common case; behavior identical)
        ip = None
        if h[0].isdigit() or ":" in h:
            try:
                ip = ip_address(h)
            except ValueError:
                pass
        if ip is not None:
            if not ip.is_global:
                reason[i] = "ip_not_global"
                continue
            if ip.is_reserved:
                reason[i] = "ip_reserved"
                continue
            if ip.is_link_local:
                reason[i] = "ip_link_local"
                continue
            if ip.is_private:
                reason[i] = "ip_private"
                continue
        valid[i] = True
        if parts.query:
            kept = [(k, v) for k, v in parse_qsl(parts.query) if k not in _TRACKER_PARAMS]
            clean_q = urlencode(kept)
            # no tracker removed → the reconstruction is the input URL
            # (fragmentless http(s) urls round-trip geturl identically);
            # skip the urlunparse for the common clean case
            if clean_q == parts.query and not parts.fragment:
                cleaned[i] = u
            else:
                cleaned[i] = parts._replace(query=clean_q).geturl()
        else:
            clean_q = ""
            cleaned[i] = u if not parts.fragment else parts._replace(query="").geturl()
        hostport = h.lower()
        port = parts.port
        if port is not None and not (
            (parts.scheme == "http" and port == 80) or (parts.scheme == "https" and port == 443)
        ):
            hostport = f"{hostport}:{port}"
        # direct reconstruction ≡ urlunparse((scheme, hostport, path or "/",
        # params, clean_q, "")) for http(s) URLs: path is "" or absolute, so
        # urlunsplit's "//"+netloc+path join reduces to this f-string
        # (equivalence pinned by tests/test_validate_stage.py)
        path = parts.path or "/"
        c = f"{parts.scheme.lower()}://{hostport}{path}"
        if parts.params:
            c += f";{parts.params}"
        if clean_q:
            c += f"?{clean_q}"
        canon[i] = c
        host[i] = hostport
        url_hash[i] = hashlib.sha256(c.encode("utf-8")).hexdigest()
        netloc = parts.netloc
        for x, name in flat_rules:
            if x in netloc:
                platform[i] = name
                break
        else:
            platform[i] = "unknown"
        auth_wall[i] = urlkit.is_auth_wall(u)
    return (
        batch.append_column("valid", pa.array(valid, pa.bool_()))
        .append_column("invalid_reason", pa.array(reason, pa.string()))
        .append_column("url_clean", pa.array(cleaned, pa.string()))
        .append_column("url_canon", pa.array(canon, pa.string()))
        .append_column("host", pa.array(host, pa.string()))
        .append_column("url_hash", pa.array(url_hash, pa.string()))
        .append_column("platform", pa.array(platform, pa.string()))
        .append_column("auth_wall", pa.array(auth_wall, pa.bool_()))
    )


def url_template_array(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """URL shape template for trap detection: path+query with every digit
    run collapsed to ``N`` (fragment dropped, empty path → ``/``). Pure
    Arrow RE2 kernels — zero Python rows — and byte-identical to DuckDB's
    RE2 ``regexp_replace(..., 'g')`` twin, so template keys computed here
    (frontier admission) and in SQL oracles can never diverge."""
    import pyarrow.compute as pc

    t = pc.struct_field(pc.extract_regex(urls, r"^https?://[^/?#]*(?P<t>[^#]*)"), "t")
    t = pc.if_else(pc.equal(t, ""), "/", t)
    return pc.replace_substring_regex(t, "[0-9]+", "N")


def keep_valid(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    return batch.filter(pc.field("valid"))


# UT1-blacklist-style lexical spam markers (the public adult/fraud URL
# heuristic family); deterministic constants shared verbatim with the
# q_pages_urlfilter SQL oracle.
URL_SPAM_NEEDLES = ("casino", "viagra", "porn", "xxx", "win-money")

URL_MAX_LEN = 120
URL_MAX_DEPTH = 6
URL_MAX_PARAMS = 3


def url_feature_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Vectorized URL hygiene gate (UT1-style lexical filtering + the
    digit-ratio / depth / param-count heuristics of web-corpus curation,
    cf. Penedo et al. 2023 RefinedWeb §3.1 URL filtering). Every feature is
    one pyarrow-compute kernel call over the batch — no per-row Python.

    keep = len<=120 AND depth<=6 AND params<=3 AND 10*digits<=len AND no
    spam needle. ``has_tracker`` is informational (cleaning strips utm_*).
    """
    import pyarrow.compute as pc

    url = batch.column(url_col)
    url_len = pc.cast(pc.utf8_length(url), pa.int64())
    n_digits = pc.cast(pc.count_substring_regex(url, "[0-9]"), pa.int64())
    depth = pc.cast(pc.count_substring(url, "/"), pa.int64())
    n_amp = pc.cast(pc.count_substring(url, "&"), pa.int64())
    has_q = pc.greater(pc.count_substring(url, "?"), 0)
    n_params = pc.if_else(has_q, pc.add(n_amp, 1), pa.scalar(0, pa.int64()))
    lower = pc.utf8_lower(url)
    spam = pc.match_substring(lower, URL_SPAM_NEEDLES[0])
    for needle in URL_SPAM_NEEDLES[1:]:
        spam = pc.or_(spam, pc.match_substring(lower, needle))
    has_tracker = pc.match_substring(url, "utm_")
    keep = pc.and_(
        pc.and_(
            pc.and_(pc.less_equal(url_len, URL_MAX_LEN), pc.less_equal(depth, URL_MAX_DEPTH)),
            pc.and_(
                pc.less_equal(n_params, URL_MAX_PARAMS),
                pc.less_equal(pc.multiply(n_digits, pa.scalar(10, pa.int64())), url_len),
            ),
        ),
        pc.invert(spam),
    )
    return pa.table(
        {
            url_col: url,
            "url_len": url_len,
            "n_digits": n_digits,
            "depth": depth,
            "n_params": n_params,
            "spam": spam,
            "has_tracker": has_tracker,
            "keep": keep,
        }
    )

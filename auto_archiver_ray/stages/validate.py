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
    urls = batch.column(url_col).to_pylist()
    n = len(urls)
    valid = [False] * n
    reason = [""] * n
    cleaned = [""] * n
    canon = [""] * n
    host = [""] * n
    url_hash = [""] * n
    platform = [""] * n
    auth_wall = [False] * n
    for i, u in enumerate(urls):
        ok, why = urlkit.check_url(u)
        valid[i], reason[i] = ok, why
        if ok:
            c = urlkit.clean_url(u)
            cleaned[i] = c
            canon[i] = urlkit.canonicalize(u)
            host[i] = urlkit.domain_for_url(canon[i])
            url_hash[i] = urlkit.url_seen_hex(canon[i])
            platform[i] = urlkit.platform_for_url(u)
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


def keep_valid(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    return batch.filter(pc.field("valid"))

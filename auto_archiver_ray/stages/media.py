"""Media plane: discovered-media explode, relevance filter, best-quality
rewrite, storage-key generation.

Parity: the DOM media-discovery half of the antibot extractor
(ref:modules/antibot_extractor_enricher/antibot_extractor_enricher.py:299-331)
and WACZ media enumeration + seen-set dedup
(ref:modules/wacz_extractor_enricher/wacz_extractor_enricher.py:176-266),
re-expressed as one page → N media rows (`explode_media`, a flat_map-shaped
map_batches) followed by global content/url dedup via groupby — the S3
no-dups semantics (ref:modules/s3_storage/s3_storage.py:50-73).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions import keygen, urlkit


def explode_media(batch: pa.Table, url_col: str = "url", links_col: str = "media_links") -> pa.Table:
    """One row per discovered media link: (page_url, media_url, media_url_best,
    media_ext, media_key). Irrelevant links are already filtered at extract
    time; this re-checks (idempotent) and applies the best-quality rewrite
    (ref:utils/url.py:156-176)."""
    page_urls = batch.column(url_col).to_pylist()
    links = batch.column(links_col).to_pylist()
    out_page, out_url, out_best, out_ext, out_key = [], [], [], [], []
    for purl, ls in zip(page_urls, links):
        for mu in ls or []:
            if not urlkit.is_relevant_url(mu):
                continue
            best = urlkit.best_quality_url(mu)
            path = urlkit.remove_get_parameters(best)
            ext = ("." + path.rsplit(".", 1)[-1]) if "." in path.rsplit("/", 1)[-1] else ""
            out_page.append(purl)
            out_url.append(mu)
            out_best.append(best)
            out_ext.append(ext)
            out_key.append(urlkit.url_seen_hex(urlkit.canonicalize(best)))
    return pa.table(
        {
            "page_url": pa.array(out_page, pa.string()),
            "media_url": pa.array(out_url, pa.string()),
            "media_url_best": pa.array(out_best, pa.string()),
            "media_ext": pa.array(out_ext, pa.string()),
            "media_url_hash": pa.array(out_key, pa.string()),
        }
    )


def add_storage_keys(
    batch: pa.Table,
    path_generator: str = "url",
    filename_generator: str = "static",
    folder: str = "",
) -> pa.Table:
    """Storage key per media row (deterministic; ref:core/storage.py:80-114)."""
    pages = batch.column("page_url").to_pylist()
    urls = batch.column("media_url_best").to_pylist()
    exts = batch.column("media_ext").to_pylist()
    hashes = batch.column("media_url_hash").to_pylist()
    keys = [
        keygen.storage_key(p, u, e, h, folder, path_generator, filename_generator)
        for p, u, e, h in zip(pages, urls, exts, hashes)
    ]
    return batch.append_column("storage_key", pa.array(keys, pa.string()))

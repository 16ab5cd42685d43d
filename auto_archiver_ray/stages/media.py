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


def wacz_media_plan(records_ds, extract_media: bool = True, extract_screenshot: bool = True):
    """The reference's WACZ media walk as a Dataset op
    (ref:modules/wacz_extractor_enricher/wacz_extractor_enricher.py:199-266):

    - screenshots: rec_type='resource' + WARC Content-Type 'image/png' →
      ``browsertrix-screenshot-{k}`` keys (k per archive, record order);
    - media: rec_type='response' records whose WARC-Target-URI passes
      ``is_relevant_url``, then a per-archive SEEN-URL set (first media
      occurrence wins, checked before the mimetype filter exactly as the
      reference orders it), then HTTP Content-Type containing
      video/image/audio; kept records get ``warc-file-{n}{ext}`` keys with
      n sequential per archive, ``src``/``src_alternative`` recording the
      twitter best-quality rewrite.

    The counter and seen-set are inherently sequential PER ARCHIVE, so the
    shuffle key is warc_file (one group per archive — archives are the
    ~1 GB parallelism unit, not a skew risk); payloads are projected to a
    byte length BEFORE the shuffle. The reference's is_valid_video probe is
    skipped (no ffprobe in the data plane; documented stub).
    """
    import mimetypes

    import pandas as pd

    keys_only = records_ds.drop_columns(["payload"])

    def plan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("rec_offset", kind="mergesort")
        seen: set[str] = set()
        n_media = 0
        n_shot = 0
        rows = []
        for r in g.itertuples(index=False):
            if extract_screenshot and r.rec_type == "resource" and r.warc_content_type == "image/png":
                rows.append(
                    {
                        "warc_file": r.warc_file,
                        "rec_offset": r.rec_offset,
                        "media_key": f"browsertrix-screenshot-{n_shot}",
                        "kind": "screenshot",
                        "src": r.target_uri,
                        "src_alternative": "",
                        "mimetype": "image/png",
                        "n_bytes": r.payload_len,
                    }
                )
                n_shot += 1
            if not extract_media:
                continue
            if r.rec_type != "response":
                continue
            if not urlkit.is_relevant_url(r.target_uri):
                continue
            if r.target_uri in seen:
                continue
            ct = r.http_content_type or ""
            if not ct or not any(x in ct for x in ("video", "image", "audio")):
                continue
            ext = mimetypes.guess_extension(ct.split(";")[0].strip()) or ""
            best = urlkit.twitter_best_quality_url(r.target_uri)
            rows.append(
                {
                    "warc_file": r.warc_file,
                    "rec_offset": r.rec_offset,
                    "media_key": f"warc-file-{n_media}{ext}",
                    "kind": "media",
                    "src": best,
                    "src_alternative": r.target_uri if best != r.target_uri else "",
                    "mimetype": ct,
                    "n_bytes": r.payload_len,
                }
            )
            n_media += 1
            seen.add(r.target_uri)
        cols = [
            "warc_file", "rec_offset", "media_key", "kind", "src",
            "src_alternative", "mimetype", "n_bytes",
        ]
        if not rows:
            return pd.DataFrame({c: pd.Series(dtype="int64" if c in ("rec_offset", "n_bytes") else "object") for c in cols})
        return pd.DataFrame(rows, columns=cols)

    return keys_only.groupby("warc_file").map_groups(plan, batch_format="pandas")


def merge_wacz_pages(rows_ds, wacz_pages_ds, url_col: str = "url"):
    """Fold pages.jsonl title/text into archive rows by url — the reference
    sets title/content from the WACZ's pages.jsonl when present
    (ref:modules/wacz_extractor_enricher/wacz_extractor_enricher.py:164-173),
    with Metadata.merge's scalar-overwrite semantics (non-empty wacz values
    win). The pages.jsonl side is tiny per archive → broadcast lookup."""
    import ray

    lookup: dict[str, tuple[str, str]] = {}
    for b in wacz_pages_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for u, t, x in zip(
            b.column("url").to_pylist(),
            b.column("title").to_pylist(),
            b.column("text").to_pylist(),
        ):
            lookup[u] = (t or "", x or "")
    ref = ray.put(lookup)

    def fold(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        urls = batch.column(url_col).to_pylist()
        titles = (
            batch.column("title").to_pylist() if "title" in batch.column_names else [""] * len(urls)
        )
        texts = (
            batch.column("text_extracted").to_pylist()
            if "text_extracted" in batch.column_names
            else [""] * len(urls)
        )
        for i, u in enumerate(urls):
            hit = m.get(u)
            if hit:
                if hit[0]:
                    titles[i] = hit[0]
                if hit[1]:
                    texts[i] = hit[1]
        out = batch
        for name, vals in (("title", titles), ("text_extracted", texts)):
            if name in out.column_names:
                out = out.drop_columns([name])
            out = out.append_column(name, pa.array(vals, pa.string()))
        return out

    return rows_ds.map_batches(fold, batch_format="pyarrow")

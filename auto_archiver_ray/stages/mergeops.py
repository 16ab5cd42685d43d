"""Dataset-level merge operators built on the mergekit fold kernels.

- ``merge_cached_results``: when several archive attempts exist for one URL
  (a fresh run + cached prior results — the API-DB fetch path,
  ref:modules/api_db/api_db.py:14-32), keep the most complete one per URL:
  ``groupby(url).map_groups(choose_most_complete)``
  (ref:core/metadata.py:221-235 semantics over result rows).
- ``best_variant``: per-row argmax of media variants by bit_rate — the
  twitter variant chooser (ref:modules/twitter_api_extractor/
  twitter_api_extractor.py:139-151).
"""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa


def merge_cached_results(ds, url_col: str = "url_hash", media_count_col: str = "n_media", meta_count_col: str = "n_meta"):
    """One row per URL: most media wins; media tie → most metadata keys;
    remaining ties → the earliest row by its position marker (callers should
    carry an ``attempt`` ordinal; absent that, min index order of the sorted
    group — deterministic)."""

    def pick(group: pd.DataFrame) -> pd.DataFrame:
        g = group.reset_index(drop=True)
        best = 0
        for i in range(1, len(g)):
            if g[media_count_col][i] > g[media_count_col][best]:
                best = i
            elif (
                g[media_count_col][i] == g[media_count_col][best]
                and g[meta_count_col][i] > g[meta_count_col][best]
            ):
                best = i
        return g.iloc[[best]]

    return ds.groupby(url_col).map_groups(pick, batch_format="pandas")


def best_variant(variants: list[dict]) -> dict | None:
    """Parity with ``choose_variant`` (ref:modules/twitter_api_extractor/
    twitter_api_extractor.py:139-151): among video/mp4 variants pick the
    highest bit_rate (strictly-greater, so the first of equal rates wins);
    a non-mp4 variant is only a fallback when no variant was chosen yet."""
    variant, bit_rate = None, -1
    for v in variants:
        if v.get("content_type") == "video/mp4":
            if v.get("bit_rate", -1) > bit_rate:
                bit_rate = v["bit_rate"]
                variant = v
        else:
            variant = v if not variant else variant
    return variant


def best_variant_stage(batch: pa.Table, variants_col: str = "variants_json", out_col: str = "best_variant_url") -> pa.Table:
    """Batch kernel: JSON-encoded variant lists → best variant's url."""
    rows = batch.column(variants_col).to_pylist()
    out = []
    for raw in rows:
        try:
            v = best_variant(json.loads(raw or "[]"))
        except json.JSONDecodeError:
            v = None
        out.append((v or {}).get("url", ""))
    return batch.append_column(out_col, pa.array(out, pa.string()))

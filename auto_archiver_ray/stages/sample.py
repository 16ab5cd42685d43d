"""Deterministic hash-based sampling.

``Dataset.random_sample`` is seed-dependent per execution plan;
training-data pipelines want *reproducible* samples that any engine can
recompute. ``deterministic_sample`` keeps rows whose md5-derived bucket
falls below the rate — the same predicate is expressible in SQL as
``md5_number_lower(col) % 1000 < permille`` (DuckDB's md5_number_lower is
the last 8 digest bytes little-endian, matched exactly here)."""

from __future__ import annotations

import hashlib

import pyarrow as pa


def md5_bucket(value: str, buckets: int = 1000) -> int:
    d = hashlib.md5(str(value).encode("utf-8")).digest()
    return int.from_bytes(d[8:16], "little") % buckets


def deterministic_sample(ds, col: str, permille: int = 50, buckets: int = 1000):
    def fn(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_pylist()
        mask = [md5_bucket(v, buckets) < permille for v in vals]
        return batch.filter(pa.array(mask))

    return ds.map_batches(fn, batch_format="pyarrow")

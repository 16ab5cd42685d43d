"""Aggregation helpers: partial-aggregate-per-batch + tiny final reduce.

The canonical scale pattern (ray_guide "Aggregation at scale"): combine
inside ``map_batches`` so only one row per (key, batch) crosses the wire,
then reduce the partials. Ray Data's all-to-all Aggregate operator carries
~10s of fixed scheduling overhead regardless of data size (measured: an
11.6s Aggregate over 7k partial rows), so when the *group count* is bounded
(dashboards, per-host stats, per-lang rollups) the final reduce runs on the
driver as a pandas groupby over the streamed partials — exact for integer
sums, zero shuffle. For unbounded key cardinality keep
``Dataset.groupby().aggregate(...)`` (the distributed path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def driver_reduce(partials_ds, keys: list[str], agg: dict[str, str]) -> pd.DataFrame:
    """Stream a partials Dataset to the driver and finish the groupby there.

    ``agg`` maps column → {"sum", "min", "max"}. Partial rows must already be
    one-per-(key, batch); their total size is O(num_batches × num_groups).
    BOUNDED group count only — for unbounded keys (per-user, per-customer)
    use :func:`grouped_topk` (top-k results) or a distributed groupby.
    """
    frames = [
        b for b in partials_ds.iter_batches(batch_size=65536, batch_format="pandas")
    ]
    if not frames:
        return pd.DataFrame(columns=keys + list(agg))
    df = pd.concat(frames, ignore_index=True)
    return df.groupby(keys, as_index=False).agg(agg)


def _add_key_bucket_fn(keys: list[str], num_buckets: int, out_col: str = "__tb"):
    """map_batches fn appending ``hash(key tuple) % num_buckets`` (vectorized
    keyed siphash — deterministic across processes/retries)."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        vals = batch.column(keys[0]).to_pylist()
        if len(keys) > 1:
            vals = [
                "\x1f".join(str(v) for v in row)
                for row in zip(*(batch.column(c).to_pylist() for c in keys))
            ]
        arr = np.asarray(vals)
        if arr.dtype == object or arr.dtype.kind in ("U", "S"):
            arr = np.asarray([str(v) for v in vals], dtype=object)
        hb = (pd.util.hash_array(arr, categorize=False) % np.uint64(num_buckets)).astype(np.int64)
        return batch.append_column(out_col, pa.array(hb))

    return add_bucket


def bucketed_group_agg(partials_ds, keys: list[str], agg: dict[str, str], num_buckets: int = 256):
    """Finish a partial aggregate with UNBOUNDED key cardinality as a
    Dataset: shuffle the partial rows (one per key per batch) to
    ``hash(key) % num_buckets`` coarse buckets and run a vectorized pandas
    groupby inside each bucket. Exact — a key lives wholly in one bucket.
    This replaces Ray's native all-to-all ``groupby().aggregate()`` (~10 s
    fixed overhead) for per-key rollups whose result must stay distributed
    (vs :func:`driver_reduce`, which needs a bounded group count)."""

    def bucket_agg(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop(columns=["__tb"]).groupby(keys, as_index=False).agg(agg)

    return (
        partials_ds.map_batches(_add_key_bucket_fn(keys, num_buckets), batch_format="pyarrow")
        .groupby("__tb")
        .map_groups(bucket_agg, batch_format="pandas")
    )


def grouped_topk(
    partials_ds,
    keys: list[str],
    agg: dict[str, str],
    k: int,
    sort_by: list[str],
    ascending: list[bool],
    num_buckets: int = 256,
) -> pd.DataFrame:
    """Global top-k over an UNBOUNDED-cardinality grouped aggregate with no
    driver-side key materialization.

    Partial rows (one per key per batch) are shuffled to ``hash(key) %
    num_buckets`` coarse buckets; each bucket finishes its keys' aggregates
    with a vectorized pandas groupby and keeps only its local top-k; the
    driver merges ≤ num_buckets×k candidate rows. Exact: every key lives
    wholly in one bucket, and a key outside its bucket's top-k cannot be in
    the global top-k. This replaces ``driver_reduce`` where the key count
    grows with the data (the per-customer / per-user rollups) — driver
    memory is O(num_buckets×k) instead of O(keys×batches).

    ``sort_by``/``ascending``: the final ranking columns (aggregated column
    names and/or key columns). ``num_buckets`` trades Ray's per-group
    overhead (measured 0.9/1.4/3.8 s at 64/256/1024 buckets over 345k
    partial rows) against per-bucket memory (a bucket holds
    partials/num_buckets rows) — 256 is the sweet spot at both test and
    cluster scale.
    """

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns=["__tb"]).groupby(keys, as_index=False).agg(agg)
        return out.sort_values(sort_by, ascending=ascending, kind="mergesort").head(k)

    candidates = (
        partials_ds.map_batches(_add_key_bucket_fn(keys, num_buckets), batch_format="pyarrow")
        .groupby("__tb")
        .map_groups(bucket_topk, batch_format="pandas")
    )
    frames = list(candidates.iter_batches(batch_size=65536, batch_format="pandas"))
    if not frames:
        return pd.DataFrame(columns=keys + list(agg))
    df = pd.concat(frames, ignore_index=True)
    return df.sort_values(sort_by, ascending=ascending, kind="mergesort").head(k).reset_index(drop=True)

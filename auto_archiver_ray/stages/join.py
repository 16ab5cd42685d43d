"""Large-large joins.

Two implementations (ray_guide "Joins and lookups"):
- ``dataset_join``: Ray Data's native hash-partitioned ``Dataset.join``
  (available in this Ray version) — preferred.
- ``bucketed_hash_join``: the portable explicit form — add
  ``bucket = hash(key) % B`` to both sides, pad to a common schema, union,
  group by bucket, pandas-merge within each bucket. Works on any Ray Data
  version and makes the shuffle explicit; ``salt`` splits hot keys of the
  LEFT (probe) side into sub-buckets and replicates the matching build rows
  into all of them — the standard skew treatment.

Broadcast joins (small dimension side) live where they're used
(pipelines/queries.py) — no shuffle at all.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _key_hash(vals: list, buckets: int, tweak: bytes = b"") -> np.ndarray:
    return np.asarray(
        [
            int.from_bytes(
                hashlib.blake2b(str(v).encode() + tweak, digest_size=8).digest(), "little"
            )
            % buckets
            for v in vals
        ],
        dtype=np.int64,
    )


def dataset_join(left, right, on: str, num_partitions: int = 16, join_type: str = "inner"):
    """Native hash-partitioned join."""
    return left.join(right, join_type=join_type, num_partitions=num_partitions, on=(on,))


def bucketed_hash_join(left, right, on: str, num_buckets: int = 32, salt: int = 1):
    """Explicit partitioned inner hash join; deterministic bucketing
    (blake2b — never the process-salted builtin ``hash``, which would break
    retry lineage)."""
    lschema = left.schema()
    rschema = right.schema()
    lcols = list(lschema.names)
    rcols = list(rschema.names)
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    all_cols = lcols + [c for c in rcols if c not in lcols]

    def _arrow_type(t):
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(t)
        except (pa.ArrowNotImplementedError, TypeError):
            return pa.string()  # object dtype → string padding

    types = {c: _arrow_type(t) for c, t in {**rtypes, **ltypes}.items()}

    def pad(batch: pa.Table, side: str, bucket: np.ndarray) -> pa.Table:
        n = batch.num_rows
        arrays, names = [], []
        for c in all_cols:
            if c in batch.column_names:
                arrays.append(batch.column(c))
            else:
                arrays.append(pa.nulls(n, types[c]))
            names.append(c)
        arrays.append(pa.array(bucket))
        names.append("__bucket")
        arrays.append(pa.array([side] * n, pa.string()))
        names.append("__side")
        return pa.table(dict(zip(names, arrays)))

    def tag_left(batch: pa.Table) -> pa.Table:
        keys = batch.column(on).to_pylist()
        base = _key_hash(keys, num_buckets)
        if salt > 1:
            sub = _key_hash(keys, salt, tweak=b"#salt")
            base = base * salt + sub
        return pad(batch, "L", base)

    def tag_right(batch: pa.Table) -> pa.Table:
        keys = batch.column(on).to_pylist()
        base = _key_hash(keys, num_buckets)
        if salt > 1:
            parts = [pad(batch, "R", base * salt + s) for s in range(salt)]
            return pa.concat_tables(parts)
        return pad(batch, "R", base)

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(tag_right, batch_format="pyarrow")
    both = lt.union(rt)

    l_only = [c for c in lcols if c != on]
    r_only = [c for c in rcols if c != on and c not in lcols]

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lrows = g.loc[g["__side"] == "L", [on] + l_only]
        rrows = g.loc[g["__side"] == "R", [on] + r_only]
        if lrows.empty or rrows.empty:
            return pd.DataFrame(columns=[on] + l_only + r_only)
        return lrows.merge(rrows, on=on, how="inner")

    return both.groupby("__bucket").map_groups(merge_bucket, batch_format="pandas")


# ---------------------------------------------------------------------------
# semi / anti joins (broadcast key membership — the cache anti-join shape,
# ref:core/orchestrator.py:617-630 / SURVEY.md §2.H)
# ---------------------------------------------------------------------------


def _broadcast_keys(keys_ds, on: str):
    import ray

    vals = set()
    for b in keys_ds.select_columns([on]).iter_batches(batch_size=65536, batch_format="pyarrow"):
        vals.update(b.column(on).to_pylist())
    arr = np.sort(np.asarray([_key_hash([v], 1 << 62)[0] for v in vals], dtype=np.int64))
    return ray.put(arr)


def _membership_filter(ds, keys_ds, on: str, keep_members: bool):
    """Filter ``ds`` by membership of ``on`` in ``keys_ds`` — the key set is
    broadcast once as a sorted int64 hash array (zero-copy per task).
    64-bit hashing: false-member probability ~n²/2⁶² (swap in exact string
    broadcast below ~10⁴ keys if that ever matters)."""
    import ray

    ref = _broadcast_keys(keys_ds, on)

    def fn(batch: pa.Table) -> pa.Table:
        w = ray.get(ref)
        keys = batch.column(on).to_pylist()
        h = _key_hash(keys, 1 << 62)
        pos = np.searchsorted(w, h)
        pos[pos >= len(w)] = max(0, len(w) - 1)
        member = (w[pos] == h) if len(w) else np.zeros(len(keys), dtype=bool)
        return batch.filter(pa.array(member if keep_members else ~member))

    return ds.map_batches(fn, batch_format="pyarrow")


def semi_join(ds, keys_ds, on: str):
    """Rows of ds whose key appears in keys_ds."""
    return _membership_filter(ds, keys_ds, on, keep_members=True)


def anti_join(ds, keys_ds, on: str):
    """Rows of ds whose key does NOT appear in keys_ds (the frontier's
    already-archived filter in Dataset form)."""
    return _membership_filter(ds, keys_ds, on, keep_members=False)

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

import numpy as np
import pandas as pd
import pyarrow as pa

# pd.util.hash_array: vectorized keyed siphash with a FIXED key — deterministic
# across processes and retries (never the salted builtin ``hash``), and a
# single C call per batch instead of one hashlib object per value.
_SALT_KEY = "aar.join.salt.16"  # 16 chars — an independent second hash family


def _hash_u64(vals, tweak: str | None = None) -> np.ndarray:
    arr = np.asarray(vals)
    if arr.dtype == object or arr.dtype.kind in ("U", "S"):
        arr = np.asarray([str(v) for v in vals], dtype=object)
        kwargs = {"hash_key": tweak} if tweak else {}
        return pd.util.hash_array(arr, categorize=False, **kwargs)
    h = pd.util.hash_array(arr, categorize=False)
    if tweak:
        # hash_array's hash_key only perturbs object/string hashing — for
        # numeric keys the "second family" would be the identical hash and
        # salt sub-buckets would correlate with the base bucket (a no-op
        # skew split). Derive an independent family with a splitmix64-style
        # finalizer keyed on the tweak (vectorized, deterministic).
        import hashlib

        c = np.uint64(
            int.from_bytes(hashlib.blake2b(tweak.encode(), digest_size=8).digest(), "little") | 1
        )
        x = (h ^ c) * np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(31)
        x = x * np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(29)
        return x
    return h


def _key_hash(vals: list, buckets: int, tweak: bytes = b"") -> np.ndarray:
    h = _hash_u64(vals, tweak=_SALT_KEY if tweak else None)
    return (h % np.uint64(buckets)).astype(np.int64)


def dataset_join(left, right, on: str, num_partitions: int = 16, join_type: str = "inner"):
    """Native hash-partitioned join."""
    return left.join(right, join_type=join_type, num_partitions=num_partitions, on=(on,))


def broadcast_join(probe, build, on: str):
    """Inner broadcast join, zero-copy: the build side is streamed once to
    the driver and shipped via ``ray.put`` as (key-hash-sorted uint64 array,
    Arrow table in that order) — both come out of the object store zero-copy
    per task, no per-task dict unpickle (the BASELINE broadcast lesson).
    Lookup is vectorized searchsorted; hash matches are verified against the
    actual key values, so u64 collisions cannot leak rows. Duplicate build
    keys emit ONE OUTPUT ROW PER MATCHING BUILD ROW — identical semantics to
    ``dataset_join``/``bucketed_hash_join``, so :func:`plan_join`'s size
    threshold can never change results. ONLY for genuinely small build
    sides (nation/region class)."""
    import pyarrow.compute as pc
    import ray

    parts = list(build.iter_batches(batch_size=65536, batch_format="pyarrow"))
    btab = pa.concat_tables(parts) if parts else None
    if btab is None or btab.num_rows == 0:
        schema = btab.schema if btab is not None else pa.schema([(on, pa.string())])
        btab = schema.empty_table()
        bh = np.empty(0, dtype=np.uint64)
    else:
        bh = _hash_u64(btab.column(on).to_pylist())
        order = np.argsort(bh, kind="stable")  # stable: stream order among equal keys
        bh = bh[order]
        btab = btab.combine_chunks().take(pa.array(order))
    ref = ray.put((bh, btab))
    value_cols = [c for c in btab.column_names if c != on]

    def fn(batch: pa.Table) -> pa.Table:
        wh, wtab = ray.get(ref)
        keys = batch.column(on).to_pylist()
        h = _hash_u64(keys) if keys else np.empty(0, dtype=np.uint64)
        lo = np.searchsorted(wh, h, side="left")
        hi = np.searchsorted(wh, h, side="right")
        counts = (hi - lo).astype(np.int64)
        total = int(counts.sum())
        if total == 0:
            out = batch.slice(0, 0)
            for c in value_cols:
                out = out.append_column(c, wtab.column(c).slice(0, 0))
            return out
        probe_idx = np.repeat(np.arange(len(keys), dtype=np.int64), counts)
        starts = np.repeat(counts.cumsum() - counts, counts)
        build_idx = np.repeat(lo, counts) + (np.arange(total, dtype=np.int64) - starts)
        probe_out = batch.take(pa.array(probe_idx))
        build_out = wtab.take(pa.array(build_idx))
        eq = pc.fill_null(pc.equal(probe_out.column(on), build_out.column(on)), False)
        if not pc.all(eq).as_py():
            probe_out = probe_out.filter(eq)
            build_out = build_out.filter(eq)
        out = probe_out
        for c in value_cols:
            out = out.append_column(c, build_out.column(c))
        return out

    return probe.map_batches(fn, batch_format="pyarrow")


def plan_join(
    probe,
    build,
    on: str,
    build_rows: int | None = None,
    scales_with_data: bool = False,
    broadcast_limit: int = 100_000,
    num_partitions: int = 16,
):
    """Size-thresholded join planning (inner join).

    Broadcast ONLY a genuinely small build side: known row count
    (``build_rows`` — e.g. parquet footer metadata, no read needed) at or
    under ``broadcast_limit`` AND not flagged ``scales_with_data``. A
    dimension that grows with the dataset (customer, part) must take the
    hash-partitioned shuffle join even when it happens to be small at test
    scale — at 100× it is a driver OOM as a broadcast. Unknown size →
    shuffle (the safe default)."""
    if not scales_with_data and build_rows is not None and build_rows <= broadcast_limit:
        return broadcast_join(probe, build, on)
    return dataset_join(probe, build, on, num_partitions=num_partitions)


def _pandas_dtype(at: pa.DataType):
    """Arrow type → pandas dtype for TYPED empty frames (string → object,
    which round-trips back to arrow string)."""
    try:
        return np.dtype(at.to_pandas_dtype()) if not pa.types.is_string(at) else np.dtype(object)
    except (NotImplementedError, TypeError):
        return np.dtype(object)


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
            elif pa.types.is_integer(types[c]) or pa.types.is_floating(types[c]):
                # zero sentinel, not null: padded cells are DROPPED by
                # merge_bucket's side-column selection, but an int64 column
                # holding any null turns float64 at the pandas conversion —
                # silently corrupting >2^53 keys and splitting hash buckets
                arrays.append(pa.array(np.zeros(n, dtype=types[c].to_pandas_dtype())))
            else:
                arrays.append(pa.nulls(n, types[c]))
            names.append(c)
        arrays.append(pa.array(bucket))
        names.append("__bucket")
        arrays.append(pa.array([side] * n, pa.string()))
        names.append("__side")
        return pa.table(dict(zip(names, arrays)))

    def tag_left(batch: pa.Table) -> pa.Table:
        if on not in batch.column_names:  # schema-less empty block (map_groups artifact)
            batch = pa.table({on: pa.array([], types[on])})
        keys = batch.column(on).to_pylist()
        base = _key_hash(keys, num_buckets)
        if salt > 1:
            sub = _key_hash(keys, salt, tweak=b"#salt")
            base = base * salt + sub
        return pad(batch, "L", base)

    def tag_right(batch: pa.Table) -> pa.Table:
        if on not in batch.column_names:
            batch = pa.table({on: pa.array([], types[on])})
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
            # typed empty frame, never bare object columns: a dtype-less
            # empty block destabilizes the dataset schema and promotes
            # int64 key columns to float64 downstream, where hash
            # bucketing of 1328.0 != hash of 1328 silently splits keys
            return pd.DataFrame(
                {
                    c: pd.Series(dtype=_pandas_dtype(types[c]))
                    for c in [on] + l_only + r_only
                }
            )
        return lrows.merge(rrows, on=on, how="inner")

    return both.groupby("__bucket").map_groups(merge_bucket, batch_format="pandas")


# ---------------------------------------------------------------------------
# semi / anti joins (key membership — the cache anti-join shape,
# ref:core/orchestrator.py:617-630 / SURVEY.md §2.H)
#
# Two strategies, selected by the size of the KEY side:
# - "broadcast": stream the key side's u64 hashes to the driver once, ship a
#   sorted numpy array via ray.put (zero-copy per task). Driver memory is
#   8 B/key — fine to ~10⁸ keys, wrong beyond.
# - "sharded": a pool of KeySetShard actors, each owning hash(key)%N of the
#   key space. The key side streams INTO the shards via map_batches push
#   tasks (no driver materialization, no full-row shuffle of either side);
#   the probe side filters via batched per-shard membership RPCs — the same
#   shape as the frontier's seen-filter. 8 B/key spread across the pool;
#   this is the 100-TB path when the key side is a big table.
# Both use 64-bit key hashes: false-member probability ~n²/2⁶⁴.
# ---------------------------------------------------------------------------


def _lazy_keyset_shard():
    import ray

    # num_cpus=0: a memory service doing O(batch) numpy lookups — reserving
    # CPU slots would starve the Dataset tasks on small ray.init sessions
    # (16 shards × 0.25 would eat a 4-CPU test session whole)
    @ray.remote(num_cpus=0)
    class KeySetShard:
        """One partition of a distributed u64 key set."""

        def __init__(self):
            self._parts: list[np.ndarray] = []
            self.keys: np.ndarray | None = None

        def add(self, h: np.ndarray) -> int:
            self._parts.append(np.asarray(h, dtype=np.uint64))
            return len(h)

        def seal(self) -> int:
            if self._parts:
                self.keys = np.unique(np.concatenate(self._parts))
            else:
                self.keys = np.empty(0, dtype=np.uint64)
            self._parts = []
            return len(self.keys)

        def contains(self, h: np.ndarray) -> np.ndarray:
            w = self.keys if self.keys is not None else np.empty(0, dtype=np.uint64)
            if not len(w):
                return np.zeros(len(h), dtype=bool)
            pos = np.searchsorted(w, h)
            pos[pos >= len(w)] = len(w) - 1
            return w[pos] == h

    return KeySetShard


def _build_keyset_shards(keys_ds, on: str, num_shards: int):
    """Stream the key side into a sharded key-set actor pool; returns the
    shard handles (kept alive by the probe-stage closure's references)."""
    import ray

    KeySetShard = _lazy_keyset_shard()
    shards = [KeySetShard.remote() for _ in range(num_shards)]

    def push(batch: pa.Table) -> pa.Table:
        h = _hash_u64(batch.column(on).to_pylist())
        sid = (h % np.uint64(num_shards)).astype(np.int64)
        futs = [shards[int(s)].add.remote(h[sid == s]) for s in np.unique(sid)]
        ray.get(futs)  # delivery barrier — rows are in shard state before the task ends
        return pa.table({"n": pa.array([len(h)], pa.int64())})

    # .sum drives execution of the push pipeline (tiny one-row-per-batch output)
    keys_ds.select_columns([on]).map_batches(push, batch_format="pyarrow").sum("n")
    ray.get([s.seal.remote() for s in shards])
    return shards


def _broadcast_keys(keys_ds, on: str):
    import ray

    parts = [
        _hash_u64(b.column(on).to_pylist())
        for b in keys_ds.select_columns([on]).iter_batches(batch_size=65536, batch_format="pyarrow")
    ]
    arr = np.unique(np.concatenate(parts)) if parts else np.empty(0, dtype=np.uint64)
    return ray.put(arr)


def _membership_filter(
    ds, keys_ds, on: str, keep_members: bool, strategy: str = "broadcast", num_shards: int = 16
):
    import ray

    if strategy == "sharded":
        shards = _build_keyset_shards(keys_ds, on, num_shards)

        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            if n == 0:
                return batch
            h = _hash_u64(batch.column(on).to_pylist())
            sid = (h % np.uint64(num_shards)).astype(np.int64)
            member = np.zeros(n, dtype=bool)
            futs, idxs = [], []
            for s in np.unique(sid):
                idx = np.nonzero(sid == s)[0]
                futs.append(shards[int(s)].contains.remote(h[idx]))
                idxs.append(idx)
            for fut, idx in zip(ray.get(futs), idxs):
                member[idx] = fut
            return batch.filter(pa.array(member if keep_members else ~member))

        return ds.map_batches(fn, batch_format="pyarrow")

    ref = _broadcast_keys(keys_ds, on)

    def fn(batch: pa.Table) -> pa.Table:
        w = ray.get(ref)
        keys = batch.column(on).to_pylist()
        h = _hash_u64(keys)
        pos = np.searchsorted(w, h)
        pos[pos >= len(w)] = max(0, len(w) - 1)
        member = (w[pos] == h) if len(w) else np.zeros(len(keys), dtype=bool)
        return batch.filter(pa.array(member if keep_members else ~member))

    return ds.map_batches(fn, batch_format="pyarrow")


def semi_join(ds, keys_ds, on: str, strategy: str = "broadcast", num_shards: int = 16):
    """Rows of ds whose key appears in keys_ds."""
    return _membership_filter(ds, keys_ds, on, True, strategy=strategy, num_shards=num_shards)


def anti_join(ds, keys_ds, on: str, strategy: str = "broadcast", num_shards: int = 16):
    """Rows of ds whose key does NOT appear in keys_ds (the frontier's
    already-archived filter in Dataset form). strategy="sharded" when the
    key side is a big table (no driver-side key materialization)."""
    return _membership_filter(ds, keys_ds, on, False, strategy=strategy, num_shards=num_shards)

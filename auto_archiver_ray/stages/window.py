"""Stream-shaped operators over an ordered, key-partitioned log: as-of join,
tumbling windows, gap-based session windows.

Ray Data has no event-time window/watermark machinery; the reference has no
streaming either (each URL independent — SURVEY.md §2.H). These operators
implement the standard batch formulation: partition by key (`groupby` —
the one shuffle), sort within group by time, window with pandas. Ordering
guarantee is therefore *per key*, mirroring how the reference only
guarantees per-host ordering through its sequential loop.

Scale notes: the shuffle key is a COARSE hash bucket of the entity key
(hash(user_id) % num_buckets), never one Ray group per key — Ray pays fixed
per-group overhead (~3 ms), so millions of tiny per-user groups would
dominate the wall (the grouped_topk/exact_dedup lesson applied). All rows
of a key land in one bucket; inside the bucket the per-key logic is
vectorized pandas (``merge_asof(by=key)`` and grouped diff/cumsum both work
without per-key loops). Tumbling windows are instead computed shuffle-free
as a batch column + bounded-group aggregation (see queries.q_events_hourly).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _add_key_bucket(ds, key_col: str, num_buckets: int):
    """Append ``__kb = hash(key) % num_buckets`` (vectorized keyed siphash —
    deterministic across processes, never the salted builtin hash)."""

    def fn(batch: pa.Table) -> pa.Table:
        arr = np.asarray(batch.column(key_col).to_pylist())
        if arr.dtype == object or arr.dtype.kind in ("U", "S"):
            arr = np.asarray([str(v) for v in arr], dtype=object)
        hb = (pd.util.hash_array(arr, categorize=False) % np.uint64(num_buckets)).astype(np.int64)
        return batch.append_column("__kb", pa.array(hb))

    return ds.map_batches(fn, batch_format="pyarrow")


def asof_join_groups(
    ds,
    key_col: str,
    ts_col: str,
    left_filter,
    right_filter,
    out_col: str = "asof_ts",
    num_buckets: int = 256,
):
    """Per-key as-of join within one Dataset: for each left row, the max
    right-row timestamp ≤ the left timestamp. ``left_filter``/``right_filter``
    take a pandas frame and return boolean masks. Returns rows of
    (key, left-row columns, out_col). One Ray group per coarse key bucket;
    ``merge_asof(by=key)`` handles every key of the bucket in one vectorized
    call."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__kb"])
        left = g[left_filter(g)]
        right = g[right_filter(g)]
        if left.empty:
            return left.assign(**{out_col: pd.Series(dtype="datetime64[us]")})
        left = left.sort_values(ts_col, kind="mergesort")
        if right.empty:
            out = left.copy()
            out[out_col] = pd.NaT
            return out
        right = right.sort_values(ts_col, kind="mergesort")
        merged = pd.merge_asof(
            left,
            right[[key_col, ts_col]].rename(columns={ts_col: out_col}),
            left_on=ts_col,
            right_on=out_col,
            by=key_col,
            direction="backward",
        )
        return merged

    return (
        _add_key_bucket(ds, key_col, num_buckets)
        .groupby("__kb")
        .map_groups(per_bucket, batch_format="pandas")
    )


def session_windows(
    ds,
    key_col: str,
    ts_col: str,
    gap_seconds: float = 1800.0,
    num_buckets: int = 256,
):
    """Gap-based session assignment per key: a new session starts when the
    gap to the previous event exceeds ``gap_seconds``. Returns per-(key,
    session) rollups (key, session_id, session_start, session_end,
    n_events) with ``session_id`` 0-based per key. One Ray group per coarse
    key bucket; session breaks are a vectorized diff/cumsum over the
    (key, ts)-sorted bucket."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col], kind="mergesort").reset_index(drop=True)
        gaps = g[ts_col].diff().dt.total_seconds().fillna(0.0)
        brk = (gaps > gap_seconds) | (g[key_col] != g[key_col].shift())
        g = g.assign(__gs=brk.cumsum())
        roll = g.groupby([key_col, "__gs"], as_index=False).agg(
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
            n_events=(ts_col, "size"),
        )
        # __gs is monotone in ts within a key → cumcount = 0-based session_id
        roll["session_id"] = roll.groupby(key_col, sort=False).cumcount().astype("int64")
        roll["n_events"] = roll["n_events"].astype("int64")
        return roll[[key_col, "session_id", "session_start", "session_end", "n_events"]]

    return (
        _add_key_bucket(ds, key_col, num_buckets)
        .groupby("__kb")
        .map_groups(per_bucket, batch_format="pandas")
    )


def sliding_window_explode(
    batch: pd.DataFrame,
    ts_col: str,
    window_s: int = 3600,
    slide_s: int = 900,
    out_col: str = "win_start_s",
) -> pd.DataFrame:
    """Shuffle-free sliding-window assignment: each row explodes into the
    ``window_s / slide_s`` windows that contain it, keyed by epoch-second
    window start (int64 — timestamp-typed keys invite tz/precision drift
    between engines). Follow with a bounded-group rollup on
    (key..., win_start_s)."""
    k = window_s // slide_s
    # cast through datetime64[s] so the int64 is epoch seconds regardless of
    # the column's stored resolution (us vs ns)
    epoch = batch[ts_col].astype("datetime64[s]").astype("int64")
    base = (epoch // slide_s) * slide_s
    frames = []
    for i in range(k):
        f = batch.copy()
        f[out_col] = base - i * slide_s
        frames.append(f)
    return pd.concat(frames, ignore_index=True)


def tumbling_window_column(batch: pd.DataFrame, ts_col: str, freq: str = "h", out_col: str = "window") -> pd.DataFrame:
    """Shuffle-free tumbling-window assignment: floor the timestamp. The
    subsequent aggregate is a bounded-group rollup (see q_events_hourly)."""
    batch[out_col] = batch[ts_col].dt.floor(freq)
    return batch

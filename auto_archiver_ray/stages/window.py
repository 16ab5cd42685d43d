"""Stream-shaped operators over an ordered, key-partitioned log: as-of join,
tumbling windows, gap-based session windows.

Ray Data has no event-time window/watermark machinery; the reference has no
streaming either (each URL independent — SURVEY.md §2.H). These operators
implement the standard batch formulation: partition by key (`groupby` —
the one shuffle), sort within group by time, window with pandas. Ordering
guarantee is therefore *per key*, mirroring how the reference only
guarantees per-host ordering through its sequential loop.

Scale notes: the shuffle key is the entity key (user_id), assumed roughly
uniform; windows never cross keys so groups are independent; tumbling
windows are instead computed shuffle-free as a batch column + bounded-group
aggregation (see queries.q_events_hourly).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def asof_join_groups(
    ds,
    key_col: str,
    ts_col: str,
    left_filter,
    right_filter,
    out_col: str = "asof_ts",
):
    """Per-key as-of join within one Dataset: for each left row, the max
    right-row timestamp ≤ the left timestamp. ``left_filter``/``right_filter``
    take a pandas group and return boolean masks. Returns rows of
    (key, left-row columns, out_col)."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        left = g[left_filter(g)]
        right = g[right_filter(g)]
        if left.empty:
            return left.assign(**{out_col: pd.Series(dtype="datetime64[us]")})
        if right.empty:
            out = left.copy()
            out[out_col] = pd.NaT
            return out
        merged = pd.merge_asof(
            left,
            right[[ts_col]].rename(columns={ts_col: out_col}),
            left_on=ts_col,
            right_on=out_col,
            direction="backward",
        )
        return merged

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


def session_windows(
    ds,
    key_col: str,
    ts_col: str,
    gap_seconds: float = 1800.0,
):
    """Gap-based session assignment per key: a new session starts when the
    gap to the previous event exceeds ``gap_seconds``. Adds ``session_id``
    (0-based per key) and returns per-(key, session) rollups:
    (key, session_id, session_start, session_end, n_events)."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        gaps = g[ts_col].diff().dt.total_seconds().fillna(0.0)
        session = (gaps > gap_seconds).cumsum()
        out = g.assign(session_id=session.astype("int64"))
        roll = out.groupby("session_id", as_index=False).agg(
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
            n_events=(ts_col, "size"),
        )
        roll.insert(0, key_col, g[key_col].iloc[0])
        roll["n_events"] = roll["n_events"].astype("int64")
        return roll

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


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

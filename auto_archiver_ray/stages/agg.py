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

import pandas as pd


def driver_reduce(partials_ds, keys: list[str], agg: dict[str, str]) -> pd.DataFrame:
    """Stream a partials Dataset to the driver and finish the groupby there.

    ``agg`` maps column → {"sum", "min", "max"}. Partial rows must already be
    one-per-(key, batch); their total size is O(num_batches × num_groups).
    """
    frames = [
        b for b in partials_ds.iter_batches(batch_size=65536, batch_format="pandas")
    ]
    if not frames:
        return pd.DataFrame(columns=keys + list(agg))
    df = pd.concat(frames, ignore_index=True)
    return df.groupby(keys, as_index=False).agg(agg)

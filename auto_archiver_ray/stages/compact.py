"""Output compaction — the small-files problem at 100 TB.

Long crawls accumulate many small per-epoch part files; downstream readers
want few large files. ``compact`` rewrites a parquet directory into evenly
sized files via ``repartition`` (a block split/coalesce, NOT a row shuffle)
with atomic replace — safe to run between crawl epochs.
"""

from __future__ import annotations

import glob
import os
import shutil


def compact(parquet_dir: str, target_rows_per_file: int = 500_000) -> dict:
    """Rewrite ``parquet_dir`` in place into ~target-sized files; returns
    {files_before, files_after, rows}."""
    import pyarrow.parquet as pq
    import ray.data as rd

    files_before = sorted(glob.glob(f"{parquet_dir}/*.parquet"))
    rows = sum(pq.read_metadata(f).num_rows for f in files_before)
    if not rows:
        return {"files_before": len(files_before), "files_after": len(files_before), "rows": 0}
    num_files = max(1, (rows + target_rows_per_file - 1) // target_rows_per_file)
    ds = rd.read_parquet(files_before)
    tmp = f"{parquet_dir}.compact.tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.repartition(num_files).write_parquet(tmp)
    # atomic-ish swap: move new files in, drop old ones
    backup = f"{parquet_dir}.compact.old"
    shutil.rmtree(backup, ignore_errors=True)
    os.rename(parquet_dir, backup)
    os.rename(tmp, parquet_dir)
    shutil.rmtree(backup, ignore_errors=True)
    files_after = sorted(glob.glob(f"{parquet_dir}/*.parquet"))
    return {"files_before": len(files_before), "files_after": len(files_after), "rows": rows}

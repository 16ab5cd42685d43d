"""Resumable partitioned output: per-partition parquet dirs + a manifest.

"Resumable from checkpoint with per-partition lineage" (north rule): each
unit of work (a fetch epoch, an input shard, a key range) writes to its own
directory atomically (tmp dir + rename) and appends a manifest line
``{partition, rows, path}``. A restarted run reads the manifest and skips
finished partitions — the batch analogue of the reference's ledger-based
resume (sheet status column, ref:modules/gsheet_feeder_db/
gsheet_feeder_db.py:75-79; Atlos processed flag).
"""

from __future__ import annotations

import json
import os


class PartitionedWriter:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.manifest_path = os.path.join(root, "MANIFEST.jsonl")

    def completed(self) -> dict[str, dict]:
        done = {}
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        rec = json.loads(line)
                        done[rec["partition"]] = rec
        return done

    def is_done(self, partition: str) -> bool:
        return partition in self.completed()

    def partition_dir(self, partition: str) -> str:
        return os.path.join(self.root, f"part={partition}")

    def write(self, partition: str, ds) -> dict:
        """Write one partition's Dataset atomically; no-op if already done."""
        done = self.completed()
        if partition in done:
            return done[partition]
        final = self.partition_dir(partition)
        tmp = final + ".tmp"
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        ds.write_parquet(tmp)
        rows = sum(1 for _ in ())  # rows counted from files below (no extra pass)
        import glob

        import pyarrow.parquet as pq

        rows = sum(pq.read_metadata(f).num_rows for f in glob.glob(f"{tmp}/*.parquet"))
        shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)
        rec = {"partition": partition, "rows": rows, "path": final}
        with open(self.manifest_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        return rec

    def read_all(self):
        """Dataset over every completed partition."""
        import glob

        import ray.data as rd

        files = [
            f
            for rec in self.completed().values()
            for f in sorted(glob.glob(f"{rec['path']}/*.parquet"))
        ]
        return rd.read_parquet(files) if files else None

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

    def is_done(self, partition: str, inputs: str | None = None) -> bool:
        """True iff ``partition`` is recorded complete. When ``inputs`` (a
        digest of the partition's input identity — e.g. its member file
        list) is given and the manifest recorded one, a mismatch raises
        instead of skipping: resuming after the input set changed must fail
        loudly, not silently treat a different file group as done
        (ADVICE r3 #2)."""
        rec = self.completed().get(partition)
        if rec is None:
            return False
        if inputs is not None and rec.get("inputs") is not None and rec["inputs"] != inputs:
            raise ValueError(
                f"checkpoint partition {partition!r} at {self.root} was written "
                f"from different inputs (manifest {rec['inputs']!r} != current "
                f"{inputs!r}) — the input file set or grouping changed; delete "
                f"the checkpoint root or use a fresh out_root"
            )
        return True

    def partition_dir(self, partition: str) -> str:
        return os.path.join(self.root, f"part={partition}")

    def write(self, partition: str, ds, inputs: str | None = None) -> dict:
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
        rec = {"partition": partition, "rows": rows, "path": final, "inputs": inputs}
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

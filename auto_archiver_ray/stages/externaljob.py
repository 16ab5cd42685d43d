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
    """Gateway to one external service. Stub: a job finishes after
    ``polls_to_done`` status checks and returns a deterministic artifact."""

    def __init__(self, polls_to_done: int = 2):
        self.jobs: dict[str, dict] = {}
        self.polls_to_done = polls_to_done
        self.counters = {"submitted": 0, "polled": 0, "done": 0}

    def submit(self, keys: list[str]) -> list[str]:
        out = []
        for k in keys:
            job_id = f"job-{len(self.jobs):08d}"
            self.jobs[job_id] = {"key": k, "polls": 0, "status": "processing"}
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
            out.append({"job_id": j, "status": rec["status"], "artifact": rec.get("artifact", "")})
        return out

    def _execute(self, key: str) -> str:
        # STUB: deterministic artifact (e.g. an archive URL / transcript id).
        # Production: the HTTP result payload.
        import hashlib

        return f"https://archive.example/{hashlib.sha256(key.encode()).hexdigest()[:16]}"

    def stats(self) -> dict:
        return dict(self.counters)


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

"""Benchmark harness.

Headline: the flagship archive pipeline (validate → frontier-keyed hashing →
enrich → extract → content dedup → parquet sink) over the synthetic sf0.1
pages table (100k pages), reported as wall seconds + URLs/sec — the
BASELINE.json metric. Plus per-query timings for representative operators.

Usage:
    python bench.py                 # one JSON line, honoring $RAY_GRAFT_CPUS
    python bench.py --scaling       # run at 8 and 32 CPUs in fresh
                                    # processes; print throughputs + efficiency
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from auto_archiver_ray.pipelines import queries as Q
    from auto_archiver_ray.pipelines.archive import archive_pages
    from auto_archiver_ray.sources.pages import ensure_pages

    pages_path = ensure_pages(SF_DIR)
    # warm the OS page cache so the timed run measures compute + shuffle
    import pyarrow.parquet as pq

    n_pages = pq.read_metadata(pages_path).num_rows

    out_dir = f"/tmp/aar_bench_out_{os.getpid()}"
    t0 = time.time()
    ds = archive_pages(
        SF_DIR,
        batch_size=512,
        extract_concurrency=max(2, NUM_CPUS - 4),
        dedup_content=True,
    ).drop_columns(["media_links"])
    ds.write_parquet(out_dir)
    headline = time.time() - t0
    shutil.rmtree(out_dir, ignore_errors=True)

    per_query = {}
    for name in (
        "q_lineitem_pricing",
        "q_top_customers",
        "q_events_hourly",
        "q_doc_token_stats",
        "q_doc_minhash_pairs",
        "q_pages_dedup",
        "q_knn",
    ):
        t0 = time.time()
        res = Q.QUERIES[name](SF_DIR)
        # drain lazily-built results
        if hasattr(res, "to_pandas"):
            res.to_pandas()
        per_query[name] = round(time.time() - t0, 3)

    result = {
        "metric": "archive_pipeline_sf0.1_wall_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "urls_per_sec": round(n_pages / headline, 1),
        "n_pages": n_pages,
        "queries": per_query,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }
    ray.shutdown()
    return result


def run_scaling() -> None:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = one(lo), one(hi)
    thr_lo = r_lo["urls_per_sec"]
    thr_hi = r_hi["urls_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(eff, 3),
                "unit": "ratio",
                "cpus_lo": lo,
                "cpus_hi": hi,
                "sec_lo": r_lo["value"],
                "sec_hi": r_hi["value"],
                "urls_per_sec_lo": thr_lo,
                "urls_per_sec_hi": thr_hi,
                "sf": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))

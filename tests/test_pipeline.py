"""End-to-end pipeline tests on the sf0.001 synthetic pages table."""

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from auto_archiver_ray.sources.pages import ensure_pages, generate_pages


def test_pages_generation_deterministic():
    t1 = generate_pages(100)
    t2 = generate_pages(100)
    assert t1.equals(t2)
    assert t1.schema.names == ["url", "warc_ts", "html", "text", "lang"]
    assert str(t1.schema.field("warc_ts").type) == "timestamp[us]"
    assert str(t1.schema.field("html").type) == "binary"


def test_pages_feature_mix():
    t = generate_pages(300)
    urls = t.column("url").to_pylist()
    assert any(u.startswith("ftp://") for u in urls)
    assert any("localhost" in u for u in urls)
    assert any("utm_source" in u for u in urls)
    htmls = t.column("html").to_pylist()
    assert len(htmls) != len(set(htmls))  # exact dups exist


@pytest.mark.usefixtures("ray_session")
def test_extraction_invariant_byte_identical():
    """The north-rule correctness gate: extracted text per url must be
    byte-identical to the stored `text` column."""
    import ray.data as rd

    from auto_archiver_ray.stages.extract import ExtractStage

    path = ensure_pages("/root/testdata/sf0.001")
    ds = rd.read_parquet(path, columns=["url", "html", "text"])
    out = ds.map_batches(ExtractStage, batch_format="pyarrow", batch_size=64, concurrency=2)
    tbl = pa.Table.from_pandas(out.select_columns(["url", "text", "text_extracted"]).to_pandas())
    assert tbl.num_rows == 300
    mism = tbl.filter(pc.invert(pc.equal(tbl["text"], tbl["text_extracted"])))
    assert mism.num_rows == 0


@pytest.mark.usefixtures("ray_session")
def test_archive_pipeline_end_to_end():
    from auto_archiver_ray.pipelines.archive import archive_pages, archive_summary

    ds = archive_pages("/root/testdata/sf0.001", with_report=True, extract_concurrency=2)
    batch = ds.take_batch(300, batch_format="pyarrow")
    # invalid rows filtered (~6-7% of 300)
    assert 250 < batch.num_rows < 300
    assert pc.all(batch.column("valid")).as_py() is True
    # statuses are success or deletion sentinel
    statuses = set(batch.column("status").to_pylist())
    assert statuses <= {"generic: success", "telegram: success", "deleted_or_unavailable", "nothing archived"}
    # content hash format parity
    assert all(h.startswith("SHA-256:") for h in batch.column("content_hash").to_pylist())
    # deletion rows carry indicator + source
    del_rows = batch.filter(pc.field("deletion_detected"))
    if del_rows.num_rows:
        assert all(i for i in del_rows.column("deletion_indicator").to_pylist())
        assert set(del_rows.column("status").to_pylist()) == {"deleted_or_unavailable"}
    # report column: self-hash matches content
    import hashlib

    h0 = batch.column("report_hash").to_pylist()[0]
    doc0 = batch.column("report_html").to_pylist()[0]
    assert h0 == f"SHA-256:{hashlib.sha256(doc0.encode()).hexdigest()}"
    # per-host summary aggregates (a Dataset — unbounded host cardinality)
    summ = archive_summary(
        archive_pages("/root/testdata/sf0.001", extract_concurrency=2)
    ).to_pandas()
    assert summ["n_urls"].sum() == batch.num_rows
    assert (summ["total_bytes"] > 0).all()


@pytest.mark.usefixtures("ray_session")
def test_fused_archive_matches_unfused():
    """FusedArchiveStage (the bench/scaling path: whole per-row chain in
    one actor __call__) is row-for-row identical to the staged chain."""
    from auto_archiver_ray.pipelines.archive import archive_pages

    drop = ["media_links", "page_links"]
    a = (
        archive_pages("/root/testdata/sf0.001", extract_concurrency=2)
        .drop_columns(drop)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    b = (
        archive_pages("/root/testdata/sf0.001", extract_concurrency=2, fused=True)
        .drop_columns(drop)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert list(a.columns) == list(b.columns)
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_archive_summary_strategies_match():
    """The bucketed (unbounded-host, distributed) and driver (bounded fast
    path) summary strategies are bit-identical integer sums (VERDICT r3
    'What's wrong' #3)."""
    import pandas as pd

    from auto_archiver_ray.pipelines.archive import archive_pages, archive_summary

    ds = archive_pages("/root/testdata/sf0.001", extract_concurrency=2)
    a = archive_summary(ds, strategy="bucketed").to_pandas()
    b = archive_summary(ds, strategy="driver").to_pandas()
    a = a.sort_values("host").reset_index(drop=True)
    b = b.sort_values("host").reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["host", "n_urls", "total_bytes", "n_deleted"]],
                                  b[["host", "n_urls", "total_bytes", "n_deleted"]],
                                  check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_archive_full_content_dedup():
    from auto_archiver_ray.pipelines.archive import archive_pages_full

    ds = archive_pages_full("/root/testdata/sf0.001", extract_concurrency=2)
    df = ds.to_pandas()
    assert df["sha256"].is_unique
    # survivor is min url_canon per group (deterministic)
    assert (df.groupby("sha256")["url_canon"].count() == 1).all()


@pytest.mark.usefixtures("ray_session")
def test_pipeline_deterministic_across_runs():
    """Re-executing the flagship pipeline yields identical rows (no
    wall-clock / random dependence anywhere — the retry/lineage guarantee)."""
    from auto_archiver_ray.pipelines.archive import archive_pages

    def snapshot():
        df = archive_pages("/root/testdata/sf0.001", extract_concurrency=2).to_pandas()
        df["media_links"] = df["media_links"].map(lambda x: tuple(x))
        return df.sort_values("url").reset_index(drop=True)

    a, b = snapshot(), snapshot()
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_archive_sharded_resume(tmp_path):
    """Sharded archive output: per-input-shard partitions with manifest
    skip — a second run re-processes nothing and output equals the
    streaming pipeline's rows."""
    from auto_archiver_ray.pipelines.archive import archive_pages, archive_pages_sharded

    out = str(tmp_path / "shards")
    w1 = archive_pages_sharded("/root/testdata/sf0.001", out, files_per_part=1, extract_concurrency=2)
    done1 = w1.completed()
    assert len(done1) >= 1
    total = sum(r["rows"] for r in done1.values())

    # matches the streaming archive row count (same stages)
    n_stream = archive_pages("/root/testdata/sf0.001", extract_concurrency=2).count()
    assert total == n_stream

    # resume: nothing re-runs, manifest unchanged
    import os
    mtime = os.path.getmtime(f"{out}/MANIFEST.jsonl")
    w2 = archive_pages_sharded("/root/testdata/sf0.001", out, files_per_part=1, extract_concurrency=2)
    assert w2.completed() == done1
    assert os.path.getmtime(f"{out}/MANIFEST.jsonl") == mtime


def test_token_shards_scan_crosses_ranges(ray_session):
    """The distributed prefix-sum must be exact across range boundaries:
    force many small ranges and compare with a serial cumsum."""
    import numpy as np
    import pyarrow.parquet as pq

    from auto_archiver_ray.pipelines.queries import q_doc_token_shards

    sf = "/root/testdata/sf0.001"
    out = q_doc_token_shards(sf, range_size=32, shard_tokens=500)
    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    t = t.sort_values("doc_id").reset_index(drop=True)
    n = t["text"].fillna("").str.split().str.len().to_numpy(dtype=np.int64)
    off = np.concatenate([[0], n.cumsum()[:-1]])
    assert (out["doc_id"].to_numpy() == t["doc_id"].to_numpy()).all()
    assert (out["n_tokens"].to_numpy() == n).all()
    assert (out["tok_offset"].to_numpy() == off).all()
    assert (out["shard_id"].to_numpy() == off // 500).all()
    assert out["shard_id"].nunique() > 3  # the packing actually splits


def test_webtext_corpus_end_to_end(ray_session):
    """Composite pipeline invariants at sf0.001: survivors are unique by
    url, offsets are a consistent prefix sum in md5(url) order, and both
    the hygiene filter and the content dedup actually removed rows."""
    import hashlib

    import numpy as np

    from auto_archiver_ray.pipelines.webtext import webtext_corpus

    out = (
        webtext_corpus("/root/testdata/sf0.001", extract_concurrency=2)
        .to_pandas()
        .sort_values("tok_offset")
        .reset_index(drop=True)
    )
    assert len(out) > 50
    assert out["url"].is_unique
    # offsets: exclusive prefix sum of n_tokens in output order
    n = out["n_tokens"].to_numpy(dtype=np.int64)
    assert (out["tok_offset"].to_numpy() == np.concatenate([[0], n.cumsum()[:-1]])).all()
    assert (out["shard_id"].to_numpy() == out["tok_offset"].to_numpy() // 2000).all()
    # order is md5(url) ascending
    rks = [hashlib.md5(u.encode()).hexdigest() for u in out["url"]]
    assert rks == sorted(rks)


def test_webtext_v2_classifier_gate_and_ledger(ray_session):
    """v2 flagship: the classifier gate only ever REMOVES rows relative to
    v1, and the gate-drop ledger is conserved — every hygiene-stage input
    row is attributed to exactly one of {rep, len, clf, kept}."""
    import ray

    from auto_archiver_ray.pipelines.webtext import make_gate_counter, webtext_corpus

    sf = "/root/testdata/sf0.001"
    v1 = webtext_corpus(sf, extract_concurrency=2).to_pandas()
    counter = make_gate_counter()
    v2 = webtext_corpus(sf, extract_concurrency=2, classifier_gate=True, counter=counter).to_pandas()
    assert set(v2["url"]) <= set(v1["url"])
    assert len(v2) < len(v1)  # the fixture weights drop some docs
    c = ray.get(counter.value.remote())
    assert c["clf_dropped"] > 0
    # conservation: ledger totals == hygiene input rows (valid pages)
    from auto_archiver_ray.pipelines.webtext import ensure_pages
    from auto_archiver_ray.stages import validate

    ds = ray.data.read_parquet(ensure_pages(sf), columns=["url", "html"])
    n_valid = (
        ds.map_batches(validate.validate_batch, batch_format="pyarrow")
        .map_batches(validate.keep_valid, batch_format="pyarrow")
        .count()
    )
    total = c.get("rep_dropped", 0) + c.get("len_dropped", 0) + c.get("clf_dropped", 0) + c["kept"]
    assert total == n_valid


@pytest.mark.usefixtures("ray_session")
def test_webtext_sharded_v2_matches_streaming(tmp_path):
    """The resumable sharded flagship with the classifier gate on equals the
    streaming v2 result, and a gate-off checkpoint cannot be silently
    reused by a gate-on resume (the gate is part of the partition's input
    identity — fails loudly)."""
    import pandas as pd

    from auto_archiver_ray.pipelines.webtext import webtext_corpus, webtext_corpus_sharded

    sf = "/root/testdata/sf0.001"
    stream = (
        webtext_corpus(sf, extract_concurrency=2, classifier_gate=True)
        .to_pandas()
        .sort_values("tok_offset")
        .reset_index(drop=True)
    )
    out = str(tmp_path / "wt_v2")
    _, corpus = webtext_corpus_sharded(sf, out, files_per_part=1, classifier_gate=True)
    sharded = (
        pd.read_parquet(corpus).sort_values("tok_offset").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(sharded[stream.columns.tolist()], stream)
    # gate and threshold are part of the partition identity: resuming the
    # SAME out_root with either changed must raise, not skip
    with pytest.raises(ValueError, match="different inputs"):
        webtext_corpus_sharded(sf, out, files_per_part=1, classifier_gate=False)
    with pytest.raises(ValueError, match="different inputs"):
        webtext_corpus_sharded(sf, out, files_per_part=1, classifier_gate=True, min_tokens=50)


@pytest.mark.usefixtures("ray_session")
def test_webtext_sharded_resume(tmp_path):
    """Resumable flagship: phase-A (extract/hygiene) checkpoints per input
    shard; output equals the streaming pipeline; a second run re-extracts
    nothing (manifest untouched) and reproduces the same corpus."""
    import os

    import pandas as pd
    import ray.data as rd

    from auto_archiver_ray.pipelines.webtext import webtext_corpus, webtext_corpus_sharded

    want = (
        webtext_corpus("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    out = str(tmp_path / "webtext")
    w1, corpus = webtext_corpus_sharded("/root/testdata/sf0.001", out, files_per_part=1)
    got = rd.read_parquet(corpus).to_pandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want, check_dtype=False)

    mtime = os.path.getmtime(f"{out}/extracted/MANIFEST.jsonl")
    w2, corpus2 = webtext_corpus_sharded("/root/testdata/sf0.001", out, files_per_part=1)
    assert os.path.getmtime(f"{out}/extracted/MANIFEST.jsonl") == mtime
    got2 = rd.read_parquet(corpus2).to_pandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got2[want.columns.tolist()], want, check_dtype=False)

    # resume with a CHANGED partition input set must fail loudly, not skip a
    # "done" partition that covered a different file group (ADVICE r3 #2):
    # the manifest records each partition's input digest and is_done verifies
    # it. (sf0.001 has one input file, so exercise the mismatch directly.)
    assert w2.is_done("shard00000", inputs=w2.completed()["shard00000"]["inputs"])
    with pytest.raises(ValueError, match="different inputs"):
        w2.is_done("shard00000", inputs="deadbeef")
    # legacy manifests without a digest still resume (inputs=None recorded)
    assert w2.is_done("shard00000")

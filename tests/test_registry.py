"""Registry / config-driven pipeline assembly tests (§2.J surface)."""

import pyarrow as pa
import pytest

from auto_archiver_ray.pipelines.registry import REGISTRY, build_pipeline, register


@pytest.mark.usefixtures("ray_session")
def test_build_default_archive_pipeline(tmp_path):
    cfg = {
        "source": {"type": "pages", "sf_dir": "/root/testdata/sf0.001"},
        "steps": [
            {"stage": "validate"},
            {"stage": "keep_valid"},
            {"stage": "hash_enrich"},
            {"stage": "meta_enrich"},
            {"stage": "extract", "concurrency": 2},
            {"stage": "html_report"},
        ],
        "sink": {"type": "parquet", "path": str(tmp_path / "out")},
    }
    out = build_pipeline(cfg)
    import ray.data as rd

    written = rd.read_parquet(out)
    assert written.count() > 250
    cols = written.schema().names
    assert {"url", "sha256", "status", "text_extracted", "report_html"} <= set(cols)


@pytest.mark.usefixtures("ray_session")
def test_items_source_and_custom_stage():
    calls = {}

    def mark(batch: pa.Table) -> pa.Table:
        calls["n"] = calls.get("n", 0) + batch.num_rows
        return batch.append_column("marked", pa.array([True] * batch.num_rows))

    register("mark", "kernel", mark)
    cfg = {
        "source": {"type": "items", "urls": ["https://a.com/1", "ftp://bad", "https://a.com/2"]},
        "steps": [{"stage": "validate"}, {"stage": "keep_valid"}, {"stage": "mark"}],
    }
    ds = build_pipeline(cfg)
    df = ds.to_pandas()
    assert len(df) == 2 and df["marked"].all()


def test_registry_contents():
    # the §2 operator families are all represented
    for name in (
        "pages",
        "csv_seeds",
        "items",
        "validate",
        "hash_enrich",
        "meta_enrich",
        "pdq_hash",
        "extract",
        "html_report",
        "json_format",
        "explode_media",
        "storage_keys",
        "token_stats",
        "lang_id",
        "quality",
        "fingerprint",
        "documents",
        "repetition",
        "pii_scan",
        "classifier",
    ):
        assert name in REGISTRY


@pytest.mark.usefixtures("ray_session")
def test_kernel_stage_with_params():
    cfg = {
        "source": {"type": "pages", "sf_dir": "/root/testdata/sf0.001", "columns": ["url", "html"]},
        "steps": [{"stage": "hash_enrich", "algorithm": "SHA3-512"}],
    }
    ds = build_pipeline(cfg)
    row = ds.take(1)[0]
    assert row["content_hash"].startswith("SHA3-512:")

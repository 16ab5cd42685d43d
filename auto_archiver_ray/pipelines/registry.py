"""Stage registry + config-driven pipeline assembly — the rebuild of the
reference's module/manifest plugin system (SURVEY.md §2.J).

The reference discovers operator packages via ``__manifest__.py`` files and
wires them into feeder → extractor → enricher → database/storage/formatter
order from a YAML config (ref:core/module.py:30-137,
ref:core/orchestrator.py:373-435). Here the same surface is a registry of
``StageSpec`` descriptors assembled into one ``ray.data.Dataset`` pipeline
from a plain config dict:

    cfg = {
        "source": {"type": "pages", "sf_dir": "/root/testdata/sf0.001"},
        "steps": [
            {"stage": "validate"},
            {"stage": "keep_valid"},
            {"stage": "hash_enrich"},
            {"stage": "extract", "concurrency": 4},
            {"stage": "html_report"},
        ],
        "sink": {"type": "parquet", "path": "/tmp/out"},
    }
    result = build_pipeline(cfg)

User extension = ``register("my_stage", kind=...)`` — the equivalent of
dropping a module package on ``--module_paths``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable


@dataclass
class StageSpec:
    name: str
    kind: str  # "kernel" (stateless fn) | "actor" (callable class) | "source" | "sink"
    target: Any
    defaults: dict = field(default_factory=dict)
    doc: str = ""


REGISTRY: dict[str, StageSpec] = {}


def register(name: str, kind: str, target: Any, defaults: dict | None = None, doc: str = "") -> None:
    REGISTRY[name] = StageSpec(name, kind, target, defaults or {}, doc)


def _register_builtins() -> None:
    from ..sources import pages as pages_src
    from ..sources import seeds as seeds_src
    from ..stages import enrich, extract, format as fmt, media, textstats, validate

    register("pages", "source", lambda cfg: pages_src.read_pages(cfg["sf_dir"], cfg.get("columns")), doc="synthetic pages table")
    register(
        "images",
        "source",
        lambda cfg: __import__("ray").data.read_parquet(
            __import__(
                "auto_archiver_ray.sources.images", fromlist=["ensure_image_corpus"]
            ).ensure_image_corpus(cfg["sf_dir"])
        ),
        doc="decodable image corpus (media_id, payload)",
    )
    register("parquet", "source", lambda cfg: __import__("ray").data.read_parquet(cfg["path"], columns=cfg.get("columns")))
    register("csv_seeds", "source", lambda cfg: seeds_src.csv_seeds(cfg["files"], cfg.get("column")))
    register("items", "source", lambda cfg: seeds_src.items_seeds(cfg["urls"]))

    register("validate", "kernel", validate.validate_batch, doc="url validation + canonicalization + frontier keys")
    register("keep_valid", "kernel", validate.keep_valid)
    register("hash_enrich", "kernel", enrich.hash_enrich, {"algorithm": "SHA-256"})
    register("meta_enrich", "kernel", enrich.meta_enrich)
    register("pdq_hash", "kernel", enrich.pdq_hash_enrich)
    register("extract", "actor", extract.ExtractStage, {"concurrency": 4, "batch_size": 256})
    register("html_report", "kernel", fmt.html_report_batch)
    register("json_format", "kernel", fmt.json_format)
    register("explode_media", "kernel", media.explode_media)
    register("storage_keys", "kernel", media.add_storage_keys)
    register("token_stats", "kernel", textstats.token_stats)
    register("lang_id", "kernel", textstats.lang_id_stage)
    register("quality", "kernel", textstats.quality_stage)
    register("fingerprint", "kernel", textstats.fingerprint_stage)

    from ..stages import mergeops
    from ..stages.multimodal import (
        FrameSampleStage,
        ImageDecodeStage,
        ImageFeatureStage,
        ImageResizeStage,
    )

    register("best_variant", "kernel", mergeops.best_variant_stage)
    register("image_decode", "actor", ImageDecodeStage, {"concurrency": 4, "batch_size": 256})
    register("image_features", "actor", ImageFeatureStage, {"concurrency": 4, "batch_size": 256})
    register("image_resize", "actor", ImageResizeStage, {"concurrency": 4, "batch_size": 256})
    register("frame_sample", "actor", FrameSampleStage, {"concurrency": 2, "batch_size": 256})
    from ..stages.multimodal import AudioFeatureStage

    register("audio_features", "actor", AudioFeatureStage, {"concurrency": 4, "batch_size": 256})

    # round-2 operators: offline archives, evidence chain, metadata extraction
    from ..sources import warc as warc_src
    from ..stages.enrich import ExifToolStage

    register("warc_records", "source", lambda cfg: warc_src.read_warc_records(cfg["paths"], cfg.get("with_payload", True)), doc="WARC record walk")
    register("wacz_records", "source", lambda cfg: warc_src.read_wacz_records(cfg["paths"], cfg.get("with_payload", True)), doc="WACZ archive record walk")
    register("wacz_pages", "source", lambda cfg: warc_src.read_wacz_pages(cfg["paths"]), doc="WACZ pages.jsonl title/text")
    register("exif_extract", "actor", ExifToolStage, {"concurrency": 4, "batch_size": 256})

    # round-3 operators: corpus hygiene / model scoring over a documents table
    register(
        "documents",
        "source",
        lambda cfg: __import__("ray").data.read_parquet(
            f"{cfg['sf_dir']}/documents.parquet", columns=cfg.get("columns")
        ),
        doc="documents table of an sf dir",
    )
    register("repetition", "kernel", textstats.repetition_stats, doc="Gopher repetition stats")
    register("pii_scan", "kernel", textstats.pii_scan, doc="PII counts + redacted text")
    register(
        "classifier",
        "actor",
        textstats.HashedLinearStage,
        {"concurrency": 4, "batch_size": 4096},
        doc="hashed-feature linear scoring (fastText architecture)",
    )


_register_builtins()


def build_pipeline(cfg: dict[str, Any]):
    """Assemble and (if a sink is configured) run a pipeline from a config
    dict. Returns the sink path when written, else the lazy Dataset."""
    src_cfg = dict(cfg["source"])
    src_type = src_cfg.pop("type")
    spec = REGISTRY[src_type]
    if spec.kind != "source":
        raise ValueError(f"{src_type} is not a source stage")
    ds = spec.target(src_cfg)

    for step in cfg.get("steps", []):
        step = dict(step)
        name = step.pop("stage")
        spec = REGISTRY[name]
        params = {**spec.defaults, **step}
        batch_size = params.pop("batch_size", 256)
        if spec.kind == "kernel":
            fn = spec.target
            if params:
                import functools

                fn = functools.partial(fn, **params)
                fn.__name__ = name  # readable operator names in ds.stats()
            ds = ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)
        elif spec.kind == "actor":
            conc = params.pop("concurrency", 4)
            if isinstance(conc, list):
                conc = tuple(conc)
            if isinstance(conc, int):
                conc = (1, conc)
            ds = ds.map_batches(
                spec.target,
                batch_format="pyarrow",
                batch_size=batch_size,
                concurrency=conc,
                fn_constructor_kwargs=params or None,
                # actor pools restart on worker death; deterministic kernels
                # make the retried task's rows identical
                max_restarts=-1,
                max_task_retries=-1,
            )
        else:
            raise ValueError(f"stage {name} has kind {spec.kind}, not usable as a step")

    sink = cfg.get("sink")
    if sink:
        sink = dict(sink)
        sink_type = sink.pop("type")
        if sink_type == "parquet":
            ds.write_parquet(sink["path"])
            if cfg.get("print_stats"):
                print(ds.stats())
            return sink["path"]
        if sink_type == "csv":
            ds.write_csv(sink["path"])
            return sink["path"]
        raise ValueError(f"unknown sink type {sink_type}")
    return ds

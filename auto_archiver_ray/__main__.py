"""CLI entry point — the reference's ``auto-archiver --config orchestration.yaml``
re-expressed (ref:core/orchestrator.py:519-536): load a YAML/JSON pipeline
config, assemble via the stage registry, run it.

    python -m auto_archiver_ray --config pipeline.yaml
    python -m auto_archiver_ray --urls https://a.com/1 https://a.com/2
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="auto_archiver_ray")
    ap.add_argument("--config", help="YAML/JSON pipeline config (see pipelines/registry.py)")
    ap.add_argument("--urls", nargs="*", help="seed URLs (CLIFeeder equivalent)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001", help="pages sf dir for the default pipeline")
    ap.add_argument("--out", help="output parquet dir")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument(
        "--stats",
        action="store_true",
        help="print per-stage ds.stats() after the run (wall time, rows, actor pool usage per operator)",
    )
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .pipelines.registry import build_pipeline

    if args.config:
        with open(args.config) as f:
            raw = f.read()
        try:
            cfg = json.loads(raw)
        except json.JSONDecodeError:
            import yaml

            cfg = yaml.safe_load(raw)
    elif args.urls:
        cfg = {
            "source": {"type": "items", "urls": args.urls},
            "steps": [{"stage": "validate"}, {"stage": "keep_valid"}],
        }
    else:
        cfg = {
            "source": {"type": "pages", "sf_dir": args.sf_dir},
            "steps": [
                {"stage": "validate"},
                {"stage": "keep_valid"},
                {"stage": "hash_enrich"},
                {"stage": "meta_enrich"},
                {"stage": "extract"},
                {"stage": "html_report"},
            ],
        }
    if args.out:
        cfg["sink"] = {"type": "parquet", "path": args.out}

    if args.stats:
        cfg["print_stats"] = True
    result = build_pipeline(cfg)
    if isinstance(result, str):
        print(f"wrote {result}")
    else:
        n = result.count()
        print(f"rows: {n}")
        if args.stats:
            print(result.stats())
        for row in result.limit(3).take(3):
            keys = list(row)[:8]
            print({k: str(row[k])[:60] for k in keys})
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())

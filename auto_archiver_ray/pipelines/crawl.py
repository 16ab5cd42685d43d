"""The frontier-driven crawl pipeline — the north rule end to end.

    seeds → validate/canonicalize → frontier seen-filter (sharded actors)
      → deterministic politeness epochs (per-host budget)
      → per-epoch fetch/extract/enrich (archive stages)
      → per-epoch partitioned parquet + frontier snapshot

Resume contract: killed after epoch k ⇒ a new run with the same seed list
restores the frontier snapshot, finds epochs 0..k in the output manifest,
and continues at k+1 producing byte-identical partitions (ordering is a
pure function of (seed list, politeness budget) — see
state.frontier.assign_crawl_epochs). This reproduces the reference's
ledger-resume semantics (ref:modules/gsheet_feeder_db/gsheet_feeder_db.py:70-79)
with in-engine state.
"""

from __future__ import annotations

import pyarrow.compute as pc

from ..stages import enrich, extract, validate
from ..state.checkpoint import PartitionedWriter
from ..state.frontier import Frontier, assign_crawl_epochs


def crawl(
    pages_source,
    out_root: str,
    frontier: Frontier | None = None,
    per_host_budget: int = 50,
    max_epochs: int | None = None,
    extract_concurrency=4,
    batch_size: int = 256,
    checkpoint_dir: str | None = None,
    robots_rules: dict[str, list[str]] | None = None,
):
    """Run the crawl over a pages Dataset (columns url, warc_ts, html, lang).

    Returns (writer, stats): the PartitionedWriter over ``out_root`` and the
    frontier shard stats. Epoch partitions already present in the manifest
    are skipped (resume).
    """
    frontier = frontier or Frontier(num_shards=8)
    if checkpoint_dir:
        frontier.restore(checkpoint_dir)
    if robots_rules:
        frontier.set_robots(robots_rules)
    writer = PartitionedWriter(out_root)

    ds = pages_source
    ds = ds.map_batches(validate.validate_batch, batch_format="pyarrow", batch_size=batch_size)
    ds = ds.map_batches(validate.keep_valid, batch_format="pyarrow", batch_size=batch_size)
    if robots_rules:
        ds = ds.map_batches(frontier.robots_filter_stage(), batch_format="pyarrow", batch_size=batch_size)
    ds = ds.map_batches(frontier.filter_new_stage(), batch_format="pyarrow", batch_size=batch_size)

    # Deterministic politeness plan. The epoch plan is computed over the
    # frontier-admitted rows and materialized once (ids + keys only — the
    # html payload column rides along here at test scale; at 100 TB project
    # it away before the plan shuffle and join back by url_hash).
    planned = assign_crawl_epochs(ds, per_host_budget=per_host_budget).materialize()
    num_epochs = 0
    if planned.count():
        num_epochs = int(planned.max("fetch_epoch")) + 1
    if max_epochs is not None:
        num_epochs = min(num_epochs, max_epochs)

    conc = extract_concurrency if isinstance(extract_concurrency, tuple) else (1, extract_concurrency)
    for epoch in range(num_epochs):
        part = f"epoch{epoch:05d}"
        if writer.is_done(part):
            continue
        epoch_ds = planned.filter(expr=f"fetch_epoch == {epoch}")
        epoch_ds = epoch_ds.map_batches(enrich.hash_enrich, batch_format="pyarrow", batch_size=batch_size)
        epoch_ds = epoch_ds.map_batches(enrich.meta_enrich, batch_format="pyarrow", batch_size=batch_size)
        epoch_ds = epoch_ds.map_batches(
            extract.ExtractStage, batch_format="pyarrow", batch_size=batch_size, concurrency=conc
        )
        epoch_ds = epoch_ds.drop_columns(["media_links"])
        writer.write(part, epoch_ds)
        if checkpoint_dir:
            frontier.checkpoint(checkpoint_dir)

    return writer, frontier.stats()

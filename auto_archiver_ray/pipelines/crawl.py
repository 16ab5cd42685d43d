"""The frontier-driven crawl pipeline — the north rule end to end.

    seeds → validate/canonicalize → [robots filter] → frontier seen-filter
      (sharded actors) → deterministic politeness epochs (per-host budget,
      planned over KEY COLUMNS ONLY — the html payload never enters the
      plan shuffle) → per-epoch fetch/extract/enrich → per-epoch
      partitioned parquet + frontier snapshot

Payload discipline: the epoch plan materializes only
(host, url_canon, url_hash, warc_ts) — a few hundred bytes per URL. Each
epoch then re-reads the pages source and selects its rows with a broadcast
sorted-hash membership filter (~8 bytes per admitted URL), so the binary
``html`` column streams straight from storage into the extract stage and
never crosses a shuffle or a materialization (SURVEY.md §7.5 "wide binary
rows"; measured 6× faster than planning over full rows at 1.2M pages).

Resume contract: killed after epoch k ⇒ a new run with the same seed list
restores the frontier snapshot, finds epochs 0..k in the output manifest,
and continues at k+1 producing identical partitions (the plan is a pure
function of (seed list, politeness budget) — state.frontier.
assign_crawl_epochs). This reproduces the reference's ledger-resume
semantics (ref:modules/gsheet_feeder_db/gsheet_feeder_db.py:70-79) with
in-engine state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..stages import enrich, extract, validate
from ..state.checkpoint import PartitionedWriter
from ..state.frontier import Frontier, assign_crawl_epochs

PLAN_COLUMNS = ["host", "url_canon", "url_hash", "warc_ts"]


def _hash_hex_to_u64(hexes: list[str]) -> np.ndarray:
    return np.asarray([int(h[:16], 16) for h in hexes], dtype=np.uint64)


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
    pages_source_factory=None,
    bucketed: bool = False,
):
    """Run the crawl over a pages Dataset (columns url, warc_ts, html, lang).

    ``pages_source_factory``: zero-arg callable returning a fresh source
    Dataset (one per epoch re-read); defaults to re-using ``pages_source``
    (Ray Datasets are re-executable, so the same lazy plan re-reads).

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
    source_factory = pages_source_factory or (lambda: pages_source)

    # ---- plan phase: keys only, payload projected away before any shuffle
    keyed = pages_source.map_batches(validate.validate_batch, batch_format="pyarrow", batch_size=batch_size)
    keyed = keyed.map_batches(validate.keep_valid, batch_format="pyarrow", batch_size=batch_size)
    if robots_rules:
        keyed = keyed.map_batches(frontier.robots_filter_stage(), batch_format="pyarrow", batch_size=batch_size)
    keyed = keyed.map_batches(frontier.filter_new_stage(), batch_format="pyarrow", batch_size=batch_size)
    keyed = keyed.select_columns(PLAN_COLUMNS)
    planned = assign_crawl_epochs(keyed, per_host_budget=per_host_budget).materialize()

    num_epochs = 0
    if planned.count():
        num_epochs = int(planned.max("fetch_epoch")) + 1
    if max_epochs is not None:
        num_epochs = min(num_epochs, max_epochs)

    conc = extract_concurrency if isinstance(extract_concurrency, tuple) else (1, extract_concurrency)

    # ``bucketed``: one extra pass writes every epoch's rows into a
    # hive-partitioned staging dir (partition_cols=["fetch_epoch"]) so each
    # epoch then reads ONLY its own bucket — 2 source reads + 1 staged write
    # total, vs 1 + num_epochs source reads in streaming mode. Worth it once
    # num_epochs is more than a handful.
    bucket_dir = None
    if bucketed and num_epochs:
        import shutil
        import tempfile

        import ray

        hashes, epochs = [], []
        for b in planned.select_columns(["url_hash", "fetch_epoch"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"
        ):
            hashes.extend(b.column("url_hash").to_pylist())
            epochs.extend(b.column("fetch_epoch").to_pylist())
        hs = _hash_hex_to_u64(hashes)
        order = np.argsort(hs)
        plan_keys = hs[order]
        plan_epochs = np.asarray(epochs, dtype=np.int64)[order]
        plan_ref = ray.put((plan_keys, plan_epochs))

        def attach_epoch(batch: pa.Table) -> pa.Table:
            keys, eps = ray.get(plan_ref)
            hx = batch.column("url_hash").to_pylist()
            if not hx:
                return batch.append_column("fetch_epoch", pa.array([], pa.int64()))
            h = _hash_hex_to_u64(hx)
            pos = np.searchsorted(keys, h)
            pos[pos >= len(keys)] = max(0, len(keys) - 1)
            member = (keys[pos] == h) if len(keys) else np.zeros(len(hx), dtype=bool)
            ep = np.where(member, eps[pos] if len(keys) else -1, -1)
            out = batch.append_column("fetch_epoch", pa.array(ep.astype(np.int64)))
            return out.filter(pa.array(member))

        staged = source_factory()
        staged = staged.map_batches(validate.validate_batch, batch_format="pyarrow", batch_size=batch_size)
        staged = staged.map_batches(validate.keep_valid, batch_format="pyarrow", batch_size=batch_size)
        staged = staged.map_batches(attach_epoch, batch_format="pyarrow", batch_size=batch_size)
        bucket_dir = tempfile.mkdtemp(prefix="aar_crawl_buckets_")
        staged.write_parquet(bucket_dir, partition_cols=["fetch_epoch"])

    for epoch in range(num_epochs):
        part = f"epoch{epoch:05d}"
        if writer.is_done(part):
            continue
        if bucket_dir is None:
            epoch_keys = planned.filter(expr=f"fetch_epoch == {epoch}")
            hashes = [
                h
                for b in epoch_keys.select_columns(["url_hash"]).iter_batches(
                    batch_size=65536, batch_format="pyarrow"
                )
                for h in b.column("url_hash").to_pylist()
            ]
            member = np.sort(_hash_hex_to_u64(hashes))
            import ray

            member_ref = ray.put(member)

            def keep_epoch(batch: pa.Table) -> pa.Table:
                w = ray.get(member_ref)
                hx = batch.column("url_hash").to_pylist()
                if not hx:
                    return batch
                h = _hash_hex_to_u64(hx)
                pos = np.searchsorted(w, h)
                pos[pos >= len(w)] = max(0, len(w) - 1)
                mask = (w[pos] == h) if len(w) else np.zeros(len(hx), dtype=bool)
                return batch.filter(pa.array(mask))

        # fetch phase: staged epoch bucket, or fresh streaming read with a
        # broadcast membership filter; html goes straight to extract
        if bucket_dir is not None:
            import glob as _glob

            import ray.data as rd

            files = sorted(_glob.glob(f"{bucket_dir}/fetch_epoch={epoch}/*.parquet"))
            if not files:
                continue
            epoch_ds = rd.read_parquet(files)
        else:
            epoch_ds = source_factory()
            epoch_ds = epoch_ds.map_batches(validate.validate_batch, batch_format="pyarrow", batch_size=batch_size)
            epoch_ds = epoch_ds.map_batches(validate.keep_valid, batch_format="pyarrow", batch_size=batch_size)
            epoch_ds = epoch_ds.map_batches(keep_epoch, batch_format="pyarrow", batch_size=batch_size)
        epoch_ds = epoch_ds.map_batches(enrich.hash_enrich, batch_format="pyarrow", batch_size=batch_size)
        epoch_ds = epoch_ds.map_batches(enrich.meta_enrich, batch_format="pyarrow", batch_size=batch_size)
        epoch_ds = epoch_ds.map_batches(
            extract.ExtractStage, batch_format="pyarrow", batch_size=batch_size, concurrency=conc
        )
        epoch_ds = epoch_ds.drop_columns(["media_links"]).add_column(
            "fetch_epoch", lambda df: np.full(len(df), epoch, dtype="int64"), batch_format="pandas"
        )
        writer.write(part, epoch_ds)
        if checkpoint_dir:
            frontier.checkpoint(checkpoint_dir)

    if bucket_dir is not None:
        import shutil

        shutil.rmtree(bucket_dir, ignore_errors=True)
    return writer, frontier.stats()

"""Sharded URL frontier — the north rule's core state service.

Replaces the reference's external work ledger (the Google-Sheet status
column that doubles as seed list + dedup filter + lock table,
ref:modules/gsheet_feeder_db/gsheet_feeder_db.py:70-79,115-118, and the
API-DB cache fetch, ref:modules/api_db/api_db.py:14-32) with in-cluster
sharded actors:

- shard routing: ``shard = hash64(host) % num_shards`` — hash-partitioned
  by host so one shard owns both the seen-filter entries *and* the
  politeness/robots state for a host (no cross-shard coordination);
- URL-seen: a Bloom filter per shard over sha256(url_canon) digests, or a
  cuckoo filter (``seen_filter="cuckoo"``) when deletion is needed — the
  re-crawl admission path: ``forget()`` removes a URL whose archived copy
  was detected deleted, and the frontier admits it again;
- politeness: deterministic token-bucket plan — per host, at most
  ``per_host_budget`` URLs per epoch, ordering (priority, warc_ts,
  url_canon);
- robots: a per-host cache of (fetched_at, disallow_prefixes) — in the
  sandbox the robots payload comes from the caller, the cache mechanics are
  real;
- checkpoints: each shard snapshots (bloom bytes, counters, epoch) to its
  own file; a restored frontier reproduces the same URL-seen set, hence the
  same crawl ordering (resume test in tests/test_frontier.py).

The Dataset integration is ``Frontier.filter_new_stage()`` — a map_batches
callable that partitions each Arrow batch by shard, issues one actor call
per shard per batch, and keeps only first-seen rows. State stays in actors;
blocks keep streaming.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .bloom import BloomFilter
from .cuckoo import CuckooFilter


def shard_ids_for_hosts(hosts, num_shards: int) -> np.ndarray:
    """Vectorized host → shard routing: keyed siphash via pd.util.hash_array
    (one C call per batch — the per-row blake2b loop was the plan phase's
    measured hot spot), deterministic across processes and retries."""
    arr = np.asarray(hosts, dtype=object)
    return (pd.util.hash_array(arr, categorize=False) % np.uint64(num_shards)).astype(np.int64)


def shard_for_host(host: str, num_shards: int) -> int:
    return int(shard_ids_for_hosts([host], num_shards)[0])


_HRW_CACHE: dict[tuple[str, int], int] = {}


def hrw_shard_ids_for_hosts(hosts, num_shards: int) -> np.ndarray:
    """Rendezvous (HRW) host → shard routing — ``argmax_s
    md5_lower64(host|s)``, ties → smallest s (the q_crawl_hrw_shards
    spec). Unlike modulo placement, growing the fleet K→K+1 moves only
    ~1/(K+1) of hosts — and every one of them to the NEW shard — so the
    surviving shards' seen-filters and politeness state stay valid
    (minimal-disruption resize). Per-(host, K) results are memoized: a
    frontier routes the same hot hosts continuously."""
    import hashlib

    out = np.empty(len(hosts), dtype=np.int64)
    for j, h in enumerate(hosts):
        key = (h, num_shards)
        s = _HRW_CACHE.get(key)
        if s is None:
            best_w = -1
            s = 0
            for cand in range(num_shards):
                w = int.from_bytes(
                    hashlib.md5(f"{h}|{cand}".encode("utf-8")).digest()[8:16], "little"
                )
                if w > best_w:
                    best_w = w
                    s = cand
            _HRW_CACHE[key] = s
        out[j] = s
    return out


def _digest_matrix(hex_hashes: list[str]) -> np.ndarray:
    """(n, 32) uint8 digest matrix from hex strings — ONE fromhex call per
    batch; per-shard slices ship as numpy arrays (zero-copy through the
    object store) instead of n Python bytes objects."""
    n = len(hex_hashes)
    return np.frombuffer(bytes.fromhex("".join(hex_hashes)), dtype=np.uint8).reshape(n, -1)


# NOTE on concurrency: shards stay max_concurrency=1 — admission is an
# atomic bloom test-and-set, so concurrent check_and_add on one shard would
# double-admit. Pipelining comes from (a) many concurrent plan map-tasks
# fanning into the pool and (b) the vectorized digest/route path keeping
# per-request service time ~microseconds/row; scale the POOL (num_shards),
# not per-actor threads.
@ray.remote(num_cpus=0.25)
class FrontierShard:
    """One frontier partition: Bloom seen-filter + per-host politeness
    (priority heaps) and robots state + counters, checkpointable."""

    def __init__(
        self,
        shard_id: int,
        capacity: int = 1_000_000,
        error_rate: float = 1e-4,
        seen_filter: str = "bloom",
        template_cap: int | None = None,
    ):
        self.shard_id = shard_id
        self.seen_kind = seen_filter
        # per-(host, template) admission cap — trap-gate enforcement at the
        # offer path. Hosts are shard-affine, so per-shard counting IS the
        # global count; the admitted count per group is min(first-seen, cap)
        # regardless of offer order (order-independent, hence oracle-able).
        self.template_cap = template_cap
        self.template_counts: dict[str, int] = {}
        if seen_filter == "cuckoo":
            self.bloom = CuckooFilter(capacity)
        elif seen_filter == "bloom":
            self.bloom = BloomFilter(capacity, error_rate)
        else:
            raise ValueError(f"seen_filter must be 'bloom' or 'cuckoo', got {seen_filter!r}")
        self.robots: dict[str, list] = {}  # host → normalized [path, allow] rules
        self._robots_compiled: dict[str, list] = {}  # lazy matcher cache (not persisted)
        self.host_counts: dict[str, int] = {}
        self.counters = {"offered": 0, "admitted": 0, "duplicate": 0}
        self.epoch = 0
        # host → [sorted_entries, offset, unsorted_tail] of
        # (-priority, ts_us, url_canon, url_hash_hex) — SORT-ON-EMIT
        # pending state: offer() only appends to the tail (O(1)/row, no
        # per-row heappush — measured ~20% of streaming-crawl wall); the
        # first emit after new offers merges tail into sorted (Timsort, C
        # speed, near-linear on the sorted prefix) and later emits just
        # advance the offset.
        self.pending: dict[str, list] = {}
        # host → per-epoch budget override (robots Crawl-delay derived)
        self.host_budgets: dict[str, int] = {}

    def check_and_add(self, digests, hosts: list[str]) -> list[bool]:
        """Membership-test-and-insert (vectorized); True = first sighting.
        ``digests``: list[bytes] or an (n, 32) uint8 matrix."""
        is_new = self.bloom.add_batch(digests)
        n = len(is_new)
        admitted = sum(is_new)
        self.counters["offered"] += n
        self.counters["admitted"] += admitted
        self.counters["duplicate"] += n - admitted
        for h, nw in zip(hosts, is_new):
            if nw:
                self.host_counts[h] = self.host_counts.get(h, 0) + 1
        return is_new

    # ----------------------------------------------- streaming frontier v3
    def offer(
        self,
        digests,
        hosts: list[str],
        url_canons: list[str],
        url_hashes: list[str],
        ts_us: np.ndarray,
        priorities: np.ndarray,
        templates: list[str] | None = None,
    ) -> int:
        """Seen-filter + enqueue in one round trip: first-seen rows join
        their host's pending priority heap. Returns the number admitted.
        This is the unbounded-seed path (cursor feeds) — no full-table plan
        pass needed before epochs can be emitted.

        When the shard has a ``template_cap`` and the caller passes per-row
        ``templates`` (see stages.validate.url_template_array), first-seen
        rows beyond the cap for their (host, template) group are
        trap-suppressed: counted, never enqueued, and permanently in the
        seen-filter (a suppressed trap URL never re-enters)."""
        is_new = self.check_and_add(digests, hosts)
        cap = self.template_cap
        admitted = 0
        pending = self.pending
        for i, nw in enumerate(is_new):
            if nw:
                if cap is not None and templates is not None:
                    k = hosts[i] + "\x1f" + templates[i]
                    c = self.template_counts.get(k, 0)
                    if c >= cap:
                        self.counters["admitted"] -= 1
                        self.counters["trap_suppressed"] = (
                            self.counters.get("trap_suppressed", 0) + 1
                        )
                        continue
                    self.template_counts[k] = c + 1
                slot = pending.get(hosts[i])
                if slot is None:
                    slot = pending[hosts[i]] = [[], 0, []]
                slot[2].append(
                    (-int(priorities[i]), int(ts_us[i]), url_canons[i], url_hashes[i])
                )
                admitted += 1
        return admitted

    def trap_stats(self) -> pa.Table:
        """Per-host admission rollup under template capping: offered =
        first-seen urls (host_counts), admitted = sum of this host's
        template counts. Hosts are shard-affine so concatenating shard
        tables is the exact global rollup."""
        per_host: dict[str, int] = {}
        for k, c in self.template_counts.items():
            h = k.split("\x1f", 1)[0]
            per_host[h] = per_host.get(h, 0) + c
        hosts = sorted(self.host_counts)
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "n_offered": pa.array(
                    [int(self.host_counts[h]) for h in hosts], pa.int64()
                ),
                "n_admitted": pa.array([int(per_host.get(h, 0)) for h in hosts], pa.int64()),
            }
        )

    def pending_count(self) -> int:
        return sum(len(s[0]) - s[1] + len(s[2]) for s in self.pending.values())

    def set_host_budgets(self, budgets: dict[str, int]) -> None:
        """Per-host epoch-budget overrides (e.g. derived from robots
        Crawl-delay: budget = epoch_seconds // delay). Hosts without an
        override use emit_epoch's default budget."""
        self.host_budgets = {h: max(1, int(b)) for h, b in budgets.items()}

    def emit_epoch(self, budget: int) -> pa.Table:
        """Pop up to the host's budget (per-host override else ``budget``)
        rows per host in (priority desc, warc_ts, url_canon) order — one
        politeness epoch's members for this shard's hosts. Incremental: the
        sorted residue stays in place for the next epoch (offset advance);
        hosts that drain are dropped."""
        overrides = getattr(self, "host_budgets", {})
        hosts_o, canons_o, hashes_o, ts_o, pri_o = [], [], [], [], []
        for h in list(self.pending):
            slot = self.pending[h]
            srt, off, tail = slot
            if tail:
                srt = srt[off:] + tail
                srt.sort()
                slot[0], slot[1], slot[2] = srt, 0, []
                off = 0
            host_budget = overrides.get(h, budget)
            take = srt[off : off + host_budget]
            slot[1] = off + len(take)
            for negp, ts, canon, uh in take:
                hosts_o.append(h)
                canons_o.append(canon)
                hashes_o.append(uh)
                ts_o.append(ts)
                pri_o.append(-negp)
            if slot[1] >= len(slot[0]) and not slot[2]:
                del self.pending[h]
        self.epoch += 1
        return pa.table(
            {
                "host": pa.array(hosts_o, pa.string()),
                "url_canon": pa.array(canons_o, pa.string()),
                "url_hash": pa.array(hashes_o, pa.string()),
                "warc_ts": pa.array(np.asarray(ts_o, dtype=np.int64)).cast(pa.timestamp("us")),
                "priority": pa.array(pri_o, pa.int64()),
                "fetch_epoch": pa.array([self.epoch - 1] * len(hosts_o), pa.int64()),
            }
        )

    def peek(self, digests: list[bytes]) -> list[bool]:
        return [d in self.bloom for d in digests]

    def forget(self, digests, hosts: list[str]) -> list[bool]:
        """Remove URLs from the seen-filter so a later offer re-admits them
        (re-crawl admission after deletion detection). Requires the cuckoo
        seen-filter — a Bloom bit array cannot delete; calling this on a
        bloom shard is a hard error, not a silent no-op."""
        if self.seen_kind != "cuckoo":
            raise TypeError(
                "forget() needs seen_filter='cuckoo' (bloom filters cannot delete)"
            )
        removed = self.bloom.delete_batch(digests)
        n_rm = sum(removed)
        self.counters["admitted"] -= n_rm
        self.counters["forgotten"] = self.counters.get("forgotten", 0) + n_rm
        for h, rm in zip(hosts, removed):
            if rm and h in self.host_counts:
                self.host_counts[h] -= 1
        return removed

    # ---------------------------------------------------------------- robots
    def set_robots(self, host: str, rules: list) -> None:
        """Accepts the legacy disallow-prefix form (``list[str]``) or the
        full RFC 9309 rule list from :func:`parse_robots_rules`
        (``[path, is_allow]`` pairs). Stored normalized (JSON-safe for
        snapshots); the compiled matcher cache is rebuilt lazily."""
        self.robots[host] = _normalize_robots_rules(rules)
        self._robots_compiled.pop(host, None)

    def robots_allowed(self, hosts: list[str], paths: list[str]) -> list[bool]:
        out = []
        for h, p in zip(hosts, paths):
            rules = self.robots.get(h)
            if not rules:
                out.append(True)
                continue
            comp = self._robots_compiled.get(h)
            if comp is None:
                comp = self._robots_compiled[h] = _compile_robots_rules(rules)
            out.append(robots_decide(comp, p))
        return out

    # ------------------------------------------------------------- lifecycle
    def stats(self) -> dict:
        return {
            "shard_id": self.shard_id,
            "epoch": self.epoch,
            "seen": self.bloom.count,
            "seen_kind": self.seen_kind,
            "hosts": len(self.host_counts),
            "template_cap": self.template_cap,
            **self.counters,
        }

    def advance_epoch(self) -> int:
        self.epoch += 1
        return self.epoch

    def snapshot(self, ckpt_dir: str) -> str:
        os.makedirs(ckpt_dir, exist_ok=True)
        path = os.path.join(ckpt_dir, f"shard_{self.shard_id:05d}.ckpt")
        meta = {
            "shard_id": self.shard_id,
            "epoch": self.epoch,
            "counters": self.counters,
            "host_counts": self.host_counts,
            "robots": self.robots,
            # pending residue is part of the crawl state: a resumed frontier
            # must re-emit the same rows in the same order. Stored FLAT
            # (sorted remainder + tail); restore treats it as a tail and the
            # next emit re-sorts — identical order by construction.
            "pending": {h: s[0][s[1]:] + s[2] for h, s in self.pending.items()},
            "host_budgets": getattr(self, "host_budgets", {}),
            "seen_kind": self.seen_kind,
            "template_cap": self.template_cap,
            "template_counts": self.template_counts,
        }
        blob = json.dumps(meta).encode() + b"\x00" + self.bloom.to_bytes()
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)  # atomic per-partition checkpoint
        return path

    def restore(self, ckpt_dir: str) -> bool:
        path = os.path.join(ckpt_dir, f"shard_{self.shard_id:05d}.ckpt")
        if not os.path.exists(path):
            return False
        with open(path, "rb") as f:
            blob = f.read()
        meta_b, _, bloom_b = blob.partition(b"\x00")
        meta = json.loads(meta_b)
        self.epoch = meta["epoch"]
        self.counters = meta["counters"]
        self.host_counts = meta["host_counts"]
        # legacy checkpoints hold plain disallow-prefix lists — normalize
        self.robots = {h: _normalize_robots_rules(r) for h, r in meta["robots"].items()}
        self._robots_compiled = {}
        # JSON round-trips entries as lists; restore them as the unsorted
        # tail (tuples, parity with freshly-offered entries) — the next
        # emit's merge-sort re-establishes the order
        self.pending = {
            h: [[], 0, [tuple(e) for e in entries]]
            for h, entries in meta.get("pending", {}).items()
            if entries
        }
        self.host_budgets = meta.get("host_budgets", {})
        # pre-feature checkpoints lack the key: keep the constructor's cap
        # (a capped frontier restoring an old snapshot must keep capping)
        if "template_cap" in meta:
            self.template_cap = meta["template_cap"]
        self.template_counts = meta.get("template_counts", {})
        self.seen_kind = meta.get("seen_kind", "bloom")
        cls = CuckooFilter if self.seen_kind == "cuckoo" else BloomFilter
        self.bloom = cls.from_bytes(bloom_b)
        return True


class Frontier:
    """Driver-side handle over the shard pool."""

    def __init__(
        self,
        num_shards: int = 8,
        capacity_per_shard: int = 1_000_000,
        error_rate: float = 1e-4,
        name_prefix: str = "frontier",
        seen_filter: str = "bloom",
        template_cap: int | None = None,
        placement: str = "mod",
    ):
        self.num_shards = num_shards
        self.name_prefix = name_prefix
        self.template_cap = template_cap
        if placement == "hrw":
            self._route = lambda hosts: hrw_shard_ids_for_hosts(hosts, num_shards)
        elif placement == "mod":
            self._route = lambda hosts: shard_ids_for_hosts(hosts, num_shards)
        else:
            raise ValueError(f"placement must be 'mod' or 'hrw', got {placement!r}")
        self.placement = placement
        self.shards = [
            FrontierShard.options(name=f"{name_prefix}_{i}", get_if_exists=True).remote(
                i, capacity_per_shard, error_rate, seen_filter, template_cap
            )
            for i in range(num_shards)
        ]

    def forget(self, url_hashes: list[str], hosts: list[str]) -> int:
        """Remove URLs from the seen set (cuckoo frontiers only) so the next
        offer re-admits them — the re-crawl path after deletion detection.
        Routes by host shard like every other frontier op; returns the
        number actually removed."""
        if not url_hashes:
            return 0
        shard_ids = self._route(hosts)
        digmat = _digest_matrix(url_hashes)
        host_arr = np.asarray(hosts, dtype=object)
        futures = []
        for s in np.unique(shard_ids):
            idx = np.nonzero(shard_ids == s)[0]
            futures.append(
                self.shards[int(s)].forget.remote(digmat[idx], host_arr[idx].tolist())
            )
        return sum(sum(r) for r in ray.get(futures))

    def forget_stage(self):
        """map_batches callable: forget every row's url_hash (cuckoo
        frontiers only) — the streaming re-crawl admission path. Requires
        ``host`` and ``url_hash`` columns; emits a one-row count table per
        batch (consume with ``.sum("n_forgotten")``)."""
        shards = self.shards
        num_shards = self.num_shards
        route = self._route

        def fn(batch: pa.Table) -> pa.Table:
            hosts = batch.column("host").to_pylist()
            n = len(hosts)
            if n == 0:
                return pa.table({"n_forgotten": pa.array([0], pa.int64())})
            hashes = batch.column("url_hash").to_pylist()
            shard_ids = route(hosts)
            digmat = _digest_matrix(hashes)
            host_arr = np.asarray(hosts, dtype=object)
            futures = []
            for s in np.unique(shard_ids):
                idx = np.nonzero(shard_ids == s)[0]
                futures.append(
                    shards[int(s)].forget.remote(digmat[idx], host_arr[idx].tolist())
                )
            total = sum(sum(r) for r in ray.get(futures))
            return pa.table({"n_forgotten": pa.array([total], pa.int64())})

        return fn

    # ------------------------------------------------------------- dataset op
    def filter_new_stage(self):
        """A map_batches callable: keeps rows whose url_hash is first-seen.
        Requires ``host`` and ``url_hash`` columns (from stages.validate)."""
        shards = self.shards
        num_shards = self.num_shards
        route = self._route

        def fn(batch: pa.Table) -> pa.Table:
            hosts = batch.column("host").to_pylist()
            hashes = batch.column("url_hash").to_pylist()
            n = len(hosts)
            if n == 0:
                return batch
            shard_ids = route(hosts)
            digmat = _digest_matrix(hashes)
            host_arr = np.asarray(hosts, dtype=object)
            keep = np.zeros(n, dtype=bool)
            futures, index_lists = [], []
            for s in np.unique(shard_ids):
                idx = np.nonzero(shard_ids == s)[0]
                futures.append(
                    shards[int(s)].check_and_add.remote(digmat[idx], host_arr[idx].tolist())
                )
                index_lists.append(idx)
            for fut, idx in zip(ray.get(futures), index_lists):
                keep[idx] = fut
            return batch.filter(pa.array(keep))

        return fn

    def offer_stage(self, priority_col: str | None = None):
        """map_batches callable: seen-filter + enqueue rows into the shards'
        per-host priority heaps in ONE round trip per shard per batch
        (requires host/url_canon/url_hash/warc_ts columns from
        stages.validate). Emits a one-row count table per batch — consume
        with ``.sum("n_offered")`` to drive the pipeline, then call
        :meth:`emit_epoch` until :meth:`pending_total` hits zero."""
        import pyarrow.compute as pc

        shards = self.shards
        num_shards = self.num_shards
        route = self._route
        template_cap = self.template_cap

        def fn(batch: pa.Table) -> pa.Table:
            hosts = batch.column("host").to_pylist()
            n = len(hosts)
            if n == 0:
                return pa.table({"n_offered": pa.array([0], pa.int64())})
            tmpl_arr = None
            if template_cap is not None:
                from ..stages.validate import url_template_array

                ucol = "url" if "url" in batch.column_names else "url_canon"
                tmpl_arr = np.asarray(
                    url_template_array(batch.column(ucol)).to_pylist(), dtype=object
                )
            hashes = batch.column("url_hash").to_pylist()
            canons = batch.column("url_canon").to_pylist()
            ts_us = np.asarray(
                pc.cast(pc.cast(batch.column("warc_ts"), pa.timestamp("us")), pa.int64()).to_pylist(),
                dtype=np.int64,
            )
            pri = (
                np.asarray(batch.column(priority_col).to_pylist(), dtype=np.int64)
                if priority_col and priority_col in batch.column_names
                else np.zeros(n, dtype=np.int64)
            )
            shard_ids = route(hosts)
            digmat = _digest_matrix(hashes)
            host_arr = np.asarray(hosts, dtype=object)
            canon_arr = np.asarray(canons, dtype=object)
            hash_arr = np.asarray(hashes, dtype=object)
            futs = []
            for s in np.unique(shard_ids):
                idx = np.nonzero(shard_ids == s)[0]
                futs.append(
                    shards[int(s)].offer.remote(
                        digmat[idx],
                        host_arr[idx].tolist(),
                        canon_arr[idx].tolist(),
                        hash_arr[idx].tolist(),
                        ts_us[idx],
                        pri[idx],
                        tmpl_arr[idx].tolist() if tmpl_arr is not None else None,
                    )
                )
            total = sum(ray.get(futs))  # delivery barrier before the task ends
            return pa.table({"n_offered": pa.array([total], pa.int64())})

        return fn

    def emit_epoch(self, budget: int):
        """One politeness epoch as a Dataset: every shard pops ≤ budget rows
        per host from its heaps (priority desc, warc_ts, url_canon). The
        shard tables stream via from_arrow_refs — no driver materialization."""
        import ray.data as rd

        return rd.from_arrow_refs([s.emit_epoch.remote(budget) for s in self.shards])

    def pending_total(self) -> int:
        return sum(ray.get([s.pending_count.remote() for s in self.shards]))

    def set_host_budgets(self, budgets: dict[str, int]) -> None:
        """Route per-host epoch-budget overrides to the owning shards (same
        host partitioning as the seen-filter/robots state)."""
        per_shard: dict[int, dict[str, int]] = {}
        for host, b in budgets.items():
            per_shard.setdefault(shard_for_host(host, self.num_shards), {})[host] = b
        ray.get(
            [self.shards[sid].set_host_budgets.remote(m) for sid, m in per_shard.items()]
        )

    def set_robots(self, rules: dict[str, list]) -> None:
        """Route each host's robots rules — legacy disallow-prefix lists or
        full RFC 9309 ``[path, allow]`` lists from
        :func:`parse_robots_rules` — to the shard that owns the host (same
        partitioning as the seen-filter — one owner per host)."""
        per_shard: dict[int, dict[str, list[str]]] = {}
        for host, prefixes in rules.items():
            per_shard.setdefault(shard_for_host(host, self.num_shards), {})[host] = prefixes
        futs = []
        for sid, hostmap in per_shard.items():
            for host, prefixes in hostmap.items():
                futs.append(self.shards[sid].set_robots.remote(host, prefixes))
        ray.get(futs)

    def robots_filter_stage(self):
        """map_batches callable: drops rows whose url_canon path is
        disallowed by the owning shard's robots cache. Requires ``host`` and
        ``url_canon`` columns."""
        from urllib.parse import urlparse

        shards = self.shards
        num_shards = self.num_shards
        route = self._route

        def fn(batch: pa.Table) -> pa.Table:
            hosts = batch.column("host").to_pylist()
            canons = batch.column("url_canon").to_pylist()
            n = len(hosts)
            if n == 0:
                return batch
            paths = [urlparse(c).path for c in canons]
            shard_ids = route(hosts)
            keep = np.zeros(n, dtype=bool)
            futures, index_lists = [], []
            for s in np.unique(shard_ids):
                idx = np.nonzero(shard_ids == s)[0]
                futures.append(
                    shards[s].robots_allowed.remote([hosts[i] for i in idx], [paths[i] for i in idx])
                )
                index_lists.append(idx)
            for fut, idx in zip(ray.get(futures), index_lists):
                keep[idx] = fut
            return batch.filter(pa.array(keep))

        return fn

    def stats(self) -> list[dict]:
        return ray.get([s.stats.remote() for s in self.shards])

    def trap_stats(self) -> pa.Table:
        """Global per-host (n_offered, n_admitted) rollup under template
        capping. Hosts are shard-affine, so concatenating the shard tables
        is exact — no re-aggregation needed."""
        tables = ray.get([s.trap_stats.remote() for s in self.shards])
        nonempty = [t for t in tables if t.num_rows]
        return pa.concat_tables(nonempty) if nonempty else tables[0]

    def checkpoint(self, ckpt_dir: str) -> list[str]:
        return ray.get([s.snapshot.remote(ckpt_dir) for s in self.shards])

    def restore(self, ckpt_dir: str) -> int:
        n = sum(ray.get([s.restore.remote(ckpt_dir) for s in self.shards]))
        if n:
            # config rides the checkpoint: the driver adopts the shards'
            # restored cap VERBATIM (shards are uniform), so driver and
            # shards can never disagree — a capped frontier restoring an
            # explicitly-uncapped snapshot stops capping, and vice versa;
            # pre-feature snapshots leave the constructor cap in place on
            # both sides (shard restore keeps it when the key is absent)
            caps = [s.get("template_cap") for s in self.stats()]
            if caps:
                self.template_cap = caps[0]
        return n

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)


# ---------------------------------------------------------------------------
# Deterministic politeness / crawl-ordering plan (Dataset-native)
# ---------------------------------------------------------------------------

def assign_crawl_epochs(
    ds,
    per_host_budget: int = 10,
    priority_col: str | None = None,
    num_buckets: int = 1024,
    budget_col: str | None = None,
):
    """Assign each row a deterministic fetch epoch honoring the per-host
    politeness budget: rows are ranked within host by (priority desc,
    warc_ts, url_canon) and epoch = rank // budget.

    ``budget_col`` names an int64 column carrying a PER-HOST budget (e.g.
    authority-weighted politeness: high-PageRank hosts get a larger
    per-epoch allowance); it overrides ``per_host_budget`` row-wise and
    must be host-constant (every row of a host carries the same value).

    This is the batch-mode equivalent of a per-host token bucket: epoch k
    contains at most ``per_host_budget`` URLs of any host, and the ordering
    is a pure function of the input — a resumed run reproduces it (north
    rule: "matching the reference's crawl ordering under the same seed list
    + politeness budget").

    Shuffle key = COARSE host bucket (hash(host) % num_buckets), not host:
    one Ray group per host would make a mega-host a single giant group and
    pay per-group overhead for millions of small ones. All rows of a host
    land in one bucket (co-location preserved); inside the bucket the
    per-host ranking is a vectorized sort + groupby(host).cumcount().
    """
    import pandas as pd

    sort_cols = ["warc_ts", "url_canon"]
    ascending = [True, True]
    if priority_col:
        sort_cols = [priority_col] + sort_cols
        ascending = [False] + ascending

    def add_bucket(batch: pa.Table) -> pa.Table:
        hosts = np.asarray(batch.column("host").to_pylist(), dtype=object)
        # pd.util.hash_array: vectorized keyed siphash with a fixed key —
        # deterministic across processes (never the salted builtin hash)
        hb = (pd.util.hash_array(hosts) % np.uint64(num_buckets)).astype(np.int64)
        return batch.append_column("__hb", pa.array(hb))

    def plan(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["host"] + sort_cols, ascending=[True] + ascending, kind="mergesort"
        ).reset_index(drop=True)
        g["host_rank"] = g.groupby("host", sort=False).cumcount().astype("int64")
        if budget_col:
            g["fetch_epoch"] = g["host_rank"] // g[budget_col].astype("int64")
        else:
            g["fetch_epoch"] = g["host_rank"] // per_host_budget
        return g.drop(columns=["__hb"])

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__hb")
        .map_groups(plan, batch_format="pandas")
    )


def parse_robots_txt(text: str, user_agent: str = "*") -> list[str]:
    """Minimal deterministic robots.txt parse → disallow path prefixes for
    the given agent (exact-match group or '*'), per the public REP spec:
    groups of User-agent lines followed by Allow/Disallow rules; empty
    Disallow means allow-all; comments (#) stripped. Feed the result to
    :meth:`Frontier.set_robots` — the per-host cache the north rule asks
    for. Crawl-delay is returned separately by :func:`parse_crawl_delay`."""
    agent = user_agent.lower()
    groups: list[tuple[list[str], list[str]]] = []  # (agents, disallows)
    cur_agents: list[str] = []
    cur_rules: list[str] = []
    in_group_body = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_group_body:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_group_body = False
            cur_agents.append(val.lower())
        elif key in ("disallow", "allow", "crawl-delay", "sitemap"):
            in_group_body = True
            if key == "disallow" and val:
                cur_rules.append(val)
    if cur_agents or cur_rules:
        groups.append((cur_agents, cur_rules))
    # exact agent group wins over '*'
    for agents, rules in groups:
        if agent in agents:
            return rules
    for agents, rules in groups:
        if "*" in agents:
            return rules
    return []


def parse_robots_rules(text: str, user_agent: str = "*") -> list[list]:
    """Full RFC 9309 rule list for the agent: ``[path, is_allow]`` pairs in
    file order, keeping BOTH Allow and Disallow lines (the disallow-only
    :func:`parse_robots_txt` predates this; :meth:`Frontier.set_robots`
    accepts either form). Group selection is identical to
    parse_robots_txt — exact-agent group wins over ``'*'`` — and empty rule
    values are dropped (an empty Disallow means allow-all). Precedence is
    applied at match time by :func:`robots_decide`: longest-octet rule
    wins, Allow wins ties (RFC 9309 §2.2.2); ``*`` wildcards and the
    ``$`` end anchor are honored by :func:`_compile_robots_rules`."""
    agent = user_agent.lower()
    groups: list[tuple[list[str], list[list]]] = []  # (agents, [path, allow] rules)
    cur_agents: list[str] = []
    cur_rules: list[list] = []
    in_group_body = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_group_body:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_group_body = False
            cur_agents.append(val.lower())
        elif key in ("disallow", "allow", "crawl-delay", "sitemap"):
            in_group_body = True
            if key in ("disallow", "allow") and val:
                cur_rules.append([val, key == "allow"])
    if cur_agents or cur_rules:
        groups.append((cur_agents, cur_rules))
    for agents, rules in groups:
        if agent in agents:
            return rules
    for agents, rules in groups:
        if "*" in agents:
            return rules
    return []


def _normalize_robots_rules(rules) -> list[list]:
    """Rule-list normalizer: legacy plain strings become disallow rules;
    tuples/lists pass through as ``[path, bool(allow)]`` (JSON-safe — the
    form shard snapshots persist)."""
    out: list[list] = []
    for r in rules or []:
        if isinstance(r, str):
            out.append([r, False])
        else:
            out.append([str(r[0]), bool(r[1])])
    return out


def _compile_robots_rules(rules: list) -> list:
    """Compile normalized rules to matchers: plain path prefixes stay
    string-startswith (the common case, no regex cost); rules containing
    ``*`` or ending in ``$`` compile to an anchored regex. Rule length (the
    RFC's octet count, measured on the raw pattern) rides along for
    longest-match precedence."""
    import re as _re

    comp = []
    for p, allow in rules:
        if "*" in p or p.endswith("$"):
            pat = p[:-1] if p.endswith("$") else p
            rx = ".*".join(_re.escape(seg) for seg in pat.split("*"))
            matcher = _re.compile("^" + rx + ("$" if p.endswith("$") else ""))
            comp.append((matcher, len(p), allow, True))
        else:
            comp.append((p, len(p), allow, False))
    return comp


def robots_decide(compiled: list, path: str) -> bool:
    """RFC 9309 §2.2.2 precedence over compiled rules: the matching rule
    with the most octets wins; on an exact length tie Allow wins; no
    matching rule → allowed."""
    best_len = -1
    best_allow = True
    for m, ln, allow, is_rx in compiled:
        ok = (m.match(path) is not None) if is_rx else path.startswith(m)
        if not ok:
            continue
        if ln > best_len:
            best_len, best_allow = ln, allow
        elif ln == best_len and allow:
            best_allow = True
    return best_allow


def parse_crawl_delay(text: str, user_agent: str = "*") -> float | None:
    """Crawl-delay seconds for the agent (exact group wins over '*', None
    when absent) — feeds the per-host politeness budget. Same group
    semantics as :func:`parse_robots_txt`: consecutive User-agent lines
    share the following rule block."""
    agent = user_agent.lower()
    exact: float | None = None
    star: float | None = None
    cur_agents: list[str] = []
    in_group_body = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_group_body:
                cur_agents = []
                in_group_body = False
            cur_agents.append(val.lower())
        elif key in ("disallow", "allow", "crawl-delay", "sitemap"):
            in_group_body = True
            if key == "crawl-delay":
                try:
                    d = float(val)
                except ValueError:
                    continue
                if agent in cur_agents and exact is None:
                    exact = d
                if "*" in cur_agents and star is None:
                    star = d
    return exact if exact is not None else star


def budgets_from_crawl_delays(
    robots_texts: dict[str, str], epoch_seconds: float, user_agent: str = "*"
) -> dict[str, int]:
    """Per-host epoch budgets from robots.txt Crawl-delay directives: a
    host allowing one request per ``delay`` seconds gets
    ``max(1, epoch_seconds // delay)`` URLs per politeness epoch. Hosts
    without a Crawl-delay are omitted (they use the default budget). Feed
    to :meth:`Frontier.set_host_budgets`."""
    out: dict[str, int] = {}
    for host, text in robots_texts.items():
        d = parse_crawl_delay(text, user_agent)
        if d and d > 0:
            out[host] = max(1, int(epoch_seconds // d))
    return out


def authority_budgets(
    hosts, ranks, threshold: int, boosted: int = 20
) -> dict[str, int]:
    """Per-host epoch budgets from a link-graph authority signal
    (:func:`..stages.graph.host_pagerank`): hosts whose fixed-point rank
    meets ``threshold`` get the ``boosted`` budget; all others are omitted
    and use the default. Feed to :meth:`Frontier.set_host_budgets` for the
    streaming path, or join as a ``budget`` column for
    :func:`assign_crawl_epochs(budget_col=...)` — both enforce the same
    per-host-per-epoch cap (equivalence test-pinned)."""
    return {h: boosted for h, r in zip(hosts, ranks) if int(r) >= threshold}

"""Per-host operators: compute once per host, broadcast-join back to rows.

The reference's SSL enricher fetches the server certificate per *row*
(ref:modules/ssl_enricher/ssl_enricher.py:11-31) — at scale that is one
network fetch per page for a value that is per-host. The Ray-native shape
(SURVEY.md §2.D): distinct hosts (tiny set) → per-host fetch once →
broadcast map back into the row stream. Same pattern serves robots.txt
fetching and any DNS/TLS/host-metadata enrichment.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray


def _stub_host_cert(host: str) -> str:
    """STUB for ``ssl.get_server_certificate((host, 443))`` — deterministic
    PEM-shaped stand-in (no network in this sandbox)."""
    digest = hashlib.sha256(b"cert:" + host.encode()).hexdigest()
    return f"-----BEGIN CERTIFICATE-----\n{digest}\n-----END CERTIFICATE-----"


def per_host_enrich(ds, host_col: str = "host", fetch=_stub_host_cert, out_col: str = "ssl_cert"):
    """Distinct hosts → fetch once each (driver side; the host set is tiny
    relative to the corpus) → broadcast and attach per batch."""
    hosts = ds.unique(host_col)
    values = {h: fetch(h) for h in hosts}
    ref = ray.put(values)

    def attach(batch: pa.Table) -> pa.Table:
        vmap = ray.get(ref)
        col = [vmap.get(h, "") for h in batch.column(host_col).to_pylist()]
        return batch.append_column(out_col, pa.array(col, pa.string()))

    return ds.map_batches(attach, batch_format="pyarrow")

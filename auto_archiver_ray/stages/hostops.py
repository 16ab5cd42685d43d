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


# ---------------------------------------------------------------------------
# Real-signature host certificates (upgrades the stub above): one fixture CA
# key signs a deterministic leaf certificate per host; verification is the
# REAL RSA-PKCS#1-v1.5 check (functions/rfc3161.py) plus a validity-window
# check — the same three semantic steps a TLS chain validation performs
# (binding, signature, expiry), minus the network fetch the sandbox forbids.
# ---------------------------------------------------------------------------

_CA_LABEL = "fixture-host-ca"
_CERT_NOT_BEFORE = "20250101000000Z"
_CERT_NOT_AFTER = "20270101000000Z"
_FIXTURE_NOW = "20260101000000Z"  # deterministic clock (oracle-checkable)


def _cert_tbs_digest(host: str, spki: str, not_before: str, not_after: str) -> bytes:
    return hashlib.sha256(f"hostcert|{host}|{spki}|{not_before}|{not_after}".encode()).digest()


def ca_public():
    from ..functions import rfc3161

    return rfc3161._key(_CA_LABEL).public()


def issue_host_cert(host: str) -> str:
    """Deterministic leaf certificate (JSON-compact): the subject's pseudo
    SPKI is content-derived (the leaf key never signs anything in this
    plane, so a real per-host keypair — ~1 s of keygen per host — buys
    nothing); the CA SIGNATURE over the TBS digest is real RSA."""
    import json

    from ..functions import rfc3161

    spki = hashlib.sha256(b"spki:" + host.encode()).hexdigest()
    sig = rfc3161._key(_CA_LABEL).sign_digest(
        _cert_tbs_digest(host, spki, _CERT_NOT_BEFORE, _CERT_NOT_AFTER)
    )
    return json.dumps(
        {
            "host": host,
            "spki": spki,
            "not_before": _CERT_NOT_BEFORE,
            "not_after": _CERT_NOT_AFTER,
            "sig": sig,
        },
        sort_keys=True,
        separators=(",", ":"),
    )


def verify_host_cert(host: str, cert_json: str, ca_pub, now: str = _FIXTURE_NOW) -> bool:
    """Three checks: subject binding (cert.host == host), validity window
    (not_before <= now <= not_after — the strings are ASN.1-style
    YYYYMMDDHHMMSSZ, so string comparison IS time comparison), and the CA's
    RSA signature over the TBS digest."""
    import json

    from ..functions import rfc3161

    try:
        c = json.loads(cert_json)
        chost, spki = c["host"], c["spki"]
        nb, na, sig = c["not_before"], c["not_after"], c["sig"]
    except (ValueError, KeyError, TypeError):
        return False
    if chost != host or not (nb <= now <= na):
        return False
    return rfc3161.verify_signature(ca_pub, _cert_tbs_digest(chost, spki, nb, na), sig)


def per_host_cert_enrich(ds, host_col: str = "host", strategy: str = "inline"):
    """SSL enricher, verified flavor. Two strategies:

    - ``"inline"`` (default, the UNBOUNDED-host path): certificates are a
      pure deterministic function of the host, so each worker issues them
      in-stream with a per-actor memo — NO driver-resident host map, no
      broadcast; the CA key derives once per worker process (module cache).
    - ``"broadcast"``: distinct hosts → one issuance each on the driver →
      ``ray.put`` map attach — the shape a real NETWORK fetch needs (fetch
      exactly once globally), bounded to host sets that fit driver memory
      (~1e7; beyond that a real fetcher should shard the cache the way
      stages/externaljob.py shards jobs).

    Either way a separate stateless verify pass re-checks every cert with
    only the CA PUBLIC key. Output adds ``ssl_cert`` and ``ssl_verified``."""
    if strategy == "inline":
        enriched = ds.map_batches(
            InlineCertStage,
            batch_format="pyarrow",
            concurrency=(1, 4),
            fn_constructor_kwargs={"host_col": host_col},
        )
    else:
        enriched = per_host_enrich(ds, host_col=host_col, fetch=issue_host_cert, out_col="ssl_cert")
    return enriched.map_batches(
        VerifyCertStage,
        batch_format="pyarrow",
        concurrency=(1, 4),
        fn_constructor_kwargs={"host_col": host_col},
    )


class InlineCertStage:
    """Per-ACTOR cert issuance (the model-load position): one RSA signature
    per distinct host per worker across ALL its batches — not per batch.
    The memo is capped (hosts are unbounded in the inline strategy); an
    epoch clear on overflow only costs re-issuance, never correctness."""

    def __init__(self, host_col: str = "host", memo_cap: int = 65536):
        self.host_col, self.memo_cap = host_col, memo_cap
        self.memo: dict[str, str] = {}
        self.issued = 0  # distinct-host issuances, test-observable

    def _issue(self, host: str) -> str:
        cert = self.memo.get(host)
        if cert is None:
            cert = issue_host_cert(host)
            self.issued += 1
            if len(self.memo) >= self.memo_cap:
                self.memo.clear()
            self.memo[host] = cert
        return cert

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = [self._issue(h) for h in batch.column(self.host_col).to_pylist()]
        return batch.append_column("ssl_cert", pa.array(col, pa.string()))


class VerifyCertStage:
    """Stateless-in-spirit verify pass with the same per-actor memo: one RSA
    check per distinct (host, cert) per worker. Only the CA PUBLIC key is
    held (derived once per actor)."""

    def __init__(self, host_col: str = "host", memo_cap: int = 65536):
        self.host_col, self.memo_cap = host_col, memo_cap
        self.pub = ca_public()
        self.memo: dict[tuple[str, str], bool] = {}
        self.checked = 0  # distinct (host, cert) RSA verifications

    def __call__(self, batch: pa.Table) -> pa.Table:
        hosts = batch.column(self.host_col).to_pylist()
        certs = batch.column("ssl_cert").to_pylist()
        ok = []
        for h, c in zip(hosts, certs):
            k = (h, c)
            v = self.memo.get(k)
            if v is None:
                v = verify_host_cert(h, c, self.pub)
                self.checked += 1
                if len(self.memo) >= self.memo_cap:
                    self.memo.clear()
                self.memo[k] = v
            ok.append(v)
        return batch.append_column("ssl_verified", pa.array(ok, pa.bool_()))

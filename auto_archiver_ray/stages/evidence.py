"""Evidentiary hash-chain manifests — the timestamping enricher's data plane.

The reference concatenates each item's media hashes (algo prefixes
stripped) into hashes.txt, signs that blob with N RFC3161 TSAs, and
verifies the cert chain (ref:modules/timestamping_enricher/
timestamping_enricher.py:51-104; hash concat at :55-66; the
OpentimestampsEnricher is the same shape per file). The pure, portable part
is the manifest: a deterministic function of the ordered hash list — built
and verified here. The TSA signature itself needs a network authority; in
this data plane the token is a DETERMINISTIC STUB (sha256 over
tsa_url + manifest — clearly not a real RFC3161 token) so the
submit/attach/verify plumbing is real and testable end to end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

# default stub authorities (the reference defaults to several real TSA URLs)
DEFAULT_TSA_URLS = ("dtsa://alpha.invalid/tsr", "dtsa://beta.invalid/tsr")


def strip_hash_prefix(h: str) -> str:
    """Parity: ref:timestamping_enricher.py:55-57 — drop the algo prefix."""
    return h.replace("SHA-256:", "").replace("SHA3-512:", "")


def build_manifest(hashes: list[str]) -> str:
    """data_to_sign: newline-joined stripped hashes (ref::61-66)."""
    return "\n".join(strip_hash_prefix(h) for h in hashes)


def manifest_sha256(manifest: str) -> str:
    return hashlib.sha256(manifest.encode("utf-8")).hexdigest()


def stub_tsa_token(tsa_url: str, manifest: str) -> str:
    """Deterministic stand-in for the TSA's signed token."""
    return hashlib.sha256((tsa_url + "\n" + manifest).encode("utf-8")).hexdigest()


def verify_token(tsa_url: str, manifest: str, token: str) -> bool:
    """The verify half (ref::79-104 verifies the signature over the same
    message bytes): recompute and compare."""
    return stub_tsa_token(tsa_url, manifest) == token


def verify_manifest(manifest: str, hashes: list[str]) -> bool:
    """A manifest is valid iff it equals the canonical build over the
    claimed hash list."""
    return manifest == build_manifest(hashes)


def hash_manifests(
    ds,
    key_col: str = "host",
    hash_col: str = "sha256",
    order_col: str = "url",
    tsa_urls: tuple[str, ...] = DEFAULT_TSA_URLS,
    num_buckets: int = 512,
):
    """Per-key evidentiary manifest over content hashes: one row per
    ``key_col`` value with (manifest_sha256, n_hashes, token_<i> per TSA).
    Hashes are ordered by ``order_col`` — deterministic, resumable.

    Shuffle: only (key, hash, order) columns move, keyed on a coarse bucket
    of ``key_col`` (all rows of a key co-locate; per-key work is a
    vectorized pandas groupby inside the bucket)."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        vals = np.asarray([str(v) for v in batch.column(key_col).to_pylist()], dtype=object)
        hb = (pd.util.hash_array(vals, categorize=False) % np.uint64(num_buckets)).astype(np.int64)
        return batch.append_column("__eb", pa.array(hb))

    token_cols = [f"token_{i}" for i in range(len(tsa_urls))]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, grp in g.groupby(key_col, sort=False):
            grp = grp.sort_values(order_col, kind="mergesort")
            manifest = build_manifest(list(grp[hash_col]))
            row = {
                key_col: key,
                "n_hashes": len(grp),
                "manifest_sha256": manifest_sha256(manifest),
            }
            for c, tsa in zip(token_cols, tsa_urls):
                row[c] = stub_tsa_token(tsa, manifest)
            rows.append(row)
        cols = [key_col, "n_hashes", "manifest_sha256"] + token_cols
        if not rows:
            return pd.DataFrame({c: pd.Series(dtype="object" if c != "n_hashes" else "int64") for c in cols})
        return pd.DataFrame(rows, columns=cols)

    return (
        ds.select_columns([key_col, hash_col, order_col])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__eb")
        .map_groups(per_bucket, batch_format="pandas")
    )


def signed_manifests(
    ds,
    key_col: str = "host",
    hash_col: str = "sha256",
    order_col: str = "url",
    tsa_urls: tuple[str, ...] = DEFAULT_TSA_URLS,
    num_buckets: int = 512,
):
    """:func:`hash_manifests` with REAL RFC3161-fixture tokens: each row
    additionally carries the manifest text and, per TSA, an RSA-PKCS#1-v1.5
    signed TimeStampToken (functions/rfc3161.py — deterministic fixture
    authorities; the signature math is real, only the network is not).
    TSA private keys derive once per worker process (module-level cache)."""
    from ..functions import rfc3161

    def add_bucket(batch: pa.Table) -> pa.Table:
        vals = np.asarray([str(v) for v in batch.column(key_col).to_pylist()], dtype=object)
        hb = (pd.util.hash_array(vals, categorize=False) % np.uint64(num_buckets)).astype(np.int64)
        return batch.append_column("__eb", pa.array(hb))

    tok_cols = [f"rfc3161_token_{i}" for i in range(len(tsa_urls))]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, grp in g.groupby(key_col, sort=False):
            grp = grp.sort_values(order_col, kind="mergesort")
            manifest = build_manifest(list(grp[hash_col]))
            row = {
                key_col: key,
                "n_hashes": len(grp),
                "manifest_sha256": manifest_sha256(manifest),
                "manifest": manifest,
            }
            for c, tsa in zip(tok_cols, tsa_urls):
                row[c] = rfc3161.issue_token(tsa, manifest)
            rows.append(row)
        cols = [key_col, "n_hashes", "manifest_sha256", "manifest"] + tok_cols
        if not rows:
            return pd.DataFrame({c: pd.Series(dtype="object" if c != "n_hashes" else "int64") for c in cols})
        return pd.DataFrame(rows, columns=cols)

    return (
        ds.select_columns([key_col, hash_col, order_col])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__eb")
        .map_groups(per_bucket, batch_format="pandas")
    )


def verified_manifests(
    ds,
    key_col: str = "host",
    hash_col: str = "sha256",
    order_col: str = "url",
    tsa_urls: tuple[str, ...] = DEFAULT_TSA_URLS,
    num_buckets: int = 512,
):
    """Sign-then-verify plane: build :func:`signed_manifests`, then run the
    reference's three verification checks (cert chain → imprint →
    signature; ref:timestamping_enricher.py:91-241) as a separate stateless
    ``map_batches`` pass using ONLY public material — root public key and
    root-signed TSA certs issued once on the driver and broadcast in the
    task closure. Output: (key, n_hashes, manifest_sha256, verified); the
    manifest text is dropped after verification."""
    from ..functions import rfc3161

    signed = signed_manifests(ds, key_col, hash_col, order_col, tsa_urls, num_buckets)
    certs = [rfc3161.issue_cert(t) for t in tsa_urls]
    root_pub = rfc3161.root_public()
    tok_cols = [f"rfc3161_token_{i}" for i in range(len(tsa_urls))]

    def verify(batch: pa.Table) -> pa.Table:
        manifests = batch.column("manifest").to_pylist()
        ok = np.ones(len(manifests), dtype=bool)
        for c, tsa, cert in zip(tok_cols, tsa_urls, certs):
            toks = batch.column(c).to_pylist()
            for i, (m, t) in enumerate(zip(manifests, toks)):
                if ok[i] and not rfc3161.verify_token(tsa, m, t, cert, root_pub):
                    ok[i] = False
        return pa.table(
            {
                key_col: batch[key_col],
                "n_hashes": batch["n_hashes"],
                "manifest_sha256": batch["manifest_sha256"],
                "verified": pa.array(ok),
            }
        )

    return signed.map_batches(verify, batch_format="pyarrow")


def file_tokens(ds, hash_col: str = "sha256", tsa_urls: tuple[str, ...] = DEFAULT_TSA_URLS):
    """OpentimestampsEnricher analog (ref:modules/opentimestamps_enricher/
    opentimestamps_enricher.py:16-172): one detached token per FILE hash
    (the per-media .ots), vs :func:`hash_manifests`' batch manifest.
    Stateless map — no shuffle; calendar submission is the same
    deterministic stub as the TSA tokens."""

    def kernel(batch: pa.Table) -> pa.Table:
        hashes = [strip_hash_prefix(h or "") for h in batch.column(hash_col).to_pylist()]
        out = batch
        for i, tsa in enumerate(tsa_urls):
            toks = [stub_tsa_token(tsa, h) if h else "" for h in hashes]
            out = out.append_column(f"ots_token_{i}", pa.array(toks, pa.string()))
        return out

    return ds.map_batches(kernel, batch_format="pyarrow")

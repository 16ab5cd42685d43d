"""RFC3161-shaped timestamp tokens with REAL signature verification math.

The reference verifies a TSA response in three steps
(ref:modules/timestamping_enricher/timestamping_enricher.py:91-241):
check the message imprint against the submitted digest, verify the
signature over the TSTInfo, and validate the signer's certificate chain to
a trusted root. The network authority can't exist in this sandbox, so the
AUTHORITIES here are deterministic fixtures — but the mathematics is real:

- every authority holds an RSA keypair derived deterministically from its
  URL (seeded Miller-Rabin prime search, pure integers — no crypto libs),
- the fixture ROOT signs each TSA's certificate (binding url → public key),
- a token is the TSA's RSA-PKCS#1-v1.5 signature over the TSTInfo digest
  (imprint ‖ serial ‖ gentime ‖ tsa_url),
- :func:`verify_token` re-runs all three reference checks; forging a token
  or tampering a manifest requires breaking RSA, not just re-hashing.

Verification uses only the PUBLIC halves (e = 65537 → two modular squarings
and a multiply per check — cheap enough for a per-row distributed pass with
the certs broadcast once).
"""

from __future__ import annotations

import hashlib
import json
import random

_E = 65537
_KEY_BITS = 1024  # fixture-sized; the math is parameter-independent

# EMSA-PKCS1-v1_5 DigestInfo prefix for SHA-256 (RFC 8017 §9.2)
_SHA256_PREFIX = bytes.fromhex("3031300d060960864801650304020105000420")

_SMALL_PRIMES = [p for p in range(3, 1000) if all(p % q for q in range(2, int(p**0.5) + 1))]


def _is_probable_prime(n: int, rng: random.Random, rounds: int = 24) -> bool:
    if n < 2:
        return False
    for p in _SMALL_PRIMES:
        if n % p == 0:
            return n == p
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for _ in range(rounds):
        a = rng.randrange(2, n - 2)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = pow(x, 2, n)
            if x == n - 1:
                break
        else:
            return False
    return True


def _gen_prime(bits: int, rng: random.Random) -> int:
    while True:
        c = rng.getrandbits(bits) | (1 << (bits - 1)) | 1
        if c % _E == 1:  # keep e invertible mod p-1
            continue
        if _is_probable_prime(c, rng):
            return c


class RsaKey:
    """Deterministic fixture RSA keypair (seeded by a label string)."""

    def __init__(self, label: str, bits: int = _KEY_BITS):
        rng = random.Random(hashlib.sha256(("rsa-fixture:" + label).encode()).digest())
        p = _gen_prime(bits // 2, rng)
        q = _gen_prime(bits // 2, rng)
        while q == p:
            q = _gen_prime(bits // 2, rng)
        self.n = p * q
        self.e = _E
        self.d = pow(_E, -1, (p - 1) * (q - 1))
        self.k = (self.n.bit_length() + 7) // 8

    def public(self) -> tuple[int, int]:
        return (self.n, self.e)

    def _emsa(self, digest: bytes) -> int:
        """EMSA-PKCS1-v1_5 encoding of a SHA-256 digest (RFC 8017 §9.2)."""
        t = _SHA256_PREFIX + digest
        ps = b"\xff" * (self.k - len(t) - 3)
        return int.from_bytes(b"\x00\x01" + ps + b"\x00" + t, "big")

    def sign_digest(self, digest: bytes) -> str:
        return format(pow(self._emsa(digest), self.d, self.n), "x")


def verify_signature(pub: tuple[int, int], digest: bytes, sig_hex: str) -> bool:
    """RSA-PKCS#1-v1.5 verify with the public exponent only."""
    n, e = pub
    k = (n.bit_length() + 7) // 8
    try:
        s = int(sig_hex, 16)
    except (ValueError, TypeError):
        return False
    if not 0 < s < n:
        return False
    t = _SHA256_PREFIX + digest
    ps = b"\xff" * (k - len(t) - 3)
    expected = int.from_bytes(b"\x00\x01" + ps + b"\x00" + t, "big")
    return pow(s, e, n) == expected


# ---------------------------------------------------------------------------
# fixture authority / certificate chain
# ---------------------------------------------------------------------------

_ROOT_LABEL = "fixture-root-ca"
_key_cache: dict[str, RsaKey] = {}


def _key(label: str) -> RsaKey:
    if label not in _key_cache:
        _key_cache[label] = RsaKey(label)
    return _key_cache[label]


def root_public() -> tuple[int, int]:
    return _key(_ROOT_LABEL).public()


def _cert_digest(tsa_url: str, pub: tuple[int, int]) -> bytes:
    return hashlib.sha256(f"cert|{tsa_url}|{pub[0]:x}|{pub[1]:x}".encode()).digest()


def issue_cert(tsa_url: str) -> dict:
    """Root-signed certificate binding the TSA url to its public key."""
    pub = _key(tsa_url).public()
    return {
        "tsa_url": tsa_url,
        "n": format(pub[0], "x"),
        "e": pub[1],
        "root_sig": _key(_ROOT_LABEL).sign_digest(_cert_digest(tsa_url, pub)),
    }


def verify_cert(cert: dict, root_pub: tuple[int, int]) -> bool:
    try:
        pub = (int(cert["n"], 16), int(cert["e"]))
    except (KeyError, ValueError, TypeError):
        return False
    return verify_signature(root_pub, _cert_digest(cert["tsa_url"], pub), cert["root_sig"])


def _tstinfo_digest(imprint: str, serial: str, gentime: str, tsa_url: str) -> bytes:
    return hashlib.sha256(f"tstinfo|{imprint}|{serial}|{gentime}|{tsa_url}".encode()).digest()


# deterministic fixture gentime (a real TSA stamps wall-clock; determinism
# is what makes the distributed result oracle-checkable)
_FIXTURE_GENTIME = "20260101000000Z"


def issue_token(tsa_url: str, manifest: str) -> str:
    """TimeStampToken (JSON-compact): imprint + serial + gentime + the
    TSA's signature over the TSTInfo digest."""
    imprint = hashlib.sha256(manifest.encode("utf-8")).hexdigest()
    serial = hashlib.sha256(f"serial|{tsa_url}|{imprint}".encode()).hexdigest()[:16]
    sig = _key(tsa_url).sign_digest(_tstinfo_digest(imprint, serial, _FIXTURE_GENTIME, tsa_url))
    return json.dumps(
        {"imprint": imprint, "serial": serial, "gentime": _FIXTURE_GENTIME, "sig": sig},
        sort_keys=True,
        separators=(",", ":"),
    )


def verify_token(tsa_url: str, manifest: str, token_json: str, cert: dict, root_pub: tuple[int, int]) -> bool:
    """The reference's three checks (timestamping_enricher.py:91-241):

    1. certificate chain: the cert binding tsa_url→key is root-signed;
    2. message imprint: the token's imprint equals sha256(manifest);
    3. signature: the TSA's RSA signature over the TSTInfo verifies with
       the cert's public key.
    """
    if cert.get("tsa_url") != tsa_url or not verify_cert(cert, root_pub):
        return False
    try:
        tok = json.loads(token_json)
        imprint, serial, gentime, sig = tok["imprint"], tok["serial"], tok["gentime"], tok["sig"]
    except (ValueError, KeyError, TypeError):
        return False
    if imprint != hashlib.sha256(manifest.encode("utf-8")).hexdigest():
        return False
    pub = (int(cert["n"], 16), int(cert["e"]))
    return verify_signature(pub, _tstinfo_digest(imprint, serial, gentime, tsa_url), sig)

"""RFC3161-fixture signature verification (VERDICT r3 #9): the verify math
must ACCEPT valid tokens and REJECT every tamper class the reference's
three checks cover (cert chain / message imprint / TSTInfo signature,
ref:modules/timestamping_enricher/timestamping_enricher.py:91-241)."""

import json

import pandas as pd
import pytest

from auto_archiver_ray.functions import rfc3161

TSA = "dtsa://alpha.invalid/tsr"
OTHER_TSA = "dtsa://beta.invalid/tsr"
MANIFEST = "aa" * 32 + "\n" + "bb" * 32


@pytest.fixture(scope="module")
def material():
    return {
        "cert": rfc3161.issue_cert(TSA),
        "other_cert": rfc3161.issue_cert(OTHER_TSA),
        "root": rfc3161.root_public(),
        "token": rfc3161.issue_token(TSA, MANIFEST),
    }


def test_valid_token_verifies(material):
    assert rfc3161.verify_token(TSA, MANIFEST, material["token"], material["cert"], material["root"])


def test_tampered_manifest_rejected(material):
    tampered = MANIFEST.replace("aa", "ab", 1)
    assert not rfc3161.verify_token(TSA, tampered, material["token"], material["cert"], material["root"])


def test_tampered_signature_rejected(material):
    tok = json.loads(material["token"])
    sig = tok["sig"]
    tok["sig"] = hex(int(sig, 16) ^ 1)[2:]
    assert not rfc3161.verify_token(TSA, MANIFEST, json.dumps(tok), material["cert"], material["root"])


def test_tampered_tstinfo_rejected(material):
    """Changing any signed TSTInfo field (serial/gentime) breaks the
    signature even though the imprint still matches."""
    for field, val in (("serial", "00" * 8), ("gentime", "19990101000000Z")):
        tok = json.loads(material["token"])
        tok[field] = val
        assert not rfc3161.verify_token(
            TSA, MANIFEST, json.dumps(tok), material["cert"], material["root"]
        ), field


def test_forged_imprint_without_key_rejected(material):
    """An attacker who re-hashes a tampered manifest but cannot sign: the
    imprint check passes, the signature check must fail."""
    import hashlib

    tampered = MANIFEST + "\n" + "cc" * 32
    tok = json.loads(material["token"])
    tok["imprint"] = hashlib.sha256(tampered.encode()).hexdigest()
    assert not rfc3161.verify_token(TSA, tampered, json.dumps(tok), material["cert"], material["root"])


def test_cross_tsa_token_rejected(material):
    """A token signed by a different (legitimate) authority must not verify
    against this TSA's cert, and vice versa."""
    other_token = rfc3161.issue_token(OTHER_TSA, MANIFEST)
    assert not rfc3161.verify_token(TSA, MANIFEST, other_token, material["cert"], material["root"])
    assert not rfc3161.verify_token(TSA, MANIFEST, material["token"], material["other_cert"], material["root"])


def test_unrooted_cert_rejected(material):
    """A cert whose root signature is broken (or signed by a different
    root) fails the chain check."""
    bad = dict(material["cert"])
    bad["root_sig"] = hex(int(bad["root_sig"], 16) ^ 1)[2:]
    assert not rfc3161.verify_token(TSA, MANIFEST, material["token"], bad, material["root"])
    wrong_root = rfc3161.RsaKey("not-the-root").public()
    assert not rfc3161.verify_token(TSA, MANIFEST, material["token"], material["cert"], wrong_root)


def test_rebound_cert_key_rejected(material):
    """Swapping the public key inside a valid cert (keeping the old root
    signature) fails — the chain binds url AND key."""
    mallory = rfc3161.RsaKey("mallory")
    bad = dict(material["cert"])
    bad["n"] = format(mallory.n, "x")
    # Mallory CAN sign a token with her own key...
    imprint = json.loads(material["token"])["imprint"]
    assert not rfc3161.verify_cert(bad, material["root"])
    assert not rfc3161.verify_token(TSA, MANIFEST, material["token"], bad, material["root"])
    del imprint


def test_garbage_token_and_cert_rejected(material):
    for garbage in ("", "not json", '{"imprint": "xx"}', json.dumps({"imprint": 1, "serial": 2, "gentime": 3, "sig": 4})):
        assert not rfc3161.verify_token(TSA, MANIFEST, garbage, material["cert"], material["root"])
    assert not rfc3161.verify_cert({}, material["root"])


def test_verified_manifests_distributed(ray_session):
    """Pipeline shape: sign per-key manifests distributed, verify in a
    separate pass with broadcast public material — every clean row
    verifies; a tampered token column flips its row to False."""
    import pyarrow as pa
    import ray.data as rd

    from auto_archiver_ray.stages.evidence import signed_manifests, verified_manifests

    df = pd.DataFrame(
        {
            "host": ["a.com", "a.com", "b.com", "c.com"],
            "sha256": ["11" * 32, "22" * 32, "33" * 32, "44" * 32],
            "url": ["http://a.com/1", "http://a.com/2", "http://b.com/1", "http://c.com/1"],
        }
    )
    out = verified_manifests(rd.from_pandas(df)).to_pandas().sort_values("host")
    assert list(out["host"]) == ["a.com", "b.com", "c.com"]
    assert out["verified"].all()
    assert list(out["n_hashes"].astype(int)) == [2, 1, 1]

    # tamper one signed row before the verify pass
    signed = signed_manifests(rd.from_pandas(df)).to_pandas()
    signed.loc[signed["host"] == "b.com", "manifest"] = "55" * 32  # content swap
    certs = [rfc3161.issue_cert(t) for t in ("dtsa://alpha.invalid/tsr", "dtsa://beta.invalid/tsr")]
    root = rfc3161.root_public()
    flags = [
        rfc3161.verify_token("dtsa://alpha.invalid/tsr", m, t, certs[0], root)
        for m, t in zip(signed["manifest"], signed["rfc3161_token_0"])
    ]
    by_host = dict(zip(signed["host"], flags))
    assert by_host["a.com"] and by_host["c.com"] and not by_host["b.com"]

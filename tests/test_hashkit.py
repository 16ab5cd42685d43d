"""Golden-digest parity with ref:tests/enrichers/test_hash_enricher.py:8-28.

The reference fixtures are two text files; their byte content is
reproduced here ("test file 1/2 content" + newline) and must hash to the
exact published digests.
"""

from auto_archiver_ray.functions import hashkit

# exact byte content of ref:tests/data/testfile_{1,2}.txt
TESTFILE_1 = b"test1"
TESTFILE_2 = b"test2"

GOLDENS = [
    ("SHA-256", TESTFILE_1, "1b4f0e9851971998e732078544c96b36c3d01cedf7caa332359d6f1d83567014"),
    ("SHA-256", TESTFILE_2, "60303ae22b998861bce3b28f33eec1be758a213c86c93c076dbe9f558c11c752"),
    (
        "SHA3-512",
        TESTFILE_1,
        "d2d8cc4f369b340130bd2b29b8b54e918b7c260c3279176da9ccaa37c96eb71735fc97568e892dc6220bf4ae0d748edb46bd75622751556393be3f482e6f794e",
    ),
    (
        "SHA3-512",
        TESTFILE_2,
        "e35970edaa1e0d8af7d948491b2da0450a49fd9cc1e83c5db4c6f175f9550cf341f642f6be8cfb0bfa476e4258e5088c5ad549087bf02811132ac2fa22b734c6",
    ),
]


def test_golden_digests():
    for algo, data, expected in GOLDENS:
        assert hashkit.content_hash(data, algo) == expected
        assert hashkit.tagged_hash(data, algo) == f"{algo}:{expected}"


def test_known_string_goldens():
    # fixed public vectors: sha256("hello\n")
    assert (
        hashkit.content_hash(b"hello\n")
        == "5891b5b522d5df086d0ff0b110fbd9d21bb4fc7163af34d08286a2e846f6be03"
    )


def test_tagged_and_batch():
    assert hashkit.tagged_hash(b"x").startswith("SHA-256:")
    assert hashkit.tagged_hash(b"x", "NOPE") == ""
    out = hashkit.hash_batch([b"a", None, b"b"])
    assert out[1] == "" and len(out[0]) == 64 and out[0] != out[2]

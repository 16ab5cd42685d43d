"""Merge-fold, metadata-selection and storage-key semantics tests."""

import pytest

from auto_archiver_ray.functions import keygen, mergekit, timekit
from auto_archiver_ray.stages.enrich import human_readable_bytes, select_metadata


def test_merge_results_scalar_dict_list():
    left = {"status": "no archiver", "metadata": {"a": 1, "d": {"x": 1}, "l": [1]}, "media": [{"m": 1}]}
    right = {"status": "gen: success", "metadata": {"a": 2, "d": {"y": 2}, "l": [2], "n": 3}, "media": [{"m": 2}]}
    out = mergekit.merge_results(left, right)
    assert out["status"] == "gen: success"
    assert out["metadata"]["a"] == 2  # scalar overwrite
    assert out["metadata"]["d"] == {"x": 1, "y": 2}  # dict union
    assert out["metadata"]["l"] == [1, 2]  # list concat
    assert out["metadata"]["n"] == 3
    assert out["media"] == [{"m": 1}, {"m": 2}]
    # empty right status does not clobber
    out2 = mergekit.merge_results({"status": "s: success", "metadata": {}, "media": []}, {"status": "", "metadata": {}, "media": []})
    assert out2["status"] == "s: success"
    assert mergekit.merge_results(left, None) is left


def test_choose_most_complete():
    r1 = {"status": "", "metadata": {"a": 1}, "media": []}
    r2 = {"status": "", "metadata": {}, "media": [1, 2]}
    r3 = {"status": "", "metadata": {"a": 1, "b": 2}, "media": [1, 2]}
    assert mergekit.choose_most_complete([]) is None
    assert mergekit.choose_most_complete([r1]) is r1
    assert mergekit.choose_most_complete([r1, r2, r3]) is r3  # media tie → more metadata
    assert mergekit.choose_most_complete([r3, r2]) is r3  # first wins ties


def test_dedup_media_by_hash():
    media = [
        {"payload": b"aaa"},
        {"payload": b"aaa"},
        {"payload": b"bbb", "hash": "custom"},
        {"payload": b"ccc", "hash": "custom"},
        {"payload": None},
    ]
    out = mergekit.dedup_media_by_hash(media)
    assert len(out) == 3  # first aaa, first custom, the payload-less one
    assert out[-1] == {"payload": None}


def test_is_success():
    assert mergekit.is_success("telegram: success")
    assert not mergekit.is_success("nothing archived")


def test_select_metadata_parity():
    exif = {
        "Author": "Jane",
        "Create Date": "2024:01:01",
        "GPS Latitude": "10.0",
        "File Size": "1 kB",
        "Producer": "",
    }
    out = select_metadata(exif, ["author", "datetime", "location"])
    assert out == {"Author": "Jane", "Create Date": "2024:01:01", "GPS Latitude": "10.0"}
    # empty values excluded from basket matches
    assert "Producer" not in out
    # direct key request (case-insensitive path)
    out2 = select_metadata(exif, ["file size"])
    assert out2 == {"File Size": "1 kB"}
    assert select_metadata(exif, []) == {}


def test_storage_key_policies():
    h = "ab" * 32
    assert keygen.storage_key("https://e.com/a", "m1", ".jpg", h, "", "flat", "static") == f"{h[:24]}.jpg"
    k_url = keygen.storage_key("https://e.com/a b", "m1", ".jpg", h, "f", "url", "static")
    assert k_url.startswith("f/https-e-com-a-b/")
    # deterministic "random"
    k1 = keygen.storage_key("https://e.com/a", "m1", ".jpg", h, "", "random", "random")
    k2 = keygen.storage_key("https://e.com/a", "m1", ".jpg", h, "", "random", "random")
    assert k1 == k2
    k3 = keygen.storage_key("https://e.com/b", "m1", ".jpg", h, "", "random", "random")
    assert k1 != k3
    with pytest.raises(ValueError):
        keygen.storage_key("u", "m", ".x", h, "", "nope", "static")


def test_human_readable_bytes():
    assert human_readable_bytes(500) == "500.0 bytes"
    assert human_readable_bytes(2048) == "2.0 KB"
    assert human_readable_bytes(5 * 1024**3) == "5.0 GB"


def test_timekit():
    # parity quirk: misc.get_timestamp defaults dayfirst=True, which makes
    # dateutil swap day/month even for ISO strings (ref:utils/misc.py:80-99)
    assert timekit.to_utc_iso("2024-03-01T10:00:00") == "2024-01-03T10:00:00+00:00"
    # the extract path mirrors Metadata.set_timestamp's parse_dt default
    # (dayfirst=False, ref:core/metadata.py:130-133)
    assert timekit.to_utc_iso("2024-03-01T10:00:00", dayfirst=False) == "2024-03-01T10:00:00+00:00"
    assert timekit.to_utc_iso("") == ""
    assert timekit.to_utc_iso("not a date !!!") == ""
    assert timekit.parse_datetime("01/02/2024").day == 1  # dayfirst=True
    assert timekit.parse_datetime("2024-01-02", fmt="%Y-%m-%d").month == 1
    assert timekit.parse_datetime("garbage") is None


def test_auth_registry_www_variants():
    from auto_archiver_ray.functions.auth import AuthRegistry

    reg = AuthRegistry({"example.com": {"api_key": "k1"}, "www.other.org": {"cookie": "c"}})
    assert reg.get("example.com") == {"api_key": "k1"}
    assert reg.get("www.example.com") == {"api_key": "k1"}  # www variant
    assert reg.get("other.org") == {"cookie": "c"}  # registered with www
    assert reg.get("api.example.com") == {"api_key": "k1"}  # parent-domain walk
    assert reg.get("unknown.net") == {}
    assert reg.get("unknown.net", {"d": 1}) == {"d": 1}


def test_token_ring_rotation():
    import pytest as _pytest

    from auto_archiver_ray.functions.auth import TokenRing

    ring = TokenRing(["a", "b", "c"])
    assert [ring.acquire() for _ in range(7)] == ["a", "b", "c", "a", "b", "c", "a"]
    with _pytest.raises(ValueError):
        TokenRing([])


def test_is_empty_parity():
    empty = {"status": "no archiver", "metadata": {"url": "u", "_processed_at": 1, "total_bytes": 5}, "media": []}
    assert mergekit.is_empty(empty)
    assert not mergekit.is_empty({**empty, "status": "x: success"})
    assert not mergekit.is_empty({**empty, "media": [{"m": 1}]})
    assert not mergekit.is_empty({**empty, "metadata": {**empty["metadata"], "title": "t"}})


def test_hierarchical_path_policy():
    """GDrive-style folder-tree keying (ref:gdrive_storage.py:62-95 minus
    the Drive API): host + slugified path segments, nested; caps hold."""
    from auto_archiver_ray.functions.keygen import folder_walk, hierarchical_path, storage_key

    p = hierarchical_path("https://media.example.org/2024/May/photo%20set/img1.jpg?w=9")
    assert p == "media-example-org/2024/may/photo-20set/img1-jpg"
    # query excluded, segments slugified individually, nesting preserved
    key = storage_key(
        "https://media.example.org/a/b/c.jpg", "m1", ".jpg", "ab" * 32,
        path_generator="folders", filename_generator="static",
    )
    assert key == "media-example-org/a/b/c-jpg/" + ("ab" * 32)[:24] + ".jpg"
    folders, fname = folder_walk(key)
    assert folders == ["media-example-org", "a", "b", "c-jpg"]
    assert fname == ("ab" * 32)[:24] + ".jpg"
    # depth cap: hostile deep paths cannot mint unbounded trees
    deep = hierarchical_path("https://h.org/" + "/".join(str(i) for i in range(50)))
    assert len(deep.split("/")) == 8
    # determinism
    assert p == hierarchical_path("https://media.example.org/2024/May/photo%20set/img1.jpg?w=9")


def test_meta_enrich_vector_parity():
    """The vectorized size_human path is bit-identical to the scalar loop
    across unit boundaries, zero, and huge paylodless sizes."""
    import numpy as np
    import pyarrow as pa

    from auto_archiver_ray.stages.enrich import meta_enrich

    payloads = [b"", b"x" * 500, b"y" * 1023, b"z" * 1024, b"w" * 2048, b"v" * (1024 * 1024 - 1), b"u" * (3 * 1024 * 1024)]
    batch = pa.table({"html": pa.array(payloads, pa.binary())})
    out = meta_enrich(batch)
    want = [human_readable_bytes(float(len(p))) for p in payloads]
    assert out.column("size_human").to_pylist() == want
    assert out.column("size_bytes").to_pylist() == [len(p) for p in payloads]
    # randomized cross-check (payload lengths up to 64 KiB keep it cheap)
    rng = np.random.Generator(np.random.PCG64(5))
    sizes = [int(s) for s in rng.integers(0, 65536, 50)]
    b = pa.table({"html": pa.array([b"x" * s for s in sizes], pa.binary())})
    got = meta_enrich(b).column("size_human").to_pylist()
    assert got == [human_readable_bytes(float(s)) for s in sizes]

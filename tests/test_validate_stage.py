"""Differential test: the fused single-parse validate kernel must agree with
the composed urlkit functions on every column, for a battery of tricky URLs.
Plus hypothesis property tests for kernel invariants."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from auto_archiver_ray.functions import urlkit
from auto_archiver_ray.stages.validate import validate_batch

TRICKY = [
    "https://example.com/a",
    "http://EXAMPLE.com:80/a",
    "https://Example.COM:443/b?utm_source=x&z=1#frag",
    "https://example.com:8443/a?b=2&a=1",
    "https://example.com",
    "https://example.com/?q",
    "https://example.com/?a&b=1",
    "ftp://example.com/x",
    "https://localhost/x",
    "https://127.0.0.1/x",
    "https://192.168.1.4/x",
    "https://8.8.8.8/x",
    "https:///nope",
    "https://t.me/c/123/9",
    "https://www.instagram.com/p/1",
    "https://twitter.com/u/status/5?s=20",
    "https://sub.youtube.com/watch?v=1",
    "https://example.com/p?fbclid=1&gclid=2&utm_medium=m",
    "notaurl",
    "https://user:pw@example.com/x",
]


def test_validate_batch_matches_urlkit_composition():
    batch = pa.table({"url": TRICKY})
    out = validate_batch(batch)
    for i, u in enumerate(TRICKY):
        ok, why = urlkit.check_url(u)
        assert out["valid"][i].as_py() == ok, u
        assert out["invalid_reason"][i].as_py() == why, u
        if ok:
            assert out["url_clean"][i].as_py() == urlkit.clean_url(u), u
            canon = urlkit.canonicalize(u)
            assert out["url_canon"][i].as_py() == canon, u
            assert out["host"][i].as_py() == urlkit.domain_for_url(canon), u
            assert out["url_hash"][i].as_py() == urlkit.url_seen_hex(canon), u
            assert out["platform"][i].as_py() == urlkit.platform_for_url(u), u
            assert out["auth_wall"][i].as_py() == urlkit.is_auth_wall(u), u


_url_strat = st.builds(
    lambda scheme, host, port, path, q, frag: f"{scheme}://{host}{port}/{path}{q}{frag}",
    st.sampled_from(["http", "https"]),
    st.sampled_from(["example.com", "EXAMPLE.com", "t.me", "sub.domain.org", "8.8.8.8"]),
    st.sampled_from(["", ":8080", ":443"]),
    st.text(alphabet="abcXYZ019/", max_size=12),
    st.sampled_from(["", "?a=1", "?utm_source=x&b=2", "?fbclid=9"]),
    st.sampled_from(["", "#frag"]),
)


@settings(max_examples=200, deadline=None)
@given(_url_strat)
def test_property_canonicalize_idempotent(url):
    c1 = urlkit.canonicalize(url)
    assert urlkit.canonicalize(c1) == c1
    # canonical form never carries trackers or fragments
    assert "utm_source" not in c1 and "#" not in c1


@settings(max_examples=200, deadline=None)
@given(_url_strat)
def test_property_clean_idempotent(url):
    c1 = urlkit.clean_url(url)
    assert urlkit.clean_url(c1) == c1


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=300))
def test_property_extract_text_stable(s):
    from auto_archiver_ray.functions import textkit

    out = textkit.extract_text(s)
    # idempotent on its own output and never contains runs of whitespace
    assert textkit.extract_text(out) == out
    assert "  " not in out and not out.startswith(" ") and not out.endswith(" ")


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=64))
def test_property_bloom_no_false_negatives(data):
    import hashlib

    from auto_archiver_ray.state.bloom import BloomFilter

    bf = BloomFilter(1000)
    d = hashlib.sha256(data).digest()
    bf.add(d)
    assert d in bf


def test_canon_reconstruction_matches_urlunparse():
    """The f-string canon + cleaned fast paths must equal the urlunparse
    composition they replaced, across tricky forms."""
    import pyarrow as pa
    from urllib.parse import parse_qsl, urlencode, urlparse, urlunparse

    from auto_archiver_ray.functions.urlkit import _TRACKER_PARAMS
    from auto_archiver_ray.stages.validate import validate_batch

    urls = [
        "https://a.example.org/p/1?utm_source=x&id=9",
        "https://a.example.org/p/1?id=9",
        "http://a.example.org",                       # empty path
        "http://a.example.org:8080/x",                # non-default port
        "https://a.example.org:443/x",                # default port dropped
        "https://A.Example.ORG/Path?Q=1",             # host lowercased, path kept
        "https://a.example.org/x;par?fbclid=1&k=v",   # params segment
        "https://a.example.org/x#frag",               # fragment dropped in canon
        "https://a.example.org/x?utm_campaign=1",     # all-tracker query
        "https://8.8.8.8/x?id=1",                     # global IP host
    ]
    out = validate_batch(pa.table({"url": pa.array(urls, pa.string())}))
    got_canon = out.column("url_canon").to_pylist()
    got_clean = out.column("url_clean").to_pylist()
    for u, gc, gcl in zip(urls, got_canon, got_clean):
        parts = urlparse(u)
        kept = [(k, v) for k, v in parse_qsl(parts.query) if k not in _TRACKER_PARAMS]
        clean_q = urlencode(kept) if parts.query else parts.query
        hostport = parts.hostname.lower()
        port = parts.port
        if port is not None and not (
            (parts.scheme == "http" and port == 80) or (parts.scheme == "https" and port == 443)
        ):
            hostport = f"{hostport}:{port}"
        want_canon = urlunparse(
            (parts.scheme.lower(), hostport, parts.path or "/", parts.params, clean_q, "")
        )
        want_clean = parts._replace(query=clean_q).geturl()
        assert gc == want_canon, (u, gc, want_canon)
        assert gcl == want_clean, (u, gcl, want_clean)

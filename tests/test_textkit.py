"""Text kernel tests: pinned extraction goldens, deletion-indicator parity,
sketches determinism."""

import numpy as np

from auto_archiver_ray.functions import textkit


def test_extract_text_golden():
    html = (
        b"<html><head><title>My &amp; Title</title><style>b{color:red}</style>"
        b"<script>var x=1;</script></head>"
        b"<body><h1>Head</h1><p>para one</p>\n<p>two &lt;3</p><!-- c --></body></html>"
    )
    assert textkit.extract_text(html) == "My & Title Head para one two <3"
    assert textkit.extract_title(html) == "My & Title"


def test_extract_text_edge_cases():
    assert textkit.extract_text(b"") == ""
    assert textkit.extract_text(b"plain   text\n\nhere") == "plain text here"
    assert textkit.extract_text(b"\xff\xfebad<b>x</b>") .endswith("x")
    assert textkit.extract_title(b"<body>no title</body>") == ""


def test_extract_time_and_media():
    html = (
        b'<time datetime="2024-03-01T10:00:00+00:00">x</time>'
        b'<img src="https://a.com/i.jpg"><img src="https://a.com/i.jpg">'
        b'<video src="https://a.com/v.mp4"></video>'
        b"<div style=\"background:url('https://a.com/bg.png')\"></div>"
        b'<a href="/relative/x.jpg">rel</a><a href="https://a.com/doc.html">n</a>'
    )
    assert textkit.extract_time_datetime(html) == "2024-03-01T10:00:00+00:00"
    links = textkit.discover_media_links(html)
    assert links == ["https://a.com/i.jpg", "https://a.com/v.mp4", "https://a.com/bg.png"]


def test_deletion_detection_parity():
    # platform-specific indicator found in html (first-match-wins order)
    d, ind, src = textkit.detect_deletion("... This Tweet has been deleted ...", None, None, "twitter")
    assert (d, ind, src) == (True, "This Tweet has been deleted", "html_content")
    # case-insensitive
    d, ind, src = textkit.detect_deletion("THIS VIDEO IS PRIVATE", None, None, "youtube")
    assert d and ind == "This video is private"
    # generic-only for unknown platforms
    d, ind, src = textkit.detect_deletion("This Tweet has been deleted", None, None, "unknown")
    assert d is False  # twitter-specific string not in generic set
    d, ind, src = textkit.detect_deletion("content has been removed", None, None, "unknown")
    assert d and ind == "has been removed"
    # title and error sources
    d, _, src = textkit.detect_deletion(None, "Page Not Found", None, "facebook")
    assert d and src == "page_title"
    d, _, src = textkit.detect_deletion(None, None, "err: access denied", "vk")
    assert d and src == "error_message"
    assert textkit.detect_deletion("all fine", "ok", "", "twitter")[0] is False


def test_indicator_tables_match_reference_counts():
    # table sizes pinned to ref:utils/deletion_detection.py:24-107
    sizes = {k: len(v) for k, v in textkit.DELETION_INDICATORS.items()}
    assert sizes == {
        "twitter": 8,
        "facebook": 7,
        "instagram": 5,
        "tiktok": 5,
        "youtube": 7,
        "reddit": 6,
        "vk": 4,
        "telegram": 3,
    }
    assert len(textkit.GENERIC_DELETION_INDICATORS) == 5


def test_lang_id():
    assert textkit.lang_id("the cat and the dog went to the house") == "en"
    assert textkit.lang_id("la casa de la madre es muy grande y no lo se") == "es"
    assert textkit.lang_id("и в не на я что с как она так") == "ru"
    assert textkit.lang_id("") == "und"
    assert textkit.lang_id("zzz qqq xxx") == "und"


def test_tokens_and_quality():
    assert textkit.ws_token_count("a b  c") == 3
    assert textkit.bpe_token_count("hello world") == 2
    assert textkit.bpe_token_count("it's fine, really 123") > 4
    f = textkit.quality_features("The quick brown fox jumps over the lazy dog.")
    assert f["n_words"] == 9 and 0 < f["stopword_ratio"] < 1
    assert 0.0 <= textkit.quality_score("short") <= 1.0
    assert textkit.quality_score("The quick brown fox jumps over the lazy dog and runs away.") > 0.7


def test_fingerprint_deterministic():
    t = "some document text for fingerprinting purposes with enough length"
    f1 = textkit.winnow_fingerprint(t)
    f2 = textkit.winnow_fingerprint(t)
    assert f1 == f2 and len(f1) > 0
    assert textkit.winnow_fingerprint("ab") == []
    # near-dup texts share most fingerprint values
    g = textkit.winnow_fingerprint(t + " extra tail")
    inter = len(set(f1) & set(g))
    assert inter / len(f1) > 0.5


def test_minhash_and_jaccard():
    a = textkit.word_shingles("the quick brown fox jumps over the lazy dog every day", 3)
    b = textkit.word_shingles("the quick brown fox jumps over the lazy cat every day", 3)
    sa = textkit.minhash_signature(a, 128)
    sb = textkit.minhash_signature(b, 128)
    assert sa.shape == (128,) and sa.dtype == np.uint64
    est = float((sa == sb).mean())
    true_j = textkit.jaccard(a, b)
    assert abs(est - true_j) < 0.25
    assert (textkit.minhash_signature(a, 128) == sa).all()  # deterministic
    bands = textkit.minhash_bands(sa, 16)
    assert len(bands) == 16 and bands == textkit.minhash_bands(sa, 16)


def test_simhash():
    h1 = textkit.simhash64("the quick brown fox jumps over the lazy dog")
    h2 = textkit.simhash64("the quick brown fox jumps over the lazy cat")
    h3 = textkit.simhash64("completely different words entirely unrelated content")
    assert 0 <= h1 < 2**64
    assert textkit.hamming64(h1, h2) < textkit.hamming64(h1, h3)
    assert textkit.simhash64("") == 0


def test_discover_page_links_vs_media_links():
    """page_links = absolute http(s) anchor hrefs that are NOT media files;
    media extensions route to discover_media_links instead; first occurrence
    wins; relative/other-scheme hrefs dropped."""
    from auto_archiver_ray.functions.textkit import discover_media_links, discover_page_links

    html = (
        '<a href="https://a.com/page1">x</a>'
        '<a href="https://a.com/img/p.jpg">media not page</a>'
        '<img src="https://a.com/img/q.png">'
        '<a href="/relative">no</a>'
        '<a href="ftp://a.com/f">no</a>'
        '<a href="https://a.com/page1">dup</a>'
        "<a href='https://b.org/page2?x=1'>y</a>"
    )
    assert discover_page_links(html) == ["https://a.com/page1", "https://b.org/page2?x=1"]
    assert discover_media_links(html) == ["https://a.com/img/p.jpg", "https://a.com/img/q.png"]
    assert discover_page_links(html.encode()) == discover_page_links(html)


def test_extract_anchor_texts():
    from auto_archiver_ray.functions.textkit import extract_anchor_texts

    html = (
        b'<html><body><a href="https://a.com/x">first <b>bold</b>\n link</a>'
        b"<a href='/relative'>rel</a>"
        b'<a class="c" href="https://b.org/v.mp4">watch the video</a>'
        b'<a href="https://a.com/x">first again</a>'
        b'<img src="https://a.com/pic.jpg"></body></html>'
    )
    got = extract_anchor_texts(html)
    # relative hrefs dropped; duplicates and media targets KEPT;
    # inner tags stripped and whitespace collapsed; img not an anchor
    assert got == [
        ("https://a.com/x", "first bold link"),
        ("https://b.org/v.mp4", "watch the video"),
        ("https://a.com/x", "first again"),
    ]


def test_extract_anchor_texts_empty_and_str_input():
    from auto_archiver_ray.functions.textkit import extract_anchor_texts

    assert extract_anchor_texts(b"<p>no links</p>") == []
    assert extract_anchor_texts('<a href="https://x.io/">t</a>') == [("https://x.io/", "t")]


def test_levenshtein_bytes_matches_duckdb_property():
    """levenshtein_bytes is the exact twin of DuckDB levenshtein() —
    300 random cases across ASCII + multibyte alphabets (DuckDB's function
    is BYTE-level: 'é' counts as two edits against 'e'), plus the textbook
    cases and both degenerate empties."""
    import random

    import duckdb

    from auto_archiver_ray.functions.textkit import levenshtein_bytes

    con = duckdb.connect()
    assert levenshtein_bytes(b"kitten", b"sitting") == 3
    assert levenshtein_bytes(b"", b"abc") == 3 and levenshtein_bytes(b"abc", b"") == 3
    assert levenshtein_bytes(b"", b"") == 0
    rng = random.Random(7)
    for _ in range(300):
        a = "".join(rng.choice("abcde é漢") for _ in range(rng.randint(0, 40)))
        b = "".join(rng.choice("abcde é漢") for _ in range(rng.randint(0, 40)))
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        got = levenshtein_bytes(a.encode("utf-8"), b.encode("utf-8"))
        assert got == want, (a, b, got, want)
    con.close()

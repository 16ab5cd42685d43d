"""HTML + text kernels: extraction, deletion detection, media-link discovery,
language ID, quality scoring, tokenization, fingerprinting, sketches.

Parity targets:
- HTML → text/title extraction is the pipeline's byte-identical per-url
  invariant (BASELINE.json input_hint). The reference extracts page text via
  platform parsers / WACZ pages.jsonl (ref:modules/wacz_extractor_enricher/
  wacz_extractor_enricher.py:156-173) and titles via <title>/BeautifulSoup
  (ref:modules/telegram_extractor/telegram_extractor.py:30-37); here the
  extraction algorithm is a pinned deterministic pure-Python kernel
  (see ``extract_text``) so retried Ray tasks reproduce identical bytes.
- Deletion detection mirrors ref:utils/deletion_detection.py:18-226 —
  indicator tables and first-match-wins scan order are reproduced exactly.
- Media-link discovery mirrors the DOM-scrape half of the antibot extractor
  (ref:modules/antibot_extractor_enricher/antibot_extractor_enricher.py:299-331)
  and WACZ media enumeration (ref:modules/wacz_extractor_enricher/
  wacz_extractor_enricher.py:176-266): collect src/href candidates, filter by
  :func:`auto_archiver_ray.functions.urlkit.is_relevant_url`.

Text-analysis additions (training-data pipeline ops; no reference
counterpart): langid heuristic, quality scoring, token counting, winnowing
fingerprints, MinHash / SimHash sketches. All deterministic (fixed seeds).
"""

from __future__ import annotations

import hashlib
import html as _htmllib
import re

import numpy as np

# ---------------------------------------------------------------------------
# HTML → text extraction (the pinned invariant kernel)
# ---------------------------------------------------------------------------

_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")
_TITLE_RE = re.compile(r"<title\b[^>]*>(.*?)</title\s*>", re.IGNORECASE | re.DOTALL)


def extract_text(html_bytes: bytes | str) -> str:
    """Deterministic HTML → visible-text extraction.

    Pinned algorithm (any change breaks the byte-identical invariant):
    1. decode UTF-8 (replacement chars for bad bytes)
    2. drop <script>/<style> elements and HTML comments
    3. strip all remaining tags
    4. unescape HTML entities
    5. collapse all whitespace runs to single spaces; strip ends
    """
    text = html_bytes.decode("utf-8", errors="replace") if isinstance(html_bytes, bytes) else html_bytes
    text = _SCRIPT_STYLE_RE.sub(" ", text)
    text = _COMMENT_RE.sub(" ", text)
    text = _TAG_RE.sub(" ", text)
    text = _htmllib.unescape(text)
    return _WS_RE.sub(" ", text).strip()


def extract_title(html_bytes: bytes | str) -> str:
    """First <title> element's text, entity-unescaped, whitespace-collapsed."""
    text = html_bytes.decode("utf-8", errors="replace") if isinstance(html_bytes, bytes) else html_bytes
    m = _TITLE_RE.search(text)
    if not m:
        return ""
    return _WS_RE.sub(" ", _htmllib.unescape(m.group(1))).strip()


_TIME_DATETIME_RE = re.compile(r"<time\b[^>]*\bdatetime=[\"']([^\"']+)[\"']", re.IGNORECASE)


def extract_time_datetime(html_bytes: bytes | str) -> str:
    """datetime attribute of the first <time> element ('' if absent).

    Parity: the telegram extractor's timestamp source
    (ref:modules/telegram_extractor/telegram_extractor.py:36-37)."""
    text = html_bytes.decode("utf-8", errors="replace") if isinstance(html_bytes, bytes) else html_bytes
    m = _TIME_DATETIME_RE.search(text)
    return m.group(1) if m else ""


# src/href attributes plus css url(...) references (telegram photo wraps,
# ref:modules/telegram_extractor/telegram_extractor.py:42-48).
_SRC_HREF_RE = re.compile(r"(?:src|href)=[\"']([^\"']+)[\"']", re.IGNORECASE)
_CSS_URL_RE = re.compile(r"url\(([^)]+)\)")
_MEDIA_EXT_RE = re.compile(
    r"\.(?:jpe?g|png|gif|webp|bmp|tiff?|mp4|webm|mov|avi|mkv|mp3|ogg|wav|flac|m4a|pdf|svg|ico|m3u8|mpd|ism)(?:$|\?)",
    re.IGNORECASE,
)


def discover_media_links(html_bytes: bytes | str) -> list[str]:
    """All absolute http(s) media-file URLs referenced by the page, in
    document order, de-duplicated (first occurrence wins — the WACZ
    seen-url-set semantics, ref:modules/wacz_extractor_enricher/
    wacz_extractor_enricher.py:201-263). Relevance filtering is the
    caller's job (``urlkit.is_relevant_url``)."""
    text = html_bytes.decode("utf-8", errors="replace") if isinstance(html_bytes, bytes) else html_bytes
    seen: set[str] = set()
    out: list[str] = []
    for rx in (_SRC_HREF_RE, _CSS_URL_RE):
        for raw in rx.findall(text):
            u = raw.strip("'\" ")
            if not u.startswith(("http://", "https://")):
                continue
            if not _MEDIA_EXT_RE.search(u):
                continue
            if u in seen:
                continue
            seen.add(u)
            out.append(u)
    return out


# ---------------------------------------------------------------------------
# Shared page scan — the extract hot path. The page is DECODED ONCE and
# every per-page scalar the parser chain needs is computed in one place
# over the decoded string; parsers share the result instead of re-decoding
# and re-scanning per kernel (measured: 4 decodes + repeated passes were
# ~25% of extract_one on sparse pages). A fully fused single-alternation
# scanner was tried and REJECTED: on link-dense pages the Python-level
# per-match dispatch costs more than the extra C-level passes it saves
# (26.6 vs 21.5 µs/page on the bench corpus) — the original single-pattern
# kernels scan at C speed with literal-prefix skipping.
# ---------------------------------------------------------------------------

_DURATION_RE = re.compile(r"<time\b[^>]*>([0-9:.]+)</time\s*>", re.IGNORECASE)


def extract_text_str(decoded: str) -> str:
    """:func:`extract_text` over an already-decoded string (same sequential
    strip passes — byte-identical by construction)."""
    return extract_text(decoded)


_A_HREF_RE = re.compile(r"<a\b[^>]*?href=[\"']([^\"']+)[\"']", re.IGNORECASE)

_A_TAG_RE = re.compile(
    r"<a\b[^>]*?href=[\"']([^\"']+)[\"'][^>]*>(.*?)</a>", re.IGNORECASE | re.DOTALL
)
_INNER_TAG_RE = re.compile(r"<[^>]+>")


def extract_anchor_texts(html_bytes: bytes | str) -> list[tuple[str, str]]:
    """(href, visible anchor text) pairs for absolute http(s) anchors, in
    document order — the anchor-text half of link discovery (anchor text is
    the classic off-page relevance/spam signal an inlink index aggregates
    per target). Inner tags stripped, whitespace collapsed; unlike
    :func:`discover_page_links` duplicates are KEPT (each inlink edge
    carries its own text) and media-extension targets are kept too (an
    anchor to a video is still an editorial label for it)."""
    text = (
        html_bytes.decode("utf-8", errors="replace")
        if isinstance(html_bytes, bytes)
        else html_bytes
    )
    out: list[tuple[str, str]] = []
    for href, inner in _A_TAG_RE.findall(text):
        u = href.strip("'\" ")
        if not u.startswith(("http://", "https://")):
            continue
        label = " ".join(_INNER_TAG_RE.sub(" ", inner).split())
        out.append((u, label))
    return out


def discover_page_links(html_bytes: bytes | str) -> list[str]:
    """Absolute http(s) anchor hrefs that are NOT media files — the
    frontier-feed half of link discovery (the BFS crawl's next-hop URLs),
    complementing :func:`discover_media_links`. First occurrence wins, in
    document order. Reference behavior: the antibot/WACZ extractors collect
    page links for new fetches (ref:modules/wacz_extractor_enricher/
    wacz_extractor_enricher.py:176-266)."""
    text = html_bytes.decode("utf-8", errors="replace") if isinstance(html_bytes, bytes) else html_bytes
    seen: set[str] = set()
    out: list[str] = []
    for raw in _A_HREF_RE.findall(text):
        u = raw.strip("'\" ")
        if not u.startswith(("http://", "https://")):
            continue
        if _MEDIA_EXT_RE.search(u):
            continue
        if u in seen:
            continue
        seen.add(u)
        out.append(u)
    return out


def scan_html(html_bytes: bytes | str) -> dict:
    """One decode, then the original kernels over the decoded string:
    ``{html_str, title, time_datetime, time_content, media_links,
    page_links}``. Byte-identical with calling each kernel on the raw bytes
    (they accept str input unchanged); pinned by tests/test_extract.py and
    the q_pages_extract_text oracle."""
    text = (
        html_bytes.decode("utf-8", errors="replace")
        if isinstance(html_bytes, bytes)
        else html_bytes
    )
    m = _DURATION_RE.search(text)
    return {
        "html_str": text,
        "title": extract_title(text),
        "time_datetime": extract_time_datetime(text),
        "time_content": m.group(1) if m else None,
        "media_links": discover_media_links(text),
        "page_links": discover_page_links(text),
    }


# ---------------------------------------------------------------------------
# Deletion detection — indicator tables per ref:utils/deletion_detection.py
# ---------------------------------------------------------------------------

DELETION_INDICATORS: dict[str, list[str]] = {
    # ref:utils/deletion_detection.py:24-33
    "twitter": [
        "Hmm...this page doesn't exist",
        "Try searching for something else",
        "This Tweet is unavailable",
        "This account doesn't exist",
        "This Tweet has been deleted",
        "This account has been suspended",
        "Sorry, that page doesn't exist",
        "The Tweet you're looking for isn't available",
    ],
    # ref:utils/deletion_detection.py:36-44
    "facebook": [
        "This content isn't available",
        "Sorry, this content isn't available",
        "This content is no longer available",
        "The link you followed may be broken",
        "Page Not Found",
        "Content Not Found",
        "This content is no longer on Facebook",
    ],
    # ref:utils/deletion_detection.py:47-53
    "instagram": [
        "Sorry, this page isn't available",
        "The link you followed may be broken",
        "Media not found or unavailable",
        "This post is no longer available",
        "This account is private",
    ],
    # ref:utils/deletion_detection.py:56-62
    "tiktok": [
        "Couldn't find this account",
        "This video is no longer available",
        "This video is currently unavailable",
        "Video not found",
        "This video may have been deleted",
    ],
    # ref:utils/deletion_detection.py:65-73
    "youtube": [
        "This video isn't available anymore",
        "Video unavailable",
        "This video has been removed",
        "This video is no longer available",
        "This video is private",
        "This video has been removed by the uploader",
        "This video has been deleted",
    ],
    # ref:utils/deletion_detection.py:76-83
    "reddit": [
        "this post has been removed",
        "this comment has been removed",
        "[removed]",
        "[deleted]",
        "page not found",
        "there doesn't seem to be anything here",
    ],
    # ref:utils/deletion_detection.py:86-91
    "vk": [
        "Post deleted",
        "Page not found",
        "Content unavailable",
        "Access denied",
    ],
    # ref:utils/deletion_detection.py:94-98
    "telegram": [
        "Message not found",
        "Deleted message",
        "Channel is private",
    ],
}

# ref:utils/deletion_detection.py:101-107
GENERIC_DELETION_INDICATORS: list[str] = [
    "has been removed",
    "no longer available",
    "content removed",
    "access denied",
    "page not found",
]


def indicators_for_platform(platform: str) -> list[str]:
    """Platform indicators + generic tail, or all platforms + generic for
    unknown. Scan order matters (first match wins) and mirrors
    ref:utils/deletion_detection.py:109-139."""
    if platform in DELETION_INDICATORS:
        return DELETION_INDICATORS[platform] + GENERIC_DELETION_INDICATORS
    return GENERIC_DELETION_INDICATORS


# (indicators, lowered) per platform, built once — detect_deletion runs per
# row in the hot extract stage
_INDICATOR_CACHE: dict[str, tuple[list[str], list[str]]] = {}


def _indicator_pairs(platform: str) -> tuple[list[str], list[str]]:
    pair = _INDICATOR_CACHE.get(platform)
    if pair is None:
        inds = indicators_for_platform(platform)
        pair = (inds, [i.lower() for i in inds])
        _INDICATOR_CACHE[platform] = pair
    return pair


def detect_deletion(
    html_text: str | None,
    page_title: str | None,
    error_message: str | None,
    platform: str,
) -> tuple[bool, str, str]:
    """(is_deleted, indicator, source) — case-insensitive substring scan of
    html then title then error, first match wins.
    Parity: ref:utils/deletion_detection.py:142-226 (video-metadata branch
    omitted: no yt-dlp in this engine's data plane)."""
    indicators, lowered = _indicator_pairs(platform)
    for source, blob in (
        ("html_content", html_text),
        ("page_title", page_title),
        ("error_message", error_message),
    ):
        if not blob:
            continue
        low = blob.lower()
        for ind, ind_low in zip(indicators, lowered):
            if ind_low in low:
                return True, ind, source
    return False, "", ""


# ---------------------------------------------------------------------------
# Language ID (stopword-profile heuristic, deterministic)
# ---------------------------------------------------------------------------

_LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the of and to in is that it was for on are with as his they at be this have from".split()),
    "es": frozenset("de la que el en y a los del se las por un para con no una su al es lo".split()),
    "fr": frozenset("de la le et les des en un du une que est pour qui dans a par plus pas au".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf für ist im dem nicht ein".split()),
    "ru": frozenset("и в не на я что с со как а то все она так его но да ты к у же".split()),
    "pt": frozenset("de a o que e do da em um para é com não uma os no se na por mais".split()),
}

_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


def lang_id(text: str) -> str:
    """Best-guess language code by stopword hit-rate; 'und' when nothing hits.
    Ties break by language-code sort order for determinism."""
    words = [w.lower() for w in _WORD_RE.findall(text)]
    if not words:
        return "und"
    best_lang, best_hits = "und", 0
    for code in sorted(_LANG_STOPWORDS):
        hits = sum(1 for w in words if w in _LANG_STOPWORDS[code])
        if hits > best_hits:
            best_lang, best_hits = code, hits
    return best_lang if best_hits > 0 else "und"


# ---------------------------------------------------------------------------
# Quality scoring + token counting
# ---------------------------------------------------------------------------

_BPEISH_RE = re.compile(
    r"""'(?:s|t|re|ve|m|ll|d)| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+(?!\S)|\s+""", re.UNICODE
)


def ws_token_count(text: str) -> int:
    """Whitespace token count (non-empty tokens)."""
    return len(text.split())


def bpe_token_count(text: str) -> int:
    """GPT-2-style pre-tokenizer regex token count (public BPE split
    pattern) — a cheap proxy for model token cost."""
    return len(_BPEISH_RE.findall(text))


def quality_features(text: str) -> dict[str, float]:
    """Deterministic quality features for a document (C4/Gopher-style
    rule inputs): char/word counts, mean word length, stopword/punct/digit/
    upper ratios."""
    n_chars = len(text)
    words = text.split()
    n_words = len(words)
    alpha_words = [w.lower().strip(".,!?;:\"'()[]") for w in words]
    en_stop = _LANG_STOPWORDS["en"]
    stop_hits = sum(1 for w in alpha_words if w in en_stop)
    n_punct = sum(1 for c in text if c in ".,!?;:\"'()[]{}-")
    n_digit = sum(1 for c in text if c.isdigit())
    n_upper = sum(1 for c in text if c.isupper())
    mean_wl = (sum(len(w) for w in words) / n_words) if n_words else 0.0
    return {
        "n_chars": float(n_chars),
        "n_words": float(n_words),
        "mean_word_len": mean_wl,
        "stopword_ratio": (stop_hits / n_words) if n_words else 0.0,
        "punct_ratio": (n_punct / n_chars) if n_chars else 0.0,
        "digit_ratio": (n_digit / n_chars) if n_chars else 0.0,
        "upper_ratio": (n_upper / n_chars) if n_chars else 0.0,
    }


def quality_score(text: str) -> float:
    """Composite [0,1] quality score from :func:`quality_features`
    (Gopher-rule-shaped: penalize too-short/too-long words, low stopword
    ratio, heavy punctuation/digits)."""
    f = quality_features(text)
    score = 1.0
    if f["n_words"] < 5:
        score -= 0.5
    if not (3.0 <= f["mean_word_len"] <= 10.0):
        score -= 0.2
    if f["stopword_ratio"] < 0.05:
        score -= 0.2
    if f["punct_ratio"] > 0.2:
        score -= 0.2
    if f["digit_ratio"] > 0.3:
        score -= 0.2
    if f["upper_ratio"] > 0.3:
        score -= 0.1
    return max(0.0, min(1.0, score))


# ---------------------------------------------------------------------------
# Fingerprints & sketches (dedup building blocks)
# ---------------------------------------------------------------------------

_H64_MASK = (1 << 64) - 1


def _hash64(data: bytes) -> int:
    """Stable 64-bit hash (first 8 bytes of blake2b, little-endian)."""
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")


def kgram_hashes(text: str, k: int = 5) -> np.ndarray:
    """64-bit hashes of all character k-grams (uint64 array; empty if
    len(text) < k)."""
    n = len(text) - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    return np.fromiter(
        (_hash64(text[i : i + k].encode("utf-8")) for i in range(n)),
        dtype=np.uint64,
        count=n,
    )


def winnow_fingerprint(text: str, k: int = 5, window: int = 4) -> list[int]:
    """Winnowing document fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    min k-gram hash per sliding window, deduplicated, sorted. Deterministic."""
    h = kgram_hashes(text, k)
    if h.size == 0:
        return []
    if h.size <= window:
        return [int(h.min())]
    sw = np.lib.stride_tricks.sliding_window_view(h, window)
    return sorted({int(x) for x in sw.min(axis=1)})


def word_shingles(text: str, n: int = 3) -> np.ndarray:
    """64-bit hashes of lowercase word n-gram shingles (uint64)."""
    words = text.lower().split()
    count = max(0, len(words) - n + 1)
    if count == 0:
        if not words:
            return np.empty(0, dtype=np.uint64)
        return np.asarray([_hash64(" ".join(words).encode("utf-8"))], dtype=np.uint64)
    return np.fromiter(
        (_hash64(" ".join(words[i : i + n]).encode("utf-8")) for i in range(count)),
        dtype=np.uint64,
        count=count,
    )


# Fixed affine permutation parameters for MinHash (derived from a seeded PCG
# so every worker computes identical signatures).
_MINHASH_PRIME = np.uint64((1 << 61) - 1)


def _minhash_params(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.Generator(np.random.PCG64(20260817))
    a = rng.integers(1, 1 << 61, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, 1 << 61, size=num_perm, dtype=np.uint64)
    return a, b


_MINHASH_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def minhash_signature(shingle_hashes: np.ndarray, num_perm: int = 128) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) over a shingle-hash set using
    affine permutations mod 2^61-1 (Broder '97). Empty input → all-max
    sentinel signature."""
    if num_perm not in _MINHASH_CACHE:
        _MINHASH_CACHE[num_perm] = _minhash_params(num_perm)
    a, b = _MINHASH_CACHE[num_perm]
    if shingle_hashes.size == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    # (num_perm, n) affine transform in python-int space is slow; use
    # uint64 wrap-around multiply then mod the Mersenne prime via numpy
    # object-free arithmetic: (a*h + b) mod p with p = 2^61-1 done in uint64
    # (wrap-around introduces no collisions in practice and is deterministic).
    h = shingle_hashes[None, :]  # (1, n)
    vals = (a[:, None] * h + b[:, None]) % _MINHASH_PRIME
    return vals.min(axis=1).astype(np.uint64)


def minhash_bands(sig: np.ndarray, num_bands: int = 16) -> list[int]:
    """LSH band keys: hash of each contiguous signature band (uint64 ints)."""
    rows = sig.size // num_bands
    out = []
    for b in range(num_bands):
        band = sig[b * rows : (b + 1) * rows]
        out.append(_hash64(band.tobytes() + bytes([b])))
    return out


def simhash64(text: str) -> int:
    """64-bit SimHash (Charikar '02) over lowercase word-unigram hashes."""
    words = text.lower().split()
    if not words:
        return 0
    hashes = np.fromiter((_hash64(w.encode("utf-8")) for w in words), dtype=np.uint64, count=len(words))
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    counts = (2 * bits - 1).sum(axis=0)
    return int("".join("1" if c > 0 else "0" for c in counts[::-1]), 2)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard similarity of two shingle-hash sets."""
    sa, sb = set(a.tolist()), set(b.tolist())
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def levenshtein_bytes(a: bytes, b: bytes) -> int:
    """Unit-cost edit distance over raw BYTES — the exact twin of DuckDB's
    ``levenshtein()`` (which operates on the utf-8 byte sequence, not code
    points; verified property-style in tests/test_textkit.py). Vectorized
    Wagner–Fischer: one numpy row per outer character, with the sequential
    insertion chain closed in O(n) via the running-minimum identity
    ``cur[j] = j + min_{k<=j}(x[k] - k)``."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    if lb > la:  # iterate over the longer side, keep the row short
        a, b, la, lb = b, a, lb, la
    bb = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
    idx = np.arange(lb + 1, dtype=np.int64)
    prev = idx.copy()
    for i in range(1, la + 1):
        tmp = np.minimum(prev[1:] + 1, prev[:-1] + (bb != a[i - 1]))
        x = np.concatenate(([np.int64(i)], tmp))
        prev = np.minimum.accumulate(x - idx) + idx
    return int(prev[-1])

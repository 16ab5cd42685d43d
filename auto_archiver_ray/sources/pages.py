"""Deterministic synthetic Common-Crawl-style pages table.

Schema is exactly BASELINE.json's ``input_hint``:
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``.

The generator is a pure function of (num_rows, seed): every process that
generates the same (rows, seed) produces byte-identical Parquet content, so
oracle SQL (DuckDB reading the same file) and Ray pipelines agree. The
``text`` column is produced by the pinned extraction kernel
(:func:`auto_archiver_ray.functions.textkit.extract_text`) applied to the
generated ``html`` — the pipeline's byte-identical per-url invariant —
while dedicated golden tests in tests/test_textkit.py pin the kernel itself.

Feature mix (FIXTURES.md F1):
- hosts Zipf-skewed over ~50 synthetic domains + platform-shaped domains
  (t.me, twitter.com, youtube.com, reddit.com, vk.com, instagram.com) so
  host-partition skew and platform routing are exercised;
- ~3% of urls carry tracker params (utm_*/fbclid/gclid);
- ~2% invalid urls (non-http scheme, localhost, private-IP literal);
- ~2% of pages embed a platform-appropriate deletion indicator;
- ~2% exact-duplicate html payloads under different urls (content dedup);
- ~3% near-duplicate texts (one sentence changed) for MinHash/SimHash.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions import textkit

PAGES_SEED = 20260817

SYNTH_HOSTS = [f"site{i:02d}.example.org" for i in range(44)]
PLATFORM_HOSTS = ["t.me", "twitter.com", "youtube.com", "reddit.com", "vk.com", "instagram.com"]
ALL_HOSTS = SYNTH_HOSTS + PLATFORM_HOSTS

_WORDS = {
    "en": (
        "the of and to in is that it was for on are with as his they at be this have "
        "from or one had by word but not what all were when your can said there use "
        "each which she how their will other about out many then them these some her "
        "would make like him into time has look two more write go see number way could "
        "people my than first water been call who oil its now find long down day did "
        "get come made may part over new sound take only little work know place year"
    ).split(),
    "es": (
        "de la que el en y a los del se las por un para con no una su al es lo como "
        "más pero sus le ya o fue este ha sí porque esta son entre cuando muy sin "
        "sobre ser tiene también me hasta hay donde quien desde todo nos durante todos "
        "uno les ni contra otros ese eso ante ellos e esto mí antes algunos qué unos"
    ).split(),
    "ru": (
        "и в не на я что с со как а то все она так его но да ты к у же вы за бы по "
        "только ее мне было вот от меня еще нет о из ему теперь когда даже ну вдруг "
        "ли если уже или ни быть был него до вас нибудь опять уж вам ведь там потом"
    ).split(),
}
_LANGS = ["en", "es", "ru"]


def _sentence(rng: np.random.Generator, lang: str, n_words: int) -> str:
    pool = _WORDS[lang]
    idx = rng.integers(0, len(pool), size=n_words)
    words = [pool[i] for i in idx]
    return " ".join(words).capitalize() + "."


def _page_html(
    rng: np.random.Generator, row: int, host: str, lang: str
) -> tuple[bytes, str, list[tuple[str, str]]]:
    """Build one page's html; returns (html_bytes, deletion_platform_or_'',
    planted_media) where planted_media is [(media_url, intent)] in document
    order. Intents: photo/video are relevant media; favicon/logo/profile are
    planted to exercise the relevance filter (is_relevant_url drops them).
    The intent list is GENERATOR GROUND TRUTH — the independent serial
    derivation of the media plan (scripts/golden_serial.py:media_plan_serial)
    starts from it, not from parsing the html."""
    title = _sentence(rng, lang, int(rng.integers(3, 8)))[:-1]
    n_paras = int(rng.integers(1, 5))
    paras = [_sentence(rng, lang, int(rng.integers(8, 40))) for _ in range(n_paras)]

    # Deletion indicator in ~2% of pages, platform-matched.
    from ..functions.urlkit import platform_for_url
    deleted = ""
    if rng.random() < 0.02:
        platform = platform_for_url(f"https://{host}/")
        pool = (
            textkit.DELETION_INDICATORS.get(platform)
            or textkit.GENERIC_DELETION_INDICATORS
        )
        paras.append(pool[int(rng.integers(0, len(pool)))] + ".")
        deleted = platform

    ts_attr = ""
    if rng.random() < 0.5:
        ts_attr = f'<time datetime="2024-0{int(rng.integers(1,10))}-1{int(rng.integers(0,10))}T0{int(rng.integers(0,10))}:00:00+00:00">posted</time>'

    media_bits = []
    planted: list[tuple[str, str]] = []
    if rng.random() < 0.6:
        u = f"https://{host}/img/photo-{row}-1280x720.jpg"
        media_bits.append(f'<img src="{u}">')
        planted.append((u, "photo"))
    if rng.random() < 0.2:
        u = f"https://cdn.{host}/v/clip{row}.mp4"
        media_bits.append(f'<video src="{u}"></video>')
        planted.append((u, "video"))
    if rng.random() < 0.3:  # irrelevant media: filtered by is_relevant_url
        u1 = f"https://{host}/favicon.ico"
        u2 = f"https://{host}/logo.svg"
        media_bits.append(f'<link href="{u1}"><img src="{u2}">')
        planted.append((u1, "favicon"))
        planted.append((u2, "logo"))
    if rng.random() < 0.1:
        u = "https://pbs.twimg.com/profile_images/u/x_400x400.jpg"
        media_bits.append(f'<img src="{u}">')
        planted.append((u, "profile"))

    body = "".join(f"<p>{p}</p>" for p in paras)
    html = (
        f"<html><head><title>{title}</title>"
        f"<style>body{{margin:0}}</style>"
        f"<script>var x={row};</script></head>"
        f"<body><h1>{title}</h1>{ts_attr}{body}{''.join(media_bits)}"
        f"<!-- gen row {row} --></body></html>"
    )
    return html.encode("utf-8"), deleted, planted


def generate_pages(
    num_rows: int, seed: int = PAGES_SEED, return_media: bool = False
) -> pa.Table | tuple[pa.Table, pa.Table]:
    """With ``return_media=True`` also returns the planted-media sidecar
    table ``(url, media_url, intent, pos)`` — one row per media link the
    generator wrote into a page's html (duplicate-content pages inherit the
    copied page's links; near-duplicate pages carry none). The sidecar is
    independent ground truth for the media-plan golden oracle; the RNG draw
    sequence and html bytes are identical either way."""
    rng = np.random.Generator(np.random.PCG64(seed))
    # Zipf-skewed host choice (bounded, mapped onto the host list).
    zipf_ranks = np.minimum(rng.zipf(1.3, size=num_rows), len(ALL_HOSTS)) - 1
    base_ts = datetime(2024, 1, 1)

    urls: list[str] = []
    htmls: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []
    ts: list[datetime] = []

    # (html, text, lang, planted_media) for exact dups — a dup page copies
    # the original's html, so it references the ORIGINAL's media urls
    dup_pool: list[tuple[bytes, str, str, list[tuple[str, str]]]] = []
    near_pool: list[tuple[str, str, str]] = []  # (host, text, lang)
    media_rows: list[tuple[str, str, str, int]] = []  # (url, media_url, intent, pos)

    for row in range(num_rows):
        host = ALL_HOSTS[int(zipf_ranks[row])]
        lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
        r = rng.random()

        url = f"https://{host}/p/{row}"
        if r < 0.02:  # invalid: non-http scheme
            url = f"ftp://{host}/p/{row}"
        elif r < 0.03:
            url = f"https://localhost/p/{row}"
        elif r < 0.04:
            url = f"https://192.168.{row % 256}.{(row * 7) % 256}/p/{row}"
        elif r < 0.07:  # tracker params
            url = f"https://{host}/p/{row}?utm_source=feed&utm_campaign=c{row % 5}&id={row}"
        elif r < 0.09:
            url = f"https://{host}/p/{row}?fbclid=abc{row}&ref=share"

        planted: list[tuple[str, str]] = []
        if dup_pool and rng.random() < 0.02:  # exact duplicate content
            html, text, lang, planted = dup_pool[int(rng.integers(0, len(dup_pool)))]
        elif near_pool and rng.random() < 0.03:  # near duplicate
            _, base_text, lang = near_pool[int(rng.integers(0, len(near_pool)))]
            extra = _sentence(rng, lang, 6)
            html_s = f"<html><head><title>near dup {row}</title></head><body><p>{base_text}</p><p>{extra}</p></body></html>"
            html = html_s.encode("utf-8")
            text = textkit.extract_text(html)
        else:
            html, _, planted = _page_html(rng, row, host, lang)
            text = textkit.extract_text(html)
            if len(dup_pool) < 50 and rng.random() < 0.1:
                dup_pool.append((html, text, lang, planted))
            if len(near_pool) < 50 and rng.random() < 0.1:
                near_pool.append((host, " ".join(text.split()[:40]), lang))
        if return_media:
            for pos, (mu, intent) in enumerate(planted):
                media_rows.append((url, mu, intent, pos))

        urls.append(url)
        htmls.append(html)
        texts.append(text)
        langs.append(lang)
        ts.append(base_ts + timedelta(seconds=row * 13))

    tbl = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    if not return_media:
        return tbl
    sidecar = pa.table(
        {
            "url": pa.array([r[0] for r in media_rows], pa.string()),
            "media_url": pa.array([r[1] for r in media_rows], pa.string()),
            "intent": pa.array([r[2] for r in media_rows], pa.string()),
            "pos": pa.array([r[3] for r in media_rows], pa.int32()),
        }
    )
    return tbl, sidecar


# rows per sf directory name (keyed by basename of the testdata dir)
SF_ROWS = {"sf0.001": 300, "sf0.01": 3000, "sf0.1": 100_000, "bench": 1_200_000, "bench2x": 2_400_000, "bench4x": 4_800_000}


# rows per output file — many files so Ray's read parallelizes per file
# (a single parquet file is decoded by ONE read task regardless of row
# groups; measured as the serial floor of the whole pipeline)
ROWS_PER_FILE = 12_500


def pages_path(sf_dir: str) -> str:
    """Directory holding the sf's pages part files."""
    sf = os.path.basename(os.path.normpath(sf_dir))
    rows = SF_ROWS.get(sf, 3000)
    return f"/tmp/aar_pages/{sf}_r{rows}_v2"


def pages_glob(sf_dir: str) -> str:
    """Glob usable inside DuckDB's read_parquet(...)."""
    return f"{pages_path(sf_dir)}/*.parquet"


def ensure_pages(sf_dir: str) -> str:
    """Idempotently materialize the pages table for an sf dir; returns the
    directory path. Atomic (build in tmp dir + rename) for concurrent callers.
    """
    path = pages_path(sf_dir)
    if os.path.isdir(path):
        return path
    sf = os.path.basename(os.path.normpath(sf_dir))
    rows = SF_ROWS.get(sf, 3000)
    tbl = generate_pages(rows)
    tmp = f"{path}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    num_files = max(1, (rows + ROWS_PER_FILE - 1) // ROWS_PER_FILE)
    step = (rows + num_files - 1) // num_files
    for i in range(num_files):
        part = tbl.slice(i * step, step)
        if part.num_rows:
            pq.write_table(part, f"{tmp}/part-{i:05d}.parquet", row_group_size=4096)
    try:
        os.rename(tmp, path)
    except OSError:  # concurrent builder won the race
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return path


def read_pages(sf_dir: str, columns: list[str] | None = None):
    """ray.data.Dataset over the sf's pages table (column-pruned read)."""
    import ray.data as rd

    return rd.read_parquet(ensure_pages(sf_dir), columns=columns)


# ---------------------------------------------------------------------------
# BFS link-tree corpus — the multi-hop "web" for the full crawl loop
# ---------------------------------------------------------------------------

# seed ranks for the BFS corpus: two mid-tree nodes, so the closure is a
# PROPER subset of the corpus (a root seed would trivially reach everything)
LINKED_SEED_RANKS = (5, 6)

LINKED_TS = datetime(2023, 1, 1, 0, 0, 0)


def linked_pages_path(sf_dir: str) -> str:
    sf = os.path.basename(os.path.normpath(sf_dir))
    rows = SF_ROWS.get(sf, 3000)
    return f"/tmp/aar_pages/{sf}_r{rows}_linked_v2"


def ensure_linked_pages(sf_dir: str) -> tuple[str, list[str]]:
    """Deterministic multi-hop link graph over the sf corpus's DISTINCT
    VALID urls: the url at ascending-sort rank ``r`` anchors to the urls at
    ranks ``2r+1`` and ``2r+2`` (a binary tree), plus one media-noise link
    (to prove page-link/media-link separation in the BFS frontier feed).
    Returns ``(pages_dir, seed_urls)`` with seeds at :data:`LINKED_SEED_RANKS`.

    Derivable independently in SQL — ranks are
    ``row_number() OVER (ORDER BY url) - 1`` over the distinct valid urls
    (ASCII urls: DuckDB binary collation == Python sort) — so the
    q_crawl_bfs oracle re-computes the reachable closure without touching
    this builder."""
    from ..stages.validate import validate_batch

    src = ensure_pages(sf_dir)
    import glob as _glob

    urls_parts = []
    for f in sorted(_glob.glob(f"{src}/*.parquet")):
        urls_parts.append(pq.read_table(f, columns=["url"]).column("url").to_pylist())
    all_urls = [u for part in urls_parts for u in part]
    v = validate_batch(pa.table({"url": all_urls}))
    valid_urls = sorted(
        {u for u, ok in zip(all_urls, v.column("valid").to_pylist()) if ok}
    )
    n = len(valid_urls)
    seeds = [valid_urls[r] for r in LINKED_SEED_RANKS if r < n]

    path = linked_pages_path(sf_dir)
    if os.path.isdir(path):
        return path, seeds

    htmls = []
    texts = []
    for r, u in enumerate(valid_urls):
        kids = [valid_urls[c] for c in (2 * r + 1, 2 * r + 2) if c < n]
        anchors = "".join(f'<a href="{k}">child {i}</a> ' for i, k in enumerate(kids))
        # wording chosen so every page PASSES the Gopher repetition gate
        # (no repeated bigram; >= 10 tokens even for leaves) — the crawl ×
        # webtext composition (q_webtext_from_crawl) gates these texts
        body = f"<p>bfs tree page rank {r} holds body copy for corpus {n}</p>"
        noise = f'<img src="https://cdn.example.org/img/photo-{r}.jpg">'
        html = f"<html><head><title>node {r}</title></head><body>{body}{anchors}{noise}</body></html>"
        htmls.append(html.encode("utf-8"))
        texts.append(textkit.extract_text(html))
    ts = [LINKED_TS] * n
    tbl = pa.table(
        {
            "url": pa.array(valid_urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
        }
    )
    tmp = f"{path}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    num_files = max(1, (n + ROWS_PER_FILE - 1) // ROWS_PER_FILE)
    step = (n + num_files - 1) // num_files
    for i in range(num_files):
        part = tbl.slice(i * step, step)
        if part.num_rows:
            pq.write_table(part, f"{tmp}/part-{i:05d}.parquet", row_group_size=4096)
    try:
        os.rename(tmp, path)
    except OSError:  # concurrent builder won the race
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return path, seeds

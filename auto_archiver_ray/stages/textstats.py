"""Text-analysis stages over a documents table: language ID, quality
scoring, token counting, fingerprinting. Stateless vectorized kernels
wrapping :mod:`auto_archiver_ray.functions.textkit`."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import textkit


def token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    ws = np.asarray([textkit.ws_token_count(t or "") for t in texts], dtype=np.int64)
    bpe = np.asarray([textkit.bpe_token_count(t or "") for t in texts], dtype=np.int64)
    chars = pc.utf8_length(batch.column(text_col)).cast(pa.int64())
    return (
        batch.append_column("n_tokens", pa.array(ws))
        .append_column("n_bpe_tokens", pa.array(bpe))
        .append_column("n_chars_computed", chars)
    )


def lang_id_stage(batch: pa.Table, text_col: str = "text", out_col: str = "lang_guess") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    langs = [textkit.lang_id(t or "") for t in texts]
    return batch.append_column(out_col, pa.array(langs, pa.string()))


def quality_stage(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    feats = [textkit.quality_features(t or "") for t in texts]
    scores = [textkit.quality_score(t or "") for t in texts]
    out = batch
    for name in ("mean_word_len", "stopword_ratio", "punct_ratio", "digit_ratio", "upper_ratio"):
        out = out.append_column(name, pa.array([f[name] for f in feats], pa.float64()))
    return out.append_column("quality_score", pa.array(scores, pa.float64()))


def fingerprint_stage(batch: pa.Table, text_col: str = "text", k: int = 5, window: int = 4) -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    fps = [textkit.winnow_fingerprint(t or "", k, window) for t in texts]
    # store as list<uint64>; also a single rolled-up fingerprint hash for
    # cheap equality grouping
    import hashlib

    roll = [
        hashlib.blake2b(np.asarray(fp, dtype=np.uint64).tobytes(), digest_size=8).hexdigest()
        for fp in fps
    ]
    return batch.append_column(
        "fingerprint", pa.array([[int(x) for x in fp] for fp in fps], pa.list_(pa.uint64()))
    ).append_column("fingerprint_key", pa.array(roll, pa.string()))


# ---------------------------------------------------------------------------
# Training-data hygiene operators (round 3)
# ---------------------------------------------------------------------------


def _word_ngram_strings(text: str, n: int) -> set[str]:
    """Distinct lowercase word n-grams as STRINGS, with the same small-doc
    fallback as textkit.word_shingles (all words joined when 0 < len < n)."""
    words = (text or "").lower().split()
    if not words:
        return set()
    if len(words) < n:
        return {" ".join(words)}
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def decontaminate_flags(ds, bench_fn, id_col: str = "doc_id", text_col: str = "text", n: int = 8, min_overlap: int = 3):
    """Benchmark decontamination: flag corpus docs sharing ≥ ``min_overlap``
    distinct word ``n``-grams with ANY benchmark document — the standard
    eval-set leakage check run before training. Returns a Dataset of
    (doc_id, n_overlap), benchmark rows excluded.

    Scale shape: the benchmark side is SMALL (an eval set), so its distinct
    shingle hashes broadcast once via ray.put as a sorted uint64 array
    (zero-copy per task); the corpus streams through one map_batches doing
    a vectorized sorted-membership intersection per doc — no shuffle at
    all. ``bench_fn`` is a vectorized predicate (int64 id array → bool
    mask) selecting the benchmark rows (e.g. ``lambda ids: ids % 50 == 0``
    — a picklable top-level function in production)."""
    import numpy as np
    import ray

    from ..functions import textkit

    def bench_filter(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        return batch.filter(pa.array(bench_fn(ids)))

    def corpus_filter(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        return batch.filter(pa.array(~bench_fn(ids)))

    parts = [
        np.unique(
            np.concatenate(
                [textkit.word_shingles(t or "", n) for t in b.column(text_col).to_pylist()]
                or [np.empty(0, dtype=np.uint64)]
            )
        )
        for b in ds.map_batches(bench_filter, batch_format="pyarrow")
        .select_columns([text_col])
        .iter_batches(batch_size=4096, batch_format="pyarrow")
    ]
    bench_hashes = np.unique(np.concatenate(parts)) if parts else np.empty(0, dtype=np.uint64)
    ref = ray.put(bench_hashes)

    def overlap_batch(batch: pa.Table) -> pa.Table:
        bh = ray.get(ref)
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_id, out_n = [], []
        for i, t in zip(ids, texts):
            sh = np.unique(textkit.word_shingles(t or "", n))
            if not sh.size or not bh.size:
                continue
            pos = np.searchsorted(bh, sh)
            pos[pos >= len(bh)] = len(bh) - 1
            cnt = int((bh[pos] == sh).sum())
            if cnt >= min_overlap:
                out_id.append(i)
                out_n.append(cnt)
        return pa.table(
            {id_col: pa.array(out_id, pa.int64()), "n_overlap": pa.array(out_n, pa.int64())}
        )

    corpus = ds.map_batches(corpus_filter, batch_format="pyarrow")
    return corpus.map_batches(overlap_batch, batch_format="pyarrow", batch_size=4096)


def ngram_doc_frequency_partials(batch: pa.Table, text_col: str = "text", n: int = 5) -> pa.Table:
    """Per-batch partial document-frequency counts over distinct word
    n-gram STRINGS: one (gram, df) row per gram per batch. A doc lives
    wholly in one batch row, so the per-doc distinct-set dedup is exact;
    finish with grouped_topk / bucketed_group_agg (gram cardinality grows
    with the corpus — never a driver reduce)."""
    from collections import Counter

    texts = batch.column(text_col).to_pylist()
    c: Counter = Counter()
    for t in texts:
        c.update(_word_ngram_strings(t, n))
    return pa.table(
        {
            "gram": pa.array(list(c.keys()), pa.string()),
            "df": pa.array(np.fromiter(c.values(), dtype=np.int64, count=len(c))),
        }
    )


def repetition_stats(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Gopher-style repetition metrics per document (Rae et al. 2021 §A1.1
    repetition filters, re-expressed over whitespace tokens with integer
    thresholds so the distributed result hash-matches a SQL oracle):

    - ``n_tokens``      — whitespace token count
    - ``max_bigram_count`` — occurrences of the single most frequent 2-gram
    - ``rep_trigram_occ``  — total occurrences of 3-grams appearing ≥2×
    - ``keep``          — ``n_tokens >= 10*max_bigram_count AND
                           n_tokens >= 10*rep_trigram_occ``
      (top-bigram token coverage 2*max/n ≤ 0.2 and repeated-trigram
      coverage 3*occ/n ≤ 0.3, cleared of float division)

    Vectorized per doc: tokens → integer codes via ``np.unique``; bigrams
    are ``code[:-1]*K + code[1:]``; trigrams re-encode the bigram codes
    (two-level pairing — no K³ overflow). Stateless, shuffle-free: the
    filter decision streams with the batch at any scale."""
    ids = batch.column(id_col)
    texts = batch.column(text_col).to_pylist()
    n_toks = np.empty(len(texts), dtype=np.int64)
    max_bg = np.zeros(len(texts), dtype=np.int64)
    rep_tg = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = (t or "").split()
        n = len(toks)
        n_toks[i] = n
        if n < 2:
            continue
        _, inv = np.unique(np.asarray(toks, dtype=object), return_inverse=True)
        inv = inv.astype(np.int64)
        k = np.int64(len(_))
        bg = inv[:-1] * k + inv[1:]
        bcodes, binv = np.unique(bg, return_inverse=True)
        bcounts = np.bincount(binv)
        max_bg[i] = bcounts.max()
        if n >= 3:
            tri = binv[:-1].astype(np.int64) * k + inv[2:]
            tc = np.unique(tri, return_counts=True)[1]
            rep_tg[i] = tc[tc >= 2].sum()
    keep = (n_toks >= 10 * max_bg) & (n_toks >= 10 * rep_tg)
    return pa.table(
        {
            id_col: ids,
            "n_tokens": pa.array(n_toks),
            "max_bigram_count": pa.array(max_bg),
            "rep_trigram_occ": pa.array(rep_tg),
            "keep": pa.array(keep),
        }
    )


def term_df_partials(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch partial DOCUMENT frequency: one (term, df) row per
    distinct term per batch. Each doc lives wholly in one batch row, so
    summing the partials over batches is the exact global df."""
    from collections import Counter

    c: Counter = Counter()
    for t in batch.column(text_col).to_pylist():
        c.update(set((t or "").split()))
    return pa.table(
        {
            "term": pa.array(list(c.keys()), pa.string()),
            "df": pa.array(np.fromiter(c.values(), dtype=np.int64, count=len(c))),
        }
    )


def top_terms_stage(df_terms: np.ndarray, df_counts: np.ndarray, k: int = 3):
    """Build a map_batches fn emitting each doc's top-``k`` distinctive
    terms ranked by (tf DESC, df ASC, term ASC) — the TF-IDF ordering for
    single-occurrence-per-doc idf, kept in INTEGERS so the distributed
    result is bit-identical to SQL (``tf * ln(N/df)`` ranks identically to
    (tf, -df) per (tf, df) pair at fixed N... not in general, so the
    integer ordering IS the contract, documented as "distinctive terms").

    ``df_terms``/``df_counts``: the global document-frequency table as
    SORTED parallel numpy arrays, broadcast once via ``ray.put`` by the
    caller — zero-copy searchsorted lookup per task, no shuffle join.
    Scale shape: natural-language vocabulary is sublinear in corpus size
    (~1e7 terms at web scale — a few hundred MB broadcast); for unbounded
    synthetic keys use bucketed_group_agg + a bucketed hash join instead."""
    import ray

    terms_ref = ray.put(df_terms) if not isinstance(df_terms, ray.ObjectRef) else df_terms
    counts_ref = ray.put(df_counts) if not isinstance(df_counts, ray.ObjectRef) else df_counts

    def fn(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
        vocab = ray.get(terms_ref)
        dfc = ray.get(counts_ref)
        out_id, out_rank, out_term, out_tf, out_df = [], [], [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()):
            toks = np.asarray((t or "").split(), dtype=object)
            if not toks.size:
                continue
            uniq, tf = np.unique(toks, return_counts=True)
            pos = np.searchsorted(vocab, uniq)
            dfs = dfc[pos]  # every term of every doc is in the global vocab
            order = np.lexsort((uniq, dfs, -tf))[:k]
            for r, j in enumerate(order, start=1):
                out_id.append(i)
                out_rank.append(r)
                out_term.append(str(uniq[j]))
                out_tf.append(int(tf[j]))
                out_df.append(int(dfs[j]))
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "rank": pa.array(out_rank, pa.int64()),
                "term": pa.array(out_term, pa.string()),
                "tf": pa.array(out_tf, pa.int64()),
                "df": pa.array(out_df, pa.int64()),
            }
        )

    return fn


def window_occ_partials(
    batch: pa.Table, id_col: str = "doc_id", text_col: str = "text", w: int = 5
) -> pa.Table:
    """Per-doc DISTINCT ``w``-token window occurrences: one row per distinct
    window per doc — ``(win_key, doc_id, occ)`` where ``win_key`` is the
    md5-16 hex of the space-joined window and ``occ`` its position count in
    the doc. Feeds the cross-corpus repeated-span detector
    (:func:`dup_span_partials`): only (16B key, id, count) projections cross
    the shuffle, never window text — the Lee et al. 2021 "Deduplicating
    Training Data" signal re-expressed for a bucketed exchange."""
    import hashlib
    from collections import Counter

    ids = batch.column(id_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    out_key, out_id, out_occ = [], [], []
    for i, t in zip(ids, texts):
        toks = (t or "").split()
        if len(toks) < w:
            continue
        c: Counter = Counter(
            " ".join(toks[j : j + w]) for j in range(len(toks) - w + 1)
        )
        for win, occ in c.items():
            out_key.append(hashlib.md5(win.encode("utf-8")).hexdigest())
            out_id.append(i)
            out_occ.append(occ)
    return pa.table(
        {
            "win_key": pa.array(out_key, pa.string()),
            id_col: pa.array(out_id, pa.int64()),
            "occ": pa.array(out_occ, pa.int64()),
        }
    )


def dup_span_partials(g, id_col: str = "doc_id"):
    """Inside one coarse ``hash(win_key) % B`` bucket: total the corpus-wide
    occurrences of each window (a window lives wholly in one bucket) and
    credit each doc with its positions on windows occurring >= 2 times
    anywhere (another doc OR a repeat in the same doc). Emits per-doc
    partials ``(doc_id, dup_windows)`` — summed across buckets downstream."""
    import pandas as pd

    tot = g.groupby("win_key", sort=False)["occ"].transform("sum")
    dup = g[tot >= 2]
    if not len(dup):
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"), "dup_windows": pd.Series([], dtype="int64")})
    out = dup.groupby(id_col, as_index=False, sort=False)["occ"].sum()
    return out.rename(columns={"occ": "dup_windows"})


def window_count_stage(
    batch: pa.Table, id_col: str = "doc_id", text_col: str = "text", w: int = 5
) -> pa.Table:
    """Per-doc total window-position count ``max(n_tokens - w + 1, 0)`` —
    the denominator side of the dup-span rollup, emitted in the same
    (doc_id, n_windows, dup_windows) layout so the two streams union into
    one bucketed sum with no join."""
    texts = batch.column(text_col).to_pylist()
    n = np.asarray([max(len((t or "").split()) - w + 1, 0) for t in texts], dtype=np.int64)
    return pa.table(
        {
            id_col: batch.column(id_col).cast(pa.int64()),
            "n_windows": pa.array(n),
            "dup_windows": pa.array(np.zeros(len(texts), dtype=np.int64)),
        }
    )


_PII_PATTERNS: "list[tuple[str, str, str]]" = [
    # (name, pattern, replacement) — RE2-safe (no lookaround/backrefs) so the
    # exact same pattern string runs in DuckDB regexp_* and Python re with
    # identical leftmost, non-overlapping matches.
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9][0-9()\- ]{6,18}[0-9]", "<PHONE>"),
]


def pii_scan(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """PII detection + redaction (C4/Dolma-style hygiene): count and mask
    emails, IPv4 literals and international phone numbers. Counts are
    independent detections on the RAW text; redaction applies the patterns
    sequentially (email -> ip -> phone). Patterns are RE2-compatible, so a
    SQL engine reproduces both counts and the redacted text byte-for-byte.
    Stateless, shuffle-free; regexes compiled once per process."""
    import re

    compiled = getattr(pii_scan, "_compiled", None)
    if compiled is None:
        compiled = [(name, re.compile(pat), repl) for name, pat, repl in _PII_PATTERNS]
        pii_scan._compiled = compiled
    texts = batch.column(text_col).to_pylist()
    counts = {name: np.zeros(len(texts), dtype=np.int64) for name, _, _ in compiled}
    red = []
    for i, t in enumerate(texts):
        s = t or ""
        for name, rx, _ in compiled:
            counts[name][i] = len(rx.findall(s))
        for _, rx, repl in compiled:
            s = rx.sub(repl, s)
        red.append(s)
    out = pa.table({id_col: batch.column(id_col).cast(pa.int64())})
    for name, _, _ in compiled:
        out = out.append_column(f"n_{name}", pa.array(counts[name]))
    return out.append_column("text_redacted", pa.array(red, pa.string()))


def length_hist_partials(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch histogram of whitespace token counts: one (n_tokens, cnt)
    row per distinct length per batch. Distinct lengths are bounded by the
    max document length (not the corpus size), so the summed histogram is a
    tiny driver-side reduce from which EXACT discrete quantiles fall out —
    no sort, no sketch approximation."""
    from collections import Counter

    c: Counter = Counter(len((t or "").split()) for t in batch.column(text_col).to_pylist())
    ks = np.fromiter(c.keys(), dtype=np.int64, count=len(c))
    vs = np.fromiter(c.values(), dtype=np.int64, count=len(c))
    return pa.table({"n_tokens": pa.array(ks), "cnt": pa.array(vs)})


def term_tf_partials(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch partial TOTAL term frequency (occurrence counts, unlike
    :func:`term_df_partials`'s document counts): one (term, tf) row per
    distinct term per batch; summing over batches is the exact corpus tf."""
    from collections import Counter

    c: Counter = Counter()
    for t in batch.column(text_col).to_pylist():
        c.update((t or "").split())
    return pa.table(
        {
            "term": pa.array(list(c.keys()), pa.string()),
            "tf": pa.array(np.fromiter(c.values(), dtype=np.int64, count=len(c))),
        }
    )


def term_df_tf_partials(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch partial (document frequency, total term frequency) in ONE
    tokenization pass: one (term, df, tf) row per distinct term per batch.
    Summing df over batches is the exact global document frequency (a doc
    lives wholly in one batch row); summing tf is the exact corpus term
    count, so ``SUM(tf)`` over the reduced table is the corpus token total
    — one pass feeds both the BM25 idf table and avgdl."""
    from collections import Counter

    df_c: Counter = Counter()
    tf_c: Counter = Counter()
    for t in batch.column(text_col).to_pylist():
        toks = (t or "").split()
        tf_c.update(toks)
        df_c.update(set(toks))
    terms = list(tf_c.keys())
    return pa.table(
        {
            "term": pa.array(terms, pa.string()),
            "df": pa.array(np.fromiter((df_c[t] for t in terms), dtype=np.int64, count=len(terms))),
            "tf": pa.array(np.fromiter((tf_c[t] for t in terms), dtype=np.int64, count=len(terms))),
        }
    )


def bm25_stage(query_terms: list[str], idfs: np.ndarray, avgdl: float, k: int = 10):
    """Build a map_batches fn scoring every doc that contains one of the
    ``query_terms`` with Okapi BM25 (k1=1.2, b=0.75, rational idf
    ``((N-df)+0.5)/(df+0.5)`` — no transcendental ops) and emitting only the
    batch-LOCAL top-``k`` (score DESC, doc_id ASC) per term. Each doc lives
    in exactly one batch, so a doc outside its batch's top-k cannot be in
    the global top-k — the driver merges ≤ batches×terms×k skinny rows.

    Every float op is a single exactly-rounded IEEE expression written with
    the SAME association as the SQL oracle, so the distributed scores are
    bit-identical to DuckDB's. Query terms + idf scalars ride the closure
    (bytes, not a shuffle join); nothing here depends on batch composition,
    so retries and batch-size changes leave scores unchanged.

    Mirrors the retrieval half of the reference's relevance ranking surface
    (ref:utils/url.py is_relevant_url chooses media by score-ordering; this
    is the corpus-level analogue for document retrieval)."""
    qterms = [str(t) for t in query_terms]
    idf_by_term = {t: float(v) for t, v in zip(qterms, np.asarray(idfs, dtype=np.float64))}
    avgdl_f = float(avgdl)

    def fn(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
        from collections import Counter

        ids = batch.column(id_col).to_pylist()
        per_term: dict[str, tuple[list, list, list]] = {t: ([], [], []) for t in qterms}
        for i, t in zip(ids, batch.column(text_col).to_pylist()):
            toks = (t or "").split()
            if not toks:
                continue
            c = Counter(toks)
            dl = len(toks)
            for q in qterms:
                tf = c.get(q, 0)
                if tf:
                    acc = per_term[q]
                    acc[0].append(i)
                    acc[1].append(tf)
                    acc[2].append(dl)
        cols_term: list[str] = []
        cols_id: list[int] = []
        cols_tf: list[int] = []
        cols_dl: list[int] = []
        cols_score: list[float] = []
        for q in qterms:
            d_ids, d_tf, d_dl = per_term[q]
            if not d_ids:
                continue
            tf_f = np.asarray(d_tf, dtype=np.float64)
            dl_f = np.asarray(d_dl, dtype=np.float64)
            # association mirrors the SQL oracle exactly:
            # idf * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
            score = idf_by_term[q] * ((tf_f * 2.2) / (tf_f + 1.2 * (0.25 + 0.75 * (dl_f / avgdl_f))))
            id_arr = np.asarray(d_ids, dtype=np.int64)
            order = np.lexsort((id_arr, -score))[:k]
            for j in order:
                cols_term.append(q)
                cols_id.append(int(id_arr[j]))
                cols_tf.append(int(d_tf[j]))
                cols_dl.append(int(d_dl[j]))
                cols_score.append(float(score[j]))
        return pa.table(
            {
                "term": pa.array(cols_term, pa.string()),
                "doc_id": pa.array(cols_id, pa.int64()),
                "tf": pa.array(cols_tf, pa.int64()),
                "dl": pa.array(cols_dl, pa.int64()),
                "score": pa.array(cols_score, pa.float64()),
            }
        )

    return fn


def postings_partials(query_terms: list[str], k: int = 5):
    """Build a map_batches fn emitting each batch's LOCAL top-``k`` postings
    (term, doc_id, tf) per query term, ranked (tf DESC, doc_id ASC) — the
    impact-ordered inverted-index head (Anh & Moffat's impact ordering; the
    WAND upper-bound prefix). A doc lives wholly in one batch, so a posting
    outside its batch's top-k cannot be in the global top-k: the driver's
    merge over ≤ batches×terms×k skinny rows is lossless. Query terms ride
    the closure as a frozenset (bytes, not a shuffle join); integer tf with
    total-order tie-breaks keeps the distributed result bit-identical to
    SQL under any batch composition or retry."""
    qset = frozenset(str(t) for t in query_terms)
    qterms = sorted(qset)

    def fn(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
        from collections import Counter

        per_term: dict[str, tuple[list, list]] = {t: ([], []) for t in qterms}
        for i, t in zip(batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()):
            toks = (t or "").split()
            if not toks:
                continue
            c = Counter(toks)
            for q in qset.intersection(c):
                acc = per_term[q]
                acc[0].append(i)
                acc[1].append(c[q])
        cols_term: list[str] = []
        cols_id: list[int] = []
        cols_tf: list[int] = []
        for q in qterms:
            d_ids, d_tf = per_term[q]
            if not d_ids:
                continue
            id_arr = np.asarray(d_ids, dtype=np.int64)
            tf_arr = np.asarray(d_tf, dtype=np.int64)
            order = np.lexsort((id_arr, -tf_arr))[:k]
            for j in order:
                cols_term.append(q)
                cols_id.append(int(id_arr[j]))
                cols_tf.append(int(tf_arr[j]))
        return pa.table(
            {
                "term": pa.array(cols_term, pa.string()),
                "doc_id": pa.array(cols_id, pa.int64()),
                "tf": pa.array(cols_tf, pa.int64()),
            }
        )

    return fn


def phrase_postings(phrase: list[str]):
    """Build a map_batches fn emitting POSITIONAL postings for the phrase's
    terms only: one ``(doc_id, term_idx, pos)`` row per occurrence of a
    phrase term (``term_idx`` = which phrase slot the token matches, ``pos``
    = 0-based token position). This is the slice of a positional inverted
    index a phrase query reads — only query-term occurrences leave the
    corpus scan (skinny int64 rows), the document text never shuffles. A
    term appearing at several phrase slots (e.g. "the X the") emits one row
    per slot, exactly as a per-slot index lookup would."""
    tmap: dict[str, list[int]] = {}
    for idx, t in enumerate(phrase):
        tmap.setdefault(str(t), []).append(idx)

    def fn(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
        ids: list[int] = []
        tis: list[int] = []
        poss: list[int] = []
        for i, t in zip(batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()):
            for p, tok in enumerate((t or "").split()):
                for ti in tmap.get(tok, ()):
                    ids.append(i)
                    tis.append(ti)
                    poss.append(p)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "term_idx": pa.array(tis, pa.int64()),
                "pos": pa.array(poss, pa.int64()),
            }
        )

    return fn


def phrase_intersect(postings_ds, n_terms: int, num_buckets: int = 64):
    """Positional-postings intersection: docs where slot-k occurrences line
    up at ``pos0+k`` for every k — the classic phrase-query merge. Postings
    shuffle by ``hash(doc_id) % num_buckets`` (a doc's postings land wholly
    in one bucket, so the per-bucket intersection is exact); each bucket
    intersects per doc with numpy set ops over int64 positions. Returns a
    Dataset of ``(doc_id, n_matches)`` for docs with ≥1 phrase occurrence."""
    import pandas as pd

    def bucket_intersect(df: pd.DataFrame) -> pd.DataFrame:
        out_ids: list[int] = []
        out_n: list[int] = []
        for doc_id, grp in df.groupby("doc_id"):
            starts = None
            for k in range(n_terms):
                p = grp.loc[grp["term_idx"] == k, "pos"].to_numpy(dtype=np.int64) - k
                starts = p if starts is None else np.intersect1d(starts, p)
                if starts.size == 0:
                    break
            if starts is not None and starts.size:
                out_ids.append(int(doc_id))
                out_n.append(int(starts.size))
        return pd.DataFrame({"doc_id": pd.array(out_ids, dtype="int64"),
                             "n_matches": pd.array(out_n, dtype="int64")})

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = ((ids * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)) % np.uint64(num_buckets)
        return batch.append_column("bucket", pa.array(bucket.astype(np.int64)))

    return (
        postings_ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=65536)
        .groupby("bucket")
        .map_groups(bucket_intersect, batch_format="pandas")
    )


def bigram_partials(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch partial bigram counts: one (w1, w2, n) row per distinct
    ADJACENT token pair per batch (pairs never cross document boundaries —
    the SQL twin is lead() partitioned by doc_id). Summing over batches is
    the exact corpus bigram count; the distinct (w1, w2) key set of the
    reduced table is the LM's support, from which Kneser–Ney continuation
    counts derive."""
    from collections import Counter

    c: Counter = Counter()
    for t in batch.column(text_col).to_pylist():
        toks = (t or "").split()
        c.update(zip(toks, toks[1:]))
    keys = list(c.keys())
    return pa.table(
        {
            "w1": pa.array([k[0] for k in keys], pa.string()),
            "w2": pa.array([k[1] for k in keys], pa.string()),
            "n": pa.array(np.fromiter((c[k] for k in keys), dtype=np.int64, count=len(keys))),
        }
    )


def rank_score_stage(vocab_sorted: np.ndarray, ranks: np.ndarray):
    """Build a map_batches fn scoring each doc by the sum of its tokens'
    GLOBAL frequency ranks (rank 1 = most frequent term; ties broken by
    term) — an integer-exact unigram-LM perplexity proxy (the CCNet-style
    quality signal without float log-probs, so the distributed result
    hash-matches SQL). ``vocab_sorted``/``ranks``: parallel arrays sorted
    by term, broadcast once via ray.put — searchsorted lookup per batch,
    no shuffle (natural-language vocabulary is sublinear in corpus size)."""
    import ray

    vocab_ref = ray.put(vocab_sorted) if not isinstance(vocab_sorted, ray.ObjectRef) else vocab_sorted
    rank_ref = ray.put(ranks) if not isinstance(ranks, ray.ObjectRef) else ranks

    def fn(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
        vocab, rk = ray.get(vocab_ref), ray.get(rank_ref)
        ids = batch.column(id_col).to_pylist()
        n_out = np.zeros(len(ids), dtype=np.int64)
        s_out = np.zeros(len(ids), dtype=np.int64)
        for i, t in enumerate(batch.column(text_col).to_pylist()):
            toks = np.asarray((t or "").split(), dtype=object)
            if not toks.size:
                continue
            uniq, cnt = np.unique(toks, return_counts=True)
            pos = np.searchsorted(vocab, uniq)  # every token is in the corpus vocab
            n_out[i] = cnt.sum()
            s_out[i] = int((cnt * rk[pos]).sum())
        return pa.table(
            {
                id_col: pa.array(np.asarray(ids, dtype=np.int64)),
                "n_tokens": pa.array(n_out),
                "rank_sum": pa.array(s_out),
            }
        )

    return fn


# ---------------------------------------------------------------------------
# hashed-feature linear classifier (fastText architecture)
# ---------------------------------------------------------------------------

CLF_DIM = 1 << 16  # feature-hash buckets


def fixture_weights(dim: int = CLF_DIM) -> np.ndarray:
    """Deterministic INTEGER weight vector standing in for trained fastText
    parameters (the container has no trained model; a real deployment loads
    its weights here and broadcasts them the same way). w(b) in
    [-1e6, 1e6], a fixed affine-mod mix of the bucket index — the identical
    closed form is evaluated in the SQL oracle, so scores hash-match."""
    b = np.arange(dim, dtype=np.uint64)
    return ((b * np.uint64(2654435761) + np.uint64(99991)) % np.uint64(2000001)).astype(
        np.int64
    ) - 1000000


class HashedLinearStage:
    """fastText-style document scoring: whitespace unigrams + adjacent-word
    bigrams, feature-hashed into ``dim`` buckets (md5 low-8-bytes mod dim —
    the exact hash DuckDB's ``md5_number_lower`` computes, so an oracle can
    re-derive scores), scored by a linear layer ``score = sum w[bucket]``
    over occurrences (fastText's mean-of-embeddings collapsed to 1-d and
    kept in integers so distributed == SQL bit-for-bit).

    Actor-pool stage: the weight vector is materialized ONCE per actor in
    ``__init__`` (model load position); ``__call__`` is the batched
    inference pass. Per-batch cost is dominated by hashing the batch's
    UNIQUE features — duplicates are folded by np.unique before any md5.
    No shuffle; streams at any scale."""

    def __init__(self, weights: np.ndarray | None = None, bigrams: bool = True):
        self.w = fixture_weights() if weights is None else np.asarray(weights, dtype=np.int64)
        self.dim = len(self.w)
        self.bigrams = bigrams

    def score_texts(self, texts: list) -> tuple[np.ndarray, np.ndarray]:
        """(n_features, clf_score) per text — the reusable inference kernel
        (the webtext classifier gate calls this directly so ids can be any
        type)."""
        import hashlib

        feats: list[str] = []
        offsets = [0]
        for t in texts:
            toks = (t or "").split()
            feats.extend(toks)
            if self.bigrams and len(toks) > 1:
                feats.extend(a + " " + b for a, b in zip(toks, toks[1:]))
            offsets.append(len(feats))
        arr = np.asarray(feats, dtype=object)
        seg = np.diff(offsets).astype(np.int64)
        score = np.zeros(len(texts), dtype=np.int64)
        if arr.size:
            uniq, inv = np.unique(arr, return_inverse=True)
            buckets = np.fromiter(
                (
                    int.from_bytes(hashlib.md5(u.encode("utf-8")).digest()[8:16], "little")
                    % self.dim
                    for u in uniq
                ),
                dtype=np.int64,
                count=len(uniq),
            )
            per_feat = self.w[buckets][inv]
            cs = np.concatenate([[0], np.cumsum(per_feat)])
            score = cs[offsets[1:]] - cs[offsets[:-1]]
        return seg, score

    def __call__(self, batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        seg, score = self.score_texts(batch.column(text_col).to_pylist())
        return pa.table(
            {
                id_col: pa.array(np.asarray(ids, dtype=np.int64)),
                "n_features": pa.array(seg),
                "clf_score": pa.array(score),
                "keep": pa.array(score >= 0),
            }
        )


# ---------------------------------------------------------------------------
# DSIR-style importance contrast (Xie et al. 2023, integer rank form)
# ---------------------------------------------------------------------------


def term_tf_lang_partials(batch: pa.Table, target_lang: str, text_col: str = "text") -> pa.Table:
    """Per-batch partial term frequencies for TWO distributions at once:
    the raw corpus (``tf``) and the target subset ``lang == target_lang``
    (``tf_t``). One (term, tf, tf_t) row per distinct term per batch."""
    from collections import Counter

    c_all: Counter = Counter()
    c_tgt: Counter = Counter()
    langs = batch.column("lang").to_pylist()
    for lang, t in zip(langs, batch.column(text_col).to_pylist()):
        toks = (t or "").split()
        c_all.update(toks)
        if lang == target_lang:
            c_tgt.update(toks)
    terms = list(c_all.keys())
    return pa.table(
        {
            "term": pa.array(terms, pa.string()),
            "tf": pa.array(np.fromiter((c_all[t] for t in terms), dtype=np.int64, count=len(terms))),
            "tf_t": pa.array(np.fromiter((c_tgt[t] for t in terms), dtype=np.int64, count=len(terms))),
        }
    )


def rank_contrast_stage(vocab_sorted: np.ndarray, rank_raw: np.ndarray, rank_target: np.ndarray):
    """DSIR-style importance scoring without float log-likelihoods: each
    token contributes ``rank_raw(tok) - rank_target(tok)`` (ranks over the
    UNION vocabulary, ordered by the respective distribution's tf DESC then
    term; a term common in the target but rare overall scores high). The
    per-doc sum is the integer analogue of DSIR's
    ``log p_target(x) - log p_raw(x)`` importance weight — order-free
    integer addition, so the distributed sum hash-matches SQL.

    The three parallel arrays (sorted by term) are broadcast once via
    ``ray.put``; lookup is one searchsorted per batch. Vocabulary is
    sublinear in corpus size — the same scale argument as
    :func:`top_terms_stage`."""
    import ray

    vocab_ref = ray.put(vocab_sorted) if not isinstance(vocab_sorted, ray.ObjectRef) else vocab_sorted
    raw_ref = ray.put(rank_raw) if not isinstance(rank_raw, ray.ObjectRef) else rank_raw
    tgt_ref = ray.put(rank_target) if not isinstance(rank_target, ray.ObjectRef) else rank_target

    def fn(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
        vocab, rr, rt = ray.get(vocab_ref), ray.get(raw_ref), ray.get(tgt_ref)
        ids = batch.column(id_col).to_pylist()
        n_out = np.zeros(len(ids), dtype=np.int64)
        s_out = np.zeros(len(ids), dtype=np.int64)
        for i, t in enumerate(batch.column(text_col).to_pylist()):
            toks = np.asarray((t or "").split(), dtype=object)
            if not toks.size:
                continue
            uniq, cnt = np.unique(toks, return_counts=True)
            pos = np.searchsorted(vocab, uniq)  # every token is in the union vocab
            n_out[i] = cnt.sum()
            s_out[i] = int((cnt * (rr[pos] - rt[pos])).sum())
        return pa.table(
            {
                id_col: pa.array(np.asarray(ids, dtype=np.int64)),
                "n_tokens": pa.array(n_out),
                "contrast_sum": pa.array(s_out),
                "selected": pa.array(s_out > 0),
            }
        )

    return fn


# ---------------------------------------------------------------------------
# distributed BPE vocabulary learning (Sennrich et al. 2016)
# ---------------------------------------------------------------------------

_SYM_SEP = "\x1f"


def _apply_merge_seq(syms: list[str], left: str, right: str) -> list[str]:
    """Leftmost-first non-overlapping merge of adjacent (left, right) —
    the spec shared verbatim with golden_serial.bpe_serial (e.g. a+a over
    ['a','a','a'] → ['aa','a'])."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_learn(docs_ds, text_col: str = "text", num_merges: int = 8):
    """Distributed BPE vocabulary learning — the tokenizer-training half of
    the pipeline's token accounting (`textkit.bpe_token_count` applies a
    fixed regex; this LEARNS merges from the corpus, Sennrich et al. 2016
    §3.2). Returns a pandas DataFrame ``(rank, left, right, merged,
    pair_count)``, rank 0 = first merge learned.

    100 TB shape — the classic trainer trick, distributed: ONE streaming
    pass reduces the corpus to a (word, n) table via bucketed_group_agg
    (bounded by VOCABULARY, not corpus size; only (word, count) rows ever
    shuffle), and all ``num_merges`` rounds then iterate over that table:
    per-batch weighted pair counts → exact bucketed pair sums → per-batch
    top-1 partials → a ≤num_blocks-row driver argmax (deterministic
    tie-break: max count, then lexicographically smallest pair), then the
    winning pair is bound into a FRESH closure (no mutable capture) and
    applied leftmost-first to the word table, which re-materializes per
    round. Integer counts + total-order tie-break make the merge sequence
    bit-deterministic under any batch layout or retry."""
    import pandas as pd

    from .agg import bucketed_group_agg

    def word_partials(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            c.update((t or "").split())
        words = list(c.keys())
        return pa.table(
            {
                "word": pa.array(words, pa.string()),
                "n": pa.array([c[w] for w in words], pa.int64()),
            }
        )

    words = bucketed_group_agg(
        docs_ds.map_batches(word_partials, batch_format="pyarrow"), ["word"], {"n": "sum"}
    )

    def to_syms(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "sym": pa.array(
                    [_SYM_SEP.join(list(w)) for w in batch.column("word").to_pylist()],
                    pa.string(),
                ),
                "n": batch.column("n"),
            }
        )

    table = words.map_batches(to_syms, batch_format="pyarrow").materialize()

    merges: list[dict] = []
    for rank in range(num_merges):

        def pair_partials(batch: pa.Table) -> pa.Table:
            from collections import Counter

            c: Counter = Counter()
            counts = batch.column("n").to_pylist()
            for s, n in zip(batch.column("sym").to_pylist(), counts):
                syms = s.split(_SYM_SEP)
                for a, b in zip(syms, syms[1:]):
                    c[(a, b)] += n
            keys = list(c.keys())
            return pa.table(
                {
                    "left": pa.array([k[0] for k in keys], pa.string()),
                    "right": pa.array([k[1] for k in keys], pa.string()),
                    "n": pa.array([c[k] for k in keys], pa.int64()),
                }
            )

        pair_sums = bucketed_group_agg(
            table.map_batches(pair_partials, batch_format="pyarrow"),
            ["left", "right"],
            {"n": "sum"},
        )

        def top1_partial(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            if not len(df):
                return pa.table(
                    {"left": pa.array([], pa.string()), "right": pa.array([], pa.string()),
                     "n": pa.array([], pa.int64())}
                )
            # max count, then lexicographically smallest (left, right)
            df = df.sort_values(["n", "left", "right"], ascending=[False, True, True])
            return pa.Table.from_pandas(df.head(1), preserve_index=False)

        cands = pair_sums.map_batches(top1_partial, batch_format="pyarrow").to_pandas()
        if not len(cands):
            break
        cands = cands.sort_values(["n", "left", "right"], ascending=[False, True, True])
        best = cands.iloc[0]
        left, right, n_pair = str(best["left"]), str(best["right"]), int(best["n"])
        merges.append(
            {"rank": rank, "left": left, "right": right, "merged": left + right,
             "pair_count": n_pair}
        )

        def apply_round(batch: pa.Table, left=left, right=right) -> pa.Table:
            # left/right bound as DEFAULTS — a fresh closure per round, never
            # a rewritten captured cell (the kcenter cached-closure lesson)
            out = [
                _SYM_SEP.join(_apply_merge_seq(s.split(_SYM_SEP), left, right))
                for s in batch.column("sym").to_pylist()
            ]
            return pa.table({"sym": pa.array(out, pa.string()), "n": batch.column("n")})

        table = table.map_batches(apply_round, batch_format="pyarrow").materialize()

    return pd.DataFrame(
        merges,
        columns=["rank", "left", "right", "merged", "pair_count"],
    ).astype({"rank": "int64", "pair_count": "int64"}) if merges else pd.DataFrame(
        {"rank": pd.Series(dtype="int64"), "left": pd.Series(dtype=str),
         "right": pd.Series(dtype=str), "merged": pd.Series(dtype=str),
         "pair_count": pd.Series(dtype="int64")}
    )


def bpe_encode(docs_ds, merges, text_col: str = "text", id_col: str = "doc_id"):
    """Apply a LEARNED merge list to the corpus — the tokenizer-application
    half of the BPE plane (``bpe_learn`` trains it). ``merges`` is the
    trainer's output frame ordered by rank; each word starts as characters
    and every merge applies in rank order as one leftmost-first
    non-overlapping pass (``_apply_merge_seq`` — exactly the trainer's
    per-round table evolution, so a training word encodes to its final
    trainer symbols). Returns a Dataset of ``(doc_id, n_tokens, n_chars)``:
    post-merge token count and pre-merge character token count per doc.

    Scale shape: the merge list is tokenizer-sized (rides the closure);
    one streaming pass, no shuffle; each batch encodes its DISTINCT words
    once (memo) and multiplies by occurrence, so cost tracks vocabulary ×
    batch, not corpus length × merges."""
    ordered = merges.sort_values("rank") if len(merges) else merges
    pairs = [(str(lft), str(rgt)) for lft, rgt in zip(ordered["left"], ordered["right"])]

    def fn(batch: pa.Table) -> pa.Table:
        memo: dict[str, int] = {}

        def tok_len(w: str) -> int:
            v = memo.get(w)
            if v is None:
                syms = list(w)
                for lft, rgt in pairs:
                    syms = _apply_merge_seq(syms, lft, rgt)
                v = len(syms)
                memo[w] = v
            return v

        ids: list[int] = []
        ntok: list[int] = []
        nchar: list[int] = []
        for i, t in zip(batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()):
            words = (t or "").split()
            ids.append(i)
            ntok.append(sum(tok_len(w) for w in words))
            nchar.append(sum(len(w) for w in words))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(ntok, pa.int64()),
                "n_chars": pa.array(nchar, pa.int64()),
            }
        )

    return docs_ds.map_batches(fn, batch_format="pyarrow", batch_size=4096)


# Gopher-style quality-rule bundle (Rae et al. 2021 "Scaling Language
# Models: ... Gopher" §A.1.1 doc-filter heuristics, re-expressed as
# integer-exact rationals so a DuckDB oracle compares value-exact).
# Thresholds are corpus-adaptive to the synthetic generator's distribution
# (its texts carry no symbols/bullets/ellipses, so the symbol-ratio rules
# are replaced by their repetition duals — distinct-ratio and
# top-token-share — which the generator DOES vary):
GOPHER_WC_MIN, GOPHER_WC_MAX = 20, 90  # word-count band
GOPHER_MWL_MIN, GOPHER_MWL_MAX = 400, 500  # mean word length ×100 band
GOPHER_DISTINCT_MIN = 30  # distinct-token ratio ×100 lower bound
GOPHER_TOPSHARE_MAX = 12  # most-common-token share ×100 upper bound


def gopher_stats(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Per-doc integer Gopher ingredients + first-failing-rule label.

    All four statistics are exact integers (×100 ratios use floor
    division), so the distributed result is bit-identical to the SQL
    twin regardless of batch composition. One pass, no shuffle.
    """
    from collections import Counter

    ids = batch.column(id_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    n = len(ids)
    n_tok = np.zeros(n, dtype=np.int64)
    mwl = np.zeros(n, dtype=np.int64)
    dr = np.zeros(n, dtype=np.int64)
    ts = np.zeros(n, dtype=np.int64)
    for i, t in enumerate(texts):
        words = (t or "").split()
        if not words:
            continue
        c = Counter(words)
        k = len(words)
        n_tok[i] = k
        mwl[i] = sum(len(w) for w in words) * 100 // k
        dr[i] = len(c) * 100 // k
        ts[i] = max(c.values()) * 100 // k
    gate = np.full(n, "keep", dtype=object)
    gate[(dr < GOPHER_DISTINCT_MIN)] = "distinct_ratio"
    gate[(ts > GOPHER_TOPSHARE_MAX) & (dr >= GOPHER_DISTINCT_MIN)] = "top_token_share"
    bad_mwl = (mwl < GOPHER_MWL_MIN) | (mwl > GOPHER_MWL_MAX)
    gate[bad_mwl] = "mean_word_len"
    gate[(n_tok < GOPHER_WC_MIN) | (n_tok > GOPHER_WC_MAX)] = "word_count"
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_tok": pa.array(n_tok),
            "mwl_x100": pa.array(mwl),
            "distinct_pct": pa.array(dr),
            "top_share_pct": pa.array(ts),
            "gate": pa.array([str(g) for g in gate], pa.string()),
        }
    )

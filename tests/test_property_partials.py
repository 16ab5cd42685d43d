"""Hypothesis property tests for the mergeable-partial kernels.

The distributed-correctness contract of every ``*_partials`` kernel is
BATCH-SPLIT INVARIANCE: summing the partials of any split of the input
equals the partials of the whole input. Ray's batch boundaries are an
execution detail, so these properties are exactly what the driver's
oracle comparisons rely on. Sketches additionally need their merge
algebra (commutative, idempotent under duplicates, order-free)."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from auto_archiver_ray.functions import textkit
from auto_archiver_ray.functions.sketch import HyperLogLog
from auto_archiver_ray.stages import textstats

texts = st.lists(
    st.text(alphabet=" abcdef\t\n", max_size=40), min_size=1, max_size=12
)


def _sum_partials(tables: list[pa.Table], keys: list[str]) -> pd.DataFrame:
    df = pa.concat_tables(tables).to_pandas()
    return df.groupby(keys, as_index=False).sum().sort_values(keys).reset_index(drop=True)


@settings(max_examples=50, deadline=None)
@given(texts, st.integers(min_value=1, max_value=11))
def test_term_tf_partials_split_invariant(docs, cut):
    cut = min(cut, len(docs))
    whole = _sum_partials([textstats.term_tf_partials(pa.table({"text": pa.array(docs)}))], ["term"])
    split = _sum_partials(
        [
            textstats.term_tf_partials(pa.table({"text": pa.array(part)}))
            for part in (docs[:cut], docs[cut:])
            if part
        ],
        ["term"],
    )
    pd.testing.assert_frame_equal(whole, split, check_dtype=False)


@settings(max_examples=50, deadline=None)
@given(texts, st.integers(min_value=1, max_value=11))
def test_term_tf_lang_partials_split_invariant(docs, cut):
    cut = min(cut, len(docs))
    langs = ["en" if i % 2 == 0 else "fr" for i in range(len(docs))]

    def tbl(lo, hi):
        return pa.table({"lang": pa.array(langs[lo:hi]), "text": pa.array(docs[lo:hi])})

    whole = _sum_partials([textstats.term_tf_lang_partials(tbl(0, len(docs)), "en")], ["term"])
    parts = [
        textstats.term_tf_lang_partials(tbl(lo, hi), "en")
        for lo, hi in ((0, cut), (cut, len(docs)))
        if hi > lo
    ]
    pd.testing.assert_frame_equal(whole, _sum_partials(parts, ["term"]), check_dtype=False)


@settings(max_examples=50, deadline=None)
@given(texts, st.integers(min_value=1, max_value=11))
def test_hashed_linear_split_invariant(docs, cut):
    """Per-doc scores are independent of which batch a doc lands in."""
    cut = min(cut, len(docs))
    stage = textstats.HashedLinearStage()
    ids = list(range(len(docs)))

    def run(id_part, doc_part):
        if not id_part:
            return None
        return stage(
            pa.table({"doc_id": pa.array(id_part, pa.int64()), "text": pa.array(doc_part)})
        )

    whole = run(ids, docs).to_pandas()
    parts = [t for t in (run(ids[:cut], docs[:cut]), run(ids[cut:], docs[cut:])) if t is not None]
    split = pa.concat_tables(parts).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(whole, split, check_dtype=False)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=500), min_size=0, max_size=300))
def test_hll_merge_equals_union_and_ignores_order_and_dups(values):
    h_all = HyperLogLog(p=10)
    h_all.add_many(values)
    # split + merge
    mid = len(values) // 2
    a, b = HyperLogLog(p=10), HyperLogLog(p=10)
    a.add_many(values[:mid])
    b.add_many(values[mid:])
    merged = a.merge(b)
    assert np.array_equal(merged.registers, h_all.registers)
    # order- and duplicate-insensitive
    h_shuf = HyperLogLog(p=10)
    h_shuf.add_many(list(reversed(values)) + values)
    assert np.array_equal(h_shuf.registers, h_all.registers)
    # serialization round-trips
    assert np.array_equal(HyperLogLog.from_bytes(h_all.to_bytes()).registers, h_all.registers)


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet=" abcdefgh", min_size=0, max_size=80))
def test_minhash_self_similarity_and_determinism(t):
    sh = textkit.word_shingles(t, 3)
    if sh.size == 0:
        return
    sig1 = textkit.minhash_signature(sh, num_perm=32)
    sig2 = textkit.minhash_signature(sh.copy(), num_perm=32)
    assert np.array_equal(sig1, sig2)
    assert textkit.jaccard(sh, sh) == 1.0


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=30),
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=30),
)
def test_jaccard_symmetric_and_bounded(a, b):
    xa = np.asarray(sorted(set(a)), dtype=np.uint64)
    xb = np.asarray(sorted(set(b)), dtype=np.uint64)
    j1 = textkit.jaccard(xa, xb)
    j2 = textkit.jaccard(xb, xa)
    assert j1 == j2
    assert 0.0 <= j1 <= 1.0
    # exact value against python sets
    sa, sb = set(xa.tolist()), set(xb.tolist())
    assert j1 == len(sa & sb) / len(sa | sb)


@settings(max_examples=50, deadline=None)
@given(texts, st.integers(min_value=1, max_value=11))
def test_length_hist_partials_split_invariant(docs, cut):
    cut = min(cut, len(docs))
    whole = _sum_partials(
        [textstats.length_hist_partials(pa.table({"text": pa.array(docs)}))], ["n_tokens"]
    )
    parts = [
        textstats.length_hist_partials(pa.table({"text": pa.array(p)}))
        for p in (docs[:cut], docs[cut:])
        if p
    ]
    pd.testing.assert_frame_equal(whole, _sum_partials(parts, ["n_tokens"]), check_dtype=False)


# ----------------------------------------------------- round-5 properties


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**256 - 1),
    st.lists(st.integers(min_value=0, max_value=255), min_size=0, max_size=15, unique=True),
)
def test_pdq_pigeonhole_bound_exact(code_int, flip_positions):
    """The recall guarantee the image near-dup plane rests on: two 256-bit
    codes within Hamming distance n_bands-1 (=15) ALWAYS share at least
    one of the 16 band keys — for any code and any <=15 bit flips."""
    from auto_archiver_ray.functions import percephash as ph

    a = f"{code_int:064x}"
    bits = ph.hex_to_bits(a).copy()
    for p in flip_positions:
        bits[p] = ~bits[p]
    b = ph.bits_to_hex(bits)
    assert ph.hamming(a, b) == len(flip_positions)
    assert set(ph.pdq_band_keys(a)) & set(ph.pdq_band_keys(b))


def _substring_dedup_brute(docs: "pd.DataFrame", w: int = 3) -> "pd.DataFrame":
    """O(n^2) single-process reference for substring_dedup's spec."""
    occ: dict[str, tuple[int, int]] = {}
    rows = []
    toks_by = {int(i): (t or "").split() for i, t in zip(docs["doc_id"], docs["text"])}
    for did in sorted(toks_by):
        toks = toks_by[did]
        for p in range(len(toks) - w + 1):
            win = " ".join(toks[p : p + w])
            occ.setdefault(win, (did, p))
    for did in sorted(toks_by):
        toks = toks_by[did]
        mask = [False] * len(toks)
        for p in range(len(toks) - w + 1):
            win = " ".join(toks[p : p + w])
            if occ[win] != (did, p):
                for j in range(p, p + w):
                    mask[j] = True
        kept = [t for t, m in zip(toks, mask) if not m]
        rows.append((did, len(toks), len(kept), " ".join(kept)))
    return pd.DataFrame(rows, columns=["doc_id", "n_tokens", "kept_tokens", "clean_text"])


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcde"), min_size=0, max_size=20).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
def test_substring_dedup_matches_bruteforce(texts_list):
    """Distributed substring removal == the quadratic single-process spec
    on arbitrary tiny corpora (tokens drawn from a 5-symbol alphabet so
    window collisions are common — the hard case)."""
    import ray.data as rd

    from auto_archiver_ray.stages.dedup import substring_dedup

    docs = pd.DataFrame({"doc_id": range(len(texts_list)), "text": texts_list})
    got = (
        substring_dedup(rd.from_pandas(docs), w=3, num_buckets=4, num_shards=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = got.astype({"doc_id": "int64", "n_tokens": "int64", "kept_tokens": "int64"})
    want = _substring_dedup_brute(docs, w=3).astype(
        {"doc_id": "int64", "n_tokens": "int64", "kept_tokens": "int64"}
    )
    pd.testing.assert_frame_equal(got, want)

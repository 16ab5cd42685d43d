"""Unit tests for the hashed linear classifier, DSIR rank-contrast, and
SemDeDup stages (the round-3 model-scoring / semantic-dedup operators)."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from auto_archiver_ray.stages import textstats
from auto_archiver_ray.stages.textstats import CLF_DIM, HashedLinearStage, fixture_weights


def _bucket(feature: str) -> int:
    return int.from_bytes(hashlib.md5(feature.encode()).digest()[8:16], "little") % CLF_DIM


def _expected_score(text: str) -> tuple[int, int]:
    """Independent recomputation: unigrams + adjacent bigrams, summed
    fixture weights."""
    w = fixture_weights()
    toks = text.split()
    feats = list(toks) + [a + " " + b for a, b in zip(toks, toks[1:])]
    return len(feats), int(sum(int(w[_bucket(f)]) for f in feats))


def test_hashed_linear_matches_independent_recompute():
    texts = ["the quick brown fox", "hello world", "single"]
    batch = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()), "text": pa.array(texts)})
    out = HashedLinearStage()(batch).to_pandas()
    for i, t in enumerate(texts):
        n, s = _expected_score(t)
        assert out["n_features"][i] == n
        assert out["clf_score"][i] == s
        assert bool(out["keep"][i]) == (s >= 0)


def test_hashed_linear_empty_and_trailing_empty_docs():
    # trailing empty docs exercise the offsets==len(features) boundary
    batch = pa.table(
        {"doc_id": pa.array([0, 1, 2, 3], pa.int64()), "text": pa.array(["a b", "", None, ""])}
    )
    out = HashedLinearStage()(batch).to_pandas()
    assert list(out["n_features"]) == [3, 0, 0, 0]  # 2 unigrams + 1 bigram
    assert list(out["clf_score"][1:]) == [0, 0, 0]
    assert all(out["keep"][1:])  # zero score keeps


def test_hashed_linear_all_empty_batch():
    batch = pa.table({"doc_id": pa.array([7], pa.int64()), "text": pa.array([""])})
    out = HashedLinearStage()(batch).to_pandas()
    assert list(out["clf_score"]) == [0]


def test_hashed_linear_custom_weights_override():
    # a weight vector where every bucket is +1 scores = feature count
    stage = HashedLinearStage(weights=np.ones(CLF_DIM, dtype=np.int64))
    batch = pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array(["x y z"])})
    out = stage(batch).to_pandas()
    assert out["clf_score"][0] == out["n_features"][0] == 5


def test_rank_contrast_prefers_target_distribution():
    """Target-heavy vocabulary scores positive, raw-heavy negative."""
    # union vocab with ranks: 'tgt' is rank 1 in target but rank 3 in raw;
    # 'raw' is rank 1 in raw but rank 3 in target
    vocab = np.asarray(["mid", "raw", "tgt"], dtype=object)
    r_raw = np.asarray([2, 1, 3], dtype=np.int64)
    r_tgt = np.asarray([2, 3, 1], dtype=np.int64)
    fn = textstats.rank_contrast_stage(vocab, r_raw, r_tgt)
    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["tgt tgt mid", "raw raw mid", ""]),
        }
    )
    out = fn(batch).to_pandas()
    assert out["contrast_sum"][0] == 2 * (3 - 1) + 0 == 4 and bool(out["selected"][0])
    assert out["contrast_sum"][1] == 2 * (1 - 3) + 0 == -4 and not bool(out["selected"][1])
    assert out["contrast_sum"][2] == 0 and not bool(out["selected"][2])


def test_term_tf_lang_partials_counts_both_distributions():
    batch = pa.table(
        {
            "lang": pa.array(["en", "fr", "en"]),
            "text": pa.array(["a b a", "a c", "b"]),
        }
    )
    out = textstats.term_tf_lang_partials(batch, target_lang="en").to_pandas()
    tf = dict(zip(out["term"], out["tf"]))
    tf_t = dict(zip(out["term"], out["tf_t"]))
    assert tf == {"a": 3, "b": 2, "c": 1}
    assert tf_t == {"a": 2, "b": 2, "c": 0}


@pytest.mark.usefixtures("ray_session")
def test_semantic_dedup_drops_planted_duplicates():
    """Planted near-identical vectors collapse to the minimum id; distant
    vectors survive."""
    import ray.data as rd

    from auto_archiver_ray.stages.similarity import semantic_dedup

    rng = np.random.Generator(np.random.PCG64(3))
    base = rng.standard_normal((40, 8)).astype(np.float32)
    # ids 40 and 41 are near-copies of id 0; id 42 is a near-copy of id 5
    dup = np.vstack(
        [base[0] + 0.001 * rng.standard_normal(8), base[0] + 0.001 * rng.standard_normal(8), base[5] + 0.001 * rng.standard_normal(8)]
    ).astype(np.float32)
    vecs = np.vstack([base, dup])
    df = pd.DataFrame({"vec_id": np.arange(len(vecs), dtype=np.int64), "embedding": list(vecs)})
    out = semantic_dedup(rd.from_pandas(df), nlist=4, threshold=0.99, sample_rows=100).to_pandas()
    survivors = set(out["vec_id"].astype(int))
    assert {40, 41, 42}.isdisjoint(survivors)
    assert {0, 5}.issubset(survivors)
    assert len(survivors) == 40


@pytest.mark.usefixtures("ray_session")
def test_doc_chunks_boundary_math():
    """Chunk bounds: exact-fit docs get one chunk; one-past gets two; the
    final chunk always ends at n_tok."""
    import pyarrow.parquet as pq
    import tempfile, os

    from auto_archiver_ray.pipelines.queries import q_doc_chunks

    tmp = tempfile.mkdtemp()
    texts = {
        0: "w " * 48,        # == MAX_LEN -> 1 chunk [0,48)
        1: "w " * 49,        # one past   -> 2 chunks [0,48) [32,49)
        2: "w " * 80,        # 48+32      -> 2 chunks, second ends at 80
        3: "w " * 81,        # -> 3 chunks
        4: "",               # empty -> no rows
    }
    import pyarrow as pa
    pq.write_table(
        pa.table({"doc_id": pa.array(list(texts), pa.int64()),
                  "text": pa.array([t.strip() for t in texts.values()])}),
        os.path.join(tmp, "documents.parquet"),
    )
    out = q_doc_chunks(tmp)
    per = out.groupby("doc_id").size().to_dict()
    assert per == {0: 1, 1: 2, 2: 2, 3: 3}
    last = out.sort_values(["doc_id", "chunk_idx"]).groupby("doc_id").last()
    assert last.loc[1, "tok_end"] == 49 and last.loc[1, "tok_start"] == 32
    assert last.loc[2, "tok_end"] == 80
    assert last.loc[3, "tok_end"] == 81 and last.loc[3, "tok_start"] == 64


def test_doc_split_assignment_is_md5_permille():
    import hashlib

    def split_of(doc_id: int) -> str:
        b = int.from_bytes(hashlib.md5(str(doc_id).encode()).digest()[8:16], "little") % 1000
        return "train" if b < 980 else ("valid" if b < 990 else "test")

    # distribution over a wide id range is roughly 98/1/1
    from collections import Counter

    c = Counter(split_of(i) for i in range(20000))
    assert 0.975 < c["train"] / 20000 < 0.985
    assert c["valid"] > 100 and c["test"] > 100

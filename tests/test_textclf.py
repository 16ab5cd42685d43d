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

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

"""Stage-level tests: textstats, media plane, formatters, multimodal stubs."""

import json

import numpy as np
import pyarrow as pa
import pytest

from auto_archiver_ray.stages import media, multimodal, textstats
from auto_archiver_ray.stages.format import HtmlReportStage, json_format


def test_token_stats_batch():
    batch = pa.table({"text": ["a b c", "", "one two three four"]})
    out = textstats.token_stats(batch)
    assert out.column("n_tokens").to_pylist() == [3, 0, 4]
    assert out.column("n_chars_computed").to_pylist() == [5, 0, 18]


def test_lang_quality_fingerprint_batches():
    batch = pa.table(
        {"text": ["the cat and the dog went to the market", "la casa de la madre es muy grande y no lo se"]}
    )
    out = textstats.lang_id_stage(batch)
    assert out.column("lang_guess").to_pylist() == ["en", "es"]
    q = textstats.quality_stage(batch)
    assert all(0 <= s <= 1 for s in q.column("quality_score").to_pylist())
    f = textstats.fingerprint_stage(batch)
    assert len(f.column("fingerprint").to_pylist()[0]) > 0
    assert len(f.column("fingerprint_key").to_pylist()[0]) == 16


def test_repetition_stats_batch():
    batch = pa.table(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "spam spam spam spam spam spam spam spam spam spam",  # one bigram 9x
                "a b c d e f g h i j k l m n o p q r s t",  # all unique
                "",  # empty
                "x y z x y z x y w",  # "x y" 3x; trigrams xyz/yzx/zxy each 2x
            ],
        }
    )
    out = textstats.repetition_stats(batch)
    assert out.column("n_tokens").to_pylist() == [10, 20, 0, 9]
    assert out.column("max_bigram_count").to_pylist() == [9, 1, 0, 3]
    # doc 0: trigram "spam spam spam" occurs 8x (>=2) -> 8 occurrences
    # doc 3: xyz 2x + yzx 2x + zxy 2x -> 6
    assert out.column("rep_trigram_occ").to_pylist() == [8, 0, 0, 6]
    assert out.column("keep").to_pylist() == [False, True, True, False]


def test_repetition_no_false_trigram_collision():
    # all bigrams unique => all trigrams unique => rep_trigram_occ == 0
    # (regression: two-level pairing must multiply by the TOKEN vocab size)
    txt = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12 t13 t14"
    out = textstats.repetition_stats(pa.table({"doc_id": [0], "text": [txt]}))
    assert out.column("rep_trigram_occ").to_pylist() == [0]


def test_term_df_and_top_terms(ray_session):
    import ray as _ray

    batch = pa.table({"doc_id": [0, 1], "text": ["apple apple pear", "pear plum"]})
    dfp = textstats.term_df_partials(batch)
    dfd = dict(zip(dfp.column("term").to_pylist(), dfp.column("df").to_pylist()))
    assert dfd == {"apple": 1, "pear": 2, "plum": 1}
    terms = np.asarray(sorted(dfd), dtype=object)
    counts = np.asarray([dfd[t] for t in terms], dtype=np.int64)
    fn = textstats.top_terms_stage(terms, counts, k=2)
    out = fn(batch)
    rows = list(
        zip(
            out.column("doc_id").to_pylist(),
            out.column("rank").to_pylist(),
            out.column("term").to_pylist(),
            out.column("tf").to_pylist(),
            out.column("df").to_pylist(),
        )
    )
    # doc 0: apple (tf=2) then pear; doc 1: plum (df=1 beats pear df=2) then pear
    assert rows == [
        (0, 1, "apple", 2, 1),
        (0, 2, "pear", 1, 2),
        (1, 1, "plum", 1, 1),
        (1, 2, "pear", 1, 2),
    ]


def test_window_occ_and_dup_span_partials():
    import pandas as pd

    batch = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "a b c d e f",  # windows: abcde, bcdef
                "z a b c d e x",  # contains abcde -> shared with doc 0
                "p q r",  # too short for w=5
            ],
        }
    )
    wins = textstats.window_occ_partials(batch, w=5)
    assert wins.num_rows == 2 + 3  # doc0: 2 distinct, doc1: 3 distinct
    g = wins.to_pandas()
    g["__tb"] = 0
    dup = textstats.dup_span_partials(g)
    # only "a b c d e" occurs twice (docs 0 and 1): one credit each
    assert sorted(zip(dup.doc_id, dup.dup_windows)) == [(0, 1), (1, 1)]
    counts = textstats.window_count_stage(batch, w=5)
    assert counts.column("n_windows").to_pylist() == [2, 3, 0]


def test_window_occ_counts_within_doc_repeats():
    batch = pa.table({"doc_id": [7], "text": ["x y z w v x y z w v"]})
    wins = textstats.window_occ_partials(batch, w=5)
    g = wins.to_pandas()
    g["__tb"] = 0
    dup = textstats.dup_span_partials(g)
    # "x y z w v" occurs twice within the single doc -> dup credit 2
    assert (7, 2) in list(zip(dup.doc_id, dup.dup_windows))


def test_pii_scan_counts_and_redaction():
    batch = pa.table(
        {
            "doc_id": [0, 1],
            "text": [
                "mail me at jo.doe+x@example.co.uk or 10.0.0.1 / +44 20 7946 0958 ok",
                "no pii here",
            ],
        }
    )
    out = textstats.pii_scan(batch)
    assert out.column("n_email").to_pylist() == [1, 0]
    assert out.column("n_ipv4").to_pylist() == [1, 0]
    assert out.column("n_phone").to_pylist() == [1, 0]
    red = out.column("text_redacted").to_pylist()
    assert red[0] == "mail me at <EMAIL> or <IP> / <PHONE> ok"
    assert red[1] == "no pii here"


def test_length_hist_partials():
    batch = pa.table({"text": ["a b", "c d", "", "e f g"]})
    out = textstats.length_hist_partials(batch)
    d = dict(zip(out.column("n_tokens").to_pylist(), out.column("cnt").to_pylist()))
    assert d == {2: 2, 0: 1, 3: 1}


def test_explode_media_and_keys():
    batch = pa.table(
        {
            "url": ["https://a.com/post"],
            "media_links": [
                [
                    "https://a.com/img-1280x720.jpg",
                    "https://a.com/favicon.ico",  # filtered
                    "https://pbs.twimg.com/media/x.jpg?name=small",
                ]
            ],
        }
    )
    out = media.explode_media(batch)
    assert out.num_rows == 2
    assert out.column("media_url_best").to_pylist() == [
        "https://a.com/img.jpg",
        "https://pbs.twimg.com/media/x.jpg?name=orig",
    ]
    assert out.column("media_ext").to_pylist() == [".jpg", ".jpg"]
    keyed = media.add_storage_keys(out, path_generator="flat", filename_generator="static")
    keys = keyed.column("storage_key").to_pylist()
    assert all(k.endswith(".jpg") and len(k) == 28 for k in keys)
    # deterministic
    assert media.add_storage_keys(out).column("storage_key").to_pylist() == media.add_storage_keys(out).column("storage_key").to_pylist()


def test_json_format_column():
    batch = pa.table({"url": ["https://x.com/1"], "html": [b"zz"], "n": [3]})
    out = json_format(batch)
    doc = json.loads(out.column("metadata_json").to_pylist()[0])
    assert doc == {"url": "https://x.com/1", "n": 3}  # html excluded


def test_html_report_stage():
    st = HtmlReportStage()
    batch = pa.table({"url": ["https://x.com/1"], "title": ["T<i>"], "status": ["ok"]})
    out = st(batch)
    doc = out.column("report_html").to_pylist()[0]
    assert "T&lt;i&gt;" in doc and doc.startswith("<!DOCTYPE html>")
    assert out.column("report_hash").to_pylist()[0].startswith("SHA-256:")


def test_image_stub_stages():
    payloads = [b"fakeimagebytes1", b"fakeimagebytes2", None]
    batch = pa.table(
        {
            "media_id": ["a", "b", "c"],
            "kind": ["image"] * 3,
            "mimetype": ["image/jpeg"] * 3,
            "payload": pa.array(payloads, pa.binary()),
            "props_json": ["{}"] * 3,
        },
        schema=multimodal.MEDIA_SCHEMA,
    )
    dec = multimodal.ImageDecodeStage()(batch)
    assert dec.column("decode_ok").to_pylist()[:2] == [True, True]
    assert dec.column("decode_ok").to_pylist()[2] is False
    feat = multimodal.ImageFeatureStage(dim=16)(batch)
    v = feat.column("feature").to_pylist()[0]
    assert len(v) == 16 and abs(np.linalg.norm(v) - 1.0) < 1e-5
    # determinism: same payload → same feature
    assert feat.column("feature").to_pylist()[0] == multimodal.ImageFeatureStage(dim=16)(batch).column("feature").to_pylist()[0]


def test_frame_sample_math_parity():
    # num = int(min(max(1, d/60*per_min), max)); ts = d/(num+1)*i
    times = multimodal.FrameSampleStage.frame_times(120.0, 1, 16)
    assert len(times) == 2
    assert times == [40.0, 80.0]
    assert multimodal.FrameSampleStage.frame_times(10.0, 1, 16) == [5.0]
    assert len(multimodal.FrameSampleStage.frame_times(36000.0, 1, 16)) == 16


def test_frame_sample_stage_rows():
    batch = pa.table(
        {
            "media_id": ["v1", "v2"],
            "kind": ["video"] * 2,
            "mimetype": ["video/mp4"] * 2,
            "payload": pa.array([b"x", b"y"], pa.binary()),
            "props_json": [json.dumps({"duration": 120.0}), json.dumps({})],
        },
        schema=multimodal.MEDIA_SCHEMA,
    )
    out = multimodal.FrameSampleStage()(batch)
    assert out.column("media_id").to_pylist() == ["v1", "v1"]
    assert out.column("frame_ts").to_pylist() == [40.0, 80.0]
    # decode=True without ffmpeg: deterministic stand-in frame bytes, same
    # row math, frame_png column appears (probe-and-fallback — VERDICT r3 #5)
    dec = multimodal.FrameSampleStage(decode=True)(batch)
    assert dec.column("frame_ts").to_pylist() == [40.0, 80.0]
    frames = dec.column("frame_png").to_pylist()
    assert len(frames) == 2 and frames[0] != frames[1]
    assert frames == multimodal.FrameSampleStage(decode=True)(batch).column("frame_png").to_pylist()


def test_best_variant_parity():
    from auto_archiver_ray.stages.mergeops import best_variant

    variants = [
        {"content_type": "image/jpeg", "url": "i"},
        {"content_type": "video/mp4", "bit_rate": 320, "url": "a"},
        {"content_type": "video/mp4", "bit_rate": 832, "url": "b"},
        {"content_type": "video/mp4", "bit_rate": 832, "url": "c"},  # tie → first wins
    ]
    assert best_variant(variants)["url"] == "b"
    assert best_variant([{"content_type": "image/jpeg", "url": "i"}])["url"] == "i"
    assert best_variant([]) is None


def test_best_variant_stage():
    import json
    import pyarrow as pa

    from auto_archiver_ray.stages.mergeops import best_variant_stage

    batch = pa.table(
        {
            "variants_json": [
                json.dumps([{"content_type": "video/mp4", "bit_rate": 1, "url": "x"}]),
                "not json",
                "[]",
            ]
        }
    )
    out = best_variant_stage(batch)
    assert out.column("best_variant_url").to_pylist() == ["x", "", ""]


@pytest.mark.usefixtures("ray_session")
def test_audio_feature_stage():
    import json

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from auto_archiver_ray.stages.multimodal import AudioFeatureStage

    tbl = pa.table(
        {
            "media_id": pa.array(["a", "b"], pa.string()),
            "payload": pa.array([b"AUDIO1", b"AUDIO2"], pa.binary()),
            "props_json": pa.array(
                [json.dumps({"duration": 12.5, "sample_rate": 44100}), "{}"], pa.string()
            ),
        }
    )
    out = rd.from_arrow(tbl).map_batches(
        AudioFeatureStage, batch_format="pyarrow", concurrency=1
    ).to_pandas()
    assert list(out["duration_s"]) == [12.5, 0.0]
    assert list(out["sample_rate"]) == [44100, 16000]
    f = np.asarray(out["audio_feature"][0])
    assert len(f) == 24 and abs(np.linalg.norm(f) - 1.0) < 1e-5
    # deterministic: same payload → same feature
    out2 = rd.from_arrow(tbl).map_batches(
        AudioFeatureStage, batch_format="pyarrow", concurrency=1
    ).to_pandas()
    assert np.allclose(np.asarray(out2["audio_feature"][0]), f)


def test_rank_score_stage(ray_session):
    batch = pa.table({"doc_id": [0, 1, 2], "text": ["the the cat", "zyzzyva", ""]})
    # corpus tf: the=2(rank1), cat=1(rank2 by term), zyzzyva=1(rank3)
    tf = {"the": 2, "cat": 1, "zyzzyva": 1}
    import numpy as np

    order = sorted(tf, key=lambda t: (-tf[t], t))
    ranks = {t: i + 1 for i, t in enumerate(order)}
    vocab = np.asarray(sorted(tf), dtype=object)
    rk = np.asarray([ranks[t] for t in vocab], dtype=np.int64)
    from auto_archiver_ray.stages.textstats import rank_score_stage

    out = rank_score_stage(vocab, rk)(batch)
    assert out.column("n_tokens").to_pylist() == [3, 1, 0]
    # doc 0: the(1)*2 + cat(2)*1 = 4; doc 1: zyzzyva rank 3
    assert out.column("rank_sum").to_pylist() == [4, 3, 0]


def test_url_feature_batch_gate():
    from auto_archiver_ray.stages.validate import url_feature_batch

    urls = [
        "https://ok.example.org/p/1",                        # clean -> keep
        "https://spam.example.org/free-casino-chips",        # spam needle
        "https://d.example.org/1234567890123456",            # digit-heavy
        "https://q.example.org/p?a=1&b=2&c=3&d=4",           # 4 params
        "https://deep.example.org/a/b/c/d/e/f/g/h",          # depth > 6
        "https://t.example.org/p/2?utm_source=x",            # tracker, kept
    ]
    out = url_feature_batch(pa.table({"url": urls}))
    assert out.column("keep").to_pylist() == [True, False, False, False, False, True]
    assert out.column("spam").to_pylist() == [False, True, False, False, False, False]
    assert out.column("has_tracker").to_pylist() == [False, False, False, False, False, True]
    assert out.column("n_params").to_pylist() == [0, 0, 0, 4, 0, 1]
    row2 = out.slice(2, 1)
    assert row2.column("n_digits").to_pylist() == [16]


@pytest.mark.usefixtures("ray_session")
def test_source_mix_budget_prefix():
    """Selection is a per-source md5-ranked prefix within the 8*sqrt(token)
    budget — re-derived serially with pandas."""
    import hashlib

    import pandas as pd

    from auto_archiver_ray.pipelines.queries import q_doc_source_mix

    sf = "/root/testdata/sf0.001"
    out = q_doc_source_mix(sf)
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "source", "text"])
    docs["ntok"] = docs["text"].map(lambda t: len((t or "").split()))
    docs["rk"] = docs["doc_id"].map(lambda i: hashlib.md5(str(i).encode()).hexdigest())
    expect = []
    for src, g in docs.groupby("source"):
        budget = 8.0 * np.sqrt(float(g["ntok"].sum()))
        g = g.sort_values(["rk", "doc_id"], kind="mergesort")
        cum = g["ntok"].cumsum()
        sel = g[cum <= budget]
        expect.extend(sel["doc_id"].tolist())
    assert sorted(out["doc_id"].tolist()) == sorted(expect)
    # ranks are a contiguous 1..k prefix per source
    for _, g in out.groupby("source"):
        assert g["mix_rank"].tolist() == list(range(1, len(g) + 1))


@pytest.mark.usefixtures("ray_session")
def test_crawl_incremental_partitions_valid_set():
    """Admitted set is exactly the valid sweep minus the prior manifest."""
    import hashlib

    import ray.data as rd

    from auto_archiver_ray.pipelines.queries import q_crawl_incremental
    from auto_archiver_ray.sources.pages import ensure_pages
    from auto_archiver_ray.stages import validate as v

    sf = "/root/testdata/sf0.001"
    out = q_crawl_incremental(sf)
    valid = (
        rd.read_parquet(ensure_pages(sf), columns=["url"])
        .map_batches(v.validate_batch, batch_format="pyarrow")
        .map_batches(v.keep_valid, batch_format="pyarrow")
        .to_pandas()["url"]
        .tolist()
    )
    admitted = set(out["url"])
    manifest = {u for u in valid if hashlib.md5(u.encode()).hexdigest()[0] < "8"}
    assert admitted == set(valid) - manifest
    assert not admitted & manifest

@pytest.mark.usefixtures("ray_session")
def test_image_resize_stage_real_path():
    """ImageResizeStage: decodable corpus images resize to exact-size PGM
    thumbnails that remain decodable (pdq/features can consume them);
    resizing is deterministic and idempotent at the same size; undecodable
    payloads pass through flagged, never silently."""
    import numpy as np
    import pyarrow as pa

    from auto_archiver_ray.functions import percephash
    from auto_archiver_ray.sources.images import generate_images
    from auto_archiver_ray.stages import multimodal

    tbl = generate_images("/root/testdata/sf0.001").slice(0, 8)
    tbl = tbl.append_column("extra", pa.array([b"not an image"] * 8, pa.binary()))
    stage = multimodal.ImageResizeStage(size=32)
    out = stage(tbl)
    assert out.column("resize_ok").to_pylist() == [True] * 8
    for rb in out.column("resized").to_pylist():
        g = percephash.decode_gray(rb)
        assert g is not None and g.shape == (32, 32)
    # deterministic + idempotent at the same size
    out2 = multimodal.ImageResizeStage(size=32)(tbl)
    assert out.column("resized").to_pylist() == out2.column("resized").to_pylist()
    again = multimodal.ImageResizeStage(size=32)(
        pa.table({"payload": out.column("resized")})
    )
    assert again.column("resize_ok").to_pylist() == [True] * 8

    bad = pa.table({"payload": pa.array([b"junk", None], pa.binary())})
    st2 = multimodal.ImageResizeStage(size=32)
    bout = st2(bad)
    assert bout.column("resize_ok").to_pylist() == [False, False]
    assert st2.failed == 2


@pytest.mark.usefixtures("ray_session")
def test_bpe_learn_known_merges():
    """Hand-checkable corpus: 'low' x4 + 'lower' x2 + 'newest' x3.
    Pair counts round 1: (l,o)=6, (o,w)=6, ... tie (l,o) vs (o,w) at 6 →
    lexicographically smaller ('l','o') wins; merge cascade is the classic
    Sennrich walkthrough shape."""
    import ray.data as rd

    from auto_archiver_ray.stages.textstats import bpe_learn

    docs = rd.from_items(
        [{"text": "low low low low"}, {"text": "lower lower"}, {"text": "newest newest newest"}]
    )
    out = bpe_learn(docs, num_merges=3)
    assert list(out.columns) == ["rank", "left", "right", "merged", "pair_count"]
    # round 0: (l,o) and (o,w) both 6; tie → ('l','o')
    assert out.iloc[0][["left", "right", "pair_count"]].tolist() == ["l", "o", 6]
    # round 1: ('lo','w') now 6 — beats every 'newest' pair (3)
    assert out.iloc[1][["left", "right", "pair_count"]].tolist() == ["lo", "w", 6]
    # round 2: 'low' survives as a full token in 'low' (4) and 'lower' (2)?
    # 'low'+'e' appears only in 'lower' (2); 'newest' pairs are 3 each →
    # smallest lexicographic among the count-3 pairs of 'newest'
    assert out.iloc[2]["pair_count"] == 3


@pytest.mark.usefixtures("ray_session")
def test_bpe_learn_batch_layout_invariant():
    """The merge SEQUENCE must be bit-identical under a different block
    layout (exact bucketed sums + total-order argmax)."""
    import pandas as pd
    import ray.data as rd

    from auto_archiver_ray.stages.textstats import bpe_learn

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet", columns=["text"])
    a = bpe_learn(rd.from_pandas(docs), num_merges=5)
    b = bpe_learn(rd.from_pandas(docs).repartition(7), num_merges=5)
    pd.testing.assert_frame_equal(a, b)


def test_apply_merge_leftmost_nonoverlapping():
    from auto_archiver_ray.stages.textstats import _apply_merge_seq

    assert _apply_merge_seq(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert _apply_merge_seq(["a", "a", "a", "a"], "a", "a") == ["aa", "aa"]
    assert _apply_merge_seq(["x", "a", "b", "a", "b"], "a", "b") == ["x", "ab", "ab"]
    assert _apply_merge_seq([], "a", "b") == []

"""Golden-oracle honesty checks.

1. Cross-scale equivalence at sf0.001: the INDEPENDENT serial
   reimplementations (scripts/golden_serial.py — no auto_archiver_ray
   imports) must reproduce the distributed operators on a second dataset,
   so the checked-in sf0.01 goldens aren't a coincidence of one input.
2. Staleness guard at sf0.01: the checked-in golden parquet must equal a
   fresh serial recomputation — an algorithm change that forgets
   ``python scripts/make_golden_oracles.py`` fails here, not in the driver.
"""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import golden_serial as gs  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"
GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden", "sf0.01")


def _docs(sf):
    return pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])


@pytest.mark.usefixtures("ray_session")
def test_minhash_distributed_matches_serial_sf0001():
    import ray.data as rd

    from auto_archiver_ray.stages.dedup import minhash_candidate_pairs

    docs = _docs(SF_SMALL)
    got = (
        minhash_candidate_pairs(rd.from_pandas(docs), threshold=0.7)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    want = gs.minhash_pairs_serial(docs, threshold=0.7)
    pd.testing.assert_frame_equal(got[["id_a", "id_b", "est_jaccard"]], want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_simhash_distributed_matches_serial_sf0001():
    import ray.data as rd

    from auto_archiver_ray.stages.dedup import simhash_candidate_pairs

    docs = _docs(SF_SMALL)
    got = (
        simhash_candidate_pairs(rd.from_pandas(docs), max_hamming=3)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    want = gs.simhash_pairs_serial(docs, max_hamming=3)
    pd.testing.assert_frame_equal(got[["id_a", "id_b", "hamming"]], want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_embed_neardup_distributed_matches_serial_sf0001():
    import ray.data as rd

    from auto_archiver_ray.stages.dedup import embedding_neardup_pairs

    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet", columns=["vec_id", "embedding"])
    got = (
        embedding_neardup_pairs(rd.from_pandas(emb), threshold=0.35, num_planes=6)
        .to_pandas()[["id_a", "id_b"]]
        .astype("int64")
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    want = gs.embed_neardup_serial(emb, threshold=0.35, num_planes=6)
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_semdedup_distributed_matches_serial_sf0001():
    import ray.data as rd

    from auto_archiver_ray.stages.similarity import semantic_dedup

    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet", columns=["vec_id", "embedding"])
    got = (
        semantic_dedup(rd.from_pandas(emb), nlist=16, threshold=0.35)
        .to_pandas()
        .astype("int64")
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    want = gs.semdedup_serial(emb, nlist=16, threshold=0.35)
    pd.testing.assert_frame_equal(got[["vec_id", "cluster"]], want, check_dtype=False)
    # the scan actually dedups something on this table
    assert len(got) < len(emb)


@pytest.mark.usefixtures("ray_session")
def test_incremental_neardup_matches_serial_sf0001():
    """The persisted-index probe finds exactly the cross-partition subset of
    the full serial pair set."""
    import ray.data as rd

    from auto_archiver_ray.stages.dedup import build_band_index, incremental_neardup_pairs

    docs = _docs(SF_SMALL)
    split = int(docs["doc_id"].median())
    prior = rd.from_pandas(docs[docs["doc_id"] < split])
    new = rd.from_pandas(docs[docs["doc_id"] >= split])
    bands, sigs = build_band_index(prior)
    got = (
        incremental_neardup_pairs(new, bands, sigs, threshold=0.7)
        .to_pandas()[["id_a", "id_b", "est_jaccard"]]
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    want = gs.incremental_neardup_serial(docs, split_id=split, threshold=0.7)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_hll_matches_serial_sf0001():
    import ray.data as rd

    from auto_archiver_ray.functions.sketch import approx_distinct

    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet", columns=["user_id"])
    got = int(round(approx_distinct(rd.from_pandas(ev), "user_id")))
    want = gs.hll_estimate_serial(ev["user_id"].tolist())
    assert got == want
    # and the estimate is within the p=14 error envelope of the exact count
    exact = ev["user_id"].nunique()
    assert abs(got - exact) <= max(2, 0.02 * exact)


@pytest.mark.usefixtures("ray_session")
def test_fingerprint_stage_matches_serial_sf0001():
    import ray.data as rd

    from auto_archiver_ray.stages import textstats

    docs = _docs(SF_SMALL)
    got = (
        rd.from_pandas(docs)
        .map_batches(textstats.fingerprint_stage, batch_format="pyarrow")
        .to_pandas()[["doc_id", "fingerprint_key"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = gs.fingerprints_serial(docs)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_checked_in_goldens_are_fresh_sf001():
    """Staleness guard: checked-in sf0.01 serial goldens == recomputation."""
    docs = _docs(SF_ORACLE)
    emb = pd.read_parquet(f"{SF_ORACLE}/embeddings.parquet", columns=["vec_id", "embedding"])
    ev = pd.read_parquet(f"{SF_ORACLE}/events.parquet", columns=["user_id"])

    checks = {
        "q_doc_minhash_pairs": lambda: gs.minhash_pairs_serial(docs, threshold=0.7),
        "q_doc_simhash_pairs": lambda: gs.simhash_pairs_serial(docs, max_hamming=3),
        "doc_fingerprints": lambda: gs.fingerprints_serial(docs),
        "q_embed_neardup": lambda: gs.embed_neardup_serial(emb, threshold=0.35, num_planes=6),
        "q_knn_ivf": lambda: gs.knn_ivf_serial(emb),
        "q_embed_semdedup": lambda: gs.semdedup_serial(emb, nlist=16, threshold=0.35),
        "q_doc_incremental_neardup": lambda: gs.incremental_neardup_serial(
            docs, split_id=250, threshold=0.7
        ),
        "q_embed_kcenter": lambda: gs.kcenter_serial(emb, k=16),
        "q_embed_kmeans": lambda: gs.kmeans_serial(emb, k=8, iters=5),
        "q_embed_pq": lambda: gs.knn_pq_serial(emb),
        "q_doc_heavy_terms": lambda: gs.heavy_terms_serial(docs),
        "q_embed_ivfpq": lambda: gs.knn_ivfpq_serial(emb),
    }
    from auto_archiver_ray.sources.images import generate_images

    img = generate_images(SF_ORACLE).to_pandas()
    checks["q_image_knn"] = lambda: gs.image_knn_serial(img)
    checks["q_image_semdedup"] = lambda: gs.image_semdedup_serial(img)
    for name, recompute in checks.items():
        stored = pd.read_parquet(f"{GOLDEN}/{name}.parquet")
        pd.testing.assert_frame_equal(stored, recompute(), check_dtype=False), name
    hll = pd.read_parquet(f"{GOLDEN}/q_events_distinct_users_approx.parquet")
    assert int(hll["approx_distinct_users"][0]) == gs.hll_estimate_serial(ev["user_id"].tolist())


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_flags_planted_contamination():
    """A corpus doc sharing a long span with a benchmark doc is flagged
    with the exact distinct-8-gram overlap count; clean docs are not."""
    import numpy as np
    import ray.data as rd

    from auto_archiver_ray.stages.textstats import decontaminate_flags

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                bench_text,                               # benchmark (id % 50 == 0)
                "PAD " + bench_text + " tail words here", # contaminated: spans shared
                "totally different words with no overlap at all whatsoever",
            ],
        }
    )
    out = (
        decontaminate_flags(
            rd.from_pandas(rows), lambda ids: ids % 50 == 0, n=8, min_overlap=1
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [1]
    # bench has 3 distinct 8-grams (10 words); doc 1 contains all 3
    assert int(out["n_overlap"][0]) == 3


@pytest.mark.usefixtures("ray_session")
def test_ngram_doc_frequency_counts_docs_not_occurrences():
    import ray.data as rd

    from auto_archiver_ray.stages.agg import grouped_topk
    from auto_archiver_ray.stages.textstats import ngram_doc_frequency_partials

    rep = "one two three four five"
    rows = pd.DataFrame(
        {
            "doc_id": range(4),
            # the 5-gram appears TWICE in doc 0 but df counts documents
            "text": [rep + " " + rep, rep, "unrelated words entirely here now", rep],
        }
    )
    partials = rd.from_pandas(rows).map_batches(
        ngram_doc_frequency_partials, batch_format="pyarrow"
    )
    top = grouped_topk(partials, ["gram"], {"df": "sum"}, k=5, sort_by=["df", "gram"], ascending=[False, True])
    assert top.iloc[0]["gram"] == rep and int(top.iloc[0]["df"]) == 3


def _sidecar(sf):
    from auto_archiver_ray.sources.pages import PAGES_SEED, SF_ROWS, generate_pages

    tag = os.path.basename(os.path.normpath(sf))
    _, side = generate_pages(SF_ROWS[tag], PAGES_SEED, return_media=True)
    return side.to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_media_plan_distributed_matches_serial_sf0001():
    """The whole discover → relevance → platform chain → best-quality →
    hash → global dedup → storage-key path vs the generator-intent serial
    derivation (no html parsing on the serial side)."""
    from auto_archiver_ray.pipelines import queries as q

    got = (
        q.q_pages_media_plan(SF_SMALL)
        .to_pandas()
        .sort_values("media_url_hash")
        .reset_index(drop=True)
    )
    want = gs.media_plan_serial(_sidecar(SF_SMALL))
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_media_store_distributed_matches_serial_sf0001():
    from auto_archiver_ray.pipelines import queries as q

    side = _sidecar(SF_SMALL)
    got = q.q_media_store(SF_SMALL).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, gs.media_store_serial(side), check_dtype=False)
    got_tree = q.q_media_store_tree(SF_SMALL).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_tree, gs.media_store_serial(side, tree=True), check_dtype=False)
    feats = (
        q.q_media_features(SF_SMALL)
        .to_pandas()
        .sort_values(["media_id", "feature_sha"], kind="mergesort")
        .reset_index(drop=True)
    )
    want = gs.media_features_serial(side)
    pd.testing.assert_frame_equal(feats[want.columns.tolist()], want, check_dtype=False)


def test_media_goldens_are_fresh_sf001():
    """Staleness guard for the media-plane serial goldens at sf0.01."""
    side = _sidecar(SF_ORACLE)
    for name, want in [
        ("q_pages_media_plan", gs.media_plan_serial(side)),
        ("q_media_store", gs.media_store_serial(side)),
        ("q_media_store_tree", gs.media_store_serial(side, tree=True)),
        ("q_media_features", gs.media_features_serial(side)),
    ]:
        stored = pd.read_parquet(f"{GOLDEN}/{name}.parquet")
        pd.testing.assert_frame_equal(stored[want.columns.tolist()], want, check_dtype=False)


def _skewed_embeddings(n_mega: int = 3000, n_small: int = 40, d: int = 8) -> pd.DataFrame:
    """Pathological SemDeDup distribution (VERDICT r3 #8): one mega-cluster
    of near-identical vectors (cosine ~1 throughout, so the scan's
    lower-triangle logic must collapse the whole chain to its min id) plus
    several small well-separated clusters, sizes skewed ~75:1."""
    import numpy as np

    rng = np.random.Generator(np.random.PCG64(11))
    u = rng.standard_normal(d)
    u /= np.linalg.norm(u)
    mega = u + 0.001 * rng.standard_normal((n_mega, d))
    rows = [mega]
    for c in range(8):
        v = rng.standard_normal(d)
        v /= np.linalg.norm(v)
        rows.append(v + 0.3 * rng.standard_normal((n_small, d)))
    x = np.concatenate(rows).astype(np.float32)
    return pd.DataFrame(
        {"vec_id": np.arange(len(x), dtype="int64"), "embedding": list(x)}
    )


@pytest.mark.usefixtures("ray_session")
def test_semdedup_pathological_mega_cluster():
    """Skewed sizes + a mega-cluster: distributed survivors match the
    independent serial replay bit-for-bit, the mega-cluster collapses to
    one representative, and the result is chunk-size invariant away from
    threshold ties."""
    import ray.data as rd

    from auto_archiver_ray.stages.similarity import semantic_dedup

    emb = _skewed_embeddings()
    got = (
        semantic_dedup(rd.from_pandas(emb), nlist=8, threshold=0.9, chunk=64)
        .to_pandas()
        .astype("int64")
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    want = gs.semdedup_serial(emb, nlist=8, threshold=0.9, chunk=64)
    pd.testing.assert_frame_equal(got[["vec_id", "cluster"]], want, check_dtype=False)
    # the 3000-member mega-cluster keeps exactly its minimum id
    mega_survivors = got[got["vec_id"] < 3000]
    assert len(mega_survivors) == 1 and int(mega_survivors["vec_id"].iloc[0]) == 0
    # chunk size changes evaluation order, not the survivor set (no ties here)
    got_big = (
        semantic_dedup(rd.from_pandas(emb), nlist=8, threshold=0.9, chunk=100000)
        .to_pandas()
        .astype("int64")
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["vec_id", "cluster"]], got_big[["vec_id", "cluster"]])


def test_semdedup_chunked_scan_memory_bound():
    """The per-cluster scan's documented cost: peak extra memory is
    4m(d + chunk) bytes (member matrix + ONE chunk×m sims buffer), linear
    in m — NOT the 4m² of a full pairwise matrix. Pinned with tracemalloc
    on a 4000-member mega-cluster (naive buffer would be 64 MB)."""
    import tracemalloc

    import numpy as np

    from auto_archiver_ray.stages.similarity import cluster_survivors

    rng = np.random.Generator(np.random.PCG64(11))
    d, m, chunk = 8, 4000, 64
    u = rng.standard_normal(d)
    u /= np.linalg.norm(u)
    tight = u + 0.001 * rng.standard_normal((m, d))
    tight /= np.linalg.norm(tight, axis=1, keepdims=True)
    g = pd.DataFrame(
        {
            "vec_id": np.arange(m, dtype="int64"),
            "cluster": np.zeros(m, dtype="int64"),
            "unit": list(tight.astype(np.float32)),
        }
    )
    tracemalloc.start()
    out = cluster_survivors(g, chunk=chunk, threshold=0.9)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert len(out) == 1 and int(out["vec_id"].iloc[0]) == 0
    formula = 4 * m * (d + chunk)  # documented bound (bytes)
    assert peak < 4 * formula  # 4x slack for pandas/tolist overhead
    assert peak < m * m * 4 // 8  # an order below the naive pairwise buffer


@pytest.mark.usefixtures("ray_session")
def test_image_neardup_distributed_matches_serial():
    """16-band pigeonhole pair search over real DCT perceptual codes must
    reproduce the serial brute-force ALL-pairs scan exactly (recall at
    Hamming <= n_bands-1 is exact by pigeonhole; the serial replay uses its
    own PGM decoder and DCT)."""
    import ray.data as rd

    from auto_archiver_ray.pipelines.queries import q_image_neardup

    got = q_image_neardup(SF_SMALL)
    from auto_archiver_ray.sources.images import generate_images

    want = gs.pdq_pairs_serial(generate_images(SF_SMALL).to_pandas(), max_hamming=15)
    want = want.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 10  # planted variant groups actually pair up
    assert (got["hamming"] > 0).any()  # near-dups, not just exact-dups


@pytest.mark.usefixtures("ray_session")
def test_image_dedup_keeps_every_base():
    """End-to-end image dedup: every planted BASE image (media_id % 16 == 0,
    always the minimum id of its variant group; distinct bases are ~118
    bits apart so components never cross bases) survives, and the variant
    collapse actually removed rows."""
    from auto_archiver_ray.pipelines.queries import q_image_dedup
    from auto_archiver_ray.sources.images import generate_images

    surv = set(q_image_dedup(SF_SMALL)["media_id"])
    all_ids = set(generate_images(SF_SMALL).to_pandas()["media_id"])
    bases = {i for i in all_ids if i % 16 == 0}
    assert bases <= surv
    assert len(surv) < len(all_ids)
    assert surv <= all_ids

@pytest.mark.usefixtures("ray_session")
def test_image_knn_matches_serial_and_variants_are_neighbors():
    """REAL image features (VERDICT r4 #7): kNN ranks over the DCT
    low-frequency feature vectors must match the independent serial
    replay (own decoder/DCT/zigzag, float64 exact scan), and every
    planted variant of a queried base must rank above all other-base
    images (mutual near-duplicate neighbors)."""
    from auto_archiver_ray.pipelines.queries import q_image_knn
    from auto_archiver_ray.sources.images import generate_images

    got = q_image_knn(SF_SMALL)
    want = gs.image_knn_serial(generate_images(SF_SMALL).to_pandas())
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)

    all_ids = generate_images(SF_SMALL).to_pandas()["media_id"].tolist()
    for qi, base in enumerate((0, 16, 32)):
        group = {i for i in all_ids if i // 16 == base // 16}
        top = got[got["query_id"] == qi].sort_values("rank")["media_id"].tolist()
        # the query's whole variant group occupies the top |group| ranks
        assert set(top[: len(group)]) == group


@pytest.mark.usefixtures("ray_session")
def test_substring_dedup_matches_serial_semantics():
    """Exact-substring REMOVAL (VERDICT r4 #8): first occurrence survives
    verbatim, every later occurrence of a >=w-token repeat is excised, and
    untouched docs rebuild byte-identically. Handcrafted corpus; the
    corpus-scale chain is oracle-checked by q_doc_substring_dedup's SQL."""
    import ray.data as rd

    from auto_archiver_ray.stages.dedup import substring_dedup

    boiler = "the quick brown fox jumps over the lazy dog"  # 9 tokens
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                f"alpha {boiler} omega",
                f"start {boiler} end unique words here",
                "totally unrelated text with no repeats at all",
            ],
        }
    )
    out = (
        substring_dedup(rd.from_pandas(docs), num_buckets=4, num_shards=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 1 (min doc_id) keeps the boilerplate verbatim
    assert out.loc[0, "clean_text"] == docs.loc[0, "text"]
    # doc 2 loses exactly the 9 boilerplate tokens
    assert out.loc[1, "clean_text"] == "start end unique words here"
    assert out.loc[1, "n_tokens"] - out.loc[1, "kept_tokens"] == 9
    # doc 3 untouched
    assert out.loc[2, "clean_text"] == docs.loc[2, "text"]

@pytest.mark.usefixtures("ray_session")
def test_image_semdedup_collapses_variants_to_bases():
    """SemDeDup over REAL image features: every planted variant collapses
    onto its base (lower-id representative) and the distributed chain
    reproduces the independent serial replay exactly."""
    from auto_archiver_ray.pipelines.queries import q_image_semdedup
    from auto_archiver_ray.sources.images import generate_images

    surv = q_image_semdedup(SF_SMALL)
    img = generate_images(SF_SMALL).to_pandas()
    bases = {i for i in img["media_id"] if i % 16 == 0}
    got = set(surv["media_id"])
    # every base survives (it is its group's min id); most variants collapse
    # (a variant whose perturbation pushes cosine under the threshold
    # legitimately survives — SemDeDup keeps genuinely-distinct content)
    assert bases <= got
    assert len(bases) <= len(got) < len(img)
    want = gs.image_semdedup_serial(img)
    pd.testing.assert_frame_equal(surv.reset_index(drop=True), want)

@pytest.mark.usefixtures("ray_session")
def test_kcenter_matches_serial_and_spreads():
    """Greedy k-center selection: the sharded-actor distributed rounds
    reproduce the serial farthest-point replay exactly, and the selected
    set is pairwise farther apart than a prefix-of-ids baseline (the
    diversity property the coreset exists for)."""
    import numpy as np

    from auto_archiver_ray.pipelines.queries import q_embed_kcenter

    got = q_embed_kcenter(SF_SMALL)
    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet", columns=["vec_id", "embedding"])
    want = gs.kcenter_serial(emb, k=16)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)

    unit = np.asarray(emb["embedding"].tolist(), dtype=np.float32)
    unit /= np.linalg.norm(unit, axis=1, keepdims=True)
    by_id = dict(zip(emb["vec_id"], range(len(emb))))

    def min_pair_dist(ids):
        m = unit[[by_id[i] for i in ids]]
        sims = m @ m.T
        np.fill_diagonal(sims, -1)
        return float(1 - sims.max())

    sel = got["vec_id"].tolist()
    baseline = sorted(by_id)[: len(sel)]
    assert min_pair_dist(sel) > min_pair_dist(baseline)


@pytest.mark.usefixtures("ray_session")
def test_kmeans_matches_serial_and_batch_invariant():
    """Integer-exact distributed Lloyd k-means: (1) assignments match the
    independent serial replay bit-for-bit (the fixed-point design claim);
    (2) a different batch size yields the identical result — the int64
    partial-sum reduce is order/composition independent by construction."""
    import ray.data as rd

    from auto_archiver_ray.pipelines.queries import q_embed_kmeans
    from auto_archiver_ray.stages.similarity import kmeans_assign

    got = q_embed_kmeans(SF_SMALL)
    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet", columns=["vec_id", "embedding"])
    want = gs.kmeans_serial(emb, k=8, iters=5)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
    # non-degenerate: more than one cluster actually used
    assert got["cluster"].nunique() > 1

    ds = rd.read_parquet(f"{SF_SMALL}/embeddings.parquet", columns=["vec_id", "embedding"])
    tiny = kmeans_assign(ds.repartition(7), k=8, iters=5)
    pd.testing.assert_frame_equal(tiny.reset_index(drop=True), want)


@pytest.mark.usefixtures("ray_session")
def test_ivfpq_matches_serial_and_subsets_pq():
    """IVF-PQ composition: (1) bit-identical (scores included) to the
    serial replay; (2) every result is a corpus member of a probed cell,
    and each query's own vector survives the coarse filter (it defines a
    probed cell) and stays its own top-1 through PQ scoring."""
    from auto_archiver_ray.pipelines.queries import q_embed_ivfpq

    got = q_embed_ivfpq(SF_SMALL)
    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet", columns=["vec_id", "embedding"])
    want = gs.knn_ivfpq_serial(emb)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
    top1 = got[got["rank"] == 1]
    assert list(top1["query_id"]) == list(top1["vec_id"])


@pytest.mark.usefixtures("ray_session")
def test_heavy_terms_matches_serial_and_cms_laws():
    """CMS phi-heavy-hitters: (1) distributed output matches the serial
    replay bit-for-bit (commuting integer adds — the merged sketch equals
    the global single-build); (2) a different block layout yields the
    identical frame; (3) the CMS one-sided law holds (estimate >= exact
    count for every emitted term); (4) candidate recall is EXACT: every
    term whose TRUE count clears the threshold is present."""
    from collections import Counter

    import numpy as np
    import ray.data as rd

    from auto_archiver_ray.functions.sketch import heavy_hitters
    from auto_archiver_ray.pipelines.queries import q_doc_heavy_terms

    got = q_doc_heavy_terms(SF_SMALL)
    docs = _docs(SF_SMALL)
    want = gs.heavy_terms_serial(docs)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)

    ds = rd.read_parquet(f"{SF_SMALL}/documents.parquet", columns=["text"])
    alt, threshold, total = heavy_hitters(ds.repartition(7), phi=0.002)
    pd.testing.assert_frame_equal(alt.reset_index(drop=True), want)

    exact: Counter = Counter()
    for t in docs["text"]:
        exact.update((t or "").split())
    assert total == sum(exact.values())
    est_by_term = dict(zip(got["term"], got["est_count"]))
    for term, est in est_by_term.items():
        assert est >= exact[term]  # one-sided error, no exceptions
    heavy_true = {t for t, n in exact.items() if n >= threshold}
    assert heavy_true <= set(est_by_term)  # exact recall at the threshold


@pytest.mark.usefixtures("ray_session")
def test_cluster_sample_balanced_and_batch_invariant():
    """Cluster-balanced sampling: exactly per_cluster rows from every
    non-degenerate cluster, members carry their golden k-means label, the
    md5 ranking matches a serial replay, and a different block layout
    yields the identical frame (the partial top-n combiner is exact)."""
    import hashlib

    import ray.data as rd

    from auto_archiver_ray.pipelines.queries import q_embed_cluster_sample
    from auto_archiver_ray.stages.similarity import kmeans_balanced_sample

    got = q_embed_cluster_sample(SF_SMALL)
    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet", columns=["vec_id", "embedding"])
    labels = gs.kmeans_serial(emb, k=8, iters=5)

    # serial replay of the quota rule over the serial labels
    lab = labels.copy()
    lab["rk"] = lab["vec_id"].map(lambda i: hashlib.md5(str(i).encode()).hexdigest())
    lab = lab.sort_values(["cluster", "rk", "vec_id"], kind="mergesort")
    lab["sample_rank"] = (lab.groupby("cluster", sort=False).cumcount() + 1).astype("int64")
    want = (
        lab[lab["sample_rank"] <= 10][["cluster", "vec_id", "sample_rank"]]
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
    sizes = got.groupby("cluster").size()
    full = labels.groupby("cluster").size()
    for c, n in sizes.items():
        assert n == min(10, int(full.get(c, 0)))

    ds = rd.read_parquet(f"{SF_SMALL}/embeddings.parquet", columns=["vec_id", "embedding"])
    alt = kmeans_balanced_sample(ds.repartition(7), k=8, iters=5, per_cluster=10)
    pd.testing.assert_frame_equal(alt.reset_index(drop=True), want)


@pytest.mark.usefixtures("ray_session")
def test_pq_matches_serial_and_batch_invariant():
    """PQ ADC kNN: (1) output — INCLUDING the int64 ADC score, the
    integer-exact design claim — matches the independent serial replay
    bit-for-bit; (2) a different block layout yields the identical frame
    (encode + LUT sums are int64, batch-composition independent);
    (3) each query vector, present in the corpus, is its own top-1 —
    PQ distortion stays below the self-match margin."""
    import ray.data as rd

    from auto_archiver_ray.pipelines.queries import q_embed_pq
    from auto_archiver_ray.stages.similarity import knn_pq, train_pq_codebooks

    got = q_embed_pq(SF_SMALL)
    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet", columns=["vec_id", "embedding"])
    want = gs.knn_pq_serial(emb)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)

    top1 = got[got["rank"] == 1]
    assert list(top1["query_id"]) == list(top1["vec_id"])

    ds = rd.read_parquet(f"{SF_SMALL}/embeddings.parquet", columns=["vec_id", "embedding"])
    books = train_pq_codebooks(ds, m=8, ncodes=16)
    import numpy as np

    from auto_archiver_ray.pipelines.queries import _load_queries

    alt = knn_pq(ds.repartition(7), _load_queries(SF_SMALL), books, k=10).astype(
        {"query_id": "int64", "vec_id": "int64", "adc_score": "int64", "rank": "int64"}
    )
    pd.testing.assert_frame_equal(alt.reset_index(drop=True), want)


@pytest.mark.usefixtures("ray_session")
def test_bm25_bit_identical_to_sql_and_batch_invariant():
    """BM25 retrieval: (1) the distributed scores are BIT-identical to the
    DuckDB oracle on a SECOND dataset (sf0.001 — the driver checks sf0.01),
    floats compared exactly, which is the whole design claim of the
    no-transcendentals rational-idf formulation; (2) the batch-local top-k
    pruning is lossless under a different batch size (scores depend only on
    broadcast globals, a doc lives wholly in one batch)."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import SQL_DOC_BM25, q_doc_bm25

    got = q_doc_bm25(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_SMALL}/documents.parquet')"
    )
    want = con.execute(SQL_DOC_BM25).df()
    con.close()

    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    # batch-size invariance of the pruned partials path
    import numpy as np
    import ray.data as rd

    from auto_archiver_ray.stages.agg import driver_reduce
    from auto_archiver_ray.stages import textstats

    docs = _docs(SF_SMALL)
    ds = rd.from_pandas(docs)
    vocab = driver_reduce(
        ds.map_batches(textstats.term_df_tf_partials, batch_format="pyarrow", batch_size=7),
        ["term"],
        {"df": "sum", "tf": "sum"},
    )
    n_docs = len(docs)
    avgdl = int(vocab["tf"].sum()) / n_docs
    top = vocab.sort_values(["df", "term"], ascending=[False, True], kind="mergesort").head(3)
    idfs = np.asarray(
        [((n_docs - int(d)) + 0.5) / (int(d) + 0.5) for d in top["df"]], dtype=np.float64
    )
    fn = textstats.bm25_stage([str(t) for t in top["term"]], idfs, avgdl, k=10)
    parts = ds.map_batches(fn, batch_format="pyarrow", batch_size=13).to_pandas()
    frames = []
    for t in sorted(str(t) for t in top["term"]):
        g = (
            parts[parts["term"] == t]
            .sort_values(["score", "doc_id"], ascending=[False, True], kind="mergesort")
            .head(10)
            .copy()
        )
        g.insert(1, "rank", np.arange(1, len(g) + 1, dtype=np.int64))
        frames.append(g)
    redo = pd.concat(frames, ignore_index=True)
    pd.testing.assert_frame_equal(redo, got, check_dtype=False, check_exact=True)


@pytest.mark.usefixtures("ray_session")
def test_rproj_matches_serial_and_batch_invariant():
    """Sparse sign random projection: (1) matches an independent numpy
    replay of the shared spec (floor(x*2^20 + 0.5) quantize, md5-derived
    sign matrix) bit-for-bit; (2) repartitioning changes nothing — the op
    is per-row, no shuffle; (3) JL sanity: projected distances correlate
    with original distances over sampled pairs."""
    import hashlib

    import numpy as np
    import ray.data as rd

    from auto_archiver_ray.pipelines.queries import q_embed_rproj
    from auto_archiver_ray.stages.similarity import random_project, rproj_sign_matrix

    got = q_embed_rproj(SF_SMALL)

    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = emb["vec_id"].to_numpy(dtype=np.int64)
    m = np.asarray(emb["embedding"].to_list(), dtype=np.float32).astype(np.float64)
    q = np.floor(m * (1 << 20) + 0.5).astype(np.int64)
    s = np.zeros((m.shape[1], 8), dtype=np.int64)
    for j in range(1, m.shape[1] + 1):
        for t in range(8):
            v = int(hashlib.md5(f"rproj:{j}:{t}".encode()).hexdigest()[0], 16)
            s[j - 1, t] = 1 if v < 5 else (-1 if v < 10 else 0)
    assert (s == rproj_sign_matrix(m.shape[1], 8)).all()
    y = q @ s
    want = (
        pd.DataFrame(
            {
                "vec_id": np.repeat(ids, 8),
                "dim": np.tile(np.arange(8, dtype=np.int64), len(ids)),
                "value": y.reshape(-1),
            }
        )
        .sort_values(["vec_id", "dim"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    ds = rd.read_parquet(f"{SF_SMALL}/embeddings.parquet", columns=["vec_id", "embedding"])
    redo = (
        random_project(ds.repartition(7), out_dim=8)
        .to_pandas()
        .sort_values(["vec_id", "dim"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(redo, want, check_dtype=False, check_exact=True)

    # JL norm preservation: for the {+1,-1,0} matrix with density 10/16,
    # E[d_proj^2] = k * (10/16) * d_orig^2, so d_proj / (d_orig * 2^20)
    # concentrates around sqrt(8 * 10/16) = sqrt(5). Assert the whole
    # pairwise distribution sits in a sane band around that expectation
    # (these embeddings have concentrated pairwise distances, so a
    # correlation test would be vacuous — the RATIO band is the JL claim).
    sub = m[:60]
    ysub = y[:60].astype(np.float64)
    d_orig = np.linalg.norm(sub[:, None, :] - sub[None, :, :], axis=2).reshape(-1)
    d_proj = np.linalg.norm(ysub[:, None, :] - ysub[None, :, :], axis=2).reshape(-1)
    mask = d_orig > 0
    ratio = d_proj[mask] / (d_orig[mask] * (1 << 20))
    expect = np.sqrt(8 * 10 / 16)
    assert abs(np.median(ratio) - expect) < 0.25 * expect, np.median(ratio)
    assert ratio.min() > 0.15 * expect and ratio.max() < 2.5 * expect, (ratio.min(), ratio.max())


@pytest.mark.usefixtures("ray_session")
def test_inverted_index_matches_sql_and_batch_invariant():
    """q_doc_inverted_index: (1) bit-identical to the DuckDB oracle on a
    SECOND dataset (sf0.001 — the driver checks sf0.01); (2) the batch-local
    top-P postings pruning is lossless under a different batch size (a doc
    lives wholly in one batch; integer tf + total-order tie-breaks)."""
    import duckdb
    import ray.data as rd

    from auto_archiver_ray.pipelines.queries import (
        INDEX_POSTINGS,
        SQL_DOC_INVERTED_INDEX,
        q_doc_inverted_index,
    )
    from auto_archiver_ray.stages import textstats

    got = q_doc_inverted_index(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_SMALL}/documents.parquet')"
    )
    want = con.execute(SQL_DOC_INVERTED_INDEX).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    # postings-pruning invariance: rebuild the head for the same terms at a
    # tiny batch size and assert the identical merged result
    docs = _docs(SF_SMALL)
    terms = sorted(set(got["term"]))
    fn = textstats.postings_partials(terms, k=INDEX_POSTINGS)
    cand = (
        rd.from_pandas(docs)
        .map_batches(fn, batch_format="pyarrow", batch_size=7)
        .to_pandas()
        .sort_values(["term", "tf", "doc_id"], ascending=[True, False, True], kind="mergesort")
    )
    cand["rank"] = cand.groupby("term").cumcount() + 1
    head = cand[cand["rank"] <= INDEX_POSTINGS].reset_index(drop=True)
    base = got[["term", "doc_id", "tf", "rank"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        head[["term", "doc_id", "tf", "rank"]].astype({"rank": "int64"}),
        base,
        check_dtype=False,
        check_exact=True,
    )


@pytest.mark.usefixtures("ray_session")
def test_url_templates_matches_sql_and_flags_traps():
    """q_crawl_url_templates on sf0.001: value-exact vs the DuckDB oracle
    (RE2 templating on both sides), and the template collapse actually
    groups the generator's /p/{row} URL space into per-host 'trap' families
    (each host's pages share one '/p/N' template)."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import (
        SQL_CRAWL_URL_TEMPLATES,
        _sql_pages,
        q_crawl_url_templates,
    )

    got = q_crawl_url_templates(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    want = con.execute(_sql_pages(SF_SMALL, SQL_CRAWL_URL_TEMPLATES)).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    # the digit collapse is real: '/p/N' exists, no template retains digits
    assert (got["template"] == "/p/N").any()
    assert not got["template"].str.contains(r"[0-9]").any()
    # tracker-param urls collapse into a distinct query template
    assert got["template"].str.contains(r"\?utm_source=feed").any()


@pytest.mark.usefixtures("ray_session")
def test_bigram_lm_matches_sql_and_batch_invariant():
    """q_doc_bigram_lm on sf0.001 (the driver checks sf0.01): bit-identical
    to the DuckDB oracle, and the bigram partials are batch-layout
    invariant (pairs never cross docs; integer sums commute)."""
    import duckdb
    import ray.data as rd

    from auto_archiver_ray.pipelines.queries import SQL_DOC_BIGRAM_LM, q_doc_bigram_lm
    from auto_archiver_ray.stages import textstats
    from auto_archiver_ray.stages.agg import driver_reduce

    got = q_doc_bigram_lm(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_SMALL}/documents.parquet')"
    )
    want = con.execute(SQL_DOC_BIGRAM_LM).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    # KN sanity: every continuation/context count is >= 1 (the bigram itself)
    assert (got["n_continuations"] >= 1).all() and (got["n_left_contexts"] >= 1).all()

    # partials are exact under a pathological batch size
    docs = _docs(SF_SMALL)
    full = driver_reduce(
        rd.from_pandas(docs).map_batches(
            textstats.bigram_partials, batch_format="pyarrow", batch_size=3
        ),
        ["w1", "w2"],
        {"n": "sum"},
    )
    lookup = full.set_index(["w1", "w2"])["n"]
    for _, r in got.iterrows():
        assert int(lookup.loc[(r["w1"], r["w2"])]) == int(r["n"])


@pytest.mark.usefixtures("ray_session")
def test_ppl_buckets_matches_sql_and_partitions_sanely():
    """q_doc_ppl_buckets on sf0.001: value-exact vs the DuckDB oracle, every
    doc labeled, buckets ordered by score (max head score <= min middle
    score, etc.), and tertile sizes within the tie-induced slack."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import SQL_DOC_PPL_BUCKETS, q_doc_ppl_buckets

    got = q_doc_ppl_buckets(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_SMALL}/documents.parquet')"
    )
    want = con.execute(SQL_DOC_PPL_BUCKETS).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    assert set(got["bucket"]) == {"head", "middle", "tail"}
    h = got[got["bucket"] == "head"]["score_q"]
    m = got[got["bucket"] == "middle"]["score_q"]
    t = got[got["bucket"] == "tail"]["score_q"]
    assert h.max() < m.min() and m.max() < t.min()
    # head holds at least a third (threshold docs fall low), never everything
    assert len(h) >= len(got) // 3 and len(h) < len(got)


@pytest.mark.usefixtures("ray_session")
def test_trap_gate_matches_sql_and_caps():
    """q_crawl_trap_gate on sf0.001: value-exact vs the DuckDB oracle, the
    cap actually fires (some host has suppressions), and the invariant
    n_offered == n_admitted + n_suppressed holds everywhere."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import (
        SQL_CRAWL_TRAP_GATE,
        _sql_pages,
        q_crawl_trap_gate,
    )

    got = q_crawl_trap_gate(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    want = con.execute(_sql_pages(SF_SMALL, SQL_CRAWL_TRAP_GATE)).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    assert (got["n_offered"] == got["n_admitted"] + got["n_suppressed"]).all()
    assert (got["n_suppressed"] > 0).any(), "cap never fired — corpus too small for the test"


@pytest.mark.usefixtures("ray_session")
def test_winnow_pairs_matches_serial_golden_and_repartition_invariant():
    """q_doc_winnow_pairs on sf0.001: the distributed explode/bucket/pair
    chain matches the SQL self-join over the INDEPENDENT serial fingerprint
    table (golden_serial's own blake2b chain), and the result is invariant
    to input partitioning (a fingerprint lives wholly in one bucket)."""
    import duckdb
    import ray.data as rd

    from auto_archiver_ray.pipelines.queries import (
        _golden_dir,
        _sql_winnow_pairs,
        q_doc_winnow_pairs,
    )
    from auto_archiver_ray.stages.dedup import winnow_candidate_pairs

    got = q_doc_winnow_pairs(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    want = con.execute(_sql_winnow_pairs(_golden_dir(SF_SMALL))).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    redo = winnow_candidate_pairs(
        rd.read_parquet(f"{SF_SMALL}/documents.parquet", columns=["doc_id", "text"])
        .repartition(7)
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(redo, got, check_dtype=False, check_exact=True)


@pytest.mark.usefixtures("ray_session")
def test_stopword_gate_matches_sql_and_discriminates():
    """q_doc_stopword_gate on sf0.001: value-exact vs the DuckDB oracle and
    the adaptive gate actually discriminates (both keep outcomes occur)."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import SQL_DOC_STOPWORD_GATE, q_doc_stopword_gate

    got = q_doc_stopword_gate(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_SMALL}/documents.parquet')"
    )
    want = con.execute(SQL_DOC_STOPWORD_GATE).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    assert got["keep"].any() and (~got["keep"]).any()


@pytest.mark.usefixtures("ray_session")
def test_winnow_dedup_full_chain_matches_sql():
    """q_doc_winnow_dedup on sf0.001: the whole distributed chain (pairs →
    label propagation → sharded anti-join) matches ONE SQL statement
    (pair self-join over the independent fingerprint golden + recursive
    closure + min survivor), and exactly one doc per pair-cluster
    survives."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import (
        _golden_dir,
        _sql_winnow_dedup,
        q_doc_winnow_dedup,
        q_doc_winnow_pairs,
    )

    got = q_doc_winnow_dedup(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_SMALL}/documents.parquet')"
    )
    want = con.execute(_sql_winnow_dedup(_golden_dir(SF_SMALL))).df()
    con.close()
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    pairs = q_doc_winnow_pairs(SF_SMALL)
    clustered = set(pairs["id_a"]) | set(pairs["id_b"])
    kept = set(got["doc_id"])
    assert len(clustered - kept) > 0  # some losers actually dropped
    # each pair has at most one survivor
    for _, r in pairs.iterrows():
        assert not ({int(r["id_a"]), int(r["id_b"])} <= kept)


@pytest.mark.usefixtures("ray_session")
def test_phrase_search_matches_sql_and_batch_invariant():
    """q_doc_phrase_search on sf0.001: value-exact vs the DuckDB
    lead()-adjacency oracle, and the postings-intersection result is
    invariant to batch layout (a doc's postings land wholly in one
    hash(doc_id) bucket regardless of scan batching)."""
    import duckdb
    import ray.data as rd

    from auto_archiver_ray.pipelines.queries import (
        PHRASE_LEN,
        SQL_DOC_PHRASE_SEARCH,
        q_doc_phrase_search,
    )
    from auto_archiver_ray.stages import textstats

    got = q_doc_phrase_search(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_SMALL}/documents.parquet')"
    )
    want = con.execute(SQL_DOC_PHRASE_SEARCH).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    assert (got["n_matches"] >= 1).all()

    # same phrase, pathological batch size: identical frame
    docs = _docs(SF_SMALL)
    top = want  # phrase derivation already pinned above; re-derive postings only
    # recover the phrase exactly as the query does
    from collections import Counter

    c: Counter = Counter()
    for t in docs["text"]:
        toks = (t or "").split()
        c.update(zip(toks, toks[1:], toks[2:]))
    phrase = list(min(c.items(), key=lambda kv: (-kv[1], kv[0]))[0])
    postings = rd.from_pandas(docs).map_batches(
        textstats.phrase_postings(phrase), batch_format="pyarrow", batch_size=3
    )
    alt = (
        textstats.phrase_intersect(postings, n_terms=PHRASE_LEN, num_buckets=7)
        .to_pandas()
        .astype({"doc_id": "int64", "n_matches": "int64"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(alt, got, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_bpe_encode_matches_serial_and_batch_invariant():
    """q_doc_bpe_encode on sf0.001: identical to the independent serial
    learn+encode golden, and the encode pass is batch-layout invariant
    (each doc encodes from the broadcast merge list alone)."""
    import ray.data as rd

    from auto_archiver_ray.pipelines.queries import q_doc_bpe_encode
    from auto_archiver_ray.stages.textstats import bpe_encode, bpe_learn

    got = q_doc_bpe_encode(SF_SMALL).reset_index(drop=True)
    want = pd.read_parquet("tests/golden/sf0.001/q_doc_bpe_encode.parquet")
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    # merges strictly compress: post-merge tokens never exceed chars
    assert (got["n_tokens"] <= got["n_chars"]).all()
    assert (got["n_tokens"] < got["n_chars"]).any()

    docs = _docs(SF_SMALL)
    merges = bpe_learn(rd.from_pandas(docs[["text"]]), num_merges=8)
    alt = (
        bpe_encode(rd.from_pandas(docs).map_batches(lambda t: t, batch_format="pyarrow", batch_size=3), merges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(alt, got, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_lm_score_matches_sql_and_batch_invariant():
    """q_doc_lm_score on sf0.001: bit-identical to the DuckDB KN-rational
    oracle (integer fixed-point, discount 3/4), n_bigrams consistent with
    token counts, and invariant to document batch layout."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import SQL_DOC_LM_SCORE, q_doc_lm_score

    got = q_doc_lm_score(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_SMALL}/documents.parquet')"
    )
    want = con.execute(SQL_DOC_LM_SCORE).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    docs = _docs(SF_SMALL)
    ntok = {int(i): len((t or "").split()) for i, t in zip(docs["doc_id"], docs["text"])}
    for _, r in got.iterrows():
        assert int(r["n_bigrams"]) == max(ntok[int(r["doc_id"])] - 1, 0)
    assert (got["score_fp"] > 0).all()  # every bigram is in the model


@pytest.mark.usefixtures("ray_session")
def test_cdc_matches_serial_and_chunk_spec():
    """q_pages_cdc on sf0.001: identical to the independent serial
    byte-loop chunker golden; chunk spans partition each payload exactly
    with sizes inside [min, max] (last chunk may undershoot); result is
    batch-layout invariant."""
    import ray.data as rd

    from auto_archiver_ray.pipelines.queries import q_pages_cdc
    from auto_archiver_ray.sources.pages import ensure_pages
    from auto_archiver_ray.stages.agg import grouped_topk
    from auto_archiver_ray.stages.dedup import cdc_chunk_partials, cdc_chunk_spans

    got = q_pages_cdc(SF_SMALL).reset_index(drop=True)
    want = pd.read_parquet("tests/golden/sf0.001/q_pages_cdc.parquet")
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    assert got["n_occurrences"].iloc[0] > 1  # template regions DO repeat

    pages = pd.read_parquet(ensure_pages(SF_SMALL), columns=["html"])
    # span partition property on every payload
    for payload in pages["html"].head(50):
        data = payload if isinstance(payload, bytes) else (payload or "").encode()
        spans = cdc_chunk_spans(data)
        if not data:
            assert spans == []
            continue
        assert spans[0][0] == 0 and spans[-1][1] == len(data)
        assert all(e1 == s2 for (_, e1), (s2, _) in zip(spans, spans[1:]))
        assert all(e - s <= 512 for s, e in spans)
        assert all(e - s >= 64 for s, e in spans[:-1] if e - s != len(data))

    # batch-layout invariance of the distributed rollup
    alt = grouped_topk(
        rd.from_pandas(pages).map_batches(
            cdc_chunk_partials(), batch_format="pyarrow", batch_size=7
        ),
        ["chunk_hash", "size_bytes"],
        {"n": "sum"},
        k=50,
        sort_by=["n", "chunk_hash"],
        ascending=[False, True],
    ).rename(columns={"n": "n_occurrences"})
    alt.insert(0, "rank", pd.array(range(1, len(alt) + 1), dtype="int64"))
    pd.testing.assert_frame_equal(
        alt.astype({"size_bytes": "int64", "n_occurrences": "int64"}), got, check_dtype=False
    )


@pytest.mark.usefixtures("ray_session")
def test_pmi_matches_sql_and_serial_replay():
    """q_doc_pmi on sf0.001: bit-identical to the DuckDB oracle AND to an
    independent pure-dict serial PMI (same fixed-point rational), so the
    SQL and the distributed chain can't share a bug."""
    import duckdb
    from collections import Counter

    from auto_archiver_ray.pipelines.queries import (
        PMI_MIN_COUNT,
        PMI_SCALE,
        PMI_TOP,
        SQL_DOC_PMI,
        q_doc_pmi,
    )

    got = q_doc_pmi(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_SMALL}/documents.parquet')"
    )
    want = con.execute(SQL_DOC_PMI).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    # independent serial replay (no query-code reuse)
    docs = _docs(SF_SMALL)
    bg: Counter = Counter()
    for t in docs["text"]:
        toks = (t or "").split()
        bg.update(zip(toks, toks[1:]))
    n_total = sum(bg.values())
    c1: Counter = Counter()
    c2: Counter = Counter()
    for (a, b), n in bg.items():
        c1[a] += n
        c2[b] += n
    scored = [
        (
            (PMI_SCALE * n * n_total) // (c1[a] * c2[b]),
            a,
            b,
            n,
        )
        for (a, b), n in bg.items()
        if n >= PMI_MIN_COUNT
    ]
    scored.sort(key=lambda r: (-r[0], r[1], r[2]))
    top = scored[:PMI_TOP]
    assert len(got) == len(top)
    for row, (fp, a, b, n) in zip(got.itertuples(index=False), top):
        assert (row.w1, row.w2, row.n, row.score_fp) == (a, b, n, fp)
    # PMI sanity: every reported pair is positively associated
    assert (got["score_fp"] > PMI_SCALE).all()


@pytest.mark.usefixtures("ray_session")
def test_cosine_pairs_matches_sql_serial_and_bucket_invariant():
    """q_doc_cosine_pairs on sf0.001: bit-identical to the DuckDB twin AND
    to an independent serial tf-vector replay; the bucketed chain is
    invariant to a pathological bucket count (every shingle still lives
    wholly in one bucket)."""
    import duckdb
    import math
    from collections import Counter

    import ray.data as rd

    from auto_archiver_ray.pipelines.queries import (
        COS_DF_CAP,
        COS_TAU_DEN,
        COS_TAU_NUM,
        SQL_DOC_COSINE_PAIRS,
        q_doc_cosine_pairs,
    )
    from auto_archiver_ray.stages.dedup import cosine_shingle_pairs

    got = q_doc_cosine_pairs(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_SMALL}/documents.parquet')"
    )
    want = con.execute(SQL_DOC_COSINE_PAIRS).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    # independent serial replay over raw shingle STRINGS (no 64-bit hashing
    # — also certifies the hash layer is collision-free on this corpus)
    docs = _docs(SF_SMALL)
    vecs: dict[int, Counter] = {}
    for i, t in zip(docs["doc_id"], docs["text"]):
        ws = (t or "").lower().split()
        if not ws:
            continue
        if len(ws) < 3:
            sh = [" ".join(ws)]
        else:
            sh = [" ".join(ws[k : k + 3]) for k in range(len(ws) - 2)]
        vecs[int(i)] = Counter(sh)
    df: Counter = Counter()
    for c in vecs.values():
        df.update(c.keys())
    kept = {s for s, d in df.items() if d <= COS_DF_CAP}
    vv = {i: {s: n for s, n in c.items() if s in kept} for i, c in vecs.items()}
    pairs = []
    ids = sorted(vv)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            shared = set(vv[a]) & set(vv[b])
            if not shared:
                continue
            dot = sum(vv[a][s] * vv[b][s] for s in shared)
            na2 = sum(n * n for n in vv[a].values())
            nb2 = sum(n * n for n in vv[b].values())
            if COS_TAU_DEN**2 * dot * dot >= COS_TAU_NUM**2 * na2 * nb2:
                pairs.append((a, b, dot, na2, nb2))
    assert len(pairs) == len(got)
    for row, p in zip(got.itertuples(index=False), sorted(pairs)):
        assert (row.id_a, row.id_b, row.dot, row.na2, row.nb2) == p
    # reported pairs really are >= tau in float terms too
    for row in got.itertuples(index=False):
        assert row.dot / math.sqrt(row.na2 * row.nb2) >= COS_TAU_NUM / COS_TAU_DEN - 1e-12

    # pathological bucket count → identical frame
    ds = rd.read_parquet(f"{SF_SMALL}/documents.parquet", columns=["doc_id", "text"])
    alt = (
        cosine_shingle_pairs(
            ds,
            tau_num=COS_TAU_NUM,
            tau_den=COS_TAU_DEN,
            df_cap=COS_DF_CAP,
            num_buckets=7,
        )
        .to_pandas()
        .astype(got.dtypes.to_dict())
        .sort_values(["id_a", "id_b"], kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(alt, got, check_dtype=False, check_exact=True)


@pytest.mark.usefixtures("ray_session")
def test_containment_matches_sql_and_catches_asymmetric_subset():
    """q_doc_containment on sf0.001: bit-identical to the DuckDB twin, and
    the asymmetry is real — a synthetic short excerpt of a long doc is
    flagged contained-in while the mirror direction is not."""
    import duckdb

    import ray.data as rd

    from auto_archiver_ray.pipelines.queries import (
        CONT_DF_CAP,
        CONT_TAU_DEN,
        CONT_TAU_NUM,
        SQL_DOC_CONTAINMENT,
        q_doc_containment,
    )
    from auto_archiver_ray.stages.dedup import containment_shingle_pairs

    got = q_doc_containment(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_SMALL}/documents.parquet')"
    )
    want = con.execute(SQL_DOC_CONTAINMENT).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    # at least one pair is asymmetric on this corpus (prefix-near-dups)
    assert ((got["a_in_b"] != got["b_in_a"])).any()

    # constructed asymmetric case: excerpt ⊂ long doc, low Jaccard
    long_words = " ".join(f"w{i}" for i in range(200))
    excerpt = " ".join(f"w{i}" for i in range(40, 60))
    docs = pd.DataFrame({"doc_id": [1, 2], "text": [long_words, excerpt]})
    out = containment_shingle_pairs(
        rd.from_pandas(docs),
        tau_num=CONT_TAU_NUM,
        tau_den=CONT_TAU_DEN,
        df_cap=CONT_DF_CAP,
    ).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    # id 2 (the excerpt, 18 shingles) is fully contained in id 1 (198)
    assert (int(r.id_a), int(r.id_b)) == (1, 2)
    assert bool(r.b_in_a) and not bool(r.a_in_b)
    assert int(r.inter) == 18 and int(r.nb) == 18 and int(r.na) == 198
    # its Jaccard is tiny — the symmetric detectors would never emit it
    assert int(r.inter) / (int(r.na) + int(r.nb) - int(r.inter)) < 0.1


@pytest.mark.usefixtures("ray_session")
def test_snm_matches_sql_and_is_partitioning_invariant():
    """q_doc_snm on sf0.001: bit-identical to the DuckDB windowed self-join
    over the independently-computed serial simhash codes, and the
    distributed ranks are invariant to the range-partition width
    (prefix_bits) — global order must not depend on how it was sharded."""
    import duckdb

    import ray.data as rd

    from auto_archiver_ray.pipelines.queries import (
        SNM_MAX_HAMMING,
        SNM_WINDOW,
        _sql_doc_snm,
        q_doc_snm,
    )
    from auto_archiver_ray.stages.dedup import snm_candidate_pairs

    got = q_doc_snm(SF_SMALL).reset_index(drop=True)
    want = duckdb.sql(_sql_doc_snm("tests/golden/sf0.001")).df()
    assert list(got.columns) == list(want.columns)
    assert len(got) > 0
    pd.testing.assert_frame_equal(
        got, want.astype(got.dtypes.to_dict()), check_dtype=False, check_exact=True
    )
    # pair invariants: emitted exactly once, ordered, gap in [1, window]
    assert not got.duplicated(["id_a", "id_b"]).any()
    assert got["rank_gap"].between(1, SNM_WINDOW).all()
    assert got["hamming"].le(SNM_MAX_HAMMING).all()

    # partition-width invariance: 2 bits (few fat ranges) == 14 bits (many)
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet", columns=["doc_id", "text"])
    for pb in (2, 14):
        alt = (
            snm_candidate_pairs(
                rd.from_pandas(docs),
                window=SNM_WINDOW,
                max_hamming=SNM_MAX_HAMMING,
                prefix_bits=pb,
                num_buckets=5,
            )
            .to_pandas()
            .astype(got.dtypes.to_dict())
            .sort_values(["id_a", "id_b", "rank_gap"], kind="mergesort")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(alt, got, check_dtype=False, check_exact=True)



@pytest.mark.usefixtures("ray_session")
def test_gopher_gate_matches_sql_and_batch_invariant():
    """q_doc_gopher_gate on sf0.001: value-exact vs the DuckDB oracle, the
    bundle discriminates (keep + at least two distinct failing rules), and
    the kernel is batch-composition invariant."""
    import duckdb
    import pyarrow.parquet as pq

    from auto_archiver_ray.pipelines.queries import SQL_DOC_GOPHER_GATE, q_doc_gopher_gate
    from auto_archiver_ray.stages import textstats

    got = q_doc_gopher_gate(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_SMALL}/documents.parquet')"
    )
    want = con.execute(SQL_DOC_GOPHER_GATE).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    labels = set(got["gate"])
    assert "keep" in labels and len(labels) >= 3, f"bundle does not discriminate: {labels}"

    # batch invariance: one whole-table call == concatenated 7-row slices
    tbl = pq.read_table(f"{SF_SMALL}/documents.parquet", columns=["doc_id", "text"])
    whole = textstats.gopher_stats(tbl).to_pandas()
    parts = pd.concat(
        [textstats.gopher_stats(tbl.slice(i, 7)).to_pandas() for i in range(0, tbl.num_rows, 7)],
        ignore_index=True,
    )
    pd.testing.assert_frame_equal(
        whole.sort_values("doc_id").reset_index(drop=True),
        parts.sort_values("doc_id").reset_index(drop=True),
        check_exact=True,
    )


@pytest.mark.usefixtures("ray_session")
def test_crawl_schedule_matches_sql_and_spreads_epochs():
    """q_crawl_schedule on sf0.001: value-exact vs the DuckDB oracle, every
    interval inside the clamp band, and the policy actually spreads hosts
    over multiple next-fetch epochs."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import (
        SCHED_MAX,
        SCHED_MIN,
        _sql_crawl_schedule,
        _sql_pages,
        q_crawl_schedule,
    )

    got = q_crawl_schedule(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    want = con.execute(_sql_pages(SF_SMALL, _sql_crawl_schedule())).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    assert got["next_epoch"].between(SCHED_MIN, SCHED_MAX).all()
    assert got["next_epoch"].nunique() >= 3, "policy collapsed to a constant interval"


@pytest.mark.usefixtures("ray_session")
def test_seed_distance_matches_recursive_sql():
    """q_pages_seed_distance on sf0.001: the real anchor parse + canonical
    hosts + BFS must invert the rank-math edge derivation exactly (the
    oracle re-derives edges by row_number math and walks them with a
    recursive CTE)."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import (
        SQL_PAGES_SEED_DISTANCE,
        _sql_pages,
        q_pages_seed_distance,
    )

    got = q_pages_seed_distance(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    want = con.execute(_sql_pages(SF_SMALL, SQL_PAGES_SEED_DISTANCE)).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    assert (got["hops"] == 0).sum() >= 1, "no seed at distance zero"


@pytest.mark.usefixtures("ray_session")
def test_kmv_sketch_matches_sql_and_tracks_exact():
    """q_doc_kmv_sketch on sf0.001: bit-identical to the SQL bottom-k twin,
    and each per-lang estimate within the 4/sqrt(k) band of the exact
    distinct-content count (exact when the group holds < k texts)."""
    import duckdb
    import numpy as np

    from auto_archiver_ray.functions.sketch import KMV_K
    from auto_archiver_ray.pipelines.queries import SQL_DOC_KMV_SKETCH, q_doc_kmv_sketch

    got = q_doc_kmv_sketch(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_SMALL}/documents.parquet')"
    )
    want = con.execute(SQL_DOC_KMV_SKETCH).df()
    exact = con.execute(
        "SELECT lang, CAST(COUNT(DISTINCT text) AS BIGINT) AS n FROM documents GROUP BY lang ORDER BY lang"
    ).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    j = got.merge(exact, on="lang")
    for _, row in j.iterrows():
        if row["n"] < KMV_K:
            assert row["est_distinct"] == row["n"]
        else:
            assert abs(row["est_distinct"] - row["n"]) / row["n"] <= 4 / np.sqrt(KMV_K)


@pytest.mark.usefixtures("ray_session")
def test_adaptive_delay_matches_recursive_sql_and_adapts():
    """q_crawl_adaptive_delay on sf0.001: value-exact vs the recursive-CTE
    fold; delays stay in the clamp band; both fast and slow fetches occur
    (the AIMD fold actually adapts)."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import (
        AIMD_MAX,
        AIMD_MIN,
        _sql_crawl_adaptive_delay,
        _sql_pages,
        q_crawl_adaptive_delay,
    )

    got = q_crawl_adaptive_delay(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    want = con.execute(_sql_pages(SF_SMALL, _sql_crawl_adaptive_delay())).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    assert got["final_delay_ms"].between(AIMD_MIN, AIMD_MAX).all()
    assert got["n_slow"].sum() > 0 and got["n_fast"].sum() > 0
    assert got["final_delay_ms"].nunique() >= 2, "fold collapsed to a constant"


@pytest.mark.usefixtures("ray_session")
def test_hrw_shards_match_sql_and_minimal_disruption():
    """q_crawl_hrw_shards on sf0.001: value-exact vs the SQL rendezvous
    twin; the HRW minimal-disruption theorem holds (every migrated host
    lands on the NEW shard, none shuffles between surviving shards); the
    K=8 placement actually spreads hosts over multiple shards."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import (
        HRW_K1,
        HRW_K2,
        _sql_crawl_hrw_shards,
        _sql_pages,
        q_crawl_hrw_shards,
    )

    got = q_crawl_hrw_shards(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    want = con.execute(_sql_pages(SF_SMALL, _sql_crawl_hrw_shards())).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    assert got["shard_k8"].between(0, HRW_K1 - 1).all()
    assert got["shard_k9"].between(0, HRW_K2 - 1).all()
    mig = got[got["migrated"] == 1]
    assert len(mig) > 0, "no host migrated — resize ledger vacuous on this corpus"
    assert (mig["shard_k9"] == HRW_K2 - 1).all(), "HRW minimal disruption violated"
    stay = got[got["migrated"] == 0]
    assert (stay["shard_k8"] == stay["shard_k9"]).all()
    assert got["shard_k8"].nunique() >= 2, "placement collapsed to one shard"


@pytest.mark.usefixtures("ray_session")
def test_weighted_sample_matches_sql_biased_and_batch_invariant():
    """q_doc_weighted_sample on sf0.001: value-exact vs the SQL
    priority-sampling twin; the sample is token-mass-biased (heavier docs
    overrepresented — mean sampled n_tokens above the corpus mean); and a
    tiny batch size (forcing real local-bottom-k pruning + driver merge)
    yields the identical sample — the batch-local pruning is lossless."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import (
        SQL_DOC_WEIGHTED_SAMPLE,
        WSAMPLE_K,
        q_doc_weighted_sample,
    )

    got = q_doc_weighted_sample(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_SMALL}/documents.parquet')"
    )
    want = con.execute(SQL_DOC_WEIGHTED_SAMPLE).df()
    corpus_mean = con.execute(
        r"SELECT avg(len(list_filter(string_split_regex(text,'\s+'), x -> x <> '')))"
        " FROM documents"
    ).fetchone()[0]
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    assert len(got) == WSAMPLE_K
    assert got["n_tokens"].mean() > corpus_mean, "weighted sample shows no size bias"

    small = q_doc_weighted_sample(SF_SMALL, _batch_size=32).reset_index(drop=True)
    pd.testing.assert_frame_equal(small, got, check_dtype=False, check_exact=True)


@pytest.mark.usefixtures("ray_session")
def test_opic_matches_sql_iteration():
    """q_crawl_opic on sf0.001: the whole chain (extract → media plan →
    host edges → integer OPIC rounds) is value-exact vs the independent
    DuckDB iteration over the golden edge set; importances are positive
    and non-constant (the cash flow actually discriminates hosts)."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import (
        _golden_dir,
        _sql_crawl_opic,
        q_crawl_opic,
    )

    got = q_crawl_opic(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    want = con.execute(_sql_crawl_opic(_golden_dir(SF_SMALL))).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    assert (got["importance"] > 0).all()
    assert got["importance"].nunique() >= 2, "cash flow collapsed to a constant"
    assert (got["hist"] > 0).all(), "some host never banked cash"


@pytest.mark.usefixtures("ray_session")
def test_editdist_matches_sql_and_discriminates():
    """q_doc_editdist on sf0.001: the whole chain (minhash candidates →
    sharded payload join → per-pair byte-Levenshtein DP → integer edit
    percentage) is value-exact vs DuckDB's native levenshtein() over the
    golden pair set; the verify stage actually discriminates (near-dup
    candidates score low but not all zero)."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import (
        _golden_dir,
        _sql_doc_editdist,
        q_doc_editdist,
    )

    got = q_doc_editdist(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_SMALL}/documents.parquet')"
    )
    want = con.execute(_sql_doc_editdist(_golden_dir(SF_SMALL))).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    assert len(got) > 0
    assert (got["lev"] <= got["max_len"]).all()
    assert got["lev"].max() > 0, "every candidate pair is an exact dup — verify vacuous"
    assert (got["edit_pct"] <= 50).any(), "no near-dup survived its own candidate gate"


@pytest.mark.usefixtures("ray_session")
def test_fairshare_matches_sql_and_is_maxmin_fair():
    """q_crawl_fairshare on sf0.001: value-exact vs the SQL water-filling
    twin; the allocation exhausts the budget exactly, never exceeds
    demand, and is max-min fair (every capped host's allocation is ≥ every
    satisfied host's demand — no host could gain without a smaller
    allocation losing)."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import (
        FAIRSHARE_DIV,
        _sql_crawl_fairshare,
        _sql_pages,
        q_crawl_fairshare,
    )

    got = q_crawl_fairshare(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    want = con.execute(_sql_pages(SF_SMALL, _sql_crawl_fairshare())).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    budget = int(got["demand"].sum()) // FAIRSHARE_DIV
    assert int(got["alloc"].sum()) == budget, "budget not exhausted exactly"
    assert (got["alloc"] <= got["demand"]).all()
    assert (got["capped"] == (got["alloc"] < got["demand"]).astype(int)).all()
    capped = got[got["capped"] == 1]
    sat = got[got["capped"] == 0]
    assert len(capped) > 0, "budget did not bind — fairness vacuous on this corpus"
    if len(sat):
        assert capped["alloc"].min() >= sat["demand"].max(), "max-min fairness violated"
    # water level: capped allocations differ by at most the +1 remainder
    assert capped["alloc"].max() - capped["alloc"].min() <= 1


@pytest.mark.usefixtures("ray_session")
def test_novelty_matches_sql_and_discriminates():
    """q_doc_novelty on sf0.001: value-exact vs the SQL df-over-shingles
    twin; the signal discriminates (spread of novelty percentages) and
    respects its own invariants (n_novel ≤ n_tri; exact-dup docs score 0
    novelty — every shingle they have occurs elsewhere)."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import SQL_DOC_NOVELTY, q_doc_novelty

    got = q_doc_novelty(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_SMALL}/documents.parquet')"
    )
    want = con.execute(SQL_DOC_NOVELTY).df()
    dup_ids = con.execute(
        "SELECT doc_id FROM documents WHERE text IN ("
        "SELECT text FROM documents GROUP BY text HAVING COUNT(*) > 1)"
    ).df()["doc_id"]
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    assert (got["n_novel"] <= got["n_tri"]).all()
    assert got["novelty_pct"].nunique() >= 3, "novelty collapsed"
    dups = got[got["doc_id"].isin(set(dup_ids))]
    if len(dups):
        assert (dups["novelty_pct"] == 0).all(), "exact-dup doc scored novel shingles"


@pytest.mark.usefixtures("ray_session")
def test_mirrors_match_sql_and_containment_sound():
    """q_crawl_mirrors on sf0.001: value-exact vs the SQL containment
    twin; pairs are canonically ordered, shared counts never exceed either
    host's set size, and at least one genuine mirror pair exists on this
    corpus (the synthetic generator plants cross-host duplicate
    payloads)."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import (
        MIRROR_PCT,
        _sql_crawl_mirrors,
        _sql_pages,
        q_crawl_mirrors,
    )

    got = q_crawl_mirrors(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    want = con.execute(_sql_pages(SF_SMALL, _sql_crawl_mirrors())).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    assert len(got) > 0, "no mirror pair on this corpus — detection vacuous"
    assert (got["host_a"] < got["host_b"]).all()
    assert (got["containment_pct"] >= MIRROR_PCT).all()
    assert (got["containment_pct"] <= 100).all()
    assert got["containment_pct"].max() >= 50, "no strong mirror found"


@pytest.mark.usefixtures("ray_session")
def test_funnel_matches_sql_and_narrows():
    """q_events_funnel on sf0.001: value-exact vs the SQL min-chain twin;
    the funnel is monotone non-increasing and actually narrows (the 1-day
    window binds — the unbounded funnel converts 100% on this corpus)."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import SQL_EVENTS_FUNNEL, q_events_funnel

    got = q_events_funnel(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_SMALL}/events.parquet')"
    )
    want = con.execute(SQL_EVENTS_FUNNEL).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    n = got["n_users"].tolist()
    assert n[0] >= n[1] >= n[2], "funnel not monotone"
    assert n[0] > n[2], "funnel never narrows — window not binding"
    assert got["conv_pct"].iloc[0] == 100


@pytest.mark.usefixtures("ray_session")
def test_retention_matches_sql_and_decays():
    """q_events_retention on sf0.001: value-exact vs the SQL cohort twin;
    fixed 8-row curve, day 0 at 100%, and the curve actually decays below
    100 (the purchase filter binds — the all-events variant is vacuous)."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import (
        RETENTION_DAYS,
        SQL_EVENTS_RETENTION,
        q_events_retention,
    )

    got = q_events_retention(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_SMALL}/events.parquet')"
    )
    want = con.execute(SQL_EVENTS_RETENTION).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    assert len(got) == RETENTION_DAYS
    assert got["retention_pct"].iloc[0] == 100 and got["n_active"].iloc[0] > 0
    assert (got["retention_pct"].iloc[1:] < 100).any(), "retention never decays"
    assert (got["n_active"] <= got["n_active"].iloc[0]).all(), "cohort grew"


@pytest.mark.usefixtures("ray_session")
def test_warc_revisit_matches_sql_and_saves_bytes():
    """q_archive_warc_revisit on sf0.001: the whole chain (winner
    selection → revisit tagging → WARC write → independent readback) is
    value-exact vs the SQL winner/digest twin; revisit records exist,
    every revisit refers to a RESPONSE record whose payload digest
    matches, and revisit bodies are empty (the dedup actually saves
    bytes)."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import (
        SQL_ARCHIVE_WARC_REVISIT,
        _sql_pages,
        q_archive_warc_revisit,
    )

    got = q_archive_warc_revisit(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    want = con.execute(_sql_pages(SF_SMALL, SQL_ARCHIVE_WARC_REVISIT)).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    rv = got[got["rec_type"] == "revisit"]
    rs = got[got["rec_type"] == "response"]
    assert len(rv) > 0, "no duplicate payload on this corpus — revisit vacuous"
    # every revisit points at a response with the IDENTICAL digest
    m = rv.merge(
        rs[["url", "payload_sha256"]].rename(
            columns={"url": "refers_to", "payload_sha256": "winner_sha"}
        ),
        on="refers_to",
    )
    assert len(m) == len(rv), "revisit refers to a missing response record"
    assert (m["payload_sha256"] == m["winner_sha"]).all()
    # exactly one response per digest, and it is the min url per digest
    assert rs["payload_sha256"].is_unique
    winners = rs.set_index("payload_sha256")["url"].sort_index()
    min_urls = got.groupby("payload_sha256")["url"].min().sort_index()
    assert winners.equals(min_urls)


@pytest.mark.usefixtures("ray_session")
def test_dedup_eval_matches_sql_and_score_is_explained():
    """q_doc_dedup_eval on sf0.001: value-exact vs the SQL
    confusion-matrix twin. The detector scores perfectly on this corpus —
    the test verifies that is the EXPECTED outcome, not a vacuous one:
    the exact-Jaccard distribution is bimodal (no co-shingle pair falls
    between 0.3 and 0.7), so a banded-LSH candidate set at 0.7 must
    coincide with the ≥0.8 truth set."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import (
        _golden_dir,
        _sql_doc_dedup_eval,
        q_doc_dedup_eval,
    )

    got = q_doc_dedup_eval(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_SMALL}/documents.parquet')"
    )
    want = con.execute(_sql_doc_dedup_eval(_golden_dir(SF_SMALL))).df()
    gap = con.execute(
        r"""
    WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'), w -> w <> '') AS ws FROM documents),
    sh AS (SELECT doc_id, CASE WHEN len(ws)=0 THEN CAST([] AS VARCHAR[]) WHEN len(ws)<3 THEN [array_to_string(ws,' ')]
        ELSE list_transform(range(1,len(ws)-1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]) END AS shingles FROM t),
    e AS (SELECT DISTINCT doc_id, unnest(shingles) AS s FROM sh),
    sizes AS (SELECT doc_id, COUNT(*) n FROM e GROUP BY doc_id),
    inter AS (SELECT a.doc_id id_a, b.doc_id id_b, COUNT(*) i FROM e a JOIN e b ON a.s=b.s AND a.doc_id<b.doc_id GROUP BY 1,2)
    SELECT COUNT(*) FROM inter JOIN sizes sa ON sa.doc_id=id_a JOIN sizes sb ON sb.doc_id=id_b
    WHERE CAST(i AS DOUBLE)/(sa.n+sb.n-i) BETWEEN 0.3 AND 0.7
    """
    ).fetchone()[0]
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    row = got.iloc[0]
    assert row["tp"] > 0, "no true near-dup pair — eval vacuous"
    assert gap == 0, "corpus has mid-Jaccard pairs; a perfect score would be suspicious"
    assert row["recall_pct"] == 100, "LSH banding missed a true near-dup"


@pytest.mark.usefixtures("ray_session")
def test_ann_recall_matches_sql_and_tradeoff_visible():
    """q_embed_ann_recall on sf0.001: value-exact vs the SQL twin (exact
    side re-ranked in SQL, IVF side from the serial golden); recall is
    below 100 for at least one query (nprobe=4 of nlist=16 actually
    prunes) but at least 50 everywhere (the index is not broken)."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import (
        _golden_dir,
        _sql_embed_ann_recall,
        q_embed_ann_recall,
    )

    got = q_embed_ann_recall(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF_SMALL}/embeddings.parquet')"
    )
    want = con.execute(_sql_embed_ann_recall(_golden_dir(SF_SMALL))).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    assert (got["recall_pct"] < 100).any(), "IVF pruning invisible — eval vacuous"
    assert (got["recall_pct"] >= 50).all(), "IVF index broken"
    assert (got["n_hits"] * 10 == got["recall_pct"]).all()


@pytest.mark.usefixtures("ray_session")
def test_fair_plan_matches_sql_and_composes():
    """q_crawl_fair_plan on sf0.01 (sf0.001's allocations are all below
    one epoch budget): the distributed admission mask + epoch assignment
    agree exactly with the closed-form SQL chain; every host admits
    exactly its fair allocation and multi-epoch hosts exist (the
    politeness budget binds)."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import (
        FAIR_PLAN_EPOCH_BUDGET,
        _sql_crawl_fair_plan,
        _sql_pages,
        q_crawl_fair_plan,
    )

    got = q_crawl_fair_plan(SF_ORACLE).reset_index(drop=True)

    con = duckdb.connect()
    want = con.execute(_sql_pages(SF_ORACLE, _sql_crawl_fair_plan())).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    assert (got["n_admitted"] == got["alloc"]).all(), "admission missed the allocation"
    assert (got["last_epoch"] == (got["alloc"] - 1) // FAIR_PLAN_EPOCH_BUDGET).all()
    assert got["last_epoch"].max() > 0, "politeness budget never binds — plan vacuous"


@pytest.mark.usefixtures("ray_session")
def test_exact_jaccard_matches_sql_and_lsh_variant():
    """q_doc_exact_jaccard on sf0.001: the exhaustive no-LSH pair scan is
    value-exact vs the SQL self-join AND pair-set-identical to the
    LSH-verified q_doc_ngram_jaccard — the two paths cannot fail
    identically, so their agreement is the banding-recall proof."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import (
        SQL_DOC_NGRAM_JACCARD,
        q_doc_exact_jaccard,
        q_doc_ngram_jaccard,
    )

    got = q_doc_exact_jaccard(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_SMALL}/documents.parquet')"
    )
    want = con.execute(SQL_DOC_NGRAM_JACCARD).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    lsh = q_doc_ngram_jaccard(SF_SMALL)
    lsh = (lsh.to_pandas() if hasattr(lsh, "to_pandas") else lsh)[["id_a", "id_b"]]
    assert set(map(tuple, lsh.to_numpy())) == set(
        map(tuple, got[["id_a", "id_b"]].to_numpy())
    )


@pytest.mark.usefixtures("ray_session")
def test_gini_matches_sql_and_discriminates():
    """q_doc_gini on sf0.001: value-exact vs the SQL Σc² twin; scores stay
    in [0, 10000), spread across docs, and respect the analytic bound
    gini_bp ≤ 10000·(1 − 1/n) (equality iff all tokens distinct)."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import SQL_DOC_GINI, q_doc_gini

    got = q_doc_gini(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_SMALL}/documents.parquet')"
    )
    want = con.execute(SQL_DOC_GINI).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    assert got["gini_bp"].between(0, 9999).all()
    assert got["gini_bp"].nunique() >= 10, "diversity collapsed"
    nz = got[got["n_tokens"] > 0]
    bound = (10000 * (nz["n_tokens"] - 1)) // nz["n_tokens"]
    assert (nz["gini_bp"] <= bound).all(), "analytic diversity bound violated"


@pytest.mark.usefixtures("ray_session")
def test_degree_dist_matches_sql_and_conserves_edges():
    """q_pages_degree_dist on sf0.001: value-exact vs the golden-edge SQL
    histogram; both sides' Σ(degree·n_hosts) equal the distinct edge
    count (degree mass conservation)."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import (
        _golden_dir,
        _sql_pages_degree_dist,
        q_pages_degree_dist,
    )

    got = q_pages_degree_dist(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    want = con.execute(_sql_pages_degree_dist(_golden_dir(SF_SMALL))).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    mass = got.assign(m=got["degree"] * got["n_hosts"]).groupby("side")["m"].sum()
    assert mass["out"] == mass["in"], "edge mass differs between sides"
    assert set(got["side"]) == {"in", "out"}


@pytest.mark.usefixtures("ray_session")
def test_spike_matches_sql_and_flags():
    """q_events_spike on sf0.001: value-exact vs the SQL cross-multiplied
    threshold; at least one spike fires and spikes are strictly the hours
    above 2× the integer mean."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import SQL_EVENTS_SPIKE, q_events_spike

    got = q_events_spike(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_SMALL}/events.parquet')"
    )
    want = con.execute(SQL_EVENTS_SPIKE).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    total, n_hours = int(got["n"].sum()), len(got)
    expect = (got["n"] * n_hours > 2 * total).astype(int)
    assert (got["is_spike"] == expect).all()
    assert got["is_spike"].sum() > 0, "no spike on this corpus — flag vacuous"
    assert got["is_spike"].sum() < len(got), "everything is a spike"


@pytest.mark.usefixtures("ray_session")
def test_byte_epochs_match_sql_and_cap_binds():
    """q_crawl_byte_epochs on sf0.001: value-exact vs the SQL window twin;
    the byte cap binds somewhere (a multi-epoch host exists), and the
    epoch count respects the arithmetic bound last_epoch ≤ total_bytes //
    CAP per host."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import (
        BYTE_EPOCH_CAP,
        _sql_crawl_byte_epochs,
        _sql_pages,
        q_crawl_byte_epochs,
    )

    got = q_crawl_byte_epochs(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    want = con.execute(_sql_pages(SF_SMALL, _sql_crawl_byte_epochs())).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    assert got["last_epoch"].max() > 0, "byte cap never binds — dual plan vacuous"
    assert (got["last_epoch"] <= got["total_bytes"] // BYTE_EPOCH_CAP).all()
    assert (got["last_epoch"] >= 0).all()


@pytest.mark.usefixtures("ray_session")
def test_crawl_skew_matches_sql_and_detects_zipf():
    """q_crawl_skew on sf0.001: value-exact vs the SQL Σd² twin; the
    Zipf-skewed generator shows through (head host holds >10% of demand,
    diversity well below the even-spread bound 10000·(1−1/n))."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import (
        _sql_crawl_skew,
        _sql_pages,
        q_crawl_skew,
    )

    got = q_crawl_skew(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    want = con.execute(_sql_pages(SF_SMALL, _sql_crawl_skew())).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    row = got.iloc[0]
    even_bound = 10000 * (row["n_hosts"] - 1) // row["n_hosts"]
    assert row["gini_bp"] < even_bound, "no skew detected on a Zipf corpus"
    assert row["head_share_myriad"] > 1000, "head host under 10% — skew signal vacuous"
    assert 0 <= row["gini_bp"] <= 10000


@pytest.mark.usefixtures("ray_session")
def test_vocab_growth_matches_sql_and_is_heaps():
    """q_doc_vocab_growth on sf0.001: value-exact vs the SQL min-doc
    twin; the curve is strictly increasing with SUBLINEAR growth (the
    Heaps'-law shape: vocabulary per doc falls as the prefix grows)."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import (
        _sql_doc_vocab_growth,
        q_doc_vocab_growth,
    )

    got = q_doc_vocab_growth(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_SMALL}/documents.parquet')"
    )
    want = con.execute(_sql_doc_vocab_growth()).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    import numpy as np

    v = got["vocab_size"].to_numpy()
    d = got["n_docs_prefix"].to_numpy()
    assert (np.diff(v) > 0).all(), "vocabulary stopped growing — curve vacuous"
    # sublinear: vocab per doc falls from the first prefix to the last
    assert v[-1] * d[0] < v[0] * d[-1], "growth is not sublinear"


@pytest.mark.usefixtures("ray_session")
def test_burndown_matches_sql_and_monotone():
    """q_crawl_burndown on sf0.001: value-exact vs the SQL closed-form
    twin; cumulative fetches are strictly increasing and the curve
    terminates exactly when the largest host drains (last remaining 0,
    more than one epoch — the budget binds)."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import (
        _sql_crawl_burndown,
        _sql_pages,
        q_crawl_burndown,
    )

    got = q_crawl_burndown(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    want = con.execute(_sql_pages(SF_SMALL, _sql_crawl_burndown())).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    assert len(got) > 1, "single epoch — politeness budget never binds"
    assert got["n_fetched_cum"].is_monotonic_increasing
    assert (got["n_fetched_cum"].diff().dropna() > 0).all()
    assert int(got["n_remaining"].iloc[-1]) == 0
    assert int(got["n_remaining"].iloc[-2]) > 0, "curve overshoots the drain epoch"


@pytest.mark.usefixtures("ray_session")
def test_simhash_dedup_matches_sql_and_differs_from_minhash():
    """q_doc_simhash_dedup on sf0.001: value-exact vs the transitive
    closure over the golden SimHash pair set; removes something; and the
    survivor set is a genuinely different family from the MinHash e2e
    dedup would be vacuous if Hamming and set-similarity clusters always
    coincided — they may OVERLAP heavily, so the assertion is only that
    the chain runs from the simhash edge family (every removed doc
    appears in a golden simhash pair)."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import (
        _golden_dir,
        _sql_simhash_cluster_labels,
        q_doc_simhash_dedup,
    )

    got = q_doc_simhash_dedup(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_SMALL}/documents.parquet')"
    )
    sql = (
        "WITH labels AS (" + _sql_simhash_cluster_labels(_golden_dir(SF_SMALL)) + ") "
        "SELECT doc_id FROM documents WHERE doc_id NOT IN "
        "(SELECT node FROM labels WHERE node <> label) ORDER BY doc_id"
    )
    want = con.execute(sql).df()
    n_docs = con.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    pairs = pd.read_parquet(f"{_golden_dir(SF_SMALL)}/q_doc_simhash_pairs.parquet")
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    removed = set(range(n_docs)) - set(got["doc_id"])
    assert removed, "nothing removed — dedup vacuous"
    in_pairs = set(pairs["id_a"]) | set(pairs["id_b"])
    assert removed <= in_pairs, "removed a doc with no simhash edge"


@pytest.mark.usefixtures("ray_session")
def test_embed_dedup_matches_sql_and_edge_family():
    """q_embed_dedup on sf0.001: value-exact vs the transitive closure
    over the golden embedding pair set; removes something; every removed
    vector appears in a golden cosine pair."""
    import duckdb

    from auto_archiver_ray.pipelines.queries import (
        _golden_dir,
        _sql_embed_cluster_labels,
        q_embed_dedup,
    )

    got = q_embed_dedup(SF_SMALL).reset_index(drop=True)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF_SMALL}/embeddings.parquet')"
    )
    sql = (
        "WITH labels AS (" + _sql_embed_cluster_labels(_golden_dir(SF_SMALL)) + ") "
        "SELECT vec_id FROM embeddings WHERE vec_id NOT IN "
        "(SELECT node FROM labels WHERE node <> label) ORDER BY vec_id"
    )
    want = con.execute(sql).df()
    all_ids = set(con.execute("SELECT vec_id FROM embeddings").df()["vec_id"])
    pairs = pd.read_parquet(f"{_golden_dir(SF_SMALL)}/q_embed_neardup.parquet")
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    removed = all_ids - set(got["vec_id"])
    assert removed, "nothing removed — dedup vacuous"
    in_pairs = set(pairs["id_a"]) | set(pairs["id_b"])
    assert removed <= in_pairs, "removed a vector with no cosine edge"


@pytest.mark.usefixtures("ray_session")
def test_cdc_ratio_matches_serial_and_accounts():
    """q_pages_cdc_ratio on sf0.001: identical to the independent serial
    whole-multiset summary (fresh recomputation, not just the checked-in
    parquet — the staleness guard for this golden); accounting invariants
    hold (distinct ≤ total on both axes; ratio consistent; dedup is real
    — distinct < total)."""
    import pandas as pd

    import golden_serial as gs

    from auto_archiver_ray.pipelines.queries import q_pages_cdc_ratio
    from auto_archiver_ray.sources.pages import ensure_pages

    got = q_pages_cdc_ratio(SF_SMALL).reset_index(drop=True)

    pages = pd.read_parquet(ensure_pages(SF_SMALL), columns=["html"])
    want = gs.cdc_summary_serial(pages).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    checked_in = pd.read_parquet(f"{GOLDEN.replace('sf0.01','sf0.001')}/q_pages_cdc_summary.parquet")
    pd.testing.assert_frame_equal(got, checked_in, check_dtype=False, check_exact=True)

    row = got.iloc[0]
    assert row["n_chunks_distinct"] < row["n_chunks_total"], "no chunk repeats — vacuous"
    assert row["bytes_distinct"] < row["bytes_total"]
    assert row["dedup_ratio_pct"] == (100 * row["bytes_distinct"]) // row["bytes_total"]

"""Dedup family + similarity search tests over documents/embeddings."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/documents.parquet")


@pytest.mark.usefixtures("ray_session")
def test_exact_dedup_text(docs_ds):
    from auto_archiver_ray.stages.dedup import add_text_sha, exact_dedup

    ds = docs_ds.map_batches(add_text_sha, batch_format="pyarrow")
    before = ds.count()
    out = exact_dedup(ds, "text_sha", "doc_id").to_pandas()
    assert len(out) <= before
    assert out["text_sha"].is_unique
    # survivors are min doc_id per group — recompute via pandas oracle
    df = ds.to_pandas()
    expect = df.groupby("text_sha")["doc_id"].min().sort_values().tolist()
    assert sorted(out["doc_id"].tolist()) == sorted(expect)


@pytest.mark.usefixtures("ray_session")
def test_minhash_near_dup_finds_planted_pairs():
    import ray.data as rd

    from auto_archiver_ray.stages.dedup import cluster_pairs, minhash_candidate_pairs

    base = (
        "the quick brown fox jumps over the lazy dog while seventeen green bottles "
        "stand on the wall and the rain in spain falls mainly on the plain today"
    )
    rows = [{"doc_id": i, "text": f"unique document number {i} " + " ".join(f"w{i}x{j}" for j in range(30))} for i in range(50)]
    rows.append({"doc_id": 100, "text": base})
    rows.append({"doc_id": 101, "text": base + " extra"})
    rows.append({"doc_id": 102, "text": base.replace("dog", "cat")})
    ds = rd.from_pandas(pd.DataFrame(rows))
    pairs = minhash_candidate_pairs(ds, threshold=0.5).to_pandas()
    found = {tuple(sorted((a, b))) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (100, 101) in found
    assert (100, 102) in found
    # no false positives among the unique docs
    assert all(a >= 100 and b >= 100 for a, b in found)
    clusters = cluster_pairs(minhash_candidate_pairs(ds, threshold=0.5))
    assert clusters[100] == clusters[101] == clusters[102] == 100


@pytest.mark.usefixtures("ray_session")
def test_simhash_near_dup():
    import ray.data as rd

    from auto_archiver_ray.stages.dedup import simhash_candidate_pairs

    base = " ".join(f"word{i}" for i in range(120))
    rows = [{"doc_id": i, "text": " ".join(f"t{i}u{j}" for j in range(60))} for i in range(30)]
    rows.append({"doc_id": 200, "text": base})
    rows.append({"doc_id": 201, "text": base.replace("word5 ", "changed ")})
    ds = rd.from_pandas(pd.DataFrame(rows))
    pairs = simhash_candidate_pairs(ds, max_hamming=8).to_pandas()
    found = {tuple(sorted((a, b))) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (200, 201) in found


@pytest.mark.usefixtures("ray_session")
def test_ngram_jaccard_exact_verify():
    import ray.data as rd

    from auto_archiver_ray.stages.dedup import ngram_jaccard_pairs

    base = " ".join(f"alpha{i}" for i in range(50))
    rows = [{"doc_id": i, "text": " ".join(f"b{i}c{j}" for j in range(40))} for i in range(20)]
    rows.append({"doc_id": 300, "text": base})
    rows.append({"doc_id": 301, "text": base + " tail"})
    ds = rd.from_pandas(pd.DataFrame(rows))
    pairs = ngram_jaccard_pairs(ds, threshold=0.8).to_pandas()
    assert len(pairs) == 1
    assert (int(pairs["id_a"][0]), int(pairs["id_b"][0])) == (300, 301)
    assert pairs["jaccard"][0] >= 0.8  # exact, not estimated


@pytest.mark.usefixtures("ray_session")
def test_embedding_neardup_and_knn():
    import ray.data as rd

    from auto_archiver_ray.stages.dedup import embedding_neardup_pairs
    from auto_archiver_ray.stages.similarity import knn_brute_force, knn_ivf, train_ivf_centroids

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    df = emb.to_pandas()
    vecs = np.asarray(df["embedding"].tolist(), dtype=np.float32)

    # plant a near-duplicate of vec 0
    dup = vecs[0] + 0.001
    df2 = pd.concat(
        [df, pd.DataFrame({"vec_id": [9999], "embedding": [dup.tolist()], "label": [0]})],
        ignore_index=True,
    )
    ds2 = rd.from_pandas(df2)
    pairs = embedding_neardup_pairs(ds2, threshold=0.999).to_pandas()
    found = {tuple(sorted((int(a), int(b)))) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 9999) in found

    # knn vs numpy oracle
    q = vecs[:3]
    out = knn_brute_force(emb, q, k=5)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = qn @ vn.T
    for qi in range(3):
        expect = set(np.argsort(-sims[qi])[:5].tolist())
        got = set(out[out.query_id == qi]["vec_id"].tolist())
        # allow tie-boundary wiggle: top-5 overlap ≥ 4
        assert len(expect & {int(df.iloc[i]["vec_id"]) for i in expect} | expect) >= 0
        assert len(got & expect) >= 4
    assert (out.groupby("query_id")["rank"].max() == 5).all()

    # IVF returns mostly the same neighbors as brute force
    cent = train_ivf_centroids(emb, nlist=8)
    ivf = knn_ivf(emb, q, cent, k=5, nprobe=4)
    for qi in range(3):
        bf_set = set(out[out.query_id == qi]["vec_id"].tolist())
        ivf_set = set(ivf[ivf.query_id == qi]["vec_id"].tolist())
        assert len(bf_set & ivf_set) >= 3  # recall ≥ 0.6 at nprobe=half


@pytest.mark.usefixtures("ray_session")
def test_label_propagate_matches_union_find():
    import ray.data as rd

    from auto_archiver_ray.stages.dedup import cluster_pairs, label_propagate

    # two chains and a triangle: {1-2-3-4}, {10-11}, {20-21-22 triangle}
    pairs = pd.DataFrame(
        {
            "id_a": [1, 2, 3, 10, 20, 20, 21],
            "id_b": [2, 3, 4, 11, 21, 22, 22],
        }
    )
    ds = rd.from_pandas(pairs)
    # exchange = the distributed min-label rounds; driver = union-find
    labels = (
        label_propagate(ds, strategy="exchange").to_pandas().set_index("node")["label"].to_dict()
    )
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
    drv = (
        label_propagate(rd.from_pandas(pairs), strategy="driver")
        .to_pandas()
        .set_index("node")["label"]
        .to_dict()
    )
    assert drv == labels
    uf = cluster_pairs(rd.from_pandas(pairs))
    assert {n: uf[n] for n in labels} == labels


@pytest.mark.usefixtures("ray_session")
def test_merge_cached_results_groupby():
    import ray.data as rd

    from auto_archiver_ray.stages.mergeops import merge_cached_results

    rows = pd.DataFrame(
        {
            "url_hash": ["u1", "u1", "u2", "u2"],
            "attempt": [0, 1, 0, 1],
            "n_media": [1, 2, 3, 3],
            "n_meta": [5, 1, 2, 9],
        }
    )
    out = merge_cached_results(rd.from_pandas(rows)).to_pandas().set_index("url_hash")
    assert out.loc["u1", "attempt"] == 1  # more media wins
    assert out.loc["u2", "attempt"] == 1  # media tie → more metadata wins


@pytest.mark.usefixtures("ray_session")
def test_exact_dedup_shuffle_strategy_matches_broadcast():
    import ray.data as rd

    from auto_archiver_ray.stages.dedup import exact_dedup

    df = pd.DataFrame(
        {
            "key": [f"k{i % 37}" for i in range(500)],
            "id": [f"id{i:04d}" for i in range(500)],
            "val": range(500),
        }
    )
    ds = rd.from_pandas(df)
    a = exact_dedup(ds, "key", "id", strategy="broadcast").to_pandas().sort_values("key").reset_index(drop=True)
    b = exact_dedup(ds, "key", "id", strategy="shuffle").to_pandas().sort_values("key").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])
    # winners really are min-id per key
    expect = df.sort_values("id").drop_duplicates("key").sort_values("key").reset_index(drop=True)
    pd.testing.assert_frame_equal(b[["key", "id", "val"]], expect[["key", "id", "val"]])


@pytest.mark.usefixtures("ray_session")
def test_truncation_counter_records_capped_buckets():
    """No-silent-caps: a band over the cap reports its dropped ids."""
    import ray.data as rd

    from auto_archiver_ray.stages.dedup import minhash_candidate_pairs, truncation_stats

    # 12 identical docs all land in one band bucket; cap=8 → 4 dropped ids
    rows = [{"doc_id": i, "text": "same words repeated here for everyone always"} for i in range(12)]
    ds = rd.from_pandas(pd.DataFrame(rows))
    before = truncation_stats("minhash")
    pairs = minhash_candidate_pairs(ds, threshold=0.5, band_cap=8).to_pandas()
    after = truncation_stats("minhash")
    assert len(pairs) == 8 * 7 // 2  # all pairs among the 8 kept ids
    assert after["dropped_ids"] > before["dropped_ids"]


@pytest.mark.usefixtures("ray_session")
def test_label_propagate_larger_graph_equivalence():
    """Coarse-bucketed label propagation ≡ union-find on a 2k-edge graph
    (many components, no per-node Ray groups)."""
    import numpy as np
    import ray.data as rd

    from auto_archiver_ray.stages.dedup import cluster_pairs, label_propagate

    rng = np.random.default_rng(3)
    # 400 chains of length 6 → 2000 edges
    edges = []
    for c in range(400):
        base = c * 10
        for j in range(5):
            edges.append((base + j, base + j + 1))
    pairs = pd.DataFrame({"id_a": [a for a, _ in edges], "id_b": [b for _, b in edges]})
    ds = rd.from_pandas(pairs)
    lp = (
        label_propagate(ds, num_buckets=32, strategy="exchange")
        .to_pandas()
        .set_index("node")["label"]
        .to_dict()
    )
    uf = cluster_pairs(rd.from_pandas(pairs))
    assert lp == {n: uf[n] for n in lp}
    assert len(lp) == 2400
    # size-aware default takes the driver path here and must agree exactly
    auto = (
        label_propagate(rd.from_pandas(pairs), num_buckets=32)
        .to_pandas()
        .set_index("node")["label"]
        .to_dict()
    )
    assert auto == lp


@pytest.mark.usefixtures("ray_session")
def test_embedding_rotations_increase_recall():
    """Extra rotations can only ADD pairs (union of independent plane sets),
    with duplicates removed."""
    import numpy as np
    import ray.data as rd

    from auto_archiver_ray.stages.dedup import embedding_neardup_pairs

    rng = np.random.default_rng(5)
    base = rng.standard_normal((40, 16)).astype("float32")
    # 10 planted near-dup pairs: tiny perturbations
    vecs = list(base) + [base[i] + rng.standard_normal(16).astype("float32") * 0.05 for i in range(10)]
    df = pd.DataFrame({"vec_id": range(len(vecs)), "embedding": [v.tolist() for v in vecs]})
    ds1 = rd.from_pandas(df)
    p1 = embedding_neardup_pairs(ds1, threshold=0.95, num_planes=8, num_rotations=1).to_pandas()
    p4 = embedding_neardup_pairs(rd.from_pandas(df), threshold=0.95, num_planes=8, num_rotations=4).to_pandas()
    s1 = {(a, b) for a, b in zip(p1["id_a"], p1["id_b"])}
    s4 = {(a, b) for a, b in zip(p4["id_a"], p4["id_b"])}
    assert s1 <= s4
    assert len(s4) == len(p4)  # rotation union is deduplicated
    planted = {(i, 40 + i) for i in range(10)}
    assert len(planted & s4) >= len(planted & s1)


@pytest.mark.usefixtures("ray_session")
def test_neardup_dedup_keeps_cluster_min():
    """End-to-end near-dup dedup: one survivor per cluster (min doc_id),
    unclustered docs untouched."""
    import ray.data as rd

    from auto_archiver_ray.stages.dedup import label_propagate, minhash_candidate_pairs
    from auto_archiver_ray.stages.join import anti_join

    base = " ".join(f"w{i}" for i in range(60))
    rows = [{"doc_id": i, "text": " ".join(f"u{i}v{j}" for j in range(40))} for i in range(10)]
    rows += [{"doc_id": 100 + k, "text": base + f" tail{k%2}"} for k in range(4)]  # one 4-doc cluster
    ds = rd.from_pandas(pd.DataFrame(rows))

    pairs = minhash_candidate_pairs(ds, threshold=0.6)
    labels = label_propagate(pairs)
    losers = labels.filter(expr="node != label").map_batches(
        lambda t: t.select(["node"]).rename_columns(["doc_id"]), batch_format="pyarrow"
    )
    kept = sorted(
        anti_join(ds.select_columns(["doc_id"]), losers, on="doc_id", strategy="sharded")
        .to_pandas()["doc_id"]
    )
    assert kept == list(range(10)) + [100]  # cluster 100-103 → min id 100 survives


@pytest.mark.usefixtures("ray_session")
def test_segment_dedup_planted_duplicates():
    """Planted shared segments: first occurrence (min doc_id, min seg_idx)
    survives, later occurrences drop, docs rebuild from surviving segments."""
    import ray.data as rd

    from auto_archiver_ray.stages.dedup import segment_dedup

    seg_a = " ".join(f"alpha{i}" for i in range(15))     # shared by docs 0,1,2
    seg_b = " ".join(f"beta{i}" for i in range(15))      # shared inside doc 3
    uniq = [" ".join(f"u{d}w{i}" for i in range(15)) for d in range(4)]
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                seg_a + " " + uniq[0],          # owner of seg_a
                uniq[1] + " " + seg_a,          # later doc: seg_a dropped
                seg_a,                          # later doc: everything dropped
                seg_b + " " + seg_b + " tail",  # in-doc repeat: 2nd copy dropped
            ],
        }
    )
    out = (
        segment_dedup(rd.from_pandas(docs), num_buckets=8, num_shards=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_segments"].tolist() == [2, 2, 1, 3]
    assert out["kept_segments"].tolist() == [2, 1, 0, 2]
    assert out.loc[0, "clean_text"] == seg_a + " " + uniq[0]
    assert out.loc[1, "clean_text"] == uniq[1]
    assert out.loc[2, "clean_text"] == ""
    assert out.loc[3, "clean_text"] == seg_b + " tail"


@pytest.mark.usefixtures("ray_session")
def test_exact_jaccard_strategies_bit_identical():
    """exact_jaccard_pairs driver and bucketed paths produce the identical
    pair set and scores (the size-aware contract)."""
    import pandas as pd
    import ray.data as rd

    from auto_archiver_ray.stages.dedup import exact_jaccard_pairs

    docs = pd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    a = (
        exact_jaccard_pairs(rd.from_pandas(docs), strategy="driver")
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    b = (
        exact_jaccard_pairs(rd.from_pandas(docs), strategy="bucketed")
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    assert len(a) > 0


@pytest.mark.usefixtures("ray_session")
def test_editdist_strategies_bit_identical():
    """editdist_verify_pairs driver and distributed paths score the
    identical pair set identically (the size-aware contract)."""
    import pandas as pd
    import ray.data as rd

    from auto_archiver_ray.stages.dedup import editdist_verify_pairs

    docs = pd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )

    def run(strategy):
        return (
            editdist_verify_pairs(rd.from_pandas(docs), strategy=strategy)
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )

    a, b = run("driver"), run("bucketed")
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    assert len(a) > 0

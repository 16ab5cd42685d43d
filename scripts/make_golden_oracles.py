"""Generate the golden-oracle parquet files under tests/golden/sf0.01/.

Every golden is INDEPENDENT serial ground truth (scripts/golden_serial.py —
no auto_archiver_ray imports; checked in; regenerate with
``python scripts/make_golden_oracles.py [sf_dir]`` after an intentional
algorithm change): minhash / simhash pair sets, winnowing fingerprints,
the HLL distinct estimate, embedding sign-LSH pairs, IVF ANN ranks, and
the media plane. A distributed-vs-serial match validates the sharded
banding / rejoin / cap / dedup machinery against a single-process spec.

Round-3 upgrade: the media-plane goldens (plan / store / store_tree /
features), formerly behavior pins of a reviewed pipeline run, are now
class-1 too — the page generator records which media links it planted
into each page (the sidecar of generate_pages(return_media=True)), and
golden_serial.media_*_serial re-derive the expected outputs from that
intent record alone: the discover → relevance → platform chain →
best-quality → hash → dedup → storage-key / stub-decode path is checked
against ground truth the extract stack never touches. No behavior pins
remain.
"""

from __future__ import annotations

import os
import sys

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import golden_serial as gs  # noqa: E402


def serial_goldens(sf_dir: str, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    events = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    gs.minhash_pairs_serial(docs, threshold=0.7).to_parquet(
        f"{out_dir}/q_doc_minhash_pairs.parquet", index=False
    )
    gs.simhash_pairs_serial(docs, max_hamming=3).to_parquet(
        f"{out_dir}/q_doc_simhash_pairs.parquet", index=False
    )
    gs.simhash_codes_serial(docs).to_parquet(
        f"{out_dir}/doc_simhash_codes.parquet", index=False
    )
    gs.fingerprints_serial(docs).to_parquet(f"{out_dir}/doc_fingerprints.parquet", index=False)
    gs.winnow_fps_serial(docs).to_parquet(f"{out_dir}/doc_winnow_fps.parquet", index=False)
    est = gs.hll_estimate_serial(events["user_id"].tolist())
    pd.DataFrame({"approx_distinct_users": pd.Series([est], dtype="int64")}).to_parquet(
        f"{out_dir}/q_events_distinct_users_approx.parquet", index=False
    )
    gs.embed_neardup_serial(emb, threshold=0.35, num_planes=6).to_parquet(
        f"{out_dir}/q_embed_neardup.parquet", index=False
    )
    gs.knn_ivf_serial(emb).to_parquet(f"{out_dir}/q_knn_ivf.parquet", index=False)
    gs.semdedup_serial(emb, nlist=16, threshold=0.35).to_parquet(
        f"{out_dir}/q_embed_semdedup.parquet", index=False
    )
    gs.incremental_neardup_serial(docs, split_id=250, threshold=0.7).to_parquet(
        f"{out_dir}/q_doc_incremental_neardup.parquet", index=False
    )

    # media plane — independent serial derivation from the page generator's
    # planted-media sidecar (generator intent, no html parsing, no package
    # url kernels). Upgraded from behavior pins in round 3.
    from auto_archiver_ray.sources.pages import SF_ROWS, PAGES_SEED, generate_pages

    tag = os.path.basename(os.path.normpath(sf_dir))
    _, sidecar = generate_pages(SF_ROWS.get(tag, 3000), PAGES_SEED, return_media=True)
    sidecar = sidecar.to_pandas()
    gs.media_plan_serial(sidecar).to_parquet(f"{out_dir}/q_pages_media_plan.parquet", index=False)
    gs.media_store_serial(sidecar).to_parquet(f"{out_dir}/q_media_store.parquet", index=False)
    gs.media_store_serial(sidecar, tree=True).to_parquet(
        f"{out_dir}/q_media_store_tree.parquet", index=False
    )
    gs.media_features_serial(sidecar).to_parquet(f"{out_dir}/q_media_features.parquet", index=False)

    # perceptual image near-dup — corpus generation is package input data
    # (like the testdata parquet); the hash + all-pairs scan is gs's own
    from auto_archiver_ray.sources.images import generate_images

    images = generate_images(sf_dir).to_pandas()
    gs.pdq_pairs_serial(images, max_hamming=15).to_parquet(
        f"{out_dir}/q_image_neardup.parquet", index=False
    )
    gs.image_knn_serial(images).to_parquet(f"{out_dir}/q_image_knn.parquet", index=False)
    gs.archive_media_clusters_serial(sidecar, images).to_parquet(
        f"{out_dir}/q_archive_media_dedup.parquet", index=False
    )
    gs.image_semdedup_serial(images).to_parquet(f"{out_dir}/q_image_semdedup.parquet", index=False)
    gs.kcenter_serial(emb).to_parquet(f"{out_dir}/q_embed_kcenter.parquet", index=False)
    gs.kmeans_serial(emb).to_parquet(f"{out_dir}/q_embed_kmeans.parquet", index=False)
    gs.knn_pq_serial(emb).to_parquet(f"{out_dir}/q_embed_pq.parquet", index=False)
    gs.heavy_terms_serial(docs).to_parquet(f"{out_dir}/q_doc_heavy_terms.parquet", index=False)
    gs.bpe_serial(docs, num_merges=8).to_parquet(f"{out_dir}/q_doc_bpe.parquet", index=False)
    gs.bpe_encode_serial(docs, num_merges=8).to_parquet(
        f"{out_dir}/q_doc_bpe_encode.parquet", index=False
    )
    gs.knn_ivfpq_serial(emb).to_parquet(f"{out_dir}/q_embed_ivfpq.parquet", index=False)

    # content-defined chunking over the raw page payloads (the pages table
    # is deterministic per sf — materialize on demand, read html only)
    from auto_archiver_ray.sources.pages import ensure_pages

    pages = pd.read_parquet(ensure_pages(sf_dir), columns=["html"])
    gs.cdc_chunks_serial(pages).to_parquet(f"{out_dir}/q_pages_cdc.parquet", index=False)
    gs.cdc_summary_serial(pages).to_parquet(
        f"{out_dir}/q_pages_cdc_summary.parquet", index=False
    )
    print(f"serial goldens written to {out_dir}")


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    tag = os.path.basename(os.path.normpath(sf))
    out = os.path.join(REPO, "tests", "golden", tag)
    serial_goldens(sf, out)

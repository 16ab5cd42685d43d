"""Deterministic decodable-image corpus for the perceptual near-dup plane.

The sf media tables carry opaque fake binaries (undecodable by design);
the image near-dup operator (stages/dedup.pdq_candidate_pairs over
functions/percephash codes) needs REAL pixels. This builder synthesizes a
corpus of 64×64 8-bit PGM images — integer pixels at exactly the hash's
downsample size, so the box-resize step is exact arithmetic and an
independent serial replay produces bit-identical codes:

- base image ``b``: a seeded coarse 8×8 grid, kron-upsampled ×8;
- each base gets ``1 + b % 3`` variants, each perturbing TWO coarse cells
  by ±(6..16) — a planted near-dup group (measured base↔variant Hamming
  0–12, safely under the 16-band pigeonhole bound of 15; per-pixel noise
  would flip ~30 near-median DCT bits on these blocky images and break
  the bound);
- distinct bases are far apart (~118 of the 256 bits differ).

media_id encodes (base, variant) as ``base * 16 + variant`` so tests can
recover the planted grouping without a sidecar.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .pages import SF_ROWS

IMAGES_VERSION = "v1"


def image_corpus_path(sf_dir: str) -> str:
    sf = os.path.basename(os.path.normpath(sf_dir))
    rows = SF_ROWS.get(sf, 3000)
    return f"/tmp/aar_images/{sf}_r{rows}_{IMAGES_VERSION}"


def _pgm(a: np.ndarray) -> bytes:
    h, w = a.shape
    return b"P5 %d %d 255 " % (w, h) + a.astype(np.uint8).tobytes()


def generate_images(sf_dir: str) -> pa.Table:
    rows = SF_ROWS.get(os.path.basename(os.path.normpath(sf_dir)), 3000)
    n_base = max(10, rows // 60)  # ~50 bases / ~100 images at sf0.01
    ids, payloads = [], []
    for b in range(n_base):
        rng = np.random.Generator(np.random.PCG64(1000 + b))
        base = np.kron(
            rng.integers(0, 256, (8, 8)), np.ones((8, 8), dtype=np.int64)
        )
        ids.append(b * 16)
        payloads.append(_pgm(base))
        for v in range(1, 2 + b % 3):
            img = base.copy()
            for _ in range(2):
                i, j = rng.integers(0, 8, 2)
                delta = int(rng.integers(6, 17)) * (1 if rng.integers(0, 2) else -1)
                img[i * 8 : (i + 1) * 8, j * 8 : (j + 1) * 8] = np.clip(
                    img[i * 8 : (i + 1) * 8, j * 8 : (j + 1) * 8] + delta, 0, 255
                )
            ids.append(b * 16 + v)
            payloads.append(_pgm(img))
    return pa.table(
        {
            "media_id": pa.array(np.asarray(ids, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def ensure_image_corpus(sf_dir: str) -> str:
    """Idempotently materialize the image corpus parquet dir (atomic
    tmp+rename for concurrent callers); returns the directory path."""
    path = image_corpus_path(sf_dir)
    if os.path.isdir(path):
        return path
    tbl = generate_images(sf_dir)
    tmp = f"{path}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    # two files so the distributed read genuinely fans out
    half = (tbl.num_rows + 1) // 2
    pq.write_table(tbl.slice(0, half), f"{tmp}/part-00000.parquet")
    if tbl.num_rows > half:
        pq.write_table(tbl.slice(half), f"{tmp}/part-00001.parquet")
    try:
        os.rename(tmp, path)
    except OSError:  # concurrent builder won the race
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return path

"""Independent SERIAL reimplementations of the approximate/near-dup
operators, used to compute golden-oracle parquet files (tests/golden/) that
the driver's DuckDB correctness gate reads via read_parquet().

These are deliberately written WITHOUT importing auto_archiver_ray: plain
numpy/hashlib over pandas frames, single-process. They share only the
*specification* with the distributed operators — hash = first 8 bytes of
blake2b little-endian, MinHash affine params from PCG64(20260817), SimHash
over word unigrams, sign-LSH planes from PCG64(seed+rotation) — so a match
validates the distributed machinery (sharding, banding, rejoin, caps,
dedup shuffles), not just "the same code ran twice".

Reference test style: golden expected values, as in
ref:tests/enrichers/test_hash_enricher.py:8-28.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd


def hash64(data: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")


# ---------------------------------------------------------------- shingles


def word_shingles(text: str, n: int = 3) -> np.ndarray:
    words = text.lower().split()
    count = max(0, len(words) - n + 1)
    if count == 0:
        if not words:
            return np.empty(0, dtype=np.uint64)
        return np.asarray([hash64(" ".join(words).encode("utf-8"))], dtype=np.uint64)
    return np.asarray(
        [hash64(" ".join(words[i : i + n]).encode("utf-8")) for i in range(count)],
        dtype=np.uint64,
    )


# ----------------------------------------------------------------- minhash

_PRIME = np.uint64((1 << 61) - 1)


def minhash_sig(sh: np.ndarray, num_perm: int = 128) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(20260817))
    a = rng.integers(1, 1 << 61, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, 1 << 61, size=num_perm, dtype=np.uint64)
    if sh.size == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    vals = (a[:, None] * sh[None, :] + b[:, None]) % _PRIME
    return vals.min(axis=1).astype(np.uint64)


def band_keys(sig: np.ndarray, num_bands: int = 16) -> list[int]:
    rows = sig.size // num_bands
    return [
        hash64(sig[b * rows : (b + 1) * rows].tobytes() + bytes([b])) for b in range(num_bands)
    ]


def minhash_pairs_serial(
    docs: pd.DataFrame,
    threshold: float = 0.7,
    num_perm: int = 128,
    num_bands: int = 16,
    band_cap: int = 64,
) -> pd.DataFrame:
    """(id_a, id_b, est_jaccard) with id_a < id_b, est ≥ threshold — the
    single-process ground truth for minhash_candidate_pairs."""
    sigs = {
        int(r.doc_id): minhash_sig(word_shingles(r.text or ""), num_perm)
        for r in docs.itertuples()
    }
    buckets: dict[int, list[int]] = {}
    for did, sig in sigs.items():
        for bk in band_keys(sig, num_bands):
            buckets.setdefault(bk, []).append(did)
    pairs: set[tuple[int, int]] = set()
    for ids in buckets.values():
        ids = sorted(set(ids))[:band_cap]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    rows = []
    for a, b in sorted(pairs):
        est = float((sigs[a] == sigs[b]).mean())
        if est >= threshold:
            rows.append((a, b, est))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "est_jaccard"]).astype(
        {"id_a": "int64", "id_b": "int64", "est_jaccard": "float64"}
    )


# ----------------------------------------------------------------- simhash


def simhash64(text: str) -> int:
    words = text.lower().split()
    if not words:
        return 0
    hashes = np.asarray([hash64(w.encode("utf-8")) for w in words], dtype=np.uint64)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    counts = (2 * bits - 1).sum(axis=0)
    return int("".join("1" if c > 0 else "0" for c in counts[::-1]), 2)


def simhash_pairs_serial(
    docs: pd.DataFrame, max_hamming: int = 3, bucket_cap: int = 256
) -> pd.DataFrame:
    codes = {int(r.doc_id): simhash64(r.text or "") for r in docs.itertuples()}
    buckets: dict[int, list[int]] = {}
    for did, h in codes.items():
        for b in range(4):
            key = (b << 16) | ((h >> (16 * b)) & 0xFFFF)
            buckets.setdefault(key, []).append(did)
    out: dict[tuple[int, int], int] = {}
    for ids in buckets.values():
        ids = sorted(set(ids))[:bucket_cap]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = bin(codes[ids[i]] ^ codes[ids[j]]).count("1")
                if d <= max_hamming:
                    out[(ids[i], ids[j])] = d
    rows = [(a, b, d) for (a, b), d in sorted(out.items())]
    return pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"]).astype("int64")


# --------------------------------------------------------------- winnowing


def winnow_fps(text: str, k: int = 5, window: int = 4) -> list[int]:
    n = len(text) - k + 1
    h = (
        np.asarray([hash64(text[i : i + k].encode("utf-8")) for i in range(n)], dtype=np.uint64)
        if n > 0
        else np.empty(0, dtype=np.uint64)
    )
    if h.size == 0:
        return []
    if h.size <= window:
        return [int(h.min())]
    sw = np.lib.stride_tricks.sliding_window_view(h, window)
    return sorted({int(x) for x in sw.min(axis=1)})


def winnow_key(text: str, k: int = 5, window: int = 4) -> str:
    fp = winnow_fps(text, k, window)
    return hashlib.blake2b(np.asarray(fp, dtype=np.uint64).tobytes(), digest_size=8).hexdigest()


def winnow_fps_serial(docs: pd.DataFrame) -> pd.DataFrame:
    """Exploded (doc_id, fp) winnowing-fingerprint rows — the ground-truth
    table the winnow-pairs SQL oracle self-joins (stop-fingerprint cap and
    shared-count threshold both expressed in the SQL)."""
    ids: list[int] = []
    fps: list[int] = []
    for r in docs.itertuples():
        for x in winnow_fps(r.text or ""):
            ids.append(int(r.doc_id))
            fps.append(x)
    return pd.DataFrame(
        {"doc_id": pd.Series(ids, dtype="int64"), "fp": pd.Series(fps, dtype="uint64")}
    )


def fingerprints_serial(docs: pd.DataFrame) -> pd.DataFrame:
    rows = [(int(r.doc_id), winnow_key(r.text or "")) for r in docs.itertuples()]
    return pd.DataFrame(rows, columns=["doc_id", "fingerprint_key"]).astype(
        {"doc_id": "int64", "fingerprint_key": "string[python]"}
    )


# --------------------------------------------------------------------- HLL


def hll_estimate_serial(values, p: int = 14) -> int:
    m = 1 << p
    registers = np.zeros(m, dtype=np.uint8)
    for v in values:
        h = hash64(str(v).encode("utf-8"))
        idx = h & (m - 1)
        w = h >> p
        rank = (64 - p) - w.bit_length() + 1
        if rank > registers[idx]:
            registers[idx] = rank
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m / float(np.sum(np.exp2(-registers.astype(np.float64))))
    if raw <= 2.5 * m:
        zeros = int(np.count_nonzero(registers == 0))
        if zeros:
            return int(round(m * math.log(m / zeros)))
    return int(round(raw))


# --------------------------------------------------- embedding sign-LSH


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def embed_neardup_serial(
    emb: pd.DataFrame,
    threshold: float = 0.35,
    num_planes: int = 6,
    seed: int = 20260817,
    num_rotations: int = 1,
    bucket_cap: int = 4096,
) -> pd.DataFrame:
    ids = emb["vec_id"].to_numpy(dtype=np.int64)
    unit = _unit(np.asarray(emb["embedding"].tolist(), dtype=np.float32))
    pairs: set[tuple[int, int]] = set()
    for r in range(num_rotations):
        rng = np.random.Generator(np.random.PCG64(seed + r))
        planes = rng.standard_normal((unit.shape[1], num_planes)).astype(np.float32)
        signs = (unit @ planes) > 0
        bks = (signs * (1 << np.arange(num_planes))).sum(axis=1).astype(np.int64)
        for bk in np.unique(bks):
            sel = np.nonzero(bks == bk)[0]
            order = np.argsort(ids[sel], kind="stable")
            sel = sel[order][:bucket_cap]
            if len(sel) < 2:
                continue
            mat = unit[sel]
            sims = mat @ mat.T
            iu = np.triu_indices(len(sel), k=1)
            hit = sims[iu] >= threshold
            for a, b in zip(ids[sel][iu[0][hit]], ids[sel][iu[1][hit]]):
                pairs.add((int(a), int(b)))
    return pd.DataFrame(sorted(pairs), columns=["id_a", "id_b"]).astype("int64")


# ---------------------------------------------------------------- IVF ANN


def knn_ivf_serial(
    emb: pd.DataFrame,
    n_queries: int = 3,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    sample_rows: int = 4096,
    seed: int = 7,
    iters: int = 10,
) -> pd.DataFrame:
    """(query_id, vec_id, rank): exact top-k restricted to the probed IVF
    cells, with the same fixed-seed bounded-sample k-means."""
    ids = emb["vec_id"].to_numpy(dtype=np.int64)
    unit = _unit(np.asarray(emb["embedding"].tolist(), dtype=np.float32))
    x = unit[:sample_rows]
    rng = np.random.Generator(np.random.PCG64(seed))
    cent = x[rng.choice(len(x), size=min(nlist, len(x)), replace=False)].copy()
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(cent.shape[0]):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _unit(cent)
    q = unit[np.isin(ids, np.arange(n_queries))]
    q_ids = ids[np.isin(ids, np.arange(n_queries))]
    q = q[np.argsort(q_ids)]
    cq = q @ cent.T
    probe = set()
    for qi in range(q.shape[0]):
        probe.update(np.argsort(-cq[qi])[:nprobe].tolist())
    assign_all = (unit @ cent.T).argmax(axis=1)
    member = np.isin(assign_all, list(probe))
    mids, mvecs = ids[member], unit[member]
    sims = q @ mvecs.T
    rows = []
    for qi in range(q.shape[0]):
        order = np.lexsort((mids, -sims[qi]))[:k]
        for rank, oi in enumerate(order, 1):
            rows.append((qi, int(mids[oi]), rank))
    return pd.DataFrame(rows, columns=["query_id", "vec_id", "rank"]).astype("int64")


# ------------------------------------------------------------- media plan
#
# Independent serial derivation of the media plan from the page generator's
# planted-media sidecar (sources/pages.py generate_pages(return_media=True)).
# It starts from GENERATOR INTENT (which links were written into each page
# and why), not from parsing html or calling the package's url kernels — a
# match against the distributed q_pages_media_plan validates the whole
# discover → relevance-filter → platform-chain → best-quality → canonical
# hash → global dedup → storage-key path end to end.
#
# Spec shared with the engine (not code): relevance drops favicon/.svg/
# profile-image links (the reference's irrelevant-URL list); twitter-routed
# pages emit best-quality-rewritten links (the twitter dropin's
# choose-best-variant); best-quality strips a "-WxH" sized-basename suffix;
# the URL identity is sha256 of the canonical form (identity for these
# already-canonical urls); dedup keeps the minimum page_url per identity;
# storage keys are slugify(page_url)[:70] + "/" + hash[:24] + ext.

import re as _re
from urllib.parse import urlparse as _urlparse

_SIZED_RE = _re.compile(r"^(.+)-\d+x\d+(\.[a-zA-Z0-9]+)$")
_SLUG_RE = _re.compile(r"[^a-z0-9]+")


def _serial_page_valid(url: str) -> bool:
    p = _urlparse(url)
    if p.scheme not in ("http", "https"):
        return False
    host = (p.hostname or "").lower()
    if host in ("localhost", "127.0.0.1") or host.startswith("192.168."):
        return False
    return True


def _serial_best(url: str) -> str:
    head, _, base = url.rpartition("/")
    m = _SIZED_RE.match(base)
    return f"{head}/{m.group(1)}{m.group(2)}" if m else url


def media_exploded_serial(sidecar: pd.DataFrame) -> pd.DataFrame:
    """One row per (valid page, relevant media link) BEFORE any global
    dedup: (page_url, media_url, media_url_best, media_ext, media_url_hash)
    in per-page document order."""
    import hashlib as _hl

    rows = []
    sidecar = sidecar.sort_values(["url", "pos"], kind="mergesort")
    for page_url, g in sidecar.groupby("url", sort=False):
        if not _serial_page_valid(page_url):
            continue
        host = (_urlparse(page_url).hostname or "").lower()
        is_twitter = host in ("twitter.com", "x.com") or host.endswith(".twitter.com")
        seen: set[str] = set()
        for mu, intent in zip(g["media_url"], g["intent"]):
            if intent not in ("photo", "video"):  # favicon/logo/profile: irrelevant
                continue
            if mu in seen:  # discover's first-occurrence-wins
                continue
            seen.add(mu)
            emitted = _serial_best(mu) if is_twitter else mu
            best = _serial_best(emitted)
            base = best.rpartition("/")[2]
            ext = "." + base.rpartition(".")[2] if "." in base else ""
            h = _hl.sha256(best.encode("utf-8")).hexdigest()
            rows.append((page_url, emitted, best, ext, h))
    return pd.DataFrame(
        rows,
        columns=["page_url", "media_url", "media_url_best", "media_ext", "media_url_hash"],
    )


def _serial_flat_key(page_url: str, h: str, ext: str) -> str:
    slug = _SLUG_RE.sub("-", page_url.lower()).strip("-")[:70]
    return f"{slug}/{h[:24]}{ext}"


def _serial_tree_key(page_url: str, h: str, ext: str) -> str:
    p = _urlparse(page_url)
    segs = [p.netloc] + [s for s in p.path.split("/") if s]
    segs = [_SLUG_RE.sub("-", s.lower()).strip("-")[:64] for s in segs[:8]]
    segs = [s for s in segs if s]
    return "/".join(segs + [f"{h[:24]}{ext}"])


def media_plan_serial(sidecar: pd.DataFrame) -> pd.DataFrame:
    """(page_url, media_url, media_url_best, media_ext, media_url_hash,
    storage_key), one row per distinct media identity — the global exact
    dedup keeps the minimum page_url per identity; storage keys follow the
    url/static policy (slug of the winner page / hash[:24] + ext)."""
    df = media_exploded_serial(sidecar)
    df = df.sort_values(["media_url_hash", "page_url"], kind="mergesort")
    df = df.drop_duplicates("media_url_hash", keep="first").reset_index(drop=True)
    df["storage_key"] = [
        _serial_flat_key(p, h, e)
        for p, h, e in zip(df["page_url"], df["media_url_hash"], df["media_ext"])
    ]
    return df


def media_store_serial(sidecar: pd.DataFrame, tree: bool = False) -> pd.DataFrame:
    """(storage_key, n_bytes) write manifest: every exploded media row gets
    a storage key (url/static policy — or the GDrive-style folder tree from
    the PAGE url with tree=True), the store dedups by storage_key (the S3
    exists-check: a key is written once), and each blob is the 32-byte fake
    payload sha256(media_url_best).digest(). Keys embed the page slug, so
    the same media referenced from two pages legitimately writes two blobs
    — the identity-level dedup is the PLAN's job (media_plan_serial)."""
    df = media_exploded_serial(sidecar)
    keyfn = _serial_tree_key if tree else _serial_flat_key
    df["storage_key"] = [
        keyfn(p, h, e)
        for p, h, e in zip(df["page_url"], df["media_url_hash"], df["media_ext"])
    ]
    df = df.sort_values(["storage_key", "media_url_hash"], kind="mergesort")
    df = df.drop_duplicates("storage_key", keep="first")
    return (
        df[["storage_key"]]
        .assign(n_bytes=np.int64(32))
        .sort_values("storage_key", kind="mergesort")
        .reset_index(drop=True)
    )


def media_features_serial(sidecar: pd.DataFrame, dim: int = 32) -> pd.DataFrame:
    """(media_id, width, height, decode_ok, feature_sha) for every exploded
    media row (no dedup — the feature stage runs per discovered link).
    Shares only the stub SPEC with the engine: payload is the 128-byte
    sha256(best_url)*4 fake blob; pseudo-dims are 64 + digest-byte*4;
    the feature is a PCG64(first-8-digest-bytes) unit-norm normal vector,
    digested to 8-byte blake2b hex over its float32 bytes."""
    import hashlib as _hl

    df = media_exploded_serial(sidecar)
    rows = []
    for h, best in zip(df["media_url_hash"], df["media_url_best"]):
        payload = _hl.sha256(best.encode("utf-8")).digest() * 4
        d = _hl.sha256(payload).digest()
        seed = int.from_bytes(d[:8], "little")
        rng = np.random.Generator(np.random.PCG64(seed))
        v = rng.standard_normal(dim).astype(np.float32)
        v /= np.linalg.norm(v) or 1.0
        sha = _hl.blake2b(v.tobytes(), digest_size=8).hexdigest()
        rows.append((h, 64 + d[0] * 4, 64 + d[1] * 4, True, sha))
    out = pd.DataFrame(
        rows, columns=["media_id", "width", "height", "decode_ok", "feature_sha"]
    )
    out["width"] = out["width"].astype("int32")
    out["height"] = out["height"].astype("int32")
    return (
        out.sort_values(["media_id", "feature_sha"], kind="mergesort").reset_index(drop=True)
    )


# ------------------------------------------------------------- SemDeDup


def semdedup_serial(
    emb: pd.DataFrame,
    nlist: int = 16,
    threshold: float = 0.9,
    sample_rows: int = 4096,
    seed: int = 7,
    iters: int = 10,
    chunk: int = 512,
) -> pd.DataFrame:
    """(vec_id, cluster) survivors of the SemDeDup spec: fixed-seed
    bounded-sample k-means, per-cluster chunked cosine scan (the chunked
    evaluation order is part of the spec), drop any vector with a lower-id
    member of the same cluster at cosine >= threshold."""
    ids = emb["vec_id"].to_numpy(dtype=np.int64)
    unit = _unit(np.asarray(emb["embedding"].tolist(), dtype=np.float32))
    x = unit[:sample_rows]
    rng = np.random.Generator(np.random.PCG64(seed))
    cent = x[rng.choice(len(x), size=min(nlist, len(x)), replace=False)].copy()
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(cent.shape[0]):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _unit(cent)
    cl = (unit @ cent.T).argmax(axis=1).astype(np.int64)
    rows = []
    for c in np.unique(cl):
        sel = np.nonzero(cl == c)[0]
        order = np.argsort(ids[sel], kind="stable")
        sel = sel[order]
        m = unit[sel]
        n = len(sel)
        dropped = np.zeros(n, dtype=bool)
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            sims = m[s:e] @ m.T
            for r in range(s, e):
                if r > 0 and (sims[r - s, :r] >= threshold).any():
                    dropped[r] = True
        for i in np.nonzero(~dropped)[0]:
            rows.append((int(ids[sel][i]), int(c)))
    return (
        pd.DataFrame(rows, columns=["vec_id", "cluster"])
        .sort_values("vec_id")
        .reset_index(drop=True)
        .astype("int64")
    )


# ---------------------------------------------------- incremental near-dup


def incremental_neardup_serial(
    docs: pd.DataFrame,
    split_id: int = 250,
    threshold: float = 0.7,
    num_perm: int = 128,
    num_bands: int = 16,
) -> pd.DataFrame:
    """(id_a=old, id_b=new, est_jaccard) cross pairs — a new doc (id >=
    split_id) shares a band with an old doc (id < split_id) and verifies at
    est >= threshold. Equals the cross-partition subset of the full serial
    pair set (band co-membership is a pairwise property)."""
    full = minhash_pairs_serial(docs, threshold=threshold, num_perm=num_perm, num_bands=num_bands)
    cross = full[(full["id_a"] < split_id) & (full["id_b"] >= split_id)]
    return cross.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# ------------------------------------------------------- perceptual hash
# Spec (shared with auto_archiver_ray.functions.percephash, re-implemented
# here from the published pHash/PDQ construction): 8-bit luminance → 64×64
# box mean → 2-D DCT-II (cosine matrix, matmul) → the 16×16 lowest AC
# block (skip DC row/col) → median threshold → 256 bits big-endian packed.


def _pgm_gray(payload: bytes) -> np.ndarray:
    """Binary PGM (P5) decode — the only format the golden corpus uses.
    Header tokens are scanned explicitly (str.split would swallow pixel
    bytes that happen to be whitespace codes)."""
    assert payload[:2] == b"P5"
    toks: list[int] = []
    i = 2
    while len(toks) < 3:
        while payload[i : i + 1].isspace():
            i += 1
        j = i
        while not payload[j : j + 1].isspace():
            j += 1
        toks.append(int(payload[i:j]))
        i = j
    i += 1  # exactly one whitespace byte after maxval
    w, h, maxval = toks
    assert maxval <= 255
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=i)
    return px.reshape(h, w).astype(np.float64)


def pdq256_serial(payload: bytes) -> np.ndarray:
    g = _pgm_gray(payload)
    n = 64
    h, w = g.shape
    assert h % n == 0 and w % n == 0  # golden corpus is exact-multiple sized
    g = g.reshape(n, h // n, n, w // n).mean(axis=(1, 3))
    k = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    dct = np.cos(np.pi * (2 * x + 1) * k / (2 * n))
    d = dct @ g @ dct.T
    block = d[1:17, 1:17].ravel()
    return block > np.median(block)


def pdq_pairs_serial(images: pd.DataFrame, max_hamming: int = 15) -> pd.DataFrame:
    """Brute-force ALL-pairs Hamming over the perceptual codes — no
    banding, no buckets; the distributed operator's pigeonhole recall at
    max_hamming <= n_bands-1 must reproduce this set exactly."""
    ids = images["media_id"].to_numpy(dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    bits = np.stack([pdq256_serial(p) for p in images["payload"].to_numpy()[order]])
    rows = []
    for i in range(len(ids)):
        d = (bits[i + 1 :] != bits[i]).sum(axis=1)
        for j in np.nonzero(d <= max_hamming)[0]:
            rows.append((int(ids[i]), int(ids[i + 1 + j]), int(d[j])))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"]).astype(
        {"id_a": "int64", "id_b": "int64", "hamming": "int64"}
    )

def _dct_features_serial(payload: bytes, dim: int = 32) -> np.ndarray:
    """Independent replay of the real image-feature path: own PGM decode,
    own DCT, own zigzag — unit-norm float32 of the `dim` lowest-frequency
    AC coefficients (DC excluded)."""
    g = _pgm_gray(payload)
    n = 64
    h, w = g.shape
    assert h % n == 0 and w % n == 0
    g = g.reshape(n, h // n, n, w // n).mean(axis=(1, 3))
    k = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    dct = np.cos(np.pi * (2 * x + 1) * k / (2 * n))
    d = dct @ g @ dct.T
    coords = []
    for s in range(1, 2 * n - 1):
        for u in range(max(0, s - n + 1), min(s, n - 1) + 1):
            coords.append((u, s - u))
            if len(coords) == dim:
                break
        if len(coords) == dim:
            break
    v = np.asarray([d[u, w_] for u, w_ in coords], dtype=np.float32)
    nv = float(np.linalg.norm(v))
    return v / (nv or 1.0)


def image_knn_serial(
    images: pd.DataFrame, dim: int = 32, k: int = 8, query_ids=(0, 16, 32)
) -> pd.DataFrame:
    """Exact float64 cosine top-k over the real DCT image features; query
    vectors are the listed base images' own features. Ranks break cosine
    ties by ascending media_id. Output (query_id, media_id, rank) — cosine
    dropped for the same float-summation-order reason as q_knn."""
    ids = images["media_id"].to_numpy(dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    feats = np.stack(
        [_dct_features_serial(p, dim) for p in images["payload"].to_numpy()[order]]
    ).astype(np.float64)
    by_id = {int(i): feats[n] for n, i in enumerate(ids)}
    rows = []
    for qi, qid in enumerate(query_ids):
        sims = feats @ by_id[int(qid)]
        top = sorted(range(len(ids)), key=lambda j: (-sims[j], ids[j]))[:k]
        rows.extend((qi, int(ids[j]), r + 1) for r, j in enumerate(top))
    return pd.DataFrame(rows, columns=["query_id", "media_id", "rank"]).astype(
        {"query_id": "int64", "media_id": "int64", "rank": "int64"}
    )

def archive_media_clusters_serial(
    sidecar: pd.DataFrame, images: pd.DataFrame, max_hamming: int = 15
) -> pd.DataFrame:
    """Perceptual clusters among the archive flagship's DISTINCT media
    payloads, fully re-derived from generator intent: distinct
    media_url_hash (from the planted-media sidecar) → int60 id (first 15
    hex chars) → deterministic corpus image (int(h[:8],16) % n over the
    media_id-sorted corpus — the engine's stand-in "fetch") → own PGM
    decode + DCT code → brute-force all-pairs Hamming <= max_hamming →
    transitive closure → (cluster_label = min member id, size) for every
    cluster of size >= 2."""
    ex = media_exploded_serial(sidecar)
    hashes = sorted(set(ex["media_url_hash"]))
    imgs = images.sort_values("media_id", kind="mergesort")["payload"].tolist()
    ids = np.asarray([int(h[:15], 16) for h in hashes], dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    hs = [hashes[i] for i in order]
    bits = np.stack([pdq256_serial(imgs[int(h[:8], 16) % len(imgs)]) for h in hs])

    parent = list(range(len(ids)))

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(len(ids)):
        d = (bits[i + 1 :] != bits[i]).sum(axis=1)
        for j in np.nonzero(d <= max_hamming)[0]:
            ra, rb = find(i), find(int(i + 1 + j))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, list[int]] = {}
    for i in range(len(ids)):
        comp.setdefault(find(i), []).append(i)
    rows = [
        (int(ids[m].min()), len(m))
        for m in (np.asarray(v) for v in comp.values())
        if len(m) >= 2
    ]
    return (
        pd.DataFrame(rows, columns=["cluster_label", "size"])
        .astype({"cluster_label": "int64", "size": "int64"})
        .sort_values("cluster_label")
        .reset_index(drop=True)
    )

def image_semdedup_serial(images: pd.DataFrame, nlist: int = 16, threshold: float = 0.95) -> pd.DataFrame:
    """SemDeDup over the REAL image features: serial DCT features (own
    decoder) in media_id order feed the same fixed-seed k-means +
    chunked-scan spec as semdedup_serial. (media_id, cluster) survivors."""
    img = images.sort_values("media_id", kind="mergesort")
    emb = pd.DataFrame(
        {
            "vec_id": img["media_id"].to_numpy(dtype=np.int64),
            "embedding": [_dct_features_serial(p) for p in img["payload"]],
        }
    )
    out = semdedup_serial(emb, nlist=nlist, threshold=threshold)
    return out.rename(columns={"vec_id": "media_id"})

def kcenter_serial(emb: pd.DataFrame, k: int = 16) -> pd.DataFrame:
    """Greedy k-center (farthest-point) selection replay: float32 unit
    vectors, float32 matmul distances (the engine's exact arithmetic),
    incremental per-point min over selected centers, argmax with
    min-id tie-break, seed = min vec_id. (order, vec_id)."""
    ids = emb["vec_id"].to_numpy(dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    unit = _unit(np.asarray(emb["embedding"].tolist(), dtype=np.float32))[order]
    sel = [int(ids[0])]
    pos = {int(i): n for n, i in enumerate(ids)}
    mind = np.full(len(ids), np.inf)
    while len(sel) < k:
        c = unit[pos[sel[-1]]]
        d = (1.0 - unit @ c).astype(np.float64)
        mind = np.minimum(mind, d)
        mind[[pos[s] for s in sel]] = -np.inf  # selected can't re-win
        best = mind.max()
        if not np.isfinite(best):
            break
        cand = ids[mind == best]
        sel.append(int(cand.min()))
    return pd.DataFrame(
        {"order": np.arange(len(sel), dtype=np.int64), "vec_id": np.asarray(sel, dtype=np.int64)}
    )


def kmeans_serial(emb: pd.DataFrame, k: int = 8, iters: int = 5) -> pd.DataFrame:
    """Integer-exact Lloyd k-means replay (same arithmetic spec as
    stages/similarity.kmeans_assign, independently coded): float32 unit
    vectors fixed-point quantized to int64 at 2^20, int64 dot-product
    assignment (ties -> lowest cluster), init = k smallest vec_ids,
    center update = exact double mean of int sums -> unit-norm ->
    re-quantize, empty clusters keep their center. (vec_id, cluster)."""
    FP = 1 << 20
    ids = emb["vec_id"].to_numpy(dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    unit = _unit(np.asarray(emb["embedding"].tolist(), dtype=np.float32))[order]
    xq = np.rint(unit.astype(np.float64) * FP).astype(np.int64)
    cent = xq[:k].copy()
    for _ in range(iters):
        assign = (xq @ cent.T).argmax(axis=1)
        new_cent = cent.copy()
        for c in range(cent.shape[0]):
            sel = xq[assign == c]
            if sel.shape[0] == 0:
                continue
            mean = sel.sum(axis=0).astype(np.float64) / sel.shape[0]
            norm = float(np.sqrt((mean * mean).sum()))
            if norm == 0.0:
                new_cent[c] = 0
            else:
                new_cent[c] = np.rint((mean / norm) * FP).astype(np.int64)
        cent = new_cent
    assign = (xq @ cent.T).argmax(axis=1)
    return pd.DataFrame({"vec_id": ids, "cluster": assign.astype(np.int64)})


def knn_pq_serial(
    emb: pd.DataFrame,
    n_queries: int = 3,
    k: int = 10,
    m: int = 8,
    ncodes: int = 16,
    sample_rows: int = 4096,
    seed: int = 7,
    iters: int = 10,
) -> pd.DataFrame:
    """Product-quantization ADC top-k replay (same arithmetic spec as
    stages/similarity.train_pq_codebooks + knn_pq, independently coded):
    per-subspace fixed-seed bounded-sample k-means codebooks trained in
    float32, then EVERYTHING integer — unit vectors and codebooks
    fixed-point quantized to int64 at 2^20, encode = per-subspace argmax
    of int64 dots (ties -> lowest code), ADC score = int64 LUT sum, ties
    on score -> ascending vec_id. (query_id, vec_id, adc_score, rank)."""
    FP = 1 << 20
    ids = emb["vec_id"].to_numpy(dtype=np.int64)
    unit = _unit(np.asarray(emb["embedding"].tolist(), dtype=np.float32))
    d = unit.shape[1]
    dsub = d // m
    x = unit[:sample_rows]
    rng = np.random.Generator(np.random.PCG64(seed))
    books = np.zeros((m, ncodes, dsub), dtype=np.float32)
    for s in range(m):
        xs = x[:, s * dsub : (s + 1) * dsub]
        cent = xs[rng.choice(len(xs), size=min(ncodes, len(xs)), replace=False)].copy()
        for _ in range(iters):
            assign = (xs @ cent.T).argmax(axis=1)
            for c in range(cent.shape[0]):
                members = xs[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[s, : cent.shape[0]] = cent

    cbq = np.rint(books.astype(np.float64) * FP).astype(np.int64)
    xq = np.rint(unit.astype(np.float64) * FP).astype(np.int64).reshape(len(unit), m, dsub)
    codes = np.stack(
        [(xq[:, s, :] @ cbq[s].T).argmax(axis=1) for s in range(m)], axis=1
    )  # (n, m), ties -> lowest code via argmax

    sel = np.isin(ids, np.arange(n_queries))
    q_ids = ids[sel]
    order = np.argsort(q_ids)
    qq = np.rint(unit[sel][order].astype(np.float64) * FP).astype(np.int64).reshape(-1, m, dsub)
    rows = []
    for qi in range(qq.shape[0]):
        lut = np.stack([cbq[s] @ qq[qi, s] for s in range(m)])  # (m, ncodes) int64
        scores = lut[np.arange(m), codes].sum(axis=1)  # (n,)
        idx = np.lexsort((ids, -scores))[:k]
        for rank, j in enumerate(idx, 1):
            rows.append((qi, int(ids[j]), int(scores[j]), rank))
    return pd.DataFrame(rows, columns=["query_id", "vec_id", "adc_score", "rank"])


def heavy_terms_serial(
    docs: pd.DataFrame, phi: float = 0.002, depth: int = 4, width: int = 8192
) -> pd.DataFrame:
    """phi-heavy-hitters replay (same arithmetic spec as
    functions/sketch.CountMinSketch + heavy_hitters, independently coded):
    exact global token counts feed one Count-Min sketch — integer adds
    commute, so the distributed per-batch-sketch merge equals this single
    global build bit-for-bit; candidates = every corpus term whose sketch
    estimate >= ceil(phi * total_tokens). (term, est_count) sorted by
    (est_count DESC, term ASC)."""
    from collections import Counter

    c: Counter = Counter()
    total = 0
    for t in docs["text"]:
        toks = (t or "").split()
        total += len(toks)
        c.update(toks)

    terms = np.asarray(list(c.keys()), dtype=object)
    cnts = np.fromiter(c.values(), dtype=np.int64, count=len(c))

    h1 = pd.util.hash_array(terms, categorize=False)
    z = h1 + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    h2 = (z ^ (z >> np.uint64(31))) | np.uint64(1)
    rows = np.arange(depth, dtype=np.uint64)[None, :]
    pos = ((h1[:, None] + rows * h2[:, None]) % np.uint64(width)).astype(np.int64)

    counts = np.zeros((depth, width), dtype=np.int64)
    for r in range(depth):
        np.add.at(counts[r], pos[:, r], cnts)
    est = np.stack([counts[r][pos[:, r]] for r in range(depth)]).min(axis=0)

    threshold = max(1, int(np.ceil(phi * total)))
    keep = est >= threshold
    out = pd.DataFrame({"term": terms[keep], "est_count": est[keep]})
    out["term"] = out["term"].astype(str)
    return (
        out.sort_values(["est_count", "term"], ascending=[False, True], kind="mergesort")
        .reset_index(drop=True)
    )


def knn_ivfpq_serial(
    emb: pd.DataFrame,
    n_queries: int = 3,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    m: int = 8,
    ncodes: int = 16,
    sample_rows: int = 4096,
    seed: int = 7,
    iters: int = 10,
) -> pd.DataFrame:
    """IVF-PQ replay: knn_ivf_serial's coarse member selection composed
    with knn_pq_serial's integer ADC scoring over the members only —
    codebooks trained on the FULL-corpus bounded sample (the composition
    trains before filtering, like the distributed path).
    (query_id, vec_id, adc_score, rank)."""
    FP = 1 << 20
    ids = emb["vec_id"].to_numpy(dtype=np.int64)
    unit = _unit(np.asarray(emb["embedding"].tolist(), dtype=np.float32))
    x = unit[:sample_rows]
    rng = np.random.Generator(np.random.PCG64(seed))
    cent = x[rng.choice(len(x), size=min(nlist, len(x)), replace=False)].copy()
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(cent.shape[0]):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _unit(cent)

    sel = np.isin(ids, np.arange(n_queries))
    q_ids = ids[sel]
    q = unit[sel][np.argsort(q_ids)]
    cq = q @ cent.T
    probe = set()
    for qi in range(q.shape[0]):
        probe.update(np.argsort(-cq[qi])[:nprobe].tolist())
    member = np.isin((unit @ cent.T).argmax(axis=1), list(probe))
    mids, munit = ids[member], unit[member]

    d = unit.shape[1]
    dsub = d // m
    rng2 = np.random.Generator(np.random.PCG64(seed))
    books = np.zeros((m, ncodes, dsub), dtype=np.float32)
    for s in range(m):
        xs = x[:, s * dsub : (s + 1) * dsub]
        cb = xs[rng2.choice(len(xs), size=min(ncodes, len(xs)), replace=False)].copy()
        for _ in range(iters):
            assign = (xs @ cb.T).argmax(axis=1)
            for c in range(cb.shape[0]):
                mem = xs[assign == c]
                if len(mem):
                    cb[c] = mem.mean(axis=0)
        books[s, : cb.shape[0]] = cb

    cbq = np.rint(books.astype(np.float64) * FP).astype(np.int64)
    xq = np.rint(munit.astype(np.float64) * FP).astype(np.int64).reshape(len(munit), m, dsub)
    codes = np.stack([(xq[:, s, :] @ cbq[s].T).argmax(axis=1) for s in range(m)], axis=1)
    qq = np.rint(q.astype(np.float64) * FP).astype(np.int64).reshape(-1, m, dsub)
    rows = []
    for qi in range(qq.shape[0]):
        lut = np.stack([cbq[s] @ qq[qi, s] for s in range(m)])
        scores = lut[np.arange(m), codes].sum(axis=1)
        idx = np.lexsort((mids, -scores))[: min(k, len(mids))]
        for rank, j in enumerate(idx, 1):
            rows.append((qi, int(mids[j]), int(scores[j]), rank))
    return pd.DataFrame(rows, columns=["query_id", "vec_id", "adc_score", "rank"])


# -------------------------------------------------------------------- bpe


def bpe_serial(docs: pd.DataFrame, num_merges: int = 8) -> pd.DataFrame:
    """Serial BPE merge learning (Sennrich et al. 2016): whitespace words →
    char symbols; per round pick the adjacent pair with the max corpus
    count (tie: lexicographically smallest (left, right)) and merge it
    leftmost-first non-overlapping. Plain Counter implementation — shares
    only the spec with the distributed trainer."""
    from collections import Counter

    word_counts: Counter = Counter()
    for t in docs["text"]:
        word_counts.update((t or "").split())
    table = {w: tuple(w) for w in word_counts}

    rows = []
    for rank in range(num_merges):
        pairs: Counter = Counter()
        for w, syms in table.items():
            n = word_counts[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), n_pair = best
        rows.append(
            {"rank": rank, "left": left, "right": right, "merged": left + right,
             "pair_count": n_pair}
        )
        new_table = {}
        for w, syms in table.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_table[w] = tuple(out)
        table = new_table
    return pd.DataFrame(rows, columns=["rank", "left", "right", "merged", "pair_count"]).astype(
        {"rank": "int64", "pair_count": "int64"}
    )


def bpe_encode_serial(docs: pd.DataFrame, num_merges: int = 8) -> pd.DataFrame:
    """Serial BPE learn + ENCODE: run the bpe_serial trainer loop (same
    spec, own code) and read each doc's token count off the final word
    table — every corpus word's symbols after all merges. Returns
    (doc_id, n_tokens, n_chars) sorted by doc_id."""
    from collections import Counter

    word_counts: Counter = Counter()
    for t in docs["text"]:
        word_counts.update((t or "").split())
    table = {w: tuple(w) for w in word_counts}
    for _rank in range(num_merges):
        pairs: Counter = Counter()
        for w, syms in table.items():
            n = word_counts[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        (left, right), _ = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        new_table = {}
        for w, syms in table.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_table[w] = tuple(out)
        table = new_table
    rows = []
    for i, t in zip(docs["doc_id"], docs["text"]):
        words = (t or "").split()
        rows.append(
            {
                "doc_id": int(i),
                "n_tokens": sum(len(table[w]) for w in words),
                "n_chars": sum(len(w) for w in words),
            }
        )
    return (
        pd.DataFrame(rows, columns=["doc_id", "n_tokens", "n_chars"])
        .astype({"doc_id": "int64", "n_tokens": "int64", "n_chars": "int64"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _cdc_chunk_counter(
    pages: pd.DataFrame,
    payload_col: str = "html",
    min_size: int = 64,
    mask_bits: int = 6,
    max_size: int = 512,
):
    """The serial chunk multiset shared by cdc_chunks_serial (top-k view)
    and cdc_summary_serial (whole-multiset dedup accounting): byte-at-a-
    time gear rolling hash (g = (2g + gear[b]) mod 2^32, gear[i] =
    blake2b(byte i, 4B); cut after a byte whose hash has the low mask_bits
    zero, min/max enforced with the scan restarting at each cut) over
    every payload. Shares only the SPEC with stages.dedup.cdc_chunk_spans
    (which vectorizes the recurrence)."""
    import hashlib
    from collections import Counter

    gear = [
        int.from_bytes(hashlib.blake2b(bytes([i]), digest_size=4).digest(), "big")
        for i in range(256)
    ]
    mask = (1 << mask_bits) - 1
    c: Counter = Counter()
    for payload in pages[payload_col]:
        data = payload or b""
        if isinstance(data, str):
            data = data.encode()
        n = len(data)
        # candidate cut positions from the rolling hash
        g = 0
        cands = []
        for i in range(n):
            g = ((g << 1) + gear[data[i]]) & 0xFFFFFFFF
            if (g & mask) == 0:
                cands.append(i + 1)
        start = 0
        ci = 0
        while start < n:
            hard_end = min(start + max_size, n)
            lo = start + min_size
            while ci < len(cands) and cands[ci] < lo:
                ci += 1
            if ci < len(cands) and cands[ci] <= hard_end:
                end = cands[ci]
                ci += 1
            else:
                end = hard_end
            c[(hashlib.sha256(data[start:end]).hexdigest(), end - start)] += 1
            start = end
    return c


def cdc_summary_serial(pages: pd.DataFrame, payload_col: str = "html") -> pd.DataFrame:
    """One-row dedup accounting over the whole serial chunk multiset:
    stored-once (distinct) vs as-fetched (total) bytes — the ratio a
    content-addressed chunk store would realize."""
    c = _cdc_chunk_counter(pages, payload_col)
    n_total = sum(c.values())
    n_distinct = len(c)
    bytes_total = sum(size * n for (_, size), n in c.items())
    bytes_distinct = sum(size for (_, size) in c.keys())
    return pd.DataFrame(
        {
            "n_chunks_total": pd.array([n_total], dtype="int64"),
            "n_chunks_distinct": pd.array([n_distinct], dtype="int64"),
            "bytes_total": pd.array([bytes_total], dtype="int64"),
            "bytes_distinct": pd.array([bytes_distinct], dtype="int64"),
            "dedup_ratio_pct": pd.array(
                [(100 * bytes_distinct) // bytes_total if bytes_total else 0], dtype="int64"
            ),
        }
    )


def cdc_chunks_serial(
    pages: pd.DataFrame,
    payload_col: str = "html",
    min_size: int = 64,
    mask_bits: int = 6,
    max_size: int = 512,
    top_k: int = 50,
) -> pd.DataFrame:
    """Top-k view of the serial chunk multiset (count DESC, hash ASC)."""
    c = _cdc_chunk_counter(pages, payload_col, min_size, mask_bits, max_size)
    rows = sorted(c.items(), key=lambda kv: (-kv[1], kv[0][0]))[:top_k]
    return pd.DataFrame(
        {
            "rank": pd.array(range(1, len(rows) + 1), dtype="int64"),
            "chunk_hash": [k[0] for k, _ in rows],
            "size_bytes": pd.array([k[1] for k, _ in rows], dtype="int64"),
            "n_occurrences": pd.array([n for _, n in rows], dtype="int64"),
        }
    )


def simhash_codes_serial(docs: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, code) with the simhash stored as SIGNED int64 (the bit
    pattern reinterpreted) so DuckDB ORDER BY code and bit_count(xor())
    match the distributed side's signed sort key exactly."""
    rows = [
        (int(r.doc_id), int(np.uint64(simhash64(r.text or "")).astype(np.int64)))
        for r in docs.itertuples()
    ]
    return pd.DataFrame(rows, columns=["doc_id", "code"]).astype("int64")


def snm_pairs_serial(docs: pd.DataFrame, window: int = 8, max_hamming: int = 3) -> pd.DataFrame:
    """Sorted-neighborhood dedup, naive replay: rank docs by (signed
    simhash code, doc_id); every pair within ``window`` ranks and Hamming
    <= max_hamming. id_a is the lower-ranked doc."""
    codes = simhash_codes_serial(docs)
    order = codes.sort_values(["code", "doc_id"], kind="mergesort").reset_index(drop=True)
    rows = []
    n = len(order)
    for i in range(n):
        for j in range(i + 1, min(i + window + 1, n)):
            a, b = order.iloc[i], order.iloc[j]
            d = bin((int(a.code) ^ int(b.code)) & ((1 << 64) - 1)).count("1")
            if d <= max_hamming:
                rows.append((int(a.doc_id), int(b.doc_id), d, j - i))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "hamming", "rank_gap"]).astype("int64")

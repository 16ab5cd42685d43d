"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast once via
``ray.put`` and every ``map_batches`` task computes a partial top-k against
its batch (numpy matmul); the driver merges the tiny per-batch partials.
Nothing but (query_id, vec_id, score) rows leave the workers.

Scale path: IVF — a fixed-seed k-means (trained on a bounded sample)
partitions vectors into ``nlist`` coarse cells; queries search only the
``nprobe`` nearest cells. Same broadcast/partial-merge skeleton, with the
cell assignment as the partition key.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa


def _as_matrix(column_values: list) -> np.ndarray:
    m = np.asarray(column_values, dtype=np.float32)
    return m if m.ndim == 2 else m.reshape(0, 0)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def knn_brute_force(
    ds,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Exact cosine top-k for each query row. Returns a DataFrame
    ``(query_id, vec_id, cosine, rank)`` sorted by (query_id, rank).

    Ties on cosine break by ascending vec_id (deterministic)."""
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float32))
    q_ref = ray.put(q)

    def partial_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        if ids.size == 0:
            return pa.table({"query_id": pa.array([], pa.int64()), id_col: pa.array([], pa.int64()), "cosine": pa.array([], pa.float64())})
        vecs = _normalize(_as_matrix(batch.column(vec_col).to_pylist()))
        sims = qm @ vecs.T  # (nq, nb)
        out_q, out_i, out_s = [], [], []
        kk = min(k, ids.size)
        for qi in range(qm.shape[0]):
            row = sims[qi]
            # stable top-k: sort by (-sim, id)
            idx = np.lexsort((ids, -row))[:kk]
            out_q.extend([qi] * kk)
            out_i.extend(ids[idx].tolist())
            out_s.extend(row[idx].astype(float).tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                id_col: pa.array(out_i, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow", batch_size=8192)
    # merge partial top-ks on the driver (rows ≤ nq × k × num_batches — tiny)
    heaps: dict[int, list] = {}
    for b in partials.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for qi, vid, s in zip(
            b.column("query_id").to_pylist(), b.column(id_col).to_pylist(), b.column("cosine").to_pylist()
        ):
            h = heaps.setdefault(qi, [])
            item = (s, -vid)  # max sim, then min id on ties
            if len(h) < k:
                heapq.heappush(h, item)
            elif item > h[0]:
                heapq.heapreplace(h, item)
    rows = []
    for qi in sorted(heaps):
        ranked = sorted(heaps[qi], key=lambda t: (-t[0], -t[1]))
        for rank, (s, negid) in enumerate(ranked, 1):
            rows.append((qi, -negid, float(s), rank))
    return pd.DataFrame(rows, columns=["query_id", "vec_id", "cosine", "rank"])


def train_ivf_centroids(ds, nlist: int = 16, vec_col: str = "embedding", sample_rows: int = 4096, seed: int = 7, iters: int = 10) -> np.ndarray:
    """Fixed-seed mini k-means on a bounded sample (driver-side; the sample
    is capped so this never scales with corpus size)."""
    sample = ds.limit(sample_rows).to_pandas()
    x = _normalize(np.asarray(sample[vec_col].tolist(), dtype=np.float32))
    rng = np.random.Generator(np.random.PCG64(seed))
    cent = x[rng.choice(len(x), size=min(nlist, len(x)), replace=False)]
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(cent.shape[0]):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def knn_ivf(
    ds,
    queries: np.ndarray,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """IVF ANN: filter each batch to vectors whose nearest centroid is among
    the union of every query's ``nprobe`` closest cells, then brute-force
    that subset. Same output schema as :func:`knn_brute_force`."""
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float32))
    cq = q @ centroids.T
    probe_cells = set()
    for qi in range(q.shape[0]):
        probe_cells.update(np.argsort(-cq[qi])[:nprobe].tolist())
    cells_ref = ray.put((centroids, frozenset(probe_cells)))

    def cell_filter(batch: pa.Table) -> pa.Table:
        cent, cells = ray.get(cells_ref)
        vecs = _as_matrix(batch.column(vec_col).to_pylist())
        if vecs.size == 0:
            return batch
        assign = (_normalize(vecs) @ cent.T).argmax(axis=1)
        mask = np.isin(assign, list(cells))
        return batch.filter(pa.array(mask))

    return knn_brute_force(ds.map_batches(cell_filter, batch_format="pyarrow", batch_size=8192), q, k, id_col, vec_col)

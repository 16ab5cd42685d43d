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
    return pd.DataFrame(rows, columns=["query_id", id_col, "cosine", "rank"])


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
    filtered = ds.map_batches(
        _ivf_cell_filter(q, centroids, nprobe, vec_col), batch_format="pyarrow", batch_size=8192
    )
    return knn_brute_force(filtered, q, k, id_col, vec_col)


def _ivf_cell_filter(q_unit: np.ndarray, centroids: np.ndarray, nprobe: int, vec_col: str):
    """map_batches callable keeping rows whose nearest coarse centroid is
    among the union of every query's ``nprobe`` closest cells (shared by
    knn_ivf and knn_ivfpq)."""
    import ray

    cq = q_unit @ centroids.T
    probe_cells = set()
    for qi in range(q_unit.shape[0]):
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

    return cell_filter


def knn_ivfpq(
    ds,
    queries: np.ndarray,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """IVF-PQ: the coarse cell filter of :func:`knn_ivf` composed with the
    integer-exact ADC scoring of :func:`knn_pq` — the full billion-vector
    recipe (probe a few cells, score survivors from m-byte codes). The
    filter drops whole rows before any PQ work; everything downstream keeps
    knn_pq's bit-determinism, so the composed output (scores included) is
    golden-comparable."""
    q = _normalize(np.asarray(queries, dtype=np.float32))
    filtered = ds.map_batches(
        _ivf_cell_filter(q, centroids, nprobe, vec_col), batch_format="pyarrow", batch_size=8192
    )
    return knn_pq(filtered, queries, codebooks, k, id_col, vec_col)


def semantic_dedup(
    ds,
    nlist: int = 16,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_rows: int = 4096,
    seed: int = 7,
    iters: int = 10,
    chunk: int = 512,
):
    """SemDeDup (Abbas et al. 2023): k-means the embedding space, then drop
    within each cluster every vector that has a LOWER-id neighbor at cosine
    >= ``threshold`` (the deterministic keep-one-representative rule; the
    comparison runs against all lower-id members, dropped or not, so chains
    a~b~c collapse to their minimum id). Returns the survivors as a Dataset
    of ``(vec_id, cluster)``.

    Scale shape: centroids come from a BOUNDED sample (never scales with
    the corpus) and are broadcast once via ``ray.put``; the only shuffle
    moves ``(id, cluster, unit-vector)`` rows — d float32s per row, no
    payload. Per-cluster work is the O(m^2/chunk) chunked lower-triangle
    matmul SemDeDup itself costs; at 100 TB you grow ``nlist``
    proportionally (the paper's k ∝ N recipe) so cluster size — and the
    m×d member matrix each group holds — stays bounded. ``chunk`` bounds
    the sims buffer to chunk×m floats; the chunked evaluation order is part
    of the spec (the serial golden replays it) so float comparisons at the
    threshold are reproducible."""
    import ray

    cent = train_ivf_centroids(ds, nlist, vec_col, sample_rows, seed, iters)
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        if ids.size == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    "unit": pa.array([], pa.list_(pa.float32())),
                }
            )
        unit = _normalize(_as_matrix(batch.column(vec_col).to_pylist()))
        cl = (unit @ c.T).argmax(axis=1).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids),
                "cluster": pa.array(cl),
                "unit": pa.array(list(unit), pa.list_(pa.float32())),
            }
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow", batch_size=8192)

    import functools

    surv = functools.partial(cluster_survivors, id_col=id_col, threshold=threshold, chunk=chunk)
    # one group per k-means cell — nlist is a bounded, caller-chosen constant,
    # so per-key map_groups is safe here (unlike unbounded-key groupbys).
    return assigned.groupby("cluster").map_groups(surv, batch_format="pandas")


def cluster_survivors(
    g: pd.DataFrame, id_col: str = "vec_id", threshold: float = 0.95, chunk: int = 512
) -> pd.DataFrame:
    """The per-cluster SemDeDup scan (module-level so the pathological-
    distribution test can instrument it directly).

    Cost for a cluster of m members, dim d: holds the m×d member matrix
    (4md bytes) plus ONE chunk×m float32 sims buffer (4·chunk·m bytes) —
    total peak extra memory 4m(d + chunk) bytes, independent of m² — while
    compute is the full O(m²d/2) lower-triangle matmul done chunk rows at a
    time. A mega-cluster therefore costs quadratic TIME (inherent to the
    SemDeDup spec) but only linear MEMORY in m; the test pins this bound."""
    g = g.sort_values(id_col, kind="mergesort").reset_index(drop=True)
    m = np.asarray(g["unit"].tolist(), dtype=np.float32)
    n = len(g)
    dropped = np.zeros(n, dtype=bool)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        sims = m[s:e] @ m.T  # (e-s, n)
        for r in range(s, e):
            if r > 0 and (sims[r - s, :r] >= threshold).any():
                dropped[r] = True
    keep = g.loc[~dropped, [id_col, "cluster"]]
    return keep


def _lazy_mindist_shard():
    import ray

    # num_cpus=0: a memory service (same rationale as join.KeySetShard)
    @ray.remote(num_cpus=0)
    class MinDistShard:
        """One partition of the per-point nearest-selected-center distance
        for greedy k-center selection: 12 B/point spread across the pool,
        never driver-resident. Each round the corpus streams once through
        an update pass; the shard folds the new center's distances into
        its running minimum and tracks a shard-local farthest candidate
        (ties broken by MIN id — deterministic)."""

        def __init__(self):
            self._d: dict[int, float] = {}

        def update(self, ids, dists) -> int:
            d = self._d
            for i, x in zip(ids.tolist(), dists.tolist()):
                cur = d.get(i)
                if cur is None or x < cur:
                    d[i] = x
            return len(d)

        def seal_round(self):
            """Shard-local farthest point under the CURRENT minima."""
            if not self._d:
                return (-1.0, -1)
            best_dist = max(self._d.values())
            best_id = min(i for i, x in self._d.items() if x == best_dist)
            return (best_dist, best_id)

        def remove(self, i: int) -> None:
            self._d.pop(int(i), None)

    return MinDistShard


def kcenter_select(
    ds,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_shards: int = 8,
):
    """Greedy k-center coreset selection (farthest-point sampling, Gonzalez
    1985 — the selection rule of Sener & Savarese 2018 "Active Learning
    for CNNs: A Core-Set Approach", the standard diversity-pruning op for
    training data): start from the MINIMUM id, then repeatedly add the
    point whose cosine distance to its nearest already-selected center is
    largest (ties → min id). Returns a DataFrame ``(order, vec_id)`` of
    the k selected points in selection order.

    Scale shape: per-point nearest-center distances live in a sharded
    actor pool (12 B/point — never on the driver); every round broadcasts
    exactly ONE new center vector (``ray.put``) and streams the corpus
    once through a task-pool update pass, then reads back one
    (dist, id) candidate per shard. k rounds = k corpus passes over a
    materialized slim (id, unit-vector) projection — the O(kN) cost is
    the algorithm's own; nothing quadratic, nothing driver-resident."""
    import ray

    MinDistShard = _lazy_mindist_shard()
    shards = [MinDistShard.remote() for _ in range(num_shards)]
    n_sh = np.uint64(num_shards)

    def unit_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        unit = _normalize(_as_matrix(batch.column(vec_col).to_pylist()))
        return pa.table(
            {id_col: pa.array(ids), "unit": pa.array(list(unit), pa.list_(pa.float32()))}
        )

    slim = ds.map_batches(unit_rows, batch_format="pyarrow", batch_size=8192).materialize()

    first = slim.min(id_col)
    selected = [int(first)]

    def make_update_pass(c_ref):
        # a FRESH closure per round, with the round's center ObjectRef bound
        # by value: a shared mutable cell (the first version used a dict the
        # driver rewrote each round) can be re-serialized from a cached
        # pickle by the runtime, silently re-running a round with the
        # previous center
        def update_pass(batch: pa.Table) -> pa.Table:
            c = ray.get(c_ref)
            ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
            if not ids.size:
                return pa.table({"n": pa.array([0], pa.int64())})
            unit = np.asarray(batch.column("unit").to_pylist(), dtype=np.float32)
            dist = (1.0 - unit @ c).astype(np.float64)
            sid = (ids.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15) % n_sh).astype(np.int64)
            futs = [
                shards[int(s)].update.remote(ids[sid == s], dist[sid == s]) for s in np.unique(sid)
            ]
            ray.get(futs)  # delivery barrier
            return pa.table({"n": pa.array([len(ids)], pa.int64())})

        return update_pass

    def center_vec(vid: int) -> np.ndarray:
        def pick(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(pc.equal(batch[id_col], pa.scalar(vid, pa.int64())))

        row = slim.map_batches(pick, batch_format="pyarrow", batch_size=8192).take(1)[0]
        return np.asarray(row["unit"], dtype=np.float32)

    while len(selected) < k:
        new_id = selected[-1]
        ray.get([s.remove.remote(new_id) for s in shards])
        slim.map_batches(
            make_update_pass(ray.put(center_vec(new_id))),
            batch_format="pyarrow",
            batch_size=8192,
        ).sum("n")
        cands = ray.get([s.seal_round.remote() for s in shards])
        best_dist = max(c[0] for c in cands)
        if best_dist < 0:
            break  # corpus exhausted before k
        best_id = min(c[1] for c in cands if c[0] == best_dist)
        if int(best_id) in selected:
            break  # only exact duplicates of selected points remain
        selected.append(int(best_id))

    for s in shards:
        ray.kill(s)
    return pd.DataFrame(
        {"order": np.arange(len(selected), dtype=np.int64), id_col: np.asarray(selected, dtype=np.int64)}
    )


KMEANS_FP = 1 << 20  # fixed-point scale for integer-exact k-means


def _kmeans_quantize(vecs: list) -> np.ndarray:
    """float32 unit-normalize then fixed-point quantize to int64 — every
    downstream dot product and partial sum is integer-exact, so assignments
    and center updates are bit-deterministic regardless of batch
    composition, scheduling order, or retries."""
    m = _as_matrix(vecs)
    if m.size == 0:
        return np.zeros((0, 0), dtype=np.int64)
    return np.rint(_normalize(m).astype(np.float64) * KMEANS_FP).astype(np.int64)


def _kmeans_requantize(vsum: np.ndarray, count: int) -> np.ndarray:
    """New center from integer partial sums: exact double mean, unit-norm,
    re-quantize. One exactly-rounded double expression chain shared with
    the serial golden (scripts/golden_serial.kmeans_serial)."""
    mean = vsum.astype(np.float64) / count
    norm = float(np.sqrt((mean * mean).sum()))
    if norm == 0.0:
        return vsum * 0
    return np.rint((mean / norm) * KMEANS_FP).astype(np.int64)


def kmeans_assign(
    ds,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    return_dataset: bool = False,
):
    """Distributed Lloyd k-means over an embedding column, INTEGER-exact:
    cosine similarity as int64 fixed-point dot products (|x|<=2^20 per
    component -> sums < 2^47 at d<=128, no overflow), ties argmax -> lowest
    cluster id, init = the k smallest ``id_col`` rows' vectors.

    Scale shape: one streamed corpus pass per iteration (the Lloyd
    invariant); each pass moves only k x (d+2) partial-sum rows per batch
    to a driver reduce whose integer adds are order-independent — no
    shuffle, no driver materialization of the corpus. Centers (k x d x 8
    bytes) broadcast once per round via ray.put, each round bound into a
    FRESH closure (the kcenter lesson: never rebind a captured mutable).

    Returns (id_col, cluster) int64. Empty clusters keep their previous
    center (standard Lloyd degenerate-case rule, mirrored by the golden)."""
    import ray

    def seed_partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        if ids.size == 0:
            return pa.table({id_col: pa.array([], pa.int64()), vec_col: pa.array([], pa.list_(pa.float32()))})
        order = np.argsort(ids, kind="stable")[:k]
        vecs = batch.column(vec_col).to_pylist()
        return pa.table(
            {
                id_col: pa.array(ids[order]),
                vec_col: pa.array([vecs[i] for i in order]),
            }
        )

    seeds = ds.map_batches(seed_partial, batch_format="pyarrow", batch_size=8192).to_pandas()
    seeds = seeds.sort_values(id_col, kind="mergesort").head(k)
    centers = _kmeans_quantize(seeds[vec_col].tolist())

    def make_pass(c_ref, final: bool):
        def assign_pass(batch: pa.Table) -> pa.Table:
            cent = ray.get(c_ref)
            xq = _kmeans_quantize(batch.column(vec_col).to_pylist())
            if xq.shape[0] == 0:
                if final:
                    return pa.table({id_col: pa.array([], pa.int64()), "cluster": pa.array([], pa.int64())})
                return pa.table(
                    {
                        "cluster": pa.array([], pa.int64()),
                        "count": pa.array([], pa.int64()),
                        "vsum": pa.array([], pa.list_(pa.int64())),
                    }
                )
            scores = xq @ cent.T  # int64-exact
            assign = scores.argmax(axis=1)  # ties -> lowest cluster id
            if final:
                ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
                return pa.table({id_col: pa.array(ids), "cluster": pa.array(assign.astype(np.int64))})
            clusters, counts, vsums = [], [], []
            for c in np.unique(assign):
                sel = xq[assign == c]
                clusters.append(int(c))
                counts.append(int(sel.shape[0]))
                vsums.append(sel.sum(axis=0).tolist())
            return pa.table(
                {
                    "cluster": pa.array(clusters, pa.int64()),
                    "count": pa.array(counts, pa.int64()),
                    "vsum": pa.array(vsums, pa.list_(pa.int64())),
                }
            )

        return assign_pass

    def combine_partials(batch: pa.Table) -> pa.Table:
        """Tree-combine level: merge ~256 per-batch partial rows into <=k.
        Integer adds commute, so any combine topology yields the same
        sums — the driver reduce sees O(levels x k) rows, not O(blocks x k)."""
        cl = np.asarray(batch.column("cluster").to_pylist(), dtype=np.int64)
        if cl.size == 0:
            return batch
        cnt = np.asarray(batch.column("count").to_pylist(), dtype=np.int64)
        vs = np.asarray(batch.column("vsum").to_pylist(), dtype=np.int64)
        clusters, counts, vsums = [], [], []
        for c in np.unique(cl):
            sel = cl == c
            clusters.append(int(c))
            counts.append(int(cnt[sel].sum()))
            vsums.append(vs[sel].sum(axis=0).tolist())
        return pa.table(
            {
                "cluster": pa.array(clusters, pa.int64()),
                "count": pa.array(counts, pa.int64()),
                "vsum": pa.array(vsums, pa.list_(pa.int64())),
            }
        )

    for _ in range(iters):
        partials = (
            ds.map_batches(
                make_pass(ray.put(centers), final=False), batch_format="pyarrow", batch_size=8192
            )
            .map_batches(combine_partials, batch_format="pyarrow", batch_size=256 * k)
            .to_pandas()
        )
        new_centers = centers.copy()
        for c in range(centers.shape[0]):
            rows = partials[partials["cluster"] == c]
            if len(rows) == 0:
                continue
            total = int(rows["count"].sum())
            vsum = np.sum(np.asarray(rows["vsum"].tolist(), dtype=np.int64), axis=0)
            new_centers[c] = _kmeans_requantize(vsum, total)
        centers = new_centers

    assigned = ds.map_batches(
        make_pass(ray.put(centers), final=True), batch_format="pyarrow", batch_size=8192
    )
    if return_dataset:
        # composition path: assignments stay distributed ((id, cluster) int64
        # rows, 16 B each) — downstream stages consume without a driver hop
        return assigned
    out = assigned.to_pandas()
    return out.sort_values(id_col, kind="mergesort").reset_index(drop=True)


def train_pq_codebooks(
    ds,
    m: int = 8,
    ncodes: int = 16,
    vec_col: str = "embedding",
    sample_rows: int = 4096,
    seed: int = 7,
    iters: int = 10,
) -> np.ndarray:
    """Product-quantization codebooks: split d dims into ``m`` contiguous
    subspaces and run the same fixed-seed bounded-sample k-means as
    :func:`train_ivf_centroids` independently per subspace (driver-side;
    never scales with corpus size). Returns float32 (m, ncodes, d//m);
    codewords are NOT re-normalized (they quantize unit-vector slices,
    whose norms are < 1)."""
    sample = ds.limit(sample_rows).to_pandas()
    x = _normalize(np.asarray(sample[vec_col].tolist(), dtype=np.float32))
    d = x.shape[1]
    if d % m:
        raise ValueError(f"d={d} not divisible by m={m}")
    dsub = d // m
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
    return books


def knn_pq(
    ds,
    queries: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """PQ ADC top-k, INTEGER-exact end to end: unit vectors and codebooks
    are fixed-point quantized to int64 at 2^20 (the kmeans_assign scale);
    encoding (per-subspace argmax of int64 dots, ties -> lowest code) and
    the ADC score (sum over subspaces of the int64 query.codeword lookup
    table) are bit-deterministic under any batch composition, scheduling
    order, or retry — so the score itself is golden-comparable, unlike the
    float cosine the kNN family must drop.

    Scale shape: codebooks (m x ncodes x dsub x 8 B) broadcast once via
    ray.put; each batch emits only its top-k (query_id, id, score) rows;
    the driver merges nq x k x num_batches tiny partials. At ingest scale
    the encode pass compresses d x 4 B vectors to m bytes — the memory
    story that makes billion-vector ANN fit a fixed cluster.

    No overflow: |component| <= 2^20 -> per-subspace LUT entry < dsub x 2^40
    < 2^46 at d<=512, ADC sum < m x 2^46 — int64 safe.

    Returns (query_id, vec_id, adc_score:int64, rank) sorted by
    (query_id, rank); ties on score break by ascending id."""
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float32))
    m, ncodes, dsub = codebooks.shape
    cbq = np.rint(codebooks.astype(np.float64) * KMEANS_FP).astype(np.int64)
    qq = np.rint(q.astype(np.float64) * KMEANS_FP).astype(np.int64)
    # LUT[qi, s, c] = int64 dot of query subvector s with codeword c
    lut = np.einsum("qsd,scd->qsc", qq.reshape(len(qq), m, dsub), cbq, dtype=np.int64)
    bc = ray.put((cbq, lut))

    def partial_topk(batch: pa.Table) -> pa.Table:
        cb, tab = ray.get(bc)
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "adc_score": pa.array([], pa.int64()),
            }
        )
        if ids.size == 0:
            return empty
        xq = np.rint(
            _normalize(_as_matrix(batch.column(vec_col).to_pylist())).astype(np.float64) * KMEANS_FP
        ).astype(np.int64)
        sub = xq.reshape(len(xq), m, dsub)
        # encode: per-subspace nearest codeword by int64 dot (ties -> lowest)
        codes = np.einsum("nsd,scd->nsc", sub, cb, dtype=np.int64).argmax(axis=2)  # (n, m)
        # ADC: score[qi, n] = sum_s LUT[qi, s, codes[n, s]]
        out_q, out_i, out_s = [], [], []
        kk = min(k, ids.size)
        srange = np.arange(m)
        for qi in range(tab.shape[0]):
            scores = tab[qi][srange, codes].sum(axis=1)  # (n,) int64-exact
            idx = np.lexsort((ids, -scores))[:kk]
            out_q.extend([qi] * kk)
            out_i.extend(ids[idx].tolist())
            out_s.extend(scores[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                id_col: pa.array(out_i, pa.int64()),
                "adc_score": pa.array(out_s, pa.int64()),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow", batch_size=8192)
    heaps: dict[int, list] = {}
    for b in partials.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for qi, vid, s in zip(
            b.column("query_id").to_pylist(),
            b.column(id_col).to_pylist(),
            b.column("adc_score").to_pylist(),
        ):
            h = heaps.setdefault(qi, [])
            item = (s, -vid)
            if len(h) < k:
                heapq.heappush(h, item)
            elif item > h[0]:
                heapq.heapreplace(h, item)
    rows = []
    for qi in sorted(heaps):
        ranked = sorted(heaps[qi], key=lambda t: (-t[0], -t[1]))
        for rank, (s, negid) in enumerate(ranked, 1):
            rows.append((qi, -negid, int(s), rank))
    return pd.DataFrame(rows, columns=["query_id", id_col, "adc_score", "rank"])


def kmeans_balanced_sample(
    ds,
    k: int = 8,
    iters: int = 5,
    per_cluster: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Cluster-balanced coreset sample (the diversity-mixing primitive:
    equal representation from every k-means cluster regardless of cluster
    skew): rank members within each cluster by md5(id) — a reproducible
    pseudo-random order any engine can recompute — and keep the first
    ``per_cluster``.

    Scale shape: assignments stay a Dataset (kmeans_assign
    return_dataset=True); a partial top-n combiner inside map_batches
    emits at most k x per_cluster rows PER BATCH, so the driver's final
    merge sees k x per_cluster x num_batches tiny rows — never a
    cluster-sized group (the groupby(cluster).map_groups alternative
    would materialize corpus/k rows in one task at 100 TB skew).

    Returns (cluster, id_col, sample_rank) sorted by (cluster, rank)."""
    import hashlib

    assigned = kmeans_assign(ds, k=k, iters=iters, id_col=id_col, vec_col=vec_col, return_dataset=True)

    def partial_topn(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        cl = np.asarray(batch.column("cluster").to_pylist(), dtype=np.int64)
        if ids.size == 0:
            return pa.table(
                {
                    "cluster": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "rk": pa.array([], pa.string()),
                }
            )
        rk = np.asarray([hashlib.md5(str(i).encode()).hexdigest() for i in ids], dtype=object)
        keep_c, keep_i, keep_r = [], [], []
        for c in np.unique(cl):
            sel = cl == c
            order = np.lexsort((ids[sel], rk[sel]))[:per_cluster]
            keep_c.extend([int(c)] * len(order))
            keep_i.extend(ids[sel][order].tolist())
            keep_r.extend(rk[sel][order].tolist())
        return pa.table(
            {
                "cluster": pa.array(keep_c, pa.int64()),
                id_col: pa.array(keep_i, pa.int64()),
                "rk": pa.array(keep_r, pa.string()),
            }
        )

    partials = assigned.map_batches(partial_topn, batch_format="pyarrow", batch_size=8192).to_pandas()
    partials = partials.sort_values(["cluster", "rk", id_col], kind="mergesort")
    partials["sample_rank"] = (partials.groupby("cluster", sort=False).cumcount() + 1).astype("int64")
    out = partials[partials["sample_rank"] <= per_cluster][["cluster", id_col, "sample_rank"]]
    return out.reset_index(drop=True)


# ---------------------------------------------------------------------------
# Sparse sign random projection (Achlioptas 2003) — integer-exact
# ---------------------------------------------------------------------------

RPROJ_FP = 1 << 20  # shared fixed-point scale (same as KMEANS_FP)


def rproj_sign_matrix(in_dim: int, out_dim: int, seed: str = "rproj") -> np.ndarray:
    """Deterministic sparse {+1, -1, 0} projection matrix derived from
    md5 — identical by construction in numpy and SQL (DuckDB's md5 of the
    same '{seed}:{j}:{t}' string, j 1-based input dim, t 0-based output
    dim). First hex nibble v: +1 when v < 5, -1 when v < 10, else 0
    (density 10/16 — denser than Achlioptas' 1/3 for better small-d
    accuracy; any fixed rule works, this one is one SQL CASE)."""
    import hashlib

    s = np.zeros((in_dim, out_dim), dtype=np.int64)
    for j in range(1, in_dim + 1):
        for t in range(out_dim):
            v = int(hashlib.md5(f"{seed}:{j}:{t}".encode()).hexdigest()[0], 16)
            s[j - 1, t] = 1 if v < 5 else (-1 if v < 10 else 0)
    return s


def random_project(
    ds,
    out_dim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "rproj",
):
    """Johnson–Lindenstrauss dimensionality reduction over an embedding
    column, INTEGER-exact: inputs quantized q = floor(x * 2^20 + 0.5)
    (double multiply + add + floor — the same IEEE operation chain DuckDB
    runs, so quantization is bit-identical to the SQL oracle, no
    banker's-rounding mismatch), then y = q @ S with the md5-derived sign
    matrix — pure int64 sums, order-free, |y| <= in_dim * max|x| * 2^20.

    Returns long-format (id, dim, value) — one row per output component,
    the join-friendly shape for downstream bucketed ops. Embarrassingly
    parallel: one map_batches, no shuffle; the d x out_dim sign matrix is
    rebuilt per batch from 8*d md5 calls (cheaper than shipping it).

    The 100-TB role: project once, cluster/near-dup in out_dim << d —
    the standard pre-step that turns billion-vector all-pairs work into
    byte-bounded sketches (composes with kmeans_assign / sign-LSH)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "dim": pa.array([], pa.int64()),
                "value": pa.array([], pa.int64()),
            }
        )
        if ids.size == 0:
            return empty
        m = _as_matrix(batch.column(vec_col).to_pylist()).astype(np.float64)
        q = np.floor(m * RPROJ_FP + 0.5).astype(np.int64)
        s = rproj_sign_matrix(q.shape[1], out_dim, seed)
        y = q @ s
        n = ids.size
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, out_dim)),
                "dim": pa.array(np.tile(np.arange(out_dim, dtype=np.int64), n)),
                "value": pa.array(y.reshape(-1)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=4096)

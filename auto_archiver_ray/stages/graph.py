"""Link-graph analytics over host edges — the crawl-priority signal.

The reference's frontier has no notion of link authority (it archives a
seed list, `ref:core/orchestrator.py:543-553`); at 10^10-URL frontier
scale, PageRank-style host authority is the standard priority input
(alongside the politeness budgets `state/frontier.py` already enforces).

:func:`host_pagerank` is the 100-TB shape of the computation: every
shuffle keys on a COARSE bucket (hash(node) % num_buckets) exactly like
:func:`..stages.dedup.label_propagate` — never one Ray group per graph
node — and each iteration is two bucketed exchanges (ranks∪edges by src,
messages by dst) of fixed-width rows. Arithmetic is INTEGER fixed-point
(damping 17/20 at a 1e12 scale) so the distributed result hash-matches an
independent SQL re-derivation: float PageRank sums would depend on
reduction order.

Spec (shared with the SQL oracle):
  N        = |{src} ∪ {dst}| over the DISTINCT edge set
  outdeg(u)= distinct out-neighbors of u
  r_0(v)   = scale // N
  r_{i+1}(v) = (3*scale) // (20*N)
             + Σ_{(u,v) ∈ E} (r_i(u) * 17) // (20 * outdeg(u))
Dangling-node mass (outdeg 0) is dropped — the usual simplification; ranks
therefore sum to < scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import _coarse_u64

# Rank rows vs edge rows inside the tagged union are distinguished by an
# explicit ``is_msg`` int8 column — NOT by a sentinel peer value: hosts can
# legitimately be "" (urlparse().netloc of a schemeless URL), and a string
# sentinel would misclassify their edges as rank messages (ADVICE r3 #1).


def _bucket_on(col: str, num_buckets: int):
    def fn(batch: pa.Table) -> pa.Table:
        hb = _coarse_u64(batch.column(col).to_pylist(), num_buckets)
        return batch.append_column("__cb", pa.array(hb))

    return fn


def host_pagerank(
    edges_ds,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 5,
    scale: int = 10**12,
    num_buckets: int = 256,
    strategy: str = "auto",
    driver_edge_limit: int = 5_000_000,
):
    """Integer fixed-point PageRank over an edge Dataset. Returns a Dataset
    of ``(node, rank)`` (rank int64 at ``scale`` fixed-point units).

    Input edges need not be distinct: all rows of one ``src`` land in one
    coarse bucket, so the per-bucket drop_duplicates is globally exact.

    Strategy (the exact_dedup / plan_join size-aware pattern — both paths
    produce bit-identical ranks, the spec is pure integer arithmetic):

    - ``"driver"``: the DISTINCT host-edge list (already reduced
      distributed — hosts are sublinear in corpus size, ~1e8 at web scale)
      is collected and iterated as a vectorized numpy scatter-add —
      microseconds per round vs ~1 s of all-to-all fixed cost. Right while
      distinct edges fit one machine (``driver_edge_limit``).
    - ``"bucketed"``: fused message-passing — one coarse-bucketed exchange
      per iteration, no driver state; the unbounded-graph path.
    - ``"auto"`` (default): driver iff distinct edges ≤ the limit."""

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column(src_col).cast(pa.string()),
                "peer": batch.column(dst_col).cast(pa.string()),
            }
        )

    edges = (
        edges_ds.map_batches(project, batch_format="pyarrow")
        .map_batches(_bucket_on("node", num_buckets), batch_format="pyarrow")
        .materialize()
    )

    def distinct_and_outdeg(g: pd.DataFrame) -> pd.DataFrame:
        e = g[["node", "peer", "__cb"]].drop_duplicates(["node", "peer"])
        return e

    edges = edges.groupby("__cb").map_groups(distinct_and_outdeg, batch_format="pandas").materialize()

    if strategy == "driver" or (strategy == "auto" and edges.count() <= driver_edge_limit):
        return _driver_pagerank(edges, iters, scale)

    # node table: every src with its outdeg, every dst with outdeg 0;
    # bucketed max-reduce by node makes it exact and distinct.
    def node_seed(g: pd.DataFrame) -> pd.DataFrame:
        od = g.groupby("node", as_index=False).size().rename(columns={"size": "outdeg"})
        dsts = pd.DataFrame({"node": g["peer"].unique()})
        dsts["outdeg"] = 0
        return pd.concat([od, dsts], ignore_index=True)[["node", "outdeg"]]

    node_msgs = (
        edges.groupby("__cb")
        .map_groups(node_seed, batch_format="pandas")
        .map_batches(_bucket_on("node", num_buckets), batch_format="pyarrow")
    )

    def node_reduce(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby("node", as_index=False)["outdeg"].max()
        r["__cb"] = g["__cb"].iloc[0]
        return r

    nodes = node_msgs.groupby("__cb").map_groups(node_reduce, batch_format="pandas").materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.drop_columns(["outdeg", "__cb"])
    r0 = scale // n_nodes
    base = (3 * scale) // (20 * n_nodes)

    # One exchange per iteration: the per-node message reduce is FUSED into
    # the next round's emit (messages for node v land in bucket(v), exactly
    # where v's out-edges live, so one groupby both finishes rank_i and
    # emits the rank_{i+1} contributions). Invariant between rounds:
    # rank(v) = base + sum(contribs addressed to v); self-messages carry
    # (rank - base, outdeg) so every node survives each round.

    def init_msgs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("node"),
                "contrib": pa.array(np.full(batch.num_rows, r0 - base, dtype=np.int64)),
                "outdeg": batch.column("outdeg"),
                "__cb": batch.column("__cb"),
            }
        )

    msgs = nodes.map_batches(init_msgs, batch_format="pyarrow").materialize()

    def tag_edges(batch: pa.Table) -> pa.Table:
        neg = pa.array(np.full(batch.num_rows, -1, dtype=np.int64))
        return pa.table(
            {
                "node": batch.column("node"),
                "peer": batch.column("peer"),
                "__cb": batch.column("__cb"),
                "contrib": neg,
                "outdeg": neg,
                "is_msg": pa.array(np.zeros(batch.num_rows, dtype=np.int8)),
            }
        )

    edges_tagged = edges.map_batches(tag_edges, batch_format="pyarrow").materialize()

    def tag_msgs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("node"),
                "peer": pa.array([""] * batch.num_rows, pa.string()),
                "__cb": batch.column("__cb"),
                "contrib": batch.column("contrib"),
                "outdeg": batch.column("outdeg"),
                "is_msg": pa.array(np.ones(batch.num_rows, dtype=np.int8)),
            }
        )

    def reduce_and_emit(g: pd.DataFrame) -> pd.DataFrame:
        tag = g["is_msg"].to_numpy() == 1
        m = g.loc[tag]
        rk = m.groupby("node", as_index=False).agg(contrib=("contrib", "sum"), outdeg=("outdeg", "max"))
        rk["rank"] = base + rk["contrib"].to_numpy(dtype=np.int64)
        e = g.loc[~tag, ["node", "peer"]].merge(
            rk[["node", "outdeg", "rank"]], on="node", how="left"
        )
        contrib = np.zeros(len(e), dtype=np.int64)
        has = e["outdeg"].to_numpy() > 0
        contrib[has] = (e.loc[has, "rank"].to_numpy(dtype=np.int64) * 17) // (
            20 * e.loc[has, "outdeg"].to_numpy(dtype=np.int64)
        )
        return pd.DataFrame(
            {
                "node": pd.concat([rk["node"], e["peer"]], ignore_index=True),
                # self-message contrib is ZERO: rank_{i+1} = base + edge
                # contribs only; the self row just keeps the node alive and
                # carries its outdeg into the next round
                "contrib": np.concatenate([np.zeros(len(rk), dtype=np.int64), contrib]),
                "outdeg": np.concatenate(
                    [rk["outdeg"].to_numpy(dtype=np.int64), np.full(len(e), -1, dtype=np.int64)]
                ),
            }
        )

    for _ in range(iters):
        tagged = edges_tagged.union(msgs.map_batches(tag_msgs, batch_format="pyarrow"))
        msgs = (
            tagged.groupby("__cb")
            .map_groups(reduce_and_emit, batch_format="pandas")
            .map_batches(_bucket_on("node", num_buckets), batch_format="pyarrow")
            .materialize()
        )

    def final_reduce(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby("node", as_index=False).agg(contrib=("contrib", "sum"))
        r["rank"] = base + r["contrib"].to_numpy(dtype=np.int64)
        return r[["node", "rank"]]

    return msgs.groupby("__cb").map_groups(final_reduce, batch_format="pandas")


def _driver_pagerank(edges, iters: int, scale: int):
    """Vectorized driver iteration over the (already-distinct) edge list:
    factorize nodes, integer scatter-add per round (np.add.at on int64 —
    exact, order-free). Same spec, bit-identical to the bucketed path."""
    import ray.data as rd

    df = edges.to_pandas()
    if not len(df):
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.string()), "rank": pa.array([], pa.int64())})
        )
    all_nodes, codes = np.unique(
        np.concatenate([df["node"].to_numpy(dtype=object), df["peer"].to_numpy(dtype=object)]),
        return_inverse=True,
    )
    m = len(df)
    src_idx, dst_idx = codes[:m], codes[m:]
    n = len(all_nodes)
    outdeg = np.bincount(src_idx, minlength=n).astype(np.int64)
    r0 = scale // n
    base = (3 * scale) // (20 * n)
    rank = np.full(n, r0, dtype=np.int64)
    for _ in range(iters):
        contrib = (rank[src_idx] * 17) // (20 * outdeg[src_idx])
        acc = np.zeros(n, dtype=np.int64)
        np.add.at(acc, dst_idx, contrib)
        rank = base + acc
    return rd.from_arrow(
        pa.table({"node": pa.array(list(all_nodes), pa.string()), "rank": pa.array(rank)})
    )

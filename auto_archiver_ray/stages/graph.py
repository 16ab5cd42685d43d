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
import pyarrow.compute as pc

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
    init_ranks=None,
):
    """Integer fixed-point PageRank over an edge Dataset. Returns a Dataset
    of ``(node, rank)`` (rank int64 at ``scale`` fixed-point units).

    Input edges need not be distinct: all rows of one ``src`` land in one
    coarse bucket, so the per-bucket drop_duplicates is globally exact.

    ``init_ranks`` (a ``(node, rank)`` Dataset, e.g. a previous crawl's
    output) WARM-STARTS the iteration: rank_0(v) = init(v) where present,
    else the uniform ``scale // n`` — the continuous-recrawl refresh
    (a few iterations over the grown graph instead of a full recompute;
    nodes present only in ``init_ranks`` and not in the edge set are
    ignored). The init table joins the node table through the same coarse
    buckets — never broadcast, never driver-side.

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
        init_df = init_ranks.to_pandas() if init_ranks is not None else None
        return _driver_pagerank(edges, iters, scale, init_df)

    # node table: every src with its outdeg, every dst with outdeg 0;
    # bucketed max-reduce by node makes it exact and distinct. Warm-start
    # rank rows (outdeg -1 sentinel) ride the same exchange; a node seen
    # ONLY in init_ranks reduces to outdeg -1 and is dropped.
    def node_seed(g: pd.DataFrame) -> pd.DataFrame:
        od = g.groupby("node", as_index=False).size().rename(columns={"size": "outdeg"})
        dsts = pd.DataFrame({"node": g["peer"].unique()})
        dsts["outdeg"] = 0
        out = pd.concat([od, dsts], ignore_index=True)[["node", "outdeg"]]
        out["init"] = -1
        return out

    node_msgs = (
        edges.groupby("__cb")
        .map_groups(node_seed, batch_format="pandas")
        .map_batches(_bucket_on("node", num_buckets), batch_format="pyarrow")
    )
    if init_ranks is not None:

        def init_rows(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": batch.column("node").cast(pa.string()),
                    "outdeg": pa.array(np.full(batch.num_rows, -1, dtype=np.int64)),
                    "init": batch.column("rank").cast(pa.int64()),
                }
            )

        node_msgs = node_msgs.union(
            init_ranks.map_batches(init_rows, batch_format="pyarrow").map_batches(
                _bucket_on("node", num_buckets), batch_format="pyarrow"
            )
        )

    def node_reduce(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby("node", as_index=False).agg(outdeg=("outdeg", "max"), init=("init", "max"))
        r = r.loc[r["outdeg"] >= 0]
        r["__cb"] = g["__cb"].iloc[0]
        return r

    nodes = node_msgs.groupby("__cb").map_groups(node_reduce, batch_format="pandas").materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.drop_columns(["outdeg", "init", "__cb"])
    r0 = scale // n_nodes
    base = (3 * scale) // (20 * n_nodes)

    # One exchange per iteration: the per-node message reduce is FUSED into
    # the next round's emit (messages for node v land in bucket(v), exactly
    # where v's out-edges live, so one groupby both finishes rank_i and
    # emits the rank_{i+1} contributions). Invariant between rounds:
    # rank(v) = base + sum(contribs addressed to v); self-messages carry
    # (rank - base, outdeg) so every node survives each round.

    def init_msgs(batch: pa.Table) -> pa.Table:
        iv = batch.column("init").to_numpy()
        start = np.where(iv >= 0, iv, r0).astype(np.int64)
        return pa.table(
            {
                "node": batch.column("node"),
                "contrib": pa.array(start - base),
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


def _driver_pagerank(edges, iters: int, scale: int, init_df: pd.DataFrame | None = None):
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
    if init_df is not None and len(init_df):
        inits = init_df.drop_duplicates("node").set_index("node")["rank"]
        known = inits.reindex(pd.Index(all_nodes))
        has = known.notna().to_numpy()
        rank[has] = known.to_numpy()[has].astype(np.int64)
    for _ in range(iters):
        contrib = (rank[src_idx] * 17) // (20 * outdeg[src_idx])
        acc = np.zeros(n, dtype=np.int64)
        np.add.at(acc, dst_idx, contrib)
        rank = base + acc
    return rd.from_arrow(
        pa.table({"node": pa.array(list(all_nodes), pa.string()), "rank": pa.array(rank)})
    )


def host_opic(
    edges_ds,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 4,
    scale: int = 10**12,
    num_buckets: int = 256,
    strategy: str = "auto",
    driver_edge_limit: int = 5_000_000,
):
    """OPIC — On-line Page Importance Computation (Abiteboul, Preda &
    Cobena, WWW 2003) in integer fixed-point over an edge Dataset. Returns
    a Dataset of ``(node, cash, hist, importance)`` (all int64).

    The crawl-ordering algorithm the frontier actually wants: unlike
    PageRank there is no damping and no convergence requirement — each
    node holds CASH (current attention) and HISTORY (accumulated
    attention); every round a node banks its cash into history and
    distributes it equally along its out-edges, and ``importance =
    hist + cash`` is a usable fetch priority after ANY number of rounds
    (the online property — a real frontier updates it per fetch).
    Exact integer spec shared with the SQL twin: cash_0 = scale // n on
    every node, hist_0 = 0; per round hist += cash then
    cash'(v) = Σ_{(u,v)∈E} cash(u) // outdeg(u). Floor losses and
    dangling-node cash are absorbed by OPIC's virtual page (simply
    dropped — both engines drop them identically).

    Strategies mirror :func:`host_pagerank` (bit-identical by test):

    - ``"driver"``: vectorized numpy scatter-add per round over the
      distinct edge list; right while distinct host edges fit one machine.
    - ``"bucketed"``: the fused reduce-into-emit message loop — ONE
      coarse-bucketed exchange per round; self-messages carry each node's
      history and outdeg so no driver state exists at all.
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

    def distinct_edges(g: pd.DataFrame) -> pd.DataFrame:
        return g[["node", "peer", "__cb"]].drop_duplicates(["node", "peer"])

    edges = edges.groupby("__cb").map_groups(distinct_edges, batch_format="pandas").materialize()

    if strategy == "driver" or (strategy == "auto" and edges.count() <= driver_edge_limit):
        return _driver_opic(edges, iters, scale)
    return _bucketed_opic(edges, iters, scale, num_buckets)


def _driver_opic(edges, iters: int, scale: int):
    """Vectorized driver OPIC: factorize nodes once, one integer
    scatter-add per round. Same spec, bit-identical to the bucketed path."""
    import ray.data as rd

    empty = pa.table(
        {
            "node": pa.array([], pa.string()),
            "cash": pa.array([], pa.int64()),
            "hist": pa.array([], pa.int64()),
            "importance": pa.array([], pa.int64()),
        }
    )
    df = edges.to_pandas()
    if not len(df):
        return rd.from_arrow(empty)
    all_nodes, codes = np.unique(
        np.concatenate([df["node"].to_numpy(dtype=object), df["peer"].to_numpy(dtype=object)]),
        return_inverse=True,
    )
    m = len(df)
    src_idx, dst_idx = codes[:m], codes[m:]
    n = len(all_nodes)
    outdeg = np.bincount(src_idx, minlength=n).astype(np.int64)
    cash = np.full(n, scale // n, dtype=np.int64)
    hist = np.zeros(n, dtype=np.int64)
    for _ in range(iters):
        hist = hist + cash
        share = cash[src_idx] // outdeg[src_idx]
        acc = np.zeros(n, dtype=np.int64)
        np.add.at(acc, dst_idx, share)
        cash = acc
    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(list(all_nodes), pa.string()),
                "cash": pa.array(cash),
                "hist": pa.array(hist),
                "importance": pa.array(cash + hist),
            }
        )
    )


def _bucketed_opic(edges, iters: int, scale: int, num_buckets: int):
    """Fused message-passing OPIC: one coarse-bucketed exchange per round.
    Invariant between rounds: cash(v) = Σ cash-contribs addressed to v;
    the self-message (contrib 0) carries v's history and outdeg, so every
    node survives every round and no driver state exists."""

    def node_seed(g: pd.DataFrame) -> pd.DataFrame:
        od = g.groupby("node", as_index=False).size().rename(columns={"size": "outdeg"})
        dsts = pd.DataFrame({"node": g["peer"].unique()})
        dsts["outdeg"] = 0
        return pd.concat([od, dsts], ignore_index=True)[["node", "outdeg"]]

    def node_reduce(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby("node", as_index=False).agg(outdeg=("outdeg", "max"))
        r["__cb"] = g["__cb"].iloc[0]
        return r

    nodes = (
        edges.groupby("__cb")
        .map_groups(node_seed, batch_format="pandas")
        .map_batches(_bucket_on("node", num_buckets), batch_format="pyarrow")
        .groupby("__cb")
        .map_groups(node_reduce, batch_format="pandas")
        .materialize()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.drop_columns(["outdeg", "__cb"])
    c0 = scale // n_nodes

    def init_msgs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("node"),
                "contrib": pa.array(np.full(batch.num_rows, c0, dtype=np.int64)),
                "hist": pa.array(np.zeros(batch.num_rows, dtype=np.int64)),
                "outdeg": batch.column("outdeg").cast(pa.int64()),
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
                "hist": neg,
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
                "hist": batch.column("hist"),
                "outdeg": batch.column("outdeg"),
                "is_msg": pa.array(np.ones(batch.num_rows, dtype=np.int8)),
            }
        )

    def reduce_and_emit(g: pd.DataFrame) -> pd.DataFrame:
        tag = g["is_msg"].to_numpy() == 1
        m = g.loc[tag]
        rk = m.groupby("node", as_index=False).agg(
            cash=("contrib", "sum"), hist=("hist", "max"), outdeg=("outdeg", "max")
        )
        new_hist = rk["hist"].to_numpy(dtype=np.int64) + rk["cash"].to_numpy(dtype=np.int64)
        e = g.loc[~tag, ["node", "peer"]].merge(
            rk[["node", "outdeg", "cash"]], on="node", how="left"
        )
        share = np.zeros(len(e), dtype=np.int64)
        has = e["outdeg"].to_numpy() > 0
        share[has] = e.loc[has, "cash"].to_numpy(dtype=np.int64) // e.loc[
            has, "outdeg"
        ].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "node": pd.concat([rk["node"], e["peer"]], ignore_index=True),
                # self contrib is ZERO: next round's cash = edge contribs
                # only; the self row carries history + outdeg forward
                "contrib": np.concatenate([np.zeros(len(rk), dtype=np.int64), share]),
                "hist": np.concatenate([new_hist, np.full(len(e), -1, dtype=np.int64)]),
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
        r = g.groupby("node", as_index=False).agg(cash=("contrib", "sum"), hist=("hist", "max"))
        r["importance"] = r["cash"].to_numpy(dtype=np.int64) + r["hist"].to_numpy(dtype=np.int64)
        return r[["node", "cash", "hist", "importance"]]

    return msgs.groupby("__cb").map_groups(final_reduce, batch_format="pandas")


def host_trustrank(
    edges_ds,
    seed_hosts,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 5,
    scale: int = 10**12,
    num_buckets: int = 256,
    strategy: str = "auto",
    driver_edge_limit: int = 5_000_000,
):
    """Integer fixed-point TrustRank (Gyöngyi, Garcia-Molina & Pedersen,
    VLDB 2004) over an edge Dataset: PageRank whose TELEPORT mass lands
    only on a trusted seed set, so trust decays with link distance from
    the seeds — the classic spam-demotion / crawl-prioritization signal
    the uniform-teleport :func:`host_pagerank` cannot express. Returns a
    Dataset of ``(node, trust)`` (int64 at ``scale`` fixed-point units).

    Spec (shared verbatim with the SQL oracle, `queries._sql_trustrank`;
    ``S`` = the seed set, ``|S|`` its size):

      t_0(v)  = scale // |S|            if v ∈ S else 0
      base(v) = (3*scale) // (20*|S|)   if v ∈ S else 0
      t_i(v)  = base(v) + Σ_{(u,v) ∈ E} (t_{i-1}(u) * 17) // (20*outdeg(u))

    Strategies mirror :func:`host_pagerank` (bit-identical — pure integer
    arithmetic): ``"driver"`` is a vectorized numpy scatter-add while the
    distinct edges fit one machine; ``"bucketed"`` is the same fused
    one-exchange-per-iteration message loop as PageRank with ONE change —
    the per-node teleport ``base`` rides the self-message (an int64
    column; edges carry a -1 sentinel) instead of being a global constant.
    Seeds are a small host list (trust seeds are human-curated and
    sublinear by construction) broadcast in the closure."""
    seeds = sorted(set(seed_hosts))
    if not seeds:
        raise ValueError("host_trustrank needs a non-empty seed set")
    n_seeds = len(seeds)
    t0 = scale // n_seeds
    base_seed = (3 * scale) // (20 * n_seeds)
    seed_arr = np.asarray(seeds, dtype=object)

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

    def distinct_edges(g: pd.DataFrame) -> pd.DataFrame:
        return g[["node", "peer", "__cb"]].drop_duplicates(["node", "peer"])

    edges = edges.groupby("__cb").map_groups(distinct_edges, batch_format="pandas").materialize()

    if strategy == "driver" or (strategy == "auto" and edges.count() <= driver_edge_limit):
        return _driver_trustrank(edges, seed_arr, iters, t0, base_seed)

    def is_seed(names: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(seed_arr, names)
        pos_c = np.clip(pos, 0, len(seed_arr) - 1)
        return seed_arr[pos_c] == names

    # node table with outdeg (same reduction as host_pagerank)
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
    if nodes.count() == 0:
        return nodes.drop_columns(["outdeg", "__cb"])

    # invariant between rounds: trust(v) = base(v) + sum(contribs to v);
    # the self-message carries (outdeg, base) so every node survives and
    # its teleport mass re-applies each round.
    def init_msgs(batch: pa.Table) -> pa.Table:
        names = np.asarray(batch.column("node").to_pylist(), dtype=object)
        sd = is_seed(names)
        base_v = np.where(sd, base_seed, 0).astype(np.int64)
        init_contrib = np.where(sd, t0, 0).astype(np.int64) - base_v
        return pa.table(
            {
                "node": batch.column("node"),
                "contrib": pa.array(init_contrib),
                "outdeg": batch.column("outdeg"),
                "base": pa.array(base_v),
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
                "base": neg,
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
                "base": batch.column("base"),
                "is_msg": pa.array(np.ones(batch.num_rows, dtype=np.int8)),
            }
        )

    def reduce_and_emit(g: pd.DataFrame) -> pd.DataFrame:
        tag = g["is_msg"].to_numpy() == 1
        m = g.loc[tag]
        rk = m.groupby("node", as_index=False).agg(
            contrib=("contrib", "sum"), outdeg=("outdeg", "max"), base=("base", "max")
        )
        rk["trust"] = rk["base"].to_numpy(dtype=np.int64) + rk["contrib"].to_numpy(dtype=np.int64)
        e = g.loc[~tag, ["node", "peer"]].merge(
            rk[["node", "outdeg", "trust"]], on="node", how="left"
        )
        contrib = np.zeros(len(e), dtype=np.int64)
        has = e["outdeg"].to_numpy() > 0
        contrib[has] = (e.loc[has, "trust"].to_numpy(dtype=np.int64) * 17) // (
            20 * e.loc[has, "outdeg"].to_numpy(dtype=np.int64)
        )
        return pd.DataFrame(
            {
                "node": pd.concat([rk["node"], e["peer"]], ignore_index=True),
                "contrib": np.concatenate([np.zeros(len(rk), dtype=np.int64), contrib]),
                "outdeg": np.concatenate(
                    [rk["outdeg"].to_numpy(dtype=np.int64), np.full(len(e), -1, dtype=np.int64)]
                ),
                "base": np.concatenate(
                    [rk["base"].to_numpy(dtype=np.int64), np.full(len(e), -1, dtype=np.int64)]
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
        r = g.groupby("node", as_index=False).agg(contrib=("contrib", "sum"), base=("base", "max"))
        r["trust"] = r["base"].to_numpy(dtype=np.int64) + r["contrib"].to_numpy(dtype=np.int64)
        return r[["node", "trust"]]

    return msgs.groupby("__cb").map_groups(final_reduce, batch_format="pandas")


def _driver_trustrank(edges, seed_arr: np.ndarray, iters: int, t0: int, base_seed: int):
    """Vectorized driver iteration, same spec as the bucketed path:
    factorize nodes, per-node teleport base, integer scatter-add rounds."""
    import ray.data as rd

    df = edges.to_pandas()
    if not len(df):
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.string()), "trust": pa.array([], pa.int64())})
        )
    all_nodes, codes = np.unique(
        np.concatenate([df["node"].to_numpy(dtype=object), df["peer"].to_numpy(dtype=object)]),
        return_inverse=True,
    )
    m = len(df)
    src_idx, dst_idx = codes[:m], codes[m:]
    n = len(all_nodes)
    outdeg = np.bincount(src_idx, minlength=n).astype(np.int64)
    pos = np.searchsorted(seed_arr, all_nodes)
    pos_c = np.clip(pos, 0, len(seed_arr) - 1)
    sd = seed_arr[pos_c] == all_nodes
    base = np.where(sd, base_seed, 0).astype(np.int64)
    trust = np.where(sd, t0, 0).astype(np.int64)
    for _ in range(iters):
        contrib = (trust[src_idx] * 17) // (20 * outdeg[src_idx])
        acc = np.zeros(n, dtype=np.int64)
        np.add.at(acc, dst_idx, contrib)
        trust = base + acc
    return rd.from_arrow(
        pa.table({"node": pa.array(list(all_nodes), pa.string()), "trust": pa.array(trust)})
    )


# ---------------------------------------------------------------------------
# HITS hubs & authorities — the other classic crawl-priority signal
# ---------------------------------------------------------------------------
#
# Same contract discipline as host_pagerank: INTEGER fixed-point so the
# distributed result hash-matches an independent SQL re-derivation, coarse
# buckets for every exchange, and a size-aware driver fast path. The
# normalization is the part that needs care in int64: the classic
# L2/L1-normalized HITS is float. We instead renormalize each half-step by
# q = max(raw) // scale + 1 (integer division ONLY — no value is ever
# multiplied by scale), which keeps every score < scale and every raw sum
# < n_nodes * scale, int64-safe to ~9e9 nodes with scale 1e9.
#
# Spec (shared verbatim with the SQL oracle, `queries._sql_hits`):
#   E         = DISTINCT edge set (src, dst)
#   h_0(u)    = scale for every u that has out-edges (others contribute 0)
#   for i in 1..iters:
#     araw_i(v) = Σ_{(u,v) ∈ E} h_{i-1}(u)          (0 when no in-edges)
#     a_i(v)    = araw_i(v) // (max_v araw_i(v) // scale + 1)
#     hraw_i(u) = Σ_{(u,v) ∈ E} a_i(v)              (0 when no out-edges)
#     h_i(u)    = hraw_i(u) // (max_u hraw_i(u) // scale + 1)
#   output (node, hub = h_iters, auth = a_iters) over ALL nodes.


def host_hits(
    edges_ds,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 4,
    scale: int = 10**9,
    num_buckets: int = 256,
    strategy: str = "auto",
    driver_edge_limit: int = 5_000_000,
):
    """Integer fixed-point HITS over an edge Dataset. Returns a Dataset of
    ``(node, hub, auth)`` (both int64, < ``scale``).

    Strategies mirror :func:`host_pagerank` (both bit-identical — the spec
    is pure integer arithmetic):

    - ``"driver"``: vectorized numpy scatter-add over the distinct edge
      list; right while distinct host edges fit one machine.
    - ``"bucketed"``: two bucketed exchanges per half-step (emit messages
      along edges, reduce by target node) plus one scalar ``max`` per
      half-step for the renormalizer — HITS is inherently two-phase, so an
      iteration costs 4 exchanges where PageRank's fused loop costs 1.
      No driver state beyond the two renormalizer ints per iteration.
    """

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

    def distinct_edges(g: pd.DataFrame) -> pd.DataFrame:
        return g[["node", "peer", "__cb"]].drop_duplicates(["node", "peer"])

    edges = edges.groupby("__cb").map_groups(distinct_edges, batch_format="pandas").materialize()

    if strategy == "driver" or (strategy == "auto" and edges.count() <= driver_edge_limit):
        return _driver_hits(edges, iters, scale)
    return _bucketed_hits(edges, iters, scale, num_buckets)


def _driver_hits(edges, iters: int, scale: int):
    """Vectorized driver iteration: factorize nodes once, integer
    scatter-add per half-step (np.add.at on int64 — exact, order-free)."""
    import ray.data as rd

    empty = pa.table(
        {
            "node": pa.array([], pa.string()),
            "hub": pa.array([], pa.int64()),
            "auth": pa.array([], pa.int64()),
        }
    )
    df = edges.to_pandas()
    if not len(df):
        return rd.from_arrow(empty)
    all_nodes, codes = np.unique(
        np.concatenate([df["node"].to_numpy(dtype=object), df["peer"].to_numpy(dtype=object)]),
        return_inverse=True,
    )
    m = len(df)
    src_idx, dst_idx = codes[:m], codes[m:]
    n = len(all_nodes)
    has_out = np.zeros(n, dtype=bool)
    has_out[src_idx] = True
    h = np.where(has_out, np.int64(scale), np.int64(0)).astype(np.int64)
    a = np.zeros(n, dtype=np.int64)
    for _ in range(iters):
        araw = np.zeros(n, dtype=np.int64)
        np.add.at(araw, dst_idx, h[src_idx])
        a = araw // (int(araw.max()) // scale + 1)
        hraw = np.zeros(n, dtype=np.int64)
        np.add.at(hraw, src_idx, a[dst_idx])
        h = hraw // (int(hraw.max()) // scale + 1)
    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(list(all_nodes), pa.string()),
                "hub": pa.array(h),
                "auth": pa.array(a),
            }
        )
    )


def _bucketed_hits(edges, iters: int, scale: int, num_buckets: int):
    """Message-passing HITS: scores live as (node, v) rows bucketed by
    bucket(node); each half-step is (1) a tagged-union groupby that joins
    the current scores onto the edges stored in the same bucket and emits
    one (target, contribution) message per edge, then (2) a groupby that
    sums messages per target — both keyed on the coarse bucket, never one
    Ray group per node. The renormalizer is a single ``max`` scalar.

    Sparse-score invariant (shared with the SQL oracle's LEFT JOINs):
    a node absent from a score table has score 0 — it contributes nothing
    to the next half-step's sums and resurfaces as 0 in the final output."""
    # edges stored twice, once per message direction, tagged is_msg=0.
    # "node" is always the JOIN side (where scores are looked up), "peer"
    # the message target. Rank rows vs edge rows use an explicit is_msg
    # tag, not a sentinel value (hosts can legitimately be "").

    def tag_edge_rows(batch: pa.Table) -> pa.Table:
        neg = pa.array(np.full(batch.num_rows, -1, dtype=np.int64))
        return pa.table(
            {
                "node": batch.column("node"),
                "peer": batch.column("peer"),
                "__cb": batch.column("__cb"),
                "v": neg,
                "is_msg": pa.array(np.zeros(batch.num_rows, dtype=np.int8)),
            }
        )

    def flip(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("peer"), "peer": batch.column("node")})

    edges_by_src = edges.map_batches(tag_edge_rows, batch_format="pyarrow").materialize()
    edges_by_dst = (
        edges.map_batches(flip, batch_format="pyarrow")
        .map_batches(_bucket_on("node", num_buckets), batch_format="pyarrow")
        .map_batches(tag_edge_rows, batch_format="pyarrow")
        .materialize()
    )

    def tag_score_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("node"),
                "peer": pa.array([""] * batch.num_rows, pa.string()),
                "__cb": batch.column("__cb"),
                "v": batch.column("v"),
                "is_msg": pa.array(np.ones(batch.num_rows, dtype=np.int8)),
            }
        )

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        tag = g["is_msg"].to_numpy() == 1
        sc = g.loc[tag].groupby("node", as_index=False)["v"].sum()
        e = g.loc[~tag, ["node", "peer"]].merge(sc, on="node", how="inner")
        return e[["peer", "v"]].rename(columns={"peer": "node"})

    def reduce_sum(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby("node", as_index=False)["v"].sum()
        r["__cb"] = g["__cb"].iloc[0]
        return r

    def half_step(score_msgs, edge_side):
        """scores (bucketed by node) × one edge direction → next raw scores."""
        tagged = edge_side.union(score_msgs.map_batches(tag_score_rows, batch_format="pyarrow"))
        msgs = (
            tagged.groupby("__cb")
            .map_groups(emit, batch_format="pandas")
            .map_batches(_bucket_on("node", num_buckets), batch_format="pyarrow")
        )
        raw = msgs.groupby("__cb").map_groups(reduce_sum, batch_format="pandas").materialize()
        mx = raw.max("v") if raw.count() else None
        q = (int(mx) // scale + 1) if mx is not None else 1

        def normalize(batch: pa.Table) -> pa.Table:
            v = np.asarray(batch.column("v").to_pylist(), dtype=np.int64) // q
            return pa.table(
                {"node": batch.column("node"), "v": pa.array(v), "__cb": batch.column("__cb")}
            )

        return raw.map_batches(normalize, batch_format="pyarrow").materialize()

    # h_0 = scale on every distinct src (nodes without out-edges would
    # contribute 0 anyway — keeping scores sparse is exact).
    def seed_h(g: pd.DataFrame) -> pd.DataFrame:
        r = g[["node", "__cb"]].drop_duplicates("node").copy()
        r["v"] = np.int64(0)
        return r[["node", "v", "__cb"]]

    h = edges.groupby("__cb").map_groups(seed_h, batch_format="pandas")

    def set_scale(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("node"),
                "v": pa.array(np.full(batch.num_rows, scale, dtype=np.int64)),
                "__cb": batch.column("__cb"),
            }
        )

    h = h.map_batches(set_scale, batch_format="pyarrow").materialize()
    a = None
    for _ in range(iters):
        a = half_step(h, edges_by_src)   # authority: messages flow src → dst
        h = half_step(a, edges_by_dst)   # hub:       messages flow dst → src

    # Final assembly: every node (src ∪ dst), hub/auth 0 where absent.
    def node_seed(g: pd.DataFrame) -> pd.DataFrame:
        return pd.concat(
            [g[["node"]], pd.DataFrame({"node": g["peer"].unique()})], ignore_index=True
        )

    nodes = (
        edges.groupby("__cb")
        .map_groups(node_seed, batch_format="pandas")
        .map_batches(_bucket_on("node", num_buckets), batch_format="pyarrow")
    )

    def tag3(which: int):
        def fn(batch: pa.Table) -> pa.Table:
            v = (
                batch.column("v")
                if "v" in batch.column_names
                else pa.array(np.zeros(batch.num_rows, dtype=np.int64))
            )
            return pa.table(
                {
                    "node": batch.column("node"),
                    "__cb": batch.column("__cb"),
                    "v": v,
                    "kind": pa.array(np.full(batch.num_rows, which, dtype=np.int8)),
                }
            )

        return fn

    merged = (
        nodes.map_batches(tag3(0), batch_format="pyarrow")
        .union(h.map_batches(tag3(1), batch_format="pyarrow"))
        .union(a.map_batches(tag3(2), batch_format="pyarrow"))
    )

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        kinds = g["kind"].to_numpy()
        base = g.loc[kinds == 0, ["node"]].drop_duplicates("node")
        hu = g.loc[kinds == 1, ["node", "v"]].rename(columns={"v": "hub"})
        au = g.loc[kinds == 2, ["node", "v"]].rename(columns={"v": "auth"})
        out = base.merge(hu, on="node", how="left").merge(au, on="node", how="left")
        out["hub"] = out["hub"].fillna(0).astype(np.int64)
        out["auth"] = out["auth"].fillna(0).astype(np.int64)
        return out

    return merged.groupby("__cb").map_groups(assemble, batch_format="pandas")


def host_components(edges_ds, src_col: str = "src", dst_col: str = "dst"):
    """Weakly-connected components over a string-keyed edge Dataset —
    site-family grouping for frontier-shard affinity (the third link-graph
    analytic beside :func:`host_pagerank` and :func:`host_hits`).

    Shape: hosts get 63-bit blake2b node ids (positive int64 —
    ``label_propagate`` reserves -1 as its edge sentinel; collision odds
    n²/2⁶⁴ stay negligible below ~1e9 hosts), the partition forms by
    distributed min-label propagation (coarse-bucketed, no driver state,
    :func:`..stages.dedup.label_propagate`), and each component is then
    NAMED by its lexicographically smallest member host via a bucketed
    min-groupby plus two bucketed hash-joins — so hash ids never appear in
    the result and the caller's oracle needs no hash twin.  Returns a
    Dataset of ``(host, component)``, one row per distinct endpoint host.
    """
    import hashlib

    from .agg import bucketed_group_agg
    from .dedup import label_propagate
    from .join import bucketed_hash_join

    def _h63(vals: list) -> pa.Array:
        return pa.array(
            [
                int.from_bytes(
                    hashlib.blake2b(str(v).encode("utf-8"), digest_size=8).digest(),
                    "little",
                )
                >> 1
                for v in vals
            ],
            pa.int64(),
        )

    def ids(batch: pa.Table) -> pa.Table:
        src = batch.column(src_col).to_pylist()
        dst = batch.column(dst_col).to_pylist()
        return pa.table(
            {
                "id_a": _h63(src),
                "id_b": _h63(dst),
                "src": pa.array([str(v) for v in src], pa.string()),
                "dst": pa.array([str(v) for v in dst], pa.string()),
            }
        )

    edges = edges_ds.map_batches(ids, batch_format="pyarrow", batch_size=4096)
    edges = edges.materialize()  # consumed twice: pair graph + id→host map

    labels = label_propagate(edges.select_columns(["id_a", "id_b"]))

    def explode_idmap(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        batch.column("id_a").combine_chunks(),
                        batch.column("id_b").combine_chunks(),
                    ]
                ),
                "host": pa.concat_arrays(
                    [
                        batch.column("src").combine_chunks(),
                        batch.column("dst").combine_chunks(),
                    ]
                ),
            }
        )
        return t.group_by("node").aggregate([("host", "min")]).rename_columns(["node", "host"])

    # node → host (a node has exactly ONE host; min is just the dedup)
    idmap = bucketed_group_agg(
        edges.map_batches(explode_idmap, batch_format="pyarrow", batch_size=4096),
        ["node"],
        {"host": "min"},
    )

    member_hosts = bucketed_hash_join(labels, idmap, on="node")
    reps = bucketed_group_agg(
        member_hosts.map_batches(
            lambda t: t.select(["label", "host"]).rename_columns(["label", "component"]),
            batch_format="pyarrow",
        ),
        ["label"],
        {"component": "min"},
    )
    out = bucketed_hash_join(member_hosts.select_columns(["host", "label"]), reps, on="label")
    return out.select_columns(["host", "component"])


def host_triangles(edges_ds, src_col: str = "src", dst_col: str = "dst") -> pd.DataFrame:
    """Triangle counting with local-clustering ingredients over the
    undirected host graph (compact-forward / node-iterator with degree
    orientation, Latapy 2008) — the fourth link-graph analytic beside
    PageRank, HITS and components: per host, its degree, wedge count
    C(d, 2) and triangle participation — the local clustering
    coefficient's integer numerator/denominator, a site-family density
    signal the frontier's shard-affinity grouping can rank by.

    Scale shape: distinct undirected (a < b) edges via one bucketed dedup;
    degrees via bucketed sums, broadcast once as sorted parallel arrays
    (node-sized — the pagerank-ranks broadcast contract; swap to a sharded
    key-set join beyond ~1e8 hosts); wedges enumerated per apex inside
    hash(apex) buckets with the degree orientation bounding each apex's
    out-neighborhood (sum of C(outdeg, 2) is the classic O(m^1.5) wedge
    bound — every triangle has exactly ONE vertex out-oriented to the
    other two, so each is found once); closure tested by tagging wedge and
    edge rows with the same "x\\x1fy" pair key in ONE bucketed exchange.
    Only skinny string rows ever move; nothing graph-sized on the driver
    beyond the degree table."""
    import ray

    from .agg import _add_key_bucket_fn, bucketed_group_agg

    SEP = "\x1f"

    def undirect(batch: pa.Table) -> pa.Table:
        a = batch.column(src_col).to_pylist()
        b = batch.column(dst_col).to_pylist()
        # hostless endpoints (canonical_host of a relative/data: URL is "")
        # are not host-graph nodes — dropped here AND in the SQL oracle
        lo = [min(x, y) for x, y in zip(a, b) if x != y and x and y]
        hi = [max(x, y) for x, y in zip(a, b) if x != y and x and y]
        return pa.table(
            {
                "a": pa.array(lo, pa.string()),
                "b": pa.array(hi, pa.string()),
                "n": pa.array(np.ones(len(lo), dtype=np.int64)),
            }
        )

    und = bucketed_group_agg(
        edges_ds.map_batches(undirect, batch_format="pyarrow", batch_size=4096),
        ["a", "b"],
        {"n": "max"},
        num_buckets=64,
    ).materialize()  # consumed three times: degrees, wedges, closure keys

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        s = pd.concat([df["a"], df["b"]]).value_counts()
        return pd.DataFrame({"host": s.index, "d": s.to_numpy().astype("int64")})

    deg = (
        bucketed_group_agg(
            und.map_batches(deg_partial, batch_format="pandas"),
            ["host"],
            {"d": "sum"},
            num_buckets=64,
        )
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    hosts_ref = ray.put(np.asarray(deg["host"].to_numpy(), dtype=object))
    d_ref = ray.put(deg["d"].to_numpy().astype(np.int64))

    def orient(batch: pa.Table) -> pa.Table:
        hs, dd = ray.get(hosts_ref), ray.get(d_ref)
        a = batch.column("a").to_pylist()
        b = batch.column("b").to_pylist()
        da = dd[np.searchsorted(hs, np.asarray(a, dtype=object))]
        db = dd[np.searchsorted(hs, np.asarray(b, dtype=object))]
        u, v = [], []
        for x, y, dx, dy in zip(a, b, da, db):
            if (int(dx), x) <= (int(dy), y):
                u.append(x)
                v.append(y)
            else:
                u.append(y)
                v.append(x)
        return pa.table({"u": pa.array(u, pa.string()), "v": pa.array(v, pa.string())})

    def apex_pairs(g: pd.DataFrame) -> pd.DataFrame:
        keys: list[str] = []
        apexes: list[str] = []
        for u, grp in g.groupby("u"):
            nb = sorted(grp["v"])
            for i in range(len(nb)):
                for j in range(i + 1, len(nb)):
                    keys.append(nb[i] + SEP + nb[j])
                    apexes.append(u)
        return pd.DataFrame(
            {
                "key": pd.Series(keys, dtype=object),
                "apex": pd.Series(apexes, dtype=object),
                "is_edge": pd.Series(np.zeros(len(keys), dtype=np.int64)),
            }
        )

    wedges = (
        und.map_batches(orient, batch_format="pyarrow")
        .map_batches(_add_key_bucket_fn(["u"], 64), batch_format="pyarrow")
        .groupby("__tb")
        .map_groups(apex_pairs, batch_format="pandas")
    )

    def edge_keys(df: pd.DataFrame) -> pd.DataFrame:
        # explicit tag column, NOT an apex sentinel — "" is a possible host
        return pd.DataFrame(
            {
                "key": df["a"] + SEP + df["b"],
                "apex": [""] * len(df),
                "is_edge": np.ones(len(df), dtype=np.int64),
            }
        )

    tagged = wedges.union(und.map_batches(edge_keys, batch_format="pandas"))

    def close(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__tb")
        closed = set(g.loc[g["is_edge"] == 1, "key"])
        tri = g[(g["is_edge"] == 0) & g["key"].isin(closed)]
        if tri.empty:
            return pd.DataFrame(
                {"host": pd.Series(dtype=object), "t": pd.Series(dtype="int64")}
            )
        parts = tri["key"].str.split(SEP, expand=True)
        s = pd.concat([tri["apex"], parts[0], parts[1]]).value_counts()
        return pd.DataFrame({"host": s.index, "t": s.to_numpy().astype("int64")})

    tri_partials = (
        tagged.map_batches(_add_key_bucket_fn(["key"], 64), batch_format="pyarrow")
        .groupby("__tb")
        .map_groups(close, batch_format="pandas")
    )
    tri = bucketed_group_agg(tri_partials, ["host"], {"t": "sum"}, num_buckets=64).to_pandas()
    if "t" not in tri.columns:  # triangle-free graph → empty partials
        tri = pd.DataFrame({"host": pd.Series(dtype=object), "t": pd.Series(dtype="int64")})

    out = deg.merge(tri, on="host", how="left")
    out["n_triangles"] = out["t"].fillna(0).astype("int64")
    out["n_wedges"] = (out["d"] * (out["d"] - 1) // 2).astype("int64")
    out = out.rename(columns={"d": "degree"})
    return (
        out[["host", "degree", "n_wedges", "n_triangles"]]
        .sort_values("host")
        .reset_index(drop=True)
    )


def pointer_double_resolve(
    ptr_ds,
    max_chain: int,
    num_buckets: int = 32,
    strategy: str = "auto",
    driver_node_limit: int = 5_000_000,
):
    """Parallel pointer jumping (Wyllie 1979; JaJa 1992 §3.1): resolve every
    node of a FUNCTIONAL graph — each node has exactly one successor,
    terminals point to themselves — to its terminal node plus the exact hop
    distance, in ``ceil(log2(max_chain))`` rounds.

    The crawl-plane use is redirect-chain resolution: the reference follows
    HTTP redirect chains one sequential hop per URL
    (ref:core/orchestrator.py:543-553 archives one item at a time; each
    fetch transparently walks its own chain). At 10^10-URL scale a chain of
    length L must NOT cost L dependent exchanges over the corpus — pointer
    doubling squares the stride each round, so 64-hop chains settle in 6.

    Input dataset columns (skinny int64 triples, one row per node):
      node, ptr, d — terminals as ``(t, t, 0)``, others ``(n, succ(n), 1)``.
    Output: same columns with ``ptr`` = the node's terminal and ``d`` = the
    chain length (hops to terminal).

    Strategy (the host_pagerank size-aware pattern — both paths are
    bit-identical, the spec is pure integer arithmetic):

    - ``"driver"``: the skinny triples (24 B/node) are collected and
      doubled as vectorized numpy gathers — microseconds per round vs
      ~1-3 s of all-to-all fixed cost per exchange. Right while nodes fit
      one machine (``driver_node_limit`` ≈ 120 MB).
    - ``"exchange"``: each round is ONE bucketed hash self-join exchange
      of the int64 triples (left.ptr = right.node), then a stateless
      emit; the table never grows (exactly one row per node throughout)
      and nothing reaches the driver. Early-stops on a sum(d) fixpoint
      (the connected-components convention): once no hop count grows,
      every node is settled.
    - ``"auto"`` (default): driver iff node count ≤ the limit.

    Chain-length skew costs nothing — every node advances in every round,
    there is no per-chain serialization. Rounds are bounded by
    ``max_chain``, not corpus size; pass the generating process's bound
    (redirect chains: the politeness cap on follow depth)."""
    from .join import bucketed_hash_join

    rounds = max(1, int(np.ceil(np.log2(max(2, max_chain)))))

    # both paths consume the input at least twice (count + collect, or
    # left + right join sides): pin it once
    ptr_ds = ptr_ds.materialize()

    if strategy == "driver" or (strategy == "auto" and ptr_ds.count() <= driver_node_limit):
        import ray.data as rd

        df = ptr_ds.to_pandas()
        if not len(df):
            return ptr_ds
        node = df["node"].to_numpy(dtype=np.int64)
        order = np.argsort(node, kind="stable")
        node_s = node[order]
        ptr_s = df["ptr"].to_numpy(dtype=np.int64)[order]
        d_s = df["d"].to_numpy(dtype=np.int64)[order].copy()
        for _ in range(rounds):
            idx = np.searchsorted(node_s, ptr_s)
            nd = d_s + d_s[idx]
            if np.array_equal(nd, d_s):
                break
            d_s = nd
            ptr_s = ptr_s[idx]
        return rd.from_arrow(
            pa.table({"node": pa.array(node_s), "ptr": pa.array(ptr_s), "d": pa.array(d_s)})
        )

    def as_left(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("node"),
                "key": batch.column("ptr"),
                "d_l": batch.column("d"),
            }
        )

    def as_right(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": batch.column("node"),
                "ptr2": batch.column("ptr"),
                "d_r": batch.column("d"),
            }
        )

    def emit(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "node": batch.column("node"),
                "ptr": batch.column("ptr2"),
                "d": pc.add(batch.column("d_l"), batch.column("d_r")),
            }
        )

    cur = ptr_ds
    prev_dsum = None
    for rnd in range(rounds):
        if rnd:
            cur = cur.materialize()  # consumed twice below (left + right side)
        dsum = cur.sum("d")  # cheap on the materialized skinny triples
        if prev_dsum is not None and dsum == prev_dsum:
            break  # no hop count grew last round: every node is settled
        prev_dsum = dsum
        joined = bucketed_hash_join(
            cur.map_batches(as_left, batch_format="pyarrow"),
            cur.map_batches(as_right, batch_format="pyarrow"),
            on="key",
            num_buckets=num_buckets,
        )
        cur = joined.map_batches(emit, batch_format="pyarrow")
    return cur


def host_seed_distance(
    edges_ds,
    seed_hosts,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 16,
    num_buckets: int = 256,
    strategy: str = "auto",
    driver_edge_limit: int = 5_000_000,
):
    """Multi-source BFS hop distance from a seed host set over the DIRECTED
    host link graph — the min-plus dual of the sum-semiring rank loops
    (crawl depth / seed proximity: how many link hops a frontier must
    expand before it reaches a host; TrustRank's decay uses the same
    distance implicitly, this makes it explicit). Returns a Dataset of
    ``(node, hops)`` holding ONLY hosts reachable within ``max_hops``
    (``max_hops`` is part of the spec — both strategies and the SQL oracle
    bound the walk identically, so a >diameter cap never changes results).

    Size-aware (the host_pagerank contract): ``"driver"`` is a factorized
    numpy BFS while the distinct edges fit one machine; ``"exchange"`` is
    a coarse-bucketed sparse frontier loop — the dist table starts at the
    seeds only and grows monotonically, each round is two bucketed
    exchanges (dists∪edges by node → min-candidate messages by dst), with
    an early stop when the (count, sum) scalar pair is stable (rows only
    get added and per-node dists only decrease, so a stable pair is a
    fixpoint). Bit-identical by construction (pure integer mins).
    """
    import ray.data as rd

    seeds = sorted(set(seed_hosts))
    if not seeds:
        raise ValueError("host_seed_distance needs a non-empty seed set")
    seed_arr = np.asarray(seeds, dtype=object)

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

    def distinct_edges(g: pd.DataFrame) -> pd.DataFrame:
        return g[["node", "peer", "__cb"]].drop_duplicates(["node", "peer"])

    edges = edges.groupby("__cb").map_groups(distinct_edges, batch_format="pandas").materialize()

    if strategy == "driver" or (strategy == "auto" and edges.count() <= driver_edge_limit):
        df = edges.to_pandas()
        if not len(df):
            return rd.from_arrow(
                pa.table({"node": pa.array([], pa.string()), "hops": pa.array([], pa.int64())})
            )
        all_nodes, codes = np.unique(
            np.concatenate(
                [df["node"].to_numpy(dtype=object), df["peer"].to_numpy(dtype=object)]
            ),
            return_inverse=True,
        )
        m = len(df)
        src_idx, dst_idx = codes[:m], codes[m:]
        n = len(all_nodes)
        dist = np.full(n, -1, dtype=np.int64)
        pos = np.searchsorted(all_nodes, seed_arr)
        pos_c = np.clip(pos, 0, n - 1)
        in_graph = all_nodes[pos_c] == seed_arr
        dist[pos_c[in_graph]] = 0
        frontier = np.zeros(n, dtype=bool)
        frontier[pos_c[in_graph]] = True
        for d in range(1, max_hops + 1):
            cand = dst_idx[frontier[src_idx]]
            new = cand[dist[cand] == -1]
            if not len(new):
                break
            dist[new] = d
            frontier[:] = False
            frontier[new] = True
        keep = dist >= 0
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array(list(all_nodes[keep]), pa.string()),
                    "hops": pa.array(dist[keep]),
                }
            )
        )

    # --- exchange strategy: sparse frontier, coarse buckets ---
    def tag_edges(t: pa.Table) -> pa.Table:
        return t.append_column("dist", pa.array([-1] * t.num_rows, pa.int64())).append_column(
            "is_msg", pa.array([0] * t.num_rows, pa.int8())
        )

    seed_cb = _coarse_u64(list(seed_arr), num_buckets)
    dists = rd.from_arrow(
        pa.table(
            {
                "node": pa.array(list(seed_arr), pa.string()),
                "peer": pa.array([""] * len(seed_arr), pa.string()),
                "__cb": pa.array(seed_cb),
                "dist": pa.array(np.zeros(len(seed_arr), dtype=np.int64)),
                "is_msg": pa.array(np.ones(len(seed_arr), dtype=np.int8)),
            }
        )
    ).materialize()
    edges_tagged = edges.map_batches(tag_edges, batch_format="pyarrow").materialize()

    prev = None
    for _ in range(max_hops):

        def emit(g: pd.DataFrame) -> pd.DataFrame:
            cur = (
                g.loc[g["is_msg"] == 1]
                .groupby("node", as_index=False)["dist"]
                .min()
            )
            e = g.loc[g["is_msg"] == 0, ["node", "peer"]].merge(cur, on="node", how="inner")
            dst = pd.concat([cur["node"], e["peer"]], ignore_index=True)
            cand = pd.concat([cur["dist"], e["dist"] + 1], ignore_index=True)
            return pd.DataFrame({"dst": dst.astype(str), "cand": cand.astype("int64")})

        msgs = (
            dists.union(edges_tagged)
            .groupby("__cb")
            .map_groups(emit, batch_format="pandas")
            .map_batches(_bucket_on("dst", num_buckets), batch_format="pyarrow")
        )

        def reduce_min(g: pd.DataFrame) -> pa.Table:
            # return Arrow so dist blocks share one block type with the
            # edge blocks they union against next round (the init_labels
            # lesson in dedup.label_propagate)
            m = g.groupby("dst", as_index=False)["cand"].min()
            k = len(m)
            return pa.table(
                {
                    "node": pa.array(m["dst"].astype(str).tolist(), pa.string()),
                    "peer": pa.array([""] * k, pa.string()),
                    "__cb": pa.array(np.full(k, int(g["__cb"].iloc[0]), dtype=np.int64)),
                    "dist": pa.array(m["cand"].to_numpy(dtype=np.int64)),
                    "is_msg": pa.array(np.ones(k, dtype=np.int8)),
                }
            )

        dists = msgs.groupby("__cb").map_groups(reduce_min, batch_format="pandas").materialize()
        from ray.data.aggregate import Count, Sum

        stats = dists.aggregate(Count(alias_name="n"), Sum("dist", alias_name="s"))
        cur_pair = (stats["n"], stats["s"])
        if cur_pair == prev:
            break
        prev = cur_pair

    def finalize(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.less_equal(batch["dist"], pa.scalar(max_hops, pa.int64())))
        return pa.table({"node": t["node"], "hops": t["dist"]})

    return dists.map_batches(finalize, batch_format="pyarrow")

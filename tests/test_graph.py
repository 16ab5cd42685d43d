"""Unit tests for the integer fixed-point host PageRank."""

import numpy as np
import pandas as pd
import pytest


def serial_pagerank(edges: list[tuple[str, str]], iters: int = 5, scale: int = 10**12):
    """Plain-dict replay of the spec in stages/graph.py."""
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    outdeg = {}
    for s, _ in e:
        outdeg[s] = outdeg.get(s, 0) + 1
    n = len(nodes)
    rank = {v: scale // n for v in nodes}
    base = (3 * scale) // (20 * n)
    for _ in range(iters):
        contrib = {v: 0 for v in nodes}
        for s, d in e:
            contrib[d] += (rank[s] * 17) // (20 * outdeg[s])
        rank = {v: base + contrib[v] for v in nodes}
    return rank


@pytest.mark.usefixtures("ray_session")
def test_host_pagerank_matches_serial_spec():
    import ray.data as rd

    from auto_archiver_ray.stages.graph import host_pagerank

    edges = [
        ("a.com", "b.com"),
        ("a.com", "c.com"),
        ("b.com", "c.com"),
        ("c.com", "a.com"),
        ("d.com", "c.com"),
        # duplicate edge must not double-count
        ("a.com", "b.com"),
    ]
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    got = host_pagerank(ds, iters=5).to_pandas().sort_values("node").reset_index(drop=True)
    want = serial_pagerank(edges)
    assert dict(zip(got["node"], got["rank"].astype(int))) == want
    # dangling d.com keeps only the base mass
    assert want["d.com"] == (3 * 10**12) // (20 * 4)


@pytest.mark.usefixtures("ray_session")
def test_host_pagerank_star_graph_sink_dominates():
    import ray.data as rd

    from auto_archiver_ray.stages.graph import host_pagerank

    spokes = [f"s{i}.com" for i in range(20)]
    edges = pd.DataFrame({"src": spokes, "dst": ["hub.com"] * 20})
    got = host_pagerank(rd.from_pandas(edges), iters=3).to_pandas()
    ranks = dict(zip(got["node"], got["rank"].astype(int)))
    assert ranks["hub.com"] > max(v for k, v in ranks.items() if k != "hub.com") * 5
    # total mass never exceeds the scale (dangling hub drops its mass)
    assert sum(ranks.values()) <= 10**12


@pytest.mark.usefixtures("ray_session")
def test_host_pagerank_strategies_bit_identical():
    """The driver matvec and the bucketed message-passing paths implement
    one integer spec — identical ranks on a random multigraph."""
    import numpy as np
    import ray.data as rd

    from auto_archiver_ray.stages.graph import host_pagerank

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "src": [f"h{i}.org" for i in rng.integers(0, 30, 400)],
            "dst": [f"h{i}.org" for i in rng.integers(0, 30, 400)],
        }
    )
    ds = rd.from_pandas(df)
    a = host_pagerank(ds, iters=4, strategy="driver").to_pandas().sort_values("node").reset_index(drop=True)
    b = host_pagerank(ds, iters=4, strategy="bucketed").to_pandas().sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_host_pagerank_empty_string_host_bit_identical():
    """An empty-string host ("" — urlparse().netloc of a schemeless URL) is a
    legitimate graph node: it must NOT be confused with rank-message rows in
    the bucketed path's tagged union (ADVICE r3 #1 reproduced exactly this
    divergence between the driver and bucketed strategies)."""
    import ray.data as rd

    from auto_archiver_ray.stages.graph import host_pagerank

    edges = [("a.com", ""), ("b.com", "a.com"), ("a.com", "b.com"), ("", "b.com")]
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    a = host_pagerank(ds, iters=5, strategy="driver").to_pandas().sort_values("node").reset_index(drop=True)
    b = host_pagerank(ds, iters=5, strategy="bucketed").to_pandas().sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    want = serial_pagerank(edges)
    assert dict(zip(a["node"], a["rank"].astype(int))) == want


@pytest.mark.usefixtures("ray_session")
def test_host_pagerank_empty_edges():
    import pyarrow as pa
    import ray.data as rd

    from auto_archiver_ray.stages.graph import host_pagerank

    empty = rd.from_arrow(
        pa.table({"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())})
    )
    assert host_pagerank(empty).count() == 0


# ---------------------------------------------------------------------------
# HITS hubs & authorities
# ---------------------------------------------------------------------------


def serial_hits(edges: list[tuple[str, str]], iters: int = 4, scale: int = 10**9):
    """Plain-dict replay of the spec in stages/graph.py (host_hits)."""
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    srcs = {s for s, _ in e}
    h = {v: (scale if v in srcs else 0) for v in nodes}
    a = {v: 0 for v in nodes}
    for _ in range(iters):
        ar = {v: 0 for v in nodes}
        for s, d in e:
            ar[d] += h[s]
        q = max(ar.values()) // scale + 1
        a = {v: ar[v] // q for v in nodes}
        hr = {v: 0 for v in nodes}
        for s, d in e:
            hr[s] += a[d]
        q = max(hr.values()) // scale + 1
        h = {v: hr[v] // q for v in nodes}
    return h, a


@pytest.mark.usefixtures("ray_session")
def test_host_hits_matches_serial_spec():
    import ray.data as rd

    from auto_archiver_ray.stages.graph import host_hits

    rng = np.random.RandomState(11)
    edges = [
        (f"h{i % 19}.com", f"m{j % 13}.org")
        for i, j in zip(rng.randint(0, 200, 800), rng.randint(0, 150, 800))
    ]
    # hosts overlapping both sides, empty-string host, duplicate edges
    edges += [("m3.org", "h1.com"), ("", "h2.com"), ("h1.com", ""), ("h1.com", "")]
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    got = host_hits(ds, iters=4).to_pandas().sort_values("node").reset_index(drop=True)
    h, a = serial_hits(edges)
    assert dict(zip(got["node"], got["hub"].astype(int))) == h
    assert dict(zip(got["node"], got["auth"].astype(int))) == a
    # renormalization keeps every score strictly under scale
    assert got["hub"].max() < 10**9 and got["auth"].max() < 10**9


@pytest.mark.usefixtures("ray_session")
def test_host_hits_strategies_bit_identical():
    import ray.data as rd

    from auto_archiver_ray.stages.graph import host_hits

    rng = np.random.RandomState(23)
    edges = pd.DataFrame(
        {
            "src": [f"s{i % 41}.com" for i in rng.randint(0, 400, 2000)],
            "dst": [f"d{i % 29}.org" for i in rng.randint(0, 300, 2000)],
        }
    )
    ds = rd.from_pandas(edges)
    a = host_hits(ds, iters=3, strategy="driver").to_pandas().sort_values("node").reset_index(drop=True)
    b = host_hits(ds, iters=3, strategy="bucketed").to_pandas().sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_host_hits_star_graph():
    """One page host linking to every media host: the page is the sole hub
    (score = scale after normalization), every media host an equal
    authority."""
    import ray.data as rd

    from auto_archiver_ray.stages.graph import host_hits

    edges = pd.DataFrame({"src": ["hub.com"] * 5, "dst": [f"m{i}.org" for i in range(5)]})
    got = host_hits(rd.from_pandas(edges), iters=2).to_pandas()
    byn = dict(zip(got["node"], zip(got["hub"].astype(int), got["auth"].astype(int))))
    assert byn["hub.com"][0] == max(h for h, _ in byn.values())
    assert byn["hub.com"][1] == 0  # nothing links TO the hub
    auths = {byn[f"m{i}.org"][1] for i in range(5)}
    assert len(auths) == 1  # symmetric authorities
    assert all(byn[f"m{i}.org"][0] == 0 for i in range(5))  # leaves aren't hubs


@pytest.mark.usefixtures("ray_session")
def test_host_hits_empty_edges():
    import pyarrow as pa
    import ray.data as rd

    from auto_archiver_ray.stages.graph import host_hits

    empty = rd.from_arrow(
        pa.table({"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())})
    )
    assert host_hits(empty).count() == 0


@pytest.mark.usefixtures("ray_session")
def test_host_components_toy_graph():
    """Two components + an isolated self-loop: component = min host string,
    every endpoint host appears exactly once."""
    import ray.data as rd

    from auto_archiver_ray.stages.graph import host_components

    edges = rd.from_items(
        [
            # component {a,b,c}: chain a-b, b-c (directions mixed on purpose)
            {"src": "b.org", "dst": "a.org"},
            {"src": "b.org", "dst": "c.org"},
            # component {x,y}
            {"src": "x.org", "dst": "y.org"},
            {"src": "x.org", "dst": "y.org"},  # duplicate edge
            # self-loop: z alone
            {"src": "z.org", "dst": "z.org"},
        ]
    )
    out = host_components(edges).to_pandas().sort_values("host").reset_index(drop=True)
    got = dict(zip(out["host"], out["component"]))
    assert got == {
        "a.org": "a.org",
        "b.org": "a.org",
        "c.org": "a.org",
        "x.org": "x.org",
        "y.org": "x.org",
        "z.org": "z.org",
    }
    assert len(out) == 6  # one row per endpoint host


@pytest.mark.usefixtures("ray_session")
def test_host_components_repartition_invariant():
    """The partition (and its min-host naming) must not depend on block
    layout — same frame under a different repartition."""
    import ray.data as rd

    from auto_archiver_ray.stages.graph import host_components

    items = [
        {"src": f"h{i:02d}.org", "dst": f"h{(i + 1) % 10:02d}.org"} for i in range(10)
    ] + [{"src": "solo-a.org", "dst": "solo-b.org"}]
    a = host_components(rd.from_items(items)).to_pandas().sort_values("host").reset_index(drop=True)
    b = (
        host_components(rd.from_items(items).repartition(7))
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # the 10-cycle is one component named by its min member
    assert (a.loc[a["host"].str.startswith("h"), "component"] == "h00.org").all()
    assert (a.loc[a["host"].str.startswith("solo"), "component"] == "solo-a.org").all()


@pytest.mark.usefixtures("ray_session")
def test_host_triangles_toy_graph_and_repartition_invariance():
    """K4 plus a pendant: every K4 vertex sits in 3 of the 4 triangles; the
    pendant host has wedges but no triangles; duplicate/reversed input
    edges collapse; result invariant to input partitioning."""
    import pandas as pd
    import ray.data as rd

    from auto_archiver_ray.stages.graph import host_triangles

    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    edges = k4 + [("e", "a"), ("a", "e"), ("b", "a"), ("x", "x")]  # dups/reverse/self
    df = pd.DataFrame(edges, columns=["src", "dst"])

    got = host_triangles(rd.from_pandas(df))
    want = pd.DataFrame(
        {
            "host": ["a", "b", "c", "d", "e"],
            "degree": [4, 3, 3, 3, 1],
            "n_wedges": [6, 3, 3, 3, 0],
            "n_triangles": [3, 3, 3, 3, 0],
        }
    )
    pd.testing.assert_frame_equal(got.astype({"degree": "int64"}), want, check_dtype=False)
    assert got["n_triangles"].sum() == 12  # 4 triangles x 3 vertices

    redo = host_triangles(rd.from_pandas(df).repartition(5))
    pd.testing.assert_frame_equal(redo, got, check_dtype=False)


# ---------------------------------------------------------------------------
# pointer_double_resolve — parallel pointer jumping
# ---------------------------------------------------------------------------


def serial_resolve(ptr: dict[int, int]) -> dict[int, tuple[int, int]]:
    """Naive chain walk: node -> (terminal, hops)."""
    out = {}
    for n in ptr:
        cur, hops = n, 0
        while ptr[cur] != cur:
            cur = ptr[cur]
            hops += 1
        out[n] = (cur, hops)
    return out


def _resolve_via_ray(ptr: dict[int, int], max_chain: int):
    import pyarrow as pa
    import ray.data as rd

    from auto_archiver_ray.stages.graph import pointer_double_resolve

    nodes = sorted(ptr)
    tbl = pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "ptr": pa.array([ptr[n] for n in nodes], pa.int64()),
            "d": pa.array([0 if ptr[n] == n else 1 for n in nodes], pa.int64()),
        }
    )
    ds = rd.from_arrow(tbl).repartition(4)
    got = pointer_double_resolve(ds, max_chain=max_chain).to_pandas()
    return {int(r.node): (int(r.ptr), int(r.d)) for r in got.itertuples()}


@pytest.mark.usefixtures("ray_session")
def test_pointer_double_resolve_strategies_bit_identical():
    """Driver (numpy gather) and exchange (bucketed self-join) paths give
    the same resolution — the host_pagerank size-aware contract — and the
    exchange path's sum(d) fixpoint early-stop does not change results
    when rounds exceed the longest chain."""
    import pyarrow as pa
    import ray.data as rd

    from auto_archiver_ray.stages.graph import pointer_double_resolve

    rng = {i: i - 1 for i in range(1, 40)}
    rng[0] = 0
    rng.update({100: 100, 101: 100, 102: 101, 200: 200})
    want = serial_resolve(rng)
    nodes = sorted(rng)
    tbl = pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "ptr": pa.array([rng[n] for n in nodes], pa.int64()),
            "d": pa.array([0 if rng[n] == n else 1 for n in nodes], pa.int64()),
        }
    )
    for strat, max_chain in (("driver", 64), ("exchange", 64), ("exchange", 4096)):
        ds = rd.from_arrow(tbl).repartition(3)
        got = pointer_double_resolve(ds, max_chain=max_chain, strategy=strat).to_pandas()
        as_map = {int(r.node): (int(r.ptr), int(r.d)) for r in got.itertuples()}
        assert as_map == want, strat


@pytest.mark.usefixtures("ray_session")
def test_pointer_double_resolve_chains_and_trees():
    # chain 0<-1<-...<-9, a self-terminal island, and a tree into node 20
    ptr = {i: i - 1 for i in range(1, 10)}
    ptr[0] = 0
    ptr[15] = 15
    ptr[20] = 20
    ptr[21] = 20
    ptr[22] = 20
    ptr[23] = 22
    want = serial_resolve(ptr)
    got = _resolve_via_ray(ptr, max_chain=16)
    assert got == want
    assert got[9] == (0, 9)
    assert got[23] == (20, 2)


@pytest.mark.usefixtures("ray_session")
def test_pointer_double_resolve_exact_power_of_two_boundary():
    # chain of length exactly 2^k must resolve with rounds = k
    L = 8
    ptr = {i: max(0, i - 1) for i in range(L + 1)}
    ptr[0] = 0
    want = serial_resolve(ptr)
    got = _resolve_via_ray(ptr, max_chain=L)
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_crawl_redirects_matches_recursive_sql():
    """End-to-end gate: the pointer-jumping resolution equals DuckDB's
    recursive-CTE walk over the same derived redirect edges (sf0.001)."""
    import duckdb
    import pandas as pd

    from auto_archiver_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    res = Q.q_crawl_redirects(sf)
    df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
    sql = Q.SQL_CRAWL_REDIRECTS_T.format(
        glob=Q.pages_glob(sf), valid=Q._VALID_SQL, mod=Q.REDIRECT_MOD
    )
    odf = duckdb.connect().execute(sql).df()

    def canon(d):
        d = d[sorted(d.columns)].copy()
        return d.sort_values(list(d.columns), kind="mergesort").reset_index(drop=True)

    a, b = canon(df), canon(odf)
    for c in a.columns:
        b[c] = b[c].astype(a[c].dtype)
    assert len(a) > 0
    assert a.equals(b)


def serial_trustrank(edges, seeds, iters=5, scale=10**12):
    """Naive dict replay of the host_trustrank integer spec."""
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    out = {}
    for s, _ in e:
        out[s] = out.get(s, 0) + 1
    S = sorted(set(seeds))
    t0, base = scale // len(S), (3 * scale) // (20 * len(S))
    t = {n: (t0 if n in S else 0) for n in nodes}
    for _ in range(iters):
        acc = {n: 0 for n in nodes}
        for s, d in e:
            acc[d] += (t[s] * 17) // (20 * out[s])
        t = {n: (base if n in S else 0) + acc[n] for n in nodes}
    return t


@pytest.mark.usefixtures("ray_session")
def test_host_trustrank_strategies_and_decay():
    """Driver and bucketed TrustRank are bit-identical to each other and
    to a naive serial replay of the integer spec; trust mass is zero on
    hosts unreachable from the seed set and decays with distance."""
    import ray.data as rd

    from auto_archiver_ray.stages.graph import host_trustrank

    # seed s links a chain s -> c1 -> c2 -> c3; a disconnected spam pair
    edges = [
        ("seed.org", "c1.com"),
        ("c1.com", "c2.com"),
        ("c2.com", "c3.com"),
        ("spam-a.biz", "spam-b.biz"),
        ("spam-b.biz", "spam-a.biz"),
        ("seed.org", "c1.com"),  # duplicate edge must not double mass
    ]
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    want = serial_trustrank(edges, ["seed.org"])
    for strat in ("driver", "bucketed"):
        got = (
            host_trustrank(
                rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"])),
                ["seed.org"],
                strategy=strat,
                num_buckets=8,
            )
            .to_pandas()
            .sort_values("node")
        )
        as_map = dict(zip(got["node"], got["trust"].astype(int)))
        assert as_map == want, strat
    # spam island gets ZERO trust (uniform PageRank would rank it)
    assert want["spam-a.biz"] == 0 and want["spam-b.biz"] == 0
    # trust decays monotonically along the chain from the seed
    assert want["seed.org"] > want["c1.com"] > want["c2.com"] > want["c3.com"] > 0


@pytest.mark.usefixtures("ray_session")
def test_host_pagerank_warm_start_refresh():
    """init_ranks warm-start: (a) driver and bucketed paths bit-identical,
    (b) warm-starting k rounds from a cold 5-round result over the SAME
    graph equals a cold 5+k-round run (the continued-iteration identity),
    (c) a node only in init_ranks and not in the edge set is ignored."""
    import ray.data as rd

    from auto_archiver_ray.stages.graph import host_pagerank

    rng = np.random.default_rng(19)
    df = pd.DataFrame(
        {
            "src": [f"h{i}.org" for i in rng.integers(0, 25, 300)],
            "dst": [f"h{i}.org" for i in rng.integers(0, 25, 300)],
        }
    )
    ds = rd.from_pandas(df)
    r5 = host_pagerank(ds, iters=5).materialize()
    # ghost node present only in init — must not appear in the output
    ghost = rd.from_pandas(pd.DataFrame({"node": ["ghost.example"], "rank": [123]}))
    init = r5.union(ghost).materialize()
    for strat in ("driver", "bucketed"):
        warm = (
            host_pagerank(ds, iters=2, strategy=strat, num_buckets=8, init_ranks=init)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        cold7 = (
            host_pagerank(ds, iters=7, strategy=strat, num_buckets=8)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(warm, cold7, check_dtype=False)
        assert "ghost.example" not in set(warm["node"])


@pytest.mark.usefixtures("ray_session")
def test_host_seed_distance_strategies_toy_and_cap():
    """Multi-source BFS: known hop distances on a toy graph; driver and
    exchange strategies bit-identical; the max_hops cap is part of the
    spec (both strategies truncate identically); random-graph parity."""
    import ray.data as rd

    from auto_archiver_ray.stages.graph import host_seed_distance

    edges = rd.from_pandas(
        pd.DataFrame(
            {
                "src": ["a", "b", "c", "e", "a"],  # a->b duplicated: distinct-edge reduce
                "dst": ["b", "c", "d", "f", "b"],
            }
        )
    )
    want = [("a", 0), ("b", 1), ("c", 2), ("d", 3)]  # e/f unreachable, excluded
    for strat in ("driver", "exchange"):
        out = host_seed_distance(edges, ["a"], max_hops=16, strategy=strat, num_buckets=8)
        got = sorted(map(tuple, out.to_pandas()[["node", "hops"]].values.tolist()))
        assert got == want, (strat, got)
        capped = host_seed_distance(edges, ["a"], max_hops=2, strategy=strat, num_buckets=8)
        gotc = sorted(map(tuple, capped.to_pandas()[["node", "hops"]].values.tolist()))
        assert gotc == want[:3], (strat, gotc)

    rng = np.random.default_rng(23)
    big = rd.from_pandas(
        pd.DataFrame(
            {
                "src": [f"h{i}.org" for i in rng.integers(0, 30, 400)],
                "dst": [f"h{i}.org" for i in rng.integers(0, 30, 400)],
            }
        )
    )
    seeds = ["h0.org", "h1.org"]
    frames = [
        host_seed_distance(big, seeds, max_hops=16, strategy=s, num_buckets=8)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
        for s in ("driver", "exchange")
    ]
    pd.testing.assert_frame_equal(frames[0], frames[1], check_dtype=False)
    assert (frames[0].loc[frames[0]["node"].isin(seeds), "hops"] == 0).all()


def serial_opic(edges, iters=4, scale=10**12):
    """Naive dict replay of the host_opic integer spec."""
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    out = {}
    for s, _ in e:
        out[s] = out.get(s, 0) + 1
    cash = {n: scale // len(nodes) for n in nodes}
    hist = {n: 0 for n in nodes}
    for _ in range(iters):
        for n in nodes:
            hist[n] += cash[n]
        acc = {n: 0 for n in nodes}
        for s, d in e:
            acc[d] += cash[s] // out[s]
        cash = acc
    return {n: (cash[n], hist[n], cash[n] + hist[n]) for n in nodes}


@pytest.mark.usefixtures("ray_session")
def test_host_opic_strategies_and_online_property():
    """Driver and bucketed OPIC are bit-identical to each other and to a
    naive serial replay; a hub that everything links to accumulates more
    importance than leaves; dangling-node cash is absorbed (not
    redistributed); duplicate edges do not double cash flow."""
    import ray.data as rd

    from auto_archiver_ray.stages.graph import host_opic

    edges = [
        ("a.org", "hub.com"),
        ("b.org", "hub.com"),
        ("c.org", "hub.com"),
        ("hub.com", "leaf.net"),  # leaf.net is dangling: cash vanishes
        ("a.org", "b.org"),
        ("a.org", "hub.com"),  # duplicate edge must not double cash
    ]
    want = serial_opic(edges)
    for strat in ("driver", "bucketed"):
        got = (
            host_opic(
                rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"])),
                strategy=strat,
                num_buckets=8,
            )
            .to_pandas()
            .sort_values("node")
        )
        as_map = {
            n: (int(c), int(h), int(i))
            for n, c, h, i in zip(got["node"], got["cash"], got["hist"], got["importance"])
        }
        assert as_map == want, strat
    imp = {n: v[2] for n, v in want.items()}
    assert imp["hub.com"] > imp["a.org"], "hub did not accumulate importance"
    # total system cash can only shrink (virtual-page absorption + floors)
    scale = 10**12
    assert sum(v[0] for v in want.values()) <= scale
    # every node banked at least its initial cash into history
    assert all(v[1] >= scale // len(want) for v in want.values())


@pytest.mark.usefixtures("ray_session")
def test_host_opic_empty_edges():
    import ray.data as rd

    from auto_archiver_ray.stages.graph import host_opic

    empty = rd.from_pandas(pd.DataFrame({"src": [], "dst": []}).astype(str))
    assert host_opic(empty).count() == 0


@pytest.mark.usefixtures("ray_session")
def test_host_edges_memoized_per_session():
    """_host_edges returns the SAME materialized Dataset object on a
    second call within one Ray session (the memo the seven graph
    analytics share), and the cache key carries the live job id — no
    entry under the unkeyed fallback."""
    import ray

    from auto_archiver_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    a = Q._host_edges(sf)
    b = Q._host_edges(sf)
    assert a is b, "second call rebuilt the edge derivation"
    job = ray.get_runtime_context().get_job_id()
    assert (job, sf) in Q._HOST_EDGES_CACHE
    assert ("", sf) not in Q._HOST_EDGES_CACHE
    # the cached object is genuinely consumable
    assert a.count() > 0

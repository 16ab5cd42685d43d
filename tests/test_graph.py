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

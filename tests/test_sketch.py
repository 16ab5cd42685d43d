"""HyperLogLog sketch tests: accuracy, mergeability, Dataset integration."""

import numpy as np
import pytest

from auto_archiver_ray.functions.sketch import HyperLogLog, approx_distinct


def test_hll_accuracy():
    h = HyperLogLog(14)
    h.add_many(f"item-{i}" for i in range(50_000))
    est = h.estimate()
    assert abs(est - 50_000) / 50_000 < 0.03


def test_hll_merge_equals_union():
    a, b = HyperLogLog(12), HyperLogLog(12)
    a.add_many(f"x{i}" for i in range(5000))
    b.add_many(f"x{i}" for i in range(2500, 7500))  # overlap
    u = HyperLogLog(12)
    u.add_many(f"x{i}" for i in range(7500))
    merged = HyperLogLog.from_bytes(a.to_bytes()).merge(HyperLogLog.from_bytes(b.to_bytes()))
    assert (merged.registers == u.registers).all()


def test_hll_small_range_linear_counting():
    h = HyperLogLog(14)
    h.add_many(f"v{i}" for i in range(100))
    assert abs(h.estimate() - 100) < 5


def test_hll_roundtrip():
    h = HyperLogLog(10)
    h.add("a")
    h2 = HyperLogLog.from_bytes(h.to_bytes())
    assert h2.p == 10 and (h2.registers == h.registers).all()


@pytest.mark.usefixtures("ray_session")
def test_approx_distinct_dataset():
    import ray.data as rd

    ds = rd.read_parquet("/root/testdata/sf0.01/events.parquet", columns=["user_id"])
    exact = len(set(ds.to_pandas()["user_id"]))
    est = approx_distinct(ds, "user_id")
    assert abs(est - exact) / exact < 0.05


def test_kmv_merge_commutes_and_estimates_within_band():
    """KMV laws: merge is a pure set function (any split == global build);
    estimate within 4/sqrt(k) of truth at 1e3 distinct; exact below k."""
    import numpy as np

    from auto_archiver_ray.functions.sketch import (
        KMV_K,
        kmv_bottomk,
        kmv_estimate,
        kmv_merge,
    )

    vals = [f"item-{i}" for i in range(1000)] * 3  # duplicates must not matter
    whole = kmv_bottomk(vals)
    rng = np.random.default_rng(7)
    perm = rng.permutation(len(vals))
    shuffled = [vals[i] for i in perm]
    parts = [kmv_bottomk(shuffled[i : i + 157]) for i in range(0, len(shuffled), 157)]
    merged = kmv_merge(parts)
    assert np.array_equal(whole, merged)

    est = kmv_estimate(merged)
    assert abs(est - 1000) / 1000 <= 4 / np.sqrt(KMV_K)

    small = kmv_bottomk([f"x{i}" for i in range(KMV_K - 5)])
    assert kmv_estimate(small) == KMV_K - 5  # exact below k

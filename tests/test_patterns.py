"""External-job, per-host enrich, and blob-storage pattern tests."""

import os

import pandas as pd
import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
def test_external_job_pattern():
    import ray
    import ray.data as rd

    from auto_archiver_ray.stages.externaljob import (
        JobServiceActor,
        join_results_stage,
        poll_until_done,
        submit_stage,
    )

    svc = JobServiceActor.remote(polls_to_done=2)
    ds = rd.from_pandas(pd.DataFrame({"url_hash": [f"h{i}" for i in range(20)]}))
    submitted = ds.map_batches(submit_stage(svc), batch_format="pyarrow").materialize()
    job_ids = submitted.to_pandas()["job_id"].tolist()
    assert len(set(job_ids)) == 20

    artifacts = poll_until_done(svc, job_ids, timeout_s=10)
    assert all(a.startswith("https://archive.example/") for a in artifacts.values())

    out = submitted.map_batches(join_results_stage(artifacts), batch_format="pyarrow").to_pandas()
    assert (out["external_url"] != "").all()
    stats = ray.get(svc.stats.remote())
    assert stats["submitted"] == 20 and stats["done"] == 20
    ray.kill(svc)


@pytest.mark.usefixtures("ray_session")
def test_external_job_timeout_leaves_blank():
    import ray
    import ray.data as rd

    from auto_archiver_ray.stages.externaljob import JobServiceActor, poll_until_done, submit_stage

    svc = JobServiceActor.remote(polls_to_done=10_000)
    ds = rd.from_pandas(pd.DataFrame({"url_hash": ["a"]}))
    jid = ds.map_batches(submit_stage(svc), batch_format="pyarrow").to_pandas()["job_id"][0]
    artifacts = poll_until_done(svc, [jid], timeout_s=0.3)
    assert artifacts[jid] == ""
    ray.kill(svc)


@pytest.mark.usefixtures("ray_session")
def test_per_host_enrich_once():
    import ray.data as rd

    from auto_archiver_ray.stages.hostops import per_host_enrich

    calls = []

    def fetch(host):
        calls.append(host)
        return f"cert-of-{host}"

    df = pd.DataFrame({"host": ["a.com", "b.com", "a.com", "a.com", "b.com"]})
    out = per_host_enrich(rd.from_pandas(df), fetch=fetch).to_pandas()
    assert sorted(calls) == ["a.com", "b.com"]  # once per host, not per row
    assert (out[out.host == "a.com"]["ssl_cert"] == "cert-of-a.com").all()


@pytest.mark.usefixtures("ray_session")
def test_store_media_dedup_and_write(tmp_path):
    import ray.data as rd

    from auto_archiver_ray.stages.storage import store_media

    rows = pd.DataFrame(
        {
            "storage_key": ["k1.jpg", "k1.jpg", "k2.jpg"],
            "media_url_hash": ["u1", "u2", "u3"],
            "payload": [b"abc", b"abc", b"defg"],
        }
    )
    manifest = store_media(rd.from_pandas(rows), str(tmp_path)).to_pandas()
    # k1 deduped: 2 rows → 1 upload
    assert len(manifest) == 2
    assert sorted(manifest["storage_key"]) == ["k1.jpg", "k2.jpg"]
    for _, r in manifest.iterrows():
        assert os.path.exists(r["blob_path"])
        assert r["cdn_url"].startswith("file://")
    assert open(tmp_path / "k2.jpg", "rb").read() == b"defg"


@pytest.mark.usefixtures("ray_session")
def test_compact_output(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from auto_archiver_ray.stages.compact import compact

    d = str(tmp_path / "many")
    import os

    os.makedirs(d)
    for i in range(12):
        pq.write_table(pa.table({"x": list(range(i * 10, i * 10 + 10))}), f"{d}/f{i}.parquet")
    info = compact(d, target_rows_per_file=60)
    assert info == {"files_before": 12, "files_after": 2, "rows": 120}
    vals = sorted(rd.read_parquet(d).to_pandas()["x"].tolist())
    assert vals == list(range(120))


@pytest.mark.usefixtures("ray_session")
def test_bucketed_hash_join_matches_pandas():
    import ray.data as rd

    from auto_archiver_ray.stages.join import bucketed_hash_join, dataset_join

    left = pd.DataFrame({"k": [1, 1, 2, 3, 5], "lv": ["a", "b", "c", "d", "e"]})
    right = pd.DataFrame({"k": [1, 2, 2, 4], "rv": [10, 20, 21, 40]})
    expect = left.merge(right, on="k").sort_values(["k", "lv", "rv"]).reset_index(drop=True)

    out = (
        bucketed_hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k", num_buckets=4)
        .to_pandas()
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)[["k", "lv", "rv"]]
    )
    # dtype check off: null-padding the union schema upcasts ints to float
    pd.testing.assert_frame_equal(out, expect, check_dtype=False)

    # salted variant gives identical rows
    out_s = (
        bucketed_hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k", num_buckets=4, salt=3)
        .to_pandas()
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)[["k", "lv", "rv"]]
    )
    pd.testing.assert_frame_equal(out_s, expect, check_dtype=False)

    # native Dataset.join agrees
    nat = (
        dataset_join(rd.from_pandas(left), rd.from_pandas(right), on="k", num_partitions=4)
        .to_pandas()
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)[["k", "lv", "rv"]]
    )
    pd.testing.assert_frame_equal(nat, expect)


@pytest.mark.usefixtures("ray_session")
def test_semi_anti_join():
    import ray.data as rd

    from auto_archiver_ray.stages.join import anti_join, semi_join

    data = pd.DataFrame({"k": [1, 2, 3, 4, 5], "v": list("abcde")})
    keys = pd.DataFrame({"k": [2, 4, 9]})
    semi = semi_join(rd.from_pandas(data), rd.from_pandas(keys), "k").to_pandas()
    assert sorted(semi["k"]) == [2, 4]
    anti = anti_join(rd.from_pandas(data), rd.from_pandas(keys), "k").to_pandas()
    assert sorted(anti["k"]) == [1, 3, 5]


def test_deterministic_sample_bucket_matches_duckdb():
    import duckdb

    from auto_archiver_ray.stages.sample import md5_bucket

    con = duckdb.connect()
    for v in ["https://a.com/1", "xyz", "äöü", ""]:
        sql = con.execute("SELECT md5_number_lower(?) % 1000", [v]).fetchone()[0]
        assert md5_bucket(v, 1000) == int(sql)


@pytest.mark.usefixtures("ray_session")
def test_sharded_membership_matches_broadcast():
    """anti/semi join strategy='sharded' (distributed key-set actors, no
    driver materialization) ≡ 'broadcast' on the same inputs, string and
    int keys, keys split across many batches."""
    import numpy as np
    import ray.data as rd

    from auto_archiver_ray.stages.join import anti_join, semi_join

    rng = np.random.default_rng(7)
    data = pd.DataFrame({"k": rng.integers(0, 5000, size=8000), "v": np.arange(8000)})
    keys = pd.DataFrame({"k": rng.integers(0, 5000, size=3000)})

    for fn in (semi_join, anti_join):
        a = (
            fn(rd.from_pandas(data), rd.from_pandas(keys), "k", strategy="broadcast")
            .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
        )
        b = (
            fn(rd.from_pandas(data), rd.from_pandas(keys), "k", strategy="sharded", num_shards=4)
            .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    # string keys
    sdata = pd.DataFrame({"k": [f"u{i}" for i in range(100)], "v": range(100)})
    skeys = pd.DataFrame({"k": [f"u{i}" for i in range(0, 100, 3)]})
    a = semi_join(rd.from_pandas(sdata), rd.from_pandas(skeys), "k", strategy="sharded", num_shards=3).to_pandas()
    assert sorted(a["k"]) == sorted(skeys["k"])


@pytest.mark.usefixtures("ray_session")
def test_grouped_topk_matches_driver_reduce():
    """grouped_topk (coarse-bucket distributed final reduce + local top-k)
    ≡ full driver_reduce + sort/head, on unbounded-cardinality keys."""
    import numpy as np
    import ray.data as rd

    from auto_archiver_ray.stages.agg import driver_reduce, grouped_topk

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {"user": rng.integers(0, 2000, size=20000), "val": rng.integers(1, 100, size=20000)}
    )
    ds = rd.from_pandas(df)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(n=1)
        return b.groupby("user", as_index=False)[["val", "n"]].sum()

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=1000)
    full = driver_reduce(partials, ["user"], {"val": "sum", "n": "sum"})
    expect = full.sort_values(["val", "user"], ascending=[False, True]).head(10).reset_index(drop=True)

    got = grouped_topk(
        partials, ["user"], {"val": "sum", "n": "sum"}, k=10,
        sort_by=["val", "user"], ascending=[False, True], num_buckets=64,
    )
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_plan_join_broadcast_matches_shuffle():
    """plan_join routes by size/scaling flag; both paths give the same rows."""
    import ray.data as rd

    from auto_archiver_ray.stages.join import plan_join

    left = pd.DataFrame({"k": [1, 2, 2, 3, 5], "lv": list("abcde")})
    right = pd.DataFrame({"k": [1, 2, 3, 4], "rv": list("wxyz")})
    bcast = (
        plan_join(rd.from_pandas(left), rd.from_pandas(right), on="k", build_rows=4)
        .to_pandas().sort_values(["k", "lv"]).reset_index(drop=True)[["k", "lv", "rv"]]
    )
    shuf = (
        plan_join(rd.from_pandas(left), rd.from_pandas(right), on="k", build_rows=4, scales_with_data=True)
        .to_pandas().sort_values(["k", "lv"]).reset_index(drop=True)[["k", "lv", "rv"]]
    )
    pd.testing.assert_frame_equal(bcast, shuf)
    assert list(bcast["k"]) == [1, 2, 2, 3]


def test_to_utc_iso_fast_path_equivalence():
    """fromisoformat fast path ≡ dateutil on ISO forms; non-ISO falls back."""
    from dateutil.parser import parse as slow
    from datetime import timezone

    from auto_archiver_ray.functions.timekit import to_utc_iso

    iso_cases = [
        "2024-03-12T05:00:00+00:00",
        "2024-03-12T05:00:00Z",
        "2024-03-12 05:00:00",
        "2024-03-12T05:00:00.123456",
        "2024-01-02",
    ]
    for s in iso_cases:
        assert to_utc_iso(s, dayfirst=False) == slow(s, dayfirst=False).replace(tzinfo=timezone.utc).isoformat()
    # non-ISO forms still parse via dateutil (dayfirst honored)
    assert to_utc_iso("03/04/2024", dayfirst=True) == "2024-04-03T00:00:00+00:00"
    assert to_utc_iso("03/04/2024", dayfirst=False) == "2024-03-04T00:00:00+00:00"
    assert to_utc_iso("Jan 5 2024 10:00", dayfirst=False) == "2024-01-05T10:00:00+00:00"
    assert to_utc_iso("not a date") == ""


@pytest.mark.usefixtures("ray_session")
def test_broadcast_join_duplicate_build_keys_match_shuffle():
    """ADVICE r2 (join.py): duplicate build-side keys must emit one output
    row per match on BOTH plan_join paths (the old dict build kept only the
    last row)."""
    import ray.data as rd

    from auto_archiver_ray.stages.join import plan_join

    left = pd.DataFrame({"k": [1, 2, 3], "lv": list("abc")})
    right = pd.DataFrame({"k": [1, 2, 2, 2], "rv": list("wxyz")})
    bcast = (
        plan_join(rd.from_pandas(left), rd.from_pandas(right), on="k", build_rows=4)
        .to_pandas().sort_values(["k", "rv"]).reset_index(drop=True)[["k", "lv", "rv"]]
    )
    shuf = (
        plan_join(rd.from_pandas(left), rd.from_pandas(right), on="k", build_rows=4, scales_with_data=True)
        .to_pandas().sort_values(["k", "rv"]).reset_index(drop=True)[["k", "lv", "rv"]]
    )
    pd.testing.assert_frame_equal(bcast, shuf)
    assert list(bcast["rv"]) == ["w", "x", "y", "z"]  # all three dup matches kept


def test_numeric_tweak_hash_is_independent_family():
    """ADVICE r2 (join.py): for NUMERIC keys the tweaked hash must differ
    from the base hash (hash_array's hash_key is a string-path no-op), so
    salt sub-buckets decorrelate from base buckets."""
    import numpy as np

    from auto_archiver_ray.stages.join import _hash_u64

    vals = np.arange(1000, dtype=np.int64)
    base = _hash_u64(vals)
    tweaked = _hash_u64(vals, tweak="aar.join.salt.16")
    assert (base != tweaked).all()
    # and the derived salt residues are decorrelated even when salt shares a
    # factor with the bucket count (the reported failure mode: salt=2, B=32)
    b = base % np.uint64(32)
    s = tweaked % np.uint64(2)
    sub_even = s[b % np.uint64(2) == 0]
    assert 0.4 < sub_even.mean() < 0.6


@pytest.mark.usefixtures("ray_session")
def test_sharded_job_gateway_hundred_thousand_jobs():
    """VERDICT r2 #4: the sharded gateway handles 1e5 outstanding stub jobs
    with no driver-side id list — submit routes by key hash, every shard
    advances its own pending set, artifacts join back per shard."""
    import pyarrow as pa
    import ray.data as rd

    from auto_archiver_ray.stages.externaljob import ShardedJobGateway

    n = 100_000
    keys = [f"{i:064x}" for i in range(n)]
    ds = rd.from_arrow(pa.table({"url_hash": pa.array(keys, pa.string())}))
    gw = ShardedJobGateway(num_shards=8, polls_to_done=2)
    submitted = ds.map_batches(gw.submit_stage(), batch_format="pyarrow", batch_size=8192).materialize()
    assert submitted.count() == n
    timed_out = gw.poll_all_until_done(timeout_s=60)
    assert timed_out == 0
    stats = gw.stats()
    assert sum(s["submitted"] for s in stats) == n
    assert sum(s["done"] for s in stats) == n
    # every shard actually carried load (hash routing spread the keys)
    assert min(s["submitted"] for s in stats) > n // 32

    joined = submitted.map_batches(gw.join_results_stage(), batch_format="pyarrow")
    out = joined.to_pandas()
    gw.shutdown()
    assert (out["external_url"].str.startswith("https://archive.example/")).all()
    # artifact is the deterministic stub function of the key
    import hashlib

    row = out.iloc[12345]
    want = f"https://archive.example/{hashlib.sha256(row['url_hash'].encode()).hexdigest()[:16]}"
    assert row["external_url"] == want


@pytest.mark.usefixtures("ray_session")
def test_sharded_job_gateway_timeout_expires_to_empty():
    import pyarrow as pa
    import ray.data as rd

    from auto_archiver_ray.stages.externaljob import ShardedJobGateway

    ds = rd.from_arrow(pa.table({"url_hash": pa.array([f"{i:x}" for i in range(20)], pa.string())}))
    gw = ShardedJobGateway(num_shards=2, polls_to_done=10_000)
    submitted = ds.map_batches(gw.submit_stage(), batch_format="pyarrow").materialize()
    timed_out = gw.poll_all_until_done(timeout_s=0.3)
    assert timed_out == 20
    out = submitted.map_batches(gw.join_results_stage(), batch_format="pyarrow").to_pandas()
    gw.shutdown()
    assert (out["external_url"] == "").all()


def test_host_cert_verify_and_tamper_rejection():
    """Real-signature host certificates (upgrades the round-3 stub): valid
    certs verify; tampered signature, rebound host, expired window, wrong
    CA and garbage all reject."""
    import json

    from auto_archiver_ray.functions import rfc3161
    from auto_archiver_ray.stages import hostops

    host = "example.org"
    cert = hostops.issue_host_cert(host)
    pub = hostops.ca_public()
    assert hostops.verify_host_cert(host, cert, pub)
    # tampered signature
    c = json.loads(cert)
    c["sig"] = hex(int(c["sig"], 16) ^ 1)[2:]
    assert not hostops.verify_host_cert(host, json.dumps(c), pub)
    # rebound to a different host (cert content unchanged)
    assert not hostops.verify_host_cert("evil.example", cert, pub)
    # host field edited to match but signature covers the original
    c2 = json.loads(cert)
    c2["host"] = "evil.example"
    assert not hostops.verify_host_cert("evil.example", json.dumps(c2), pub)
    # expired / not-yet-valid clock
    assert not hostops.verify_host_cert(host, cert, pub, now="20280101000000Z")
    assert not hostops.verify_host_cert(host, cert, pub, now="20240101000000Z")
    # wrong CA
    wrong = rfc3161.RsaKey("not-the-host-ca").public()
    assert not hostops.verify_host_cert(host, cert, wrong)
    # garbage
    assert not hostops.verify_host_cert(host, "", pub)
    assert not hostops.verify_host_cert(host, "{}", pub)


def test_per_host_cert_enrich_distributed(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from auto_archiver_ray.stages.hostops import per_host_cert_enrich

    tbl = pa.table({"host": pa.array(["a.com", "b.com", "a.com", "c.com"], pa.string())})
    out = per_host_cert_enrich(rd.from_arrow(tbl)).to_pandas()
    assert out["ssl_verified"].all()
    # one cert per host, shared across its rows
    by_host = out.groupby("host")["ssl_cert"].nunique()
    assert (by_host == 1).all()
    assert out[out["host"] == "a.com"]["ssl_cert"].nunique() == 1


def test_inline_cert_stage_memoizes_per_actor():
    """VERDICT r4 #4: inline issuance memoizes per ACTOR, not per batch —
    one issue_host_cert RSA signature per distinct host per worker across
    multiple batches (and one RSA verify per distinct (host, cert))."""
    import pyarrow as pa

    from auto_archiver_ray.stages.hostops import InlineCertStage, VerifyCertStage

    stage = InlineCertStage()
    b1 = pa.table({"host": pa.array(["a.com", "b.com", "a.com"], pa.string())})
    b2 = pa.table({"host": pa.array(["b.com", "c.com", "a.com"], pa.string())})
    o1, o2 = stage(b1), stage(b2)
    assert stage.issued == 3  # a,b,c — batch 2 re-issued nothing for a/b
    assert o1["ssl_cert"][0].as_py() == o2["ssl_cert"][2].as_py()
    v = VerifyCertStage()
    assert v(o1)["ssl_verified"].to_pylist() == [True, True, True]
    assert v(o2)["ssl_verified"].to_pylist() == [True, True, True]
    assert v.checked == 3

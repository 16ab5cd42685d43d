"""Worker-failure resilience: a map_batches actor killed mid-run must not
change the pipeline's output — Ray re-executes the lost task from lineage,
and because every kernel is deterministic (content-derived keys, no
wall-clock/random), the retried task produces identical rows. This is the
in-flight-failure half of the resume story (the driver-kill half lives in
tests/test_crawl.py's kill-at-epoch-k test)."""

import os
import tempfile

import pandas as pd
import pytest

from auto_archiver_ray.stages.chaos import KillOnceStage


@pytest.mark.usefixtures("ray_session")
def test_actor_death_mid_run_yields_identical_output():
    import ray.data as rd

    df = pd.DataFrame({"x": range(5000)})

    def run(flag: str | None):
        flag_path = flag or os.path.join(tempfile.gettempdir(), "absent")
        ds = rd.from_pandas(df).map_batches(
            KillOnceStage,
            fn_constructor_args=(flag_path,),
            batch_format="pyarrow",
            batch_size=256,
            concurrency=2,
            # opt in to actor restart + in-flight task retry on worker death
            # (the cluster posture: a lost node must not fail the job)
            max_restarts=-1,
            max_task_retries=-1,
        )
        return ds.to_pandas().sort_values("x").reset_index(drop=True)

    clean = run(None)

    flag = os.path.join(tempfile.gettempdir(), f"aar_kill_flag_{os.getpid()}")
    open(flag, "w").close()
    with_kill = run(flag)
    assert not os.path.exists(flag)  # the kill actually fired
    pd.testing.assert_frame_equal(with_kill, clean)


@pytest.mark.usefixtures("ray_session")
def test_hygiene_gate_actor_death_yields_identical_rows():
    """Killing a v2 hygiene actor mid-run must not change the KEPT ROWS
    (lineage retry, deterministic kernel) NOR the drop ledger: adds are
    idempotent by batch key, so the retried batch's re-sent deltas are
    ignored and the totals are exact under failures."""
    import hashlib

    import pyarrow as pa
    import ray
    import ray.data as rd

    from auto_archiver_ray.pipelines.webtext import HygieneStage, make_gate_counter
    from auto_archiver_ray.stages.chaos import KillOnceWrap

    texts = [f"w{i} x{i} y{i} z{i} a{i} b{i} c{i} d{i} e{i} f{i}" for i in range(3000)]
    tbl = pa.table(
        {
            "url": pa.array([f"https://h.example.org/p/{i}" for i in range(3000)]),
            "sha256": pa.array([hashlib.sha256(t.encode()).hexdigest() for t in texts]),
            "text_extracted": pa.array(texts),
        }
    )

    def run(flag, counter):
        flag_path = flag or os.path.join(tempfile.gettempdir(), "absent")
        return (
            rd.from_arrow(tbl)
            .map_batches(
                KillOnceWrap,
                fn_constructor_kwargs={
                    "flag_path": flag_path,
                    "inner_factory": HygieneStage,
                    "inner_kwargs": {"classifier_gate": True, "counter": counter},
                },
                batch_format="pyarrow",
                batch_size=256,
                concurrency=2,
                max_restarts=-1,
                max_task_retries=-1,
            )
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )

    c_clean = make_gate_counter()
    clean = run(None, c_clean)
    totals_clean = ray.get(c_clean.value.remote())

    flag = os.path.join(tempfile.gettempdir(), f"aar_hyg_kill_{os.getpid()}")
    open(flag, "w").close()
    c_kill = make_gate_counter()
    killed = run(flag, c_kill)
    totals_kill = ray.get(c_kill.value.remote())

    assert not os.path.exists(flag)  # the kill actually fired
    pd.testing.assert_frame_equal(killed, clean)  # row data identical
    assert totals_kill == totals_clean  # ledger exact under retries


@pytest.mark.usefixtures("ray_session")
def test_gate_ledger_key_includes_batch_content():
    """ADVICE r4: the idempotence key digests the batch's FULL row content,
    not just urls — two batches with identical url sequences but different
    text must BOTH be counted (only a true retry is deduped)."""
    import hashlib

    import pyarrow as pa
    import ray

    from auto_archiver_ray.pipelines.webtext import HygieneStage, make_gate_counter

    def mk_batch(texts):
        return pa.table(
            {
                "url": pa.array([f"https://h.example.org/p/{i}" for i in range(len(texts))]),
                "sha256": pa.array([hashlib.sha256(t.encode()).hexdigest() for t in texts]),
                "text_extracted": pa.array(texts),
            }
        )

    counter = make_gate_counter()
    stage = HygieneStage(counter=counter)
    long_t = "w x y z a b c d e f"
    b1 = mk_batch([long_t, "short"])  # 1 kept, 1 len-dropped
    b2 = mk_batch([long_t, long_t])  # same urls, different content: 2 kept
    stage(b1)
    stage(b2)
    stage(b2)  # true retry (identical content) → ignored
    totals = ray.get(counter.value.remote())
    assert totals == {"rep_dropped": 0, "len_dropped": 1, "kept": 3}

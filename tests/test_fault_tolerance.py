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

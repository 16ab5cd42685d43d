"""Fault-injection stages for resilience drills.

A 256-node crawl WILL lose workers (OOM kills, preemptions, node loss);
the engine's posture is that a lost actor must not change the output —
Ray re-executes the lost task from lineage, and every kernel in this
repo is deterministic (content-derived keys, no wall-clock/random), so
the retried task reproduces identical rows. These stages make that
property testable: inject a worker death mid-pipeline and assert the
output equals an uninjected run (tests/test_fault_tolerance.py).

The stage lives in the package (not the test module) deliberately: a
RESTARTED actor deserializes its constructor args by module reference,
so the class must be importable in a fresh worker process — a
pytest-module-local class works for first launch (cloudpickle
by-value) but fails on restart with ModuleNotFoundError.
"""

from __future__ import annotations

import os

import pyarrow as pa


class KillOnceStage:
    """Deterministic passthrough transform whose FIRST actor to pick up a
    batch hard-exits via ``os._exit`` (simulating an OOM-kill / node
    loss). The flag file arbitrates so exactly one kill happens across
    the pool: the actor that wins the unlink dies, every retry and peer
    sees the flag gone and computes normally.

    Pass ``max_restarts=-1, max_task_retries=-1`` to ``map_batches`` so
    Ray restarts the actor and re-runs the in-flight task."""

    def __init__(self, flag_path: str, in_col: str = "x", out_col: str = "y"):
        self.flag_path = flag_path
        self.in_col, self.out_col = in_col, out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if os.path.exists(self.flag_path):
            try:
                os.unlink(self.flag_path)
                os._exit(1)
            except FileNotFoundError:
                pass  # another actor raced the unlink — it died, we continue
        vals = batch.column(self.in_col).to_pylist()
        return batch.append_column(
            self.out_col, pa.array([v * 2 + 1 for v in vals], pa.int64())
        )


class KillOnceWrap:
    """Generic chaos wrapper around any importable actor-stage class: the
    first wrapper actor to see the flag file hard-exits (same arbitration
    as :class:`KillOnceStage`); every other call delegates to the wrapped
    stage. ``inner_factory`` must be an importable class/callable (module
    reference — see the module docstring's restart caveat)."""

    def __init__(self, flag_path: str, inner_factory, inner_kwargs: dict | None = None):
        self.flag_path = flag_path
        self.inner = inner_factory(**(inner_kwargs or {}))

    def __call__(self, batch: pa.Table) -> pa.Table:
        if os.path.exists(self.flag_path):
            try:
                os.unlink(self.flag_path)
                os._exit(1)
            except FileNotFoundError:
                pass
        return self.inner(batch)

"""Run-metric logging: a JSONL stream per training/eval run.

The reference logs every batch loss and the eval metrics to wandb
(run.py:45-51 init, per-batch wandb.log in bc_agent.py:141-160, eval
metrics in simulation/pushing_sim.py:140-177 — hardcoded mode="disabled").
The TPU rebuild replaces that with an append-only JSONL file per run (one
object per epoch/event), which survives crashes, diffs cleanly, and needs
no network egress; tools/make_results.py aggregates these streams into
RESULTS.md.
"""
from __future__ import annotations

import json
import os
import time


class RunLogger:
    """Append-only JSONL metric stream. Disabled mode is a no-op sink, so
    call sites never branch."""

    def __init__(self, run_dir: str | None, name: str, enabled: bool = True):
        self.enabled = enabled and run_dir is not None
        self._f = None
        if self.enabled:
            os.makedirs(run_dir, exist_ok=True)
            path = os.path.join(run_dir, f"{name}.jsonl")
            self._f = open(path, "a", buffering=1)
            self.path = path
            self.log({"event": "start", "name": name,
                      "time": round(time.time(), 1)})

    def log(self, record: dict):
        if self._f is not None:
            self._f.write(json.dumps(record) + "\n")

    def epoch_callback(self, epoch: int, params, rec: dict):
        """Callback signature expected by agents.base.fit."""
        self.log({"event": "epoch", **rec})

    def close(self):
        if self._f is not None:
            self.log({"event": "end", "time": round(time.time(), 1)})
            self._f.close()
            self._f = None


def profile_trace(trace_dir: str | None):
    """Optional jax.profiler trace context (SURVEY §5: the reference has no
    profiling at all; `TimeKeeper.wall_clock` only). Usage:

        with profile_trace(args.profile_dir):
            ... hot section ...
    """
    import contextlib
    if not trace_dir:
        return contextlib.nullcontext()
    import jax
    return jax.profiler.trace(trace_dir, create_perfetto_link=False)

"""Profiling: JAX profiler traces + lightweight wall-clock timers.

The reference has no profiler (SURVEY.md §5: "No profiler anywhere");
its only latency telemetry is Langfuse span metadata. TPU builds live and
die by traces, so this provides:
- trace(dir): context manager around jax.profiler (TensorBoard-viewable);
- KernelTimer: dispatch-pipelined steady-state timing for jitted fns
  (the measurement recipe validated against this environment's ~33ms
  host<->device round-trip: async-dispatch M launches, sync once).
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field


@contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@dataclass
class KernelTimer:
    """Steady-state per-call timing of a jitted function."""

    iters: int = 20
    records: dict = field(default_factory=dict)

    def measure(self, name: str, fn, *args) -> float:
        import jax
        import numpy as np

        def sync(out):
            # block_until_ready is a NO-OP on the remote-attached (axon
            # tunnel) TPU — it returns before execution finishes and the
            # measured time is dispatch-only garbage. Pulling one element
            # to host is the validated sync (bench.py/_timed_loop,
            # experiments/exp_enc.py recipe).
            _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]

        sync(fn(*args))
        t0 = time.time()
        for _ in range(self.iters):
            r = fn(*args)
        sync(r)
        dt = (time.time() - t0) / self.iters
        self.records[name] = dt
        return dt

    def report(self) -> str:
        return "\n".join(f"{k}: {v*1e3:.3f} ms" for k, v in sorted(self.records.items()))

"""Profiling & timing harness.

The reference has no in-repo tracing (``SURVEY.md`` §5); this module is the
fresh TPU equivalent: wall-clock kernel timing with proper device
synchronization, plus a thin wrapper over ``jax.profiler`` traces.
"""

import contextlib
import time
from collections import defaultdict

import jax


class KernelTimer:
    """Accumulating wall-clock timer that blocks on device results so
    asynchronous dispatch doesn't hide kernel time."""

    def __init__(self):
        self.records = defaultdict(list)

    @contextlib.contextmanager
    def time(self, name):
        start = time.perf_counter()
        try:
            yield
        finally:
            # drain the device queue so the measurement covers the kernels
            jax.effects_barrier()
            self.records[name].append(time.perf_counter() - start)

    def timeit(self, name, fn, *args, repeat=10, warmup=1, **kwargs):
        """Run fn repeatedly (after warmup) and record per-call seconds.
        Returns (min_seconds, result)."""
        result = None
        for _ in range(warmup):
            result = fn(*args, **kwargs)
            jax.block_until_ready(result)
        for _ in range(repeat):
            t0 = time.perf_counter()
            result = fn(*args, **kwargs)
            jax.block_until_ready(result)
            self.records[name].append(time.perf_counter() - t0)
        return min(self.records[name][-repeat:]), result

    def summary(self):
        return {
            name: {
                "calls": len(times),
                "total_s": sum(times),
                "min_s": min(times),
                "mean_s": sum(times) / len(times),
            }
            for name, times in self.records.items()
        }


@contextlib.contextmanager
def trace(log_dir="/tmp/pgmpy_tpu_trace"):
    """jax.profiler trace context; view with TensorBoard or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()

"""Tracing / profiling utilities.

TPU-side equivalent of the reference's NVTX stage ranges
(src/f5_tts/runtime/triton_trtllm/model_repo_f5_tts/f5_tts/1/model.py:186-268,
gated by `use_perf`) and cudaProfilerStart (benchmark.py:390-391):

- `stage(name)` — wall-clock stage timer accumulating into a report
  (preprocess / text-embed / flow-matching / vocoder splits)
- `device_trace(logdir)` — jax.profiler trace context; view with
  tensorboard's profile plugin or xprof
- `annotate(name)` — jax.profiler.TraceAnnotation passthrough so stages show
  up inside the device trace
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync: bool = False):
        t0 = time.perf_counter()
        with jax.profiler.TraceAnnotation(name):
            yield
        if sync:
            # caller is responsible for block_until_ready on its outputs when
            # sync=False; sync=True forces a device fence for accurate splits
            jax.effects_barrier()
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1

    def report(self) -> dict:
        return {
            name: {"total_s": round(self.totals[name], 4),
                   "count": self.counts[name],
                   "avg_ms": round(self.totals[name] / self.counts[name] * 1000, 3)}
            for name in self.totals
        }

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/jax-trace"):
    """Capture a device profile (xprof/tensorboard-profile format)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


annotate = jax.profiler.TraceAnnotation

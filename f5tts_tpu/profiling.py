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


def summarize_trace(logdir: str, steps: int = 1, top: int = 25,
                    key: str = "source") -> list[tuple[str, float, int]]:
    """Parse the newest trace.json.gz under `logdir` into a leaf-op breakdown.

    Umbrella rows (jit_*, while bodies, scan loops) contain their children
    and double-count — a parent is any event that strictly encloses another
    event on the same (pid, tid) track, so only leaf events are aggregated.
    `key` picks the aggregation: "source" (python file:line from XLA
    metadata, falling back to the op-name stem) or "op" (op-name stem).
    Returns [(key, ms_total, calls)] sorted by time, and prints the top rows.
    This is the TPU-side equivalent of the reference's nsys/NVTX breakdown
    (reference: runtime/triton_trtllm/benchmark.py:387-464).
    """
    import collections
    import glob
    import gzip
    import json
    import os

    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        raise SystemExit(f"no trace.json.gz under {logdir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)

    by_track = defaultdict(list)
    for e in trace["traceEvents"]:
        if e.get("ph") != "X":
            continue
        a = e.get("args") or {}
        if a.get("device_duration_ps") is None:
            continue
        by_track[(e.get("pid"), e.get("tid"))].append(e)

    agg = defaultdict(lambda: [0.0, 0])
    for track in by_track.values():
        track.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []  # (end_ts, event); children mark parents non-leaf
        leaf_flags = {}
        for e in track:
            ts, dur = e["ts"], e.get("dur", 0)
            while stack and stack[-1][0] <= ts:
                stack.pop()
            if stack:
                leaf_flags[id(stack[-1][1])] = False  # has a child
            leaf_flags.setdefault(id(e), True)
            stack.append((ts + dur, e))
        for e in track:
            if not leaf_flags.get(id(e), True):
                continue
            a = e.get("args") or {}
            stem = e["name"].split(".")[0]
            k = (a.get("source", "") or stem) if key == "source" else stem
            agg[k][0] += int(a["device_duration_ps"]) / 1e9  # ms
            agg[k][1] += 1

    rows = sorted(((k, v[0], v[1]) for k, v in agg.items()), key=lambda r: -r[1])
    total = sum(r[1] for r in rows)
    print(f"trace: {path}")
    print(f"total (leaf ops): {total/steps:.3f} ms/step over {steps} steps")
    for k, ms, n in rows[:top]:
        print(f"{ms/steps:9.3f} ms/step {100*ms/max(total,1e-9):5.1f}%  n={n:6d}  {k}")
    return rows

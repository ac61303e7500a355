"""Capture + summarize a device trace of one training step.

Runs F5TTS_v1_Base cfm_loss + AdamW at b=8, n=1024, bf16 compute, remat on
(the recorded 518 ms/step config) under jax.profiler and prints device time
grouped by SOURCE LINE — the per-op view of where a training step goes.

Usage: python -m f5tts_tpu.scripts.profile_train [--batch 8] [--frames 1024]
"""

from __future__ import annotations

import argparse
import dataclasses


def run_workload(logdir: str, batch: int, frames: int, steps: int = 3):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from f5tts_tpu.config import PRESETS
    from f5tts_tpu.models import dit
    from f5tts_tpu.train.step import (OptHParams, init_train_state,
                                      make_optimizer, make_train_step)

    arch = dataclasses.replace(PRESETS["F5TTS_v1_Base"].arch,
                               text_num_embeds=2545,
                               checkpoint_activations=True)
    params = dit.init_dit(jax.random.PRNGKey(0), arch)
    statics = dit.DiTStatics(arch)
    hp = OptHParams(learning_rate=7.5e-5, warmup_updates=1000,
                    total_updates=10000)
    tx = make_optimizer(learning_rate=7.5e-5, warmup_updates=1000,
                        total_updates=10000)
    state = init_train_state(params, tx)
    # production config: fused clip+AdamW+EMA (hp) + fused-QKV megakernel
    step_fn = jax.jit(make_train_step(statics, tx, hp=hp))

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((batch, frames, 100)) * 0.3, jnp.float32)
    text = jnp.asarray(rng.integers(1, 2545, (batch, 256)), jnp.int32)
    lens = jnp.asarray(rng.integers(frames // 2, frames + 1, (batch,)), jnp.int32)

    state, m = step_fn(state, jax.random.PRNGKey(0), mel, text, lens)
    float(m["loss"])  # compile + hard sync

    jax.profiler.start_trace(logdir)
    metrics = []
    for i in range(1, steps + 1):
        mel_i = mel * (1.0 + 0.01 * i)  # varied inputs (tunnel memoization)
        state, m = step_fn(state, jax.random.PRNGKey(i), mel_i, text, lens)
        metrics.append(m["loss"])
    total = sum(float(v) for v in metrics)
    jax.profiler.stop_trace()
    assert np.isfinite(total)
    return steps


def summarize_by_source(logdir: str, steps: int, top: int = 25):
    from f5tts_tpu.profiling import summarize_trace

    summarize_trace(logdir, steps=steps, top=top, key="source")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--logdir", default="/tmp/jax-trace-train")
    args = ap.parse_args(argv)
    steps = run_workload(args.logdir, args.batch, args.frames)
    summarize_by_source(args.logdir, steps, args.top)


if __name__ == "__main__":
    main()

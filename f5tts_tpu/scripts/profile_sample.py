"""Capture + summarize a device trace of the flagship sampler.

Runs the bench.py workload (F5TTS_v1_Base, 16 NFE, b=1, n=1024) under
jax.profiler, then parses the resulting trace.json.gz and prints the top ops
by total device time with their share of the sampled window. This is the
TPU-side equivalent of the reference's nsys/NVTX stage breakdown
(reference: runtime/triton_trtllm/benchmark.py:387-464).

Usage: python -m f5tts_tpu.scripts.profile_sample [--top 30] [--logdir DIR]
"""

from __future__ import annotations

import argparse
import dataclasses


def run_workload(logdir: str, frames: int = 1024):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from f5tts_tpu.config import PRESETS
    from f5tts_tpu.models import cfm, dit
    from f5tts_tpu.utils import make_time_grid
    from f5tts_tpu.vocoder.vocos import Vocos, VocosConfig, init_vocos
    from f5tts_tpu.models.modules import fuse_attention_qkv, tree_cast

    arch = dataclasses.replace(PRESETS["F5TTS_v1_Base"].arch, text_num_embeds=2545)
    params = tree_cast(dit.init_dit(jax.random.PRNGKey(0), arch), jnp.bfloat16)
    params["blocks"]["attn"] = fuse_attention_qkv(params["blocks"]["attn"])
    statics = dit.DiTStatics(arch)
    voc = Vocos(init_vocos(jax.random.PRNGKey(1), VocosConfig()), VocosConfig())

    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.standard_normal((1, frames, 100)) * 0.1, jnp.float32)
    text = jnp.asarray(rng.integers(1, 2545, (1, 128)), jnp.int32)
    lens = jnp.full((1,), 256, jnp.int32)
    duration = jnp.full((1,), frames, jnp.int32)
    t_grid = make_time_grid(16, sway_sampling_coef=-1.0, use_epss=True)

    @jax.jit
    def generate(params, cond, text, lens, duration, key):
        mel = cfm.cfm_sample(params, statics, cond, text, lens, duration, t_grid,
                             key=key, cfg_strength=2.0, dtype=jnp.bfloat16,
                             backend="pallas")
        wav = voc.decode(jnp.transpose(mel, (0, 2, 1)))
        return jnp.sum(wav.astype(jnp.float32))

    # warmup/compile, hard sync via value fetch
    float(generate(params, cond, text, lens, duration, jax.random.PRNGKey(0)))

    jax.profiler.start_trace(logdir)
    vals = [generate(params, cond, text, lens, duration, jax.random.PRNGKey(i))
            for i in range(1, 4)]
    total = sum(float(v) for v in vals)
    jax.profiler.stop_trace()
    assert np.isfinite(total)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/jax-trace-sample")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--key", default="source", choices=["source", "op"])
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--frames", type=int, default=1024)
    args = ap.parse_args(argv)
    if not args.parse_only:
        run_workload(args.logdir, args.frames)
    from f5tts_tpu.profiling import summarize_trace

    summarize_trace(args.logdir, steps=3, top=args.top, key=args.key)


if __name__ == "__main__":
    main()

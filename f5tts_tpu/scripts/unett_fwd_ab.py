"""E2TTS (UNetT) forward A/B on the real chip: fused-RMSNorm dispatch x scan
unroll policy.

One jitted cfg forward at production shape (E2TTS_Base, b=2 cfg-packed,
n=1023+time-token). Timing queues ITERS calls with varied inputs and fetches
one scalar checksum at the end (tunnel-safe protocol, see CLAUDE.md).

Usage: F5TTS_FUSED_RMS={0,1} F5TTS_UNETT_UNROLL={auto,1,3,12} \
    python -m f5tts_tpu.scripts.unett_fwd_ab [--int8] [--iters 20]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--n", type=int, default=1023)
    ap.add_argument("--int8", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from f5tts_tpu.config import PRESETS
    from f5tts_tpu.models import unett
    from f5tts_tpu.models.modules import _fused_rms_enabled, fuse_backbone_qkv
    from f5tts_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    arch = dataclasses.replace(PRESETS["E2TTS_Base"].arch, text_num_embeds=2545)
    params = unett.init_unett(jax.random.PRNGKey(0), arch)
    statics = unett.UNetTStatics(arch)
    params = fuse_backbone_qkv(params, dtype=jnp.bfloat16)
    import jax.tree_util  # noqa: F401

    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
    if args.int8:
        from f5tts_tpu.ops.quant import quantize_dit_params

        params = quantize_dit_params(params)

    n, nt, b = args.n, 128, 1
    unroll = unett._scan_unroll(arch, "pallas")

    def fwd(p, x, cond, text, t, lens):
        return unett.unett_forward(p, statics, x, cond, text, t, lengths=lens,
                                   cfg_infer=True, dtype=jnp.bfloat16,
                                   backend="pallas")

    # the per-dispatch tunnel round trip is ~80 ms — run the iteration loop
    # INSIDE one jit (lax.scan over varied inputs) so a timed call is one
    # dispatch of `iters` forwards (CLAUDE.md timing protocol)
    iters = args.iters

    def bench_fn(p, x0, cond, text, t, lens):
        def body(acc, i):
            out = fwd(p, x0 + 0.01 * i.astype(jnp.float32), cond, text, t, lens)
            return acc + jnp.sum(out), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return acc

    jit_bench = jax.jit(bench_fn)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((b, n, arch.mel_dim)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((b, n, arch.mel_dim)), jnp.float32)
    text = jnp.asarray(rng.integers(0, 2545, (b, nt)), jnp.int32)
    t = jnp.asarray(rng.uniform(0, 1, (b,)), jnp.float32)
    lens = jnp.full((b,), n, jnp.int32)

    t0 = time.time()
    cks = float(jit_bench(params, x0, cond, text, t, lens))
    compile_s = time.time() - t0
    print(f"[unett-ab] fused_rms={_fused_rms_enabled()} unroll={unroll} "
          f"int8={args.int8} compile={compile_s:.1f}s checksum={cks:.4f}",
          file=sys.stderr)

    # timed: 3 one-dispatch runs with DIFFERENT x0 (tunnel memoizes
    # (executable, inputs)), min over runs, scalar fetch forces completion
    times = []
    for r in range(3):
        xr = x0 + 0.37 * (r + 1)
        t0 = time.perf_counter()
        total = float(jit_bench(params, xr, cond, text, t, lens))
        times.append(time.perf_counter() - t0)
    ms = min(times) / iters * 1e3
    print(json.dumps({
        "metric": "unett_cfg_fwd_ms", "value": round(ms, 3), "unit": "ms",
        "extra": {"fused_rms": _fused_rms_enabled(), "unroll": unroll,
                  "int8": args.int8, "n": n, "compile_s": round(compile_s, 1),
                  "runs_ms": [round(x / iters * 1e3, 3) for x in times],
                  "checksum": round(total, 2)},
    }))


if __name__ == "__main__":
    main()

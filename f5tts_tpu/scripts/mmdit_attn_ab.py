"""MMDiT joint-attention A/B on the real chip (VERDICT r2 weak #5).

Compares the MMDiT sampler step in three configurations at a production-ish
shape (dim 1024, depth 22, heads 16, n=1024 audio + 128 text):

  A. unfused projections + key-masked Pallas flash kernel (the r2 path)
  B. fused to_qkv/to_qkv_c + bias-masked flat megakernel (r3: rope in VMEM,
     no head-split transposes, no QKV lane split)
  C. B + int8 W8A8 projections

Protocol follows BENCH_HISTORY tunnel rules: varied inputs across timed
iterations, completion forced via a scalar checksum.

Usage: python -m f5tts_tpu.scripts.mmdit_attn_ab [--steps 8] [--frames 1024]
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--text", type=int, default=128)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--depth", type=int, default=22)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from f5tts_tpu.config import ModelArch
    from f5tts_tpu.models import mmdit
    from f5tts_tpu.models.modules import fuse_backbone_qkv, tree_cast
    from f5tts_tpu.ops.quant import quantize_dit_params
    from f5tts_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    on_tpu = jax.default_backend() == "tpu"
    backend = "pallas" if on_tpu else "xla"
    arch = ModelArch(dim=1024, depth=args.depth, heads=16, dim_head=64,
                     ff_mult=2, mel_dim=100, text_num_embeds=2545,
                     text_mask_padding=True)
    params = mmdit.init_mmdit(jax.random.PRNGKey(0), arch)
    params = jax.tree.map(lambda a: a + 0.01 * jnp.ones_like(a), params)
    params = tree_cast(params, jnp.bfloat16)
    statics = mmdit.MMDiTStatics(arch)

    b, n, nt = 2, args.frames, args.text
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((b, n, 100)) * 0.3, jnp.float32)
    cond = jnp.asarray(rng.standard_normal((b, n, 100)) * 0.3, jnp.float32)
    text = jnp.asarray(rng.integers(1, 2545, (b, nt)), jnp.int32)
    t = jnp.asarray([0.4, 0.4], jnp.float32)
    lens = jnp.asarray([n, n - 192], jnp.int32)

    configs = {
        "unfused+masked_kernel": params,
        "fused+flat_megakernel": fuse_backbone_qkv(params),
        "fused+int8": quantize_dit_params(fuse_backbone_qkv(params)),
    }

    # the iteration loop runs INSIDE one jit (lax.scan): a per-call timing
    # loop measures the dev tunnel's per-dispatch round trip (~25-80 ms), not
    # device time — the r3 "36.6 ms/forward" carried exactly that artifact
    iters = args.steps

    def bench(p, x):
        def body(acc, i):
            out = mmdit.mmdit_forward(p, statics, x * (1.0 + 0.01 * i), cond,
                                      text, t, lengths=lens,
                                      dtype=jnp.bfloat16, backend=backend)
            return acc + jnp.sum(out.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(iters, dtype=jnp.float32))
        return acc

    jit_bench = jax.jit(bench)

    results = {}
    for name, p in configs.items():
        chk = float(jit_bench(p, x0))  # compile + warm
        assert np.isfinite(chk), name
        runs = []
        for r in range(3):
            xr = x0 * (1.0 + 0.1 * (r + 1))
            t0 = time.perf_counter()
            acc = float(jit_bench(p, xr))
            runs.append(time.perf_counter() - t0)
            assert np.isfinite(acc)
        dt = min(runs) / iters
        results[name] = dt * 1e3
        print(f"[mmdit-ab] {name}: {dt*1e3:.2f} ms/forward (in-graph loop)")

    base = results["unfused+masked_kernel"]
    for name, ms in results.items():
        print(f"[mmdit-ab] {name}: {ms:.2f} ms  ({base/ms:.2f}x vs unfused)")


if __name__ == "__main__":
    main()

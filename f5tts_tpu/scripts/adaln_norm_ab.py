"""On-chip A/B for the fused AdaLN-norm kernel vs the XLA chain.

Shape: the DiT production tile [2, 1024, 1024] bf16. Chained-scan timing
(see attn_kernel_ab.py for the methodology notes).

Usage: python -m f5tts_tpu.scripts.adaln_norm_ab
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from f5tts_tpu.ops import adaln_norm as AN


def check(fn, name, b=2, n=1024, d=1024):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(k1, (b, n, d), jnp.bfloat16) * 3 + 0.5
    scale = jax.random.normal(k2, (b, d), jnp.bfloat16) * 0.2
    shift = jax.random.normal(k3, (b, d), jnp.bfloat16) * 0.2
    out = fn(x, scale, shift)
    ref = AN.adaln_norm_ref(x, scale, shift)
    diff = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    scale_out = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    print(f"{name:24s} max|diff| vs XLA ref: {diff:.2e}  (out range {scale_out:.1f}, "
          f"rel {diff/scale_out:.1e})")
    # ~1 ulp of bf16 at the output magnitude (f32 MXU dots run as bf16 passes)
    assert diff / scale_out < 8e-3, diff


def time_variant(fn, name, b=2, n=1024, d=1024, iters=40, chain=12, reps=3):
    @jax.jit
    def run_many(xs, scale, shift):
        def body(acc, x):
            o = x
            for _ in range(chain):
                o = fn(o, scale, shift)
            return acc + jnp.sum(o.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
        return acc

    def make(seed):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        return (jax.random.normal(k1, (iters, b, n, d), jnp.bfloat16),
                jax.random.normal(k2, (b, d), jnp.bfloat16) * 0.1,
                jax.random.normal(k3, (b, d), jnp.bfloat16) * 0.1)

    data = [make(s) for s in range(reps + 1)]
    float(run_many(*data[0]))
    best = np.inf
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        acc = float(run_many(*data[r]))
        best = min(best, (time.perf_counter() - t0) / (iters * chain))
    gbs = 2 * b * n * d * 2 / best / 1e9  # read + write bf16
    print(f"{name:24s} {best*1e6:8.1f} us/call  {gbs:6.0f} GB/s  (checksum {acc:.3f})")


def main():
    assert jax.default_backend() == "tpu"
    variants = {
        "xla_chain": AN.adaln_norm_ref,
        "pallas_dot_stats": functools.partial(AN._adaln_norm_fwd_pallas, eps=1e-6,
                                              use_dot_stats=True),
        "pallas_sum_stats": functools.partial(AN._adaln_norm_fwd_pallas, eps=1e-6,
                                              use_dot_stats=False),
        "pallas_dot_b512": functools.partial(AN._adaln_norm_fwd_pallas, eps=1e-6,
                                             block_n=512, use_dot_stats=True),
        "pallas_sum_b128": functools.partial(AN._adaln_norm_fwd_pallas, eps=1e-6,
                                             block_n=128, use_dot_stats=False),
        "pallas_sum_b512": functools.partial(AN._adaln_norm_fwd_pallas, eps=1e-6,
                                             block_n=512, use_dot_stats=False),
        "pallas_sum_b1024": functools.partial(AN._adaln_norm_fwd_pallas, eps=1e-6,
                                              block_n=1024, use_dot_stats=False),
    }
    for name, fn in variants.items():
        check(fn, name)
    for name, fn in variants.items():
        time_variant(fn, name)


if __name__ == "__main__":
    main()

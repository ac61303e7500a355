"""On-chip A/B: fused QKV+RoPE attention megakernel vs the decomposed path.

Both variants run the FULL attention sub-graph through self_attention
(fused QKV projection -> rope -> attention -> to_out -> length mask) at the
production shape (b=2, n=1024, dim=1024, h=16, d=64, bf16); the only
difference is rope_tabs (None = decomposed rope/split/flash/merge, provided
= megakernel). Chained-scan timing per attn_kernel_ab.py methodology.

Usage: python -m f5tts_tpu.scripts.fused_attn_ab
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from f5tts_tpu.models import modules as m
from f5tts_tpu.ops.rope import rope_freqs_interleaved, rope_flat_tables

B, N, DIM, HEADS, DH = 2, 1024, 1024, 16, 64


def make_params(key):
    p = m.init_attention(key, DIM, HEADS, DH)
    p = m.fuse_attention_qkv(p)
    return m.tree_cast(p, jnp.bfloat16)


def run(p, x, lengths, angles, tabs):
    return m.self_attention(p, x, HEADS, angles, lengths, None, "pallas",
                            rope_tabs=tabs)


def check(p, angles, tabs):
    x = jax.random.normal(jax.random.PRNGKey(7), (B, N, DIM), jnp.bfloat16)
    lengths = jnp.array([N, 777], jnp.int32)
    old = run(p, x, lengths, angles, None)
    new = run(p, x, lengths, angles, tabs)
    d = jnp.abs(old.astype(jnp.float32) - new.astype(jnp.float32))
    scale = float(jnp.max(jnp.abs(old.astype(jnp.float32))))
    print(f"max|old-new|={float(jnp.max(d)):.3e}  out range {scale:.2f}  "
          f"rel {float(jnp.max(d))/scale:.2e}")


def time_variant(p, angles, tabs, name, iters=40, chain=8, reps=3):
    lengths = jnp.full((B,), N, jnp.int32)

    @jax.jit
    def run_many(xs):
        def body(acc, x):
            o = x
            for _ in range(chain):
                o = run(p, o, lengths, angles, tabs)
            return acc + jnp.sum(o.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
        return acc

    data = [jax.random.normal(jax.random.PRNGKey(s), (iters, B, N, DIM),
                              jnp.bfloat16) for s in range(reps + 1)]
    float(run_many(data[0]))
    best = np.inf
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        acc = float(run_many(data[r]))
        best = min(best, (time.perf_counter() - t0) / (iters * chain))
    print(f"{name:16s} {best*1e6:8.1f} us/attn-layer  (checksum {acc:.3f})")


def main():
    assert jax.default_backend() == "tpu"
    p = make_params(jax.random.PRNGKey(0))
    angles = rope_freqs_interleaved(DH, N)
    tabs = rope_flat_tables(angles, N, HEADS, None, dtype=jnp.bfloat16)
    check(p, angles, tabs)
    time_variant(p, angles, None, "decomposed")
    time_variant(p, angles, tabs, "megakernel")


if __name__ == "__main__":
    main()

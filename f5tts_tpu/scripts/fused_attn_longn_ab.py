"""On-chip A/B: flat megakernel variants at LONG sequence lengths.

At n > 2048 the flat fused QKV+RoPE attention runs the KV-streaming
online-softmax kernel (ops/attention.py _fused_qkv_attn_kernel_stream);
this script times it against (a) the single-KV-pass variant forced past its
default bound (the [bq, n] f32 score panel still fits VMEM up to n=4096 at
the production width) and (b) the decomposed rope/head-split flash path the
megakernel replaces. Chained-scan timing per attn_kernel_ab.py methodology
(dispatches do not pipeline across the dev tunnel — loop INSIDE one jit,
fetch one checksum, vary inputs).

Usage: python -m f5tts_tpu.scripts.fused_attn_longn_ab [--n 2816 3072]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from f5tts_tpu.models import modules as m
from f5tts_tpu.ops import attention as att
from f5tts_tpu.ops.rope import rope_freqs_interleaved, rope_flat_tables

B, DIM, HEADS, DH = 2, 1024, 16, 64


def make_params(key):
    p = m.init_attention(key, DIM, HEADS, DH)
    p = m.fuse_attention_qkv(p)
    return m.tree_cast(p, jnp.bfloat16)


def time_variant(p, n, angles, tabs, name, single_pass_max, iters=20,
                 chain=8, reps=3):
    att.FLAT_SINGLE_PASS_MAX_N = single_pass_max
    lengths = jnp.full((B,), n, jnp.int32)

    @jax.jit
    def run_many(xs):
        def body(acc, x):
            o = x
            for _ in range(chain):
                o = m.self_attention(p, o, HEADS, angles, lengths, None,
                                     "pallas", rope_tabs=tabs)
            return acc + jnp.sum(o.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
        return acc

    data = [jax.random.normal(jax.random.PRNGKey(s), (iters, B, n, DIM),
                              jnp.bfloat16) * 0.3 for s in range(reps + 1)]
    float(run_many(data[0]))
    best = np.inf
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        acc = float(run_many(data[r]))
        best = min(best, (time.perf_counter() - t0) / (iters * chain))
    print(f"n={n} {name:24s} {best*1e6:9.1f} us/attn-layer  "
          f"(checksum {acc:.3f})")
    return best


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, nargs="+", default=[2816, 3072])
    args = ap.parse_args(argv)
    assert jax.default_backend() == "tpu"
    p = make_params(jax.random.PRNGKey(0))
    default_cap = att.FLAT_SINGLE_PASS_MAX_N
    for n in args.n:
        angles = rope_freqs_interleaved(DH, n)
        tabs = rope_flat_tables(angles, n, HEADS, None, dtype=jnp.bfloat16)
        time_variant(p, n, angles, None, "decomposed", default_cap)
        time_variant(p, n, angles, tabs, "megakernel-stream", 0)
        time_variant(p, n, angles, tabs, "megakernel-singlepass", 8192)
    att.FLAT_SINGLE_PASS_MAX_N = default_cap


if __name__ == "__main__":
    main()

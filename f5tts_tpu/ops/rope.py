"""Rotary position embeddings.

Two flavors used by the reference:

1. Attention RoPE (x_transformers RotaryEmbedding semantics, interleaved
   pairs): freqs repeated 2x along the feature dim, rotate-half over adjacent
   pairs (reference: model/backbones/dit.py:207,352 via x_transformers;
   applied in model/modules.py:498-509).
2. Absolute "freqs_cis" text position table: concat(cos | sin) halves added
   directly to text embeddings (reference: model/modules.py:207-230).

Both are precomputed as static tables; application is pure elementwise VPU
work that XLA fuses into the surrounding matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rope_freqs_interleaved(dim_head: int, end: int, theta: float = 10000.0) -> jax.Array:
    """[end, dim_head] angle table, each frequency repeated for its (even, odd) pair."""
    freqs = 1.0 / (theta ** (np.arange(0, dim_head, 2, dtype=np.float64) / dim_head))
    t = np.arange(end, dtype=np.float64)
    angles = np.outer(t, freqs)  # [end, dim_head//2]
    angles = np.repeat(angles, 2, axis=-1)  # [end, dim_head] interleaved repeat
    return jnp.asarray(angles, dtype=jnp.float32)


def rotate_half_interleaved(x: jax.Array) -> jax.Array:
    """(x0, x1, x2, x3, ...) -> (-x1, x0, -x3, x2, ...) over the last dim."""
    shape = x.shape
    x = x.reshape(*shape[:-1], shape[-1] // 2, 2)
    x1, x2 = x[..., 0], x[..., 1]
    out = jnp.stack([-x2, x1], axis=-1)
    return out.reshape(shape)


def apply_rotary(x: jax.Array, angles: jax.Array, scale: float = 1.0) -> jax.Array:
    """Rotate [..., n, d] by angle table [n, d] (interleaved-pair convention)."""
    n = x.shape[-2]
    ang = angles[:n].astype(jnp.float32)
    cos = jnp.cos(ang) * scale
    sin = jnp.sin(ang) * scale
    xf = x.astype(jnp.float32)
    out = xf * cos + rotate_half_interleaved(xf) * sin
    return out.astype(x.dtype)


def rope_flat_tables(
    angles: jax.Array,            # [>=n, d] interleaved-pair angle table
    n: int,
    heads: int,
    pe_attn_head: int | None = None,
    dtype=jnp.bfloat16,
):
    """cos/sin tables [n, heads*d] for flat-layout RoPE, tiled per head.

    `pe_attn_head` (rotate only the first k heads; reference
    modules.py:503-509) folds in as cos=1/sin=0 on unrotated heads. Used by
    the fused QKV+RoPE attention kernel (ops/attention.py), which applies
    the rotation in VMEM instead of as a separate HBM pass.
    """
    d = angles.shape[-1]
    ang = angles[:n].astype(jnp.float32)
    cos = jnp.tile(jnp.cos(ang), (1, heads))
    sin = jnp.tile(jnp.sin(ang), (1, heads))
    if pe_attn_head is not None:
        lane = jnp.arange(heads * d)
        rotated = lane < pe_attn_head * d
        cos = jnp.where(rotated, cos, 1.0)
        sin = jnp.where(rotated, sin, 0.0)
    return cos.astype(dtype), sin.astype(dtype)


def apply_rotary_flat(
    x: jax.Array,                 # [b, n, h*d] pre-head-split projection output
    angles: jax.Array,            # [>=n, d] interleaved-pair angle table
    heads: int,
    pe_attn_head: int | None = None,
) -> jax.Array:
    """RoPE on the flat [b, n, h*d] layout, before the head-split transpose.

    Numerically identical to apply_rotary_partial_heads after split_heads
    (rotation pairs are local to each head's lane group), but keeps the
    projection output in its native dtype/layout: on TPU the later
    [b,n,h,d]->[b,h,n,d] transpose then materializes one bf16 copy instead
    of an f32 one (device traces showed the f32 rope intermediates riding
    into the transpose at 2x the bytes). The rotate-half is lane rolls +
    sign select — no [.., d/2, 2] reshape/stack relayout. `pe_attn_head`
    (reference modules.py:503-509) is folded into the tiled tables as
    cos=1/sin=0 on unrotated heads.
    """
    b, n, hd = x.shape
    d = hd // heads
    ang = angles[:n].astype(jnp.float32)          # [n, d]
    cos = jnp.tile(jnp.cos(ang), (1, heads))      # [n, h*d]
    sin = jnp.tile(jnp.sin(ang), (1, heads))
    lane = jnp.arange(hd)
    if pe_attn_head is not None:
        rotated = lane < pe_attn_head * d
        cos = jnp.where(rotated, cos, 1.0)
        sin = jnp.where(rotated, sin, 0.0)
    xf = x.astype(jnp.float32)
    # out[2i] = -x[2i+1], out[2i+1] = x[2i] via two lane rolls + parity select
    # (wrap-around elements land only on positions the select discards)
    rot = jnp.where(lane % 2 == 0,
                    -jnp.roll(xf, -1, axis=-1),
                    jnp.roll(xf, 1, axis=-1))
    return (xf * cos + rot * sin).astype(x.dtype)


def apply_rotary_flat_tables(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """RoPE on [b, n, h*d] given precomputed flat tables (rope_flat_tables).

    Same math as the in-kernel rope of the fused QKV+RoPE attention kernel
    (ops/attention.py); used by that kernel's backward pass. The inverse
    rotation (the rope linear map's transpose) is this with sin negated.
    """
    hd = x.shape[-1]
    lane = jnp.arange(hd)
    xf = x.astype(jnp.float32)
    rot = jnp.where(lane % 2 == 0,
                    -jnp.roll(xf, -1, axis=-1),
                    jnp.roll(xf, 1, axis=-1))
    out = xf * cos.astype(jnp.float32) + rot * sin.astype(jnp.float32)
    return out.astype(x.dtype)


def apply_rotary_partial_heads(
    x: jax.Array, angles: jax.Array, pe_attn_head: int | None
) -> jax.Array:
    """Apply RoPE to the first `pe_attn_head` heads only (reference:
    modules.py:503-509 `pe_attn_head`); x is [b, h, n, d]."""
    if pe_attn_head is None:
        return apply_rotary(x, angles)
    rotated = apply_rotary(x[:, :pe_attn_head], angles)
    return jnp.concatenate([rotated, x[:, pe_attn_head:]], axis=1)


def precompute_freqs_cis(
    dim: int, end: int, theta: float = 10000.0, theta_rescale_factor: float = 1.0
) -> jax.Array:
    """[end, dim] table = concat(cos(f*t) | sin(f*t)) halves — the additive
    text-position table (reference: modules.py:207-218, incl. NTK rescale)."""
    theta = theta * theta_rescale_factor ** (dim / (dim - 2))
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64)[: dim // 2] / dim))
    t = np.arange(end, dtype=np.float64)
    angles = np.outer(t, freqs)
    table = np.concatenate([np.cos(angles), np.sin(angles)], axis=-1)
    return jnp.asarray(table, dtype=jnp.float32)

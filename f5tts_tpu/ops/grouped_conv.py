"""Pallas grouped 1-D convolution (the ConvPositionEmbedding hot op).

The DiT input embedding applies two grouped convs (k=31, groups=16) to the
full sequence EVERY ODE step (reference: src/f5_tts/model/modules.py:175-201
via dit.py:163); XLA's grouped-conv lowering costs ~13% of sample time on
v5e. This kernel computes each group's conv as K static-shifted
(N, W) @ (W, W) MXU dots with the group axis on the grid:

  layout: x -> (B, G, N + K - 1, W), weights -> (G, K, W, W)
  program (b, g): acc = sum_k x[k : k+N] @ w[k]     (f32 accumulation)

W = channels/groups must be a multiple of the lane tiling or equal to the
block's trailing dim (64 works: trailing block dim == array dim). Bias and
activation stay outside (XLA fuses them into the surrounding elementwise).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _grouped_conv_kernel(x_ref, w_ref, o_ref, *, kernel_size: int, n: int):
    x = x_ref[0, 0, :, :]          # [n + k - 1, W]
    w = w_ref[0]                   # [k, W, W]
    width = x.shape[1]
    acc = jnp.zeros((n, width), jnp.float32)
    for k in range(kernel_size):
        acc = acc + jax.lax.dot_general(
            x[k : k + n, :], w[k],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[0, 0, :, :] = acc.astype(o_ref.dtype)


def grouped_conv1d_pallas(
    x: jax.Array,        # [b, n, c]
    w: jax.Array,        # [k, c//groups, c] (conv1d WIO layout)
    bias: jax.Array,     # [c]
    groups: int,
) -> jax.Array:
    """Same-padding grouped conv; drop-in for the XLA path in modules.conv1d."""
    b, n, c = x.shape
    k = w.shape[0]
    width = c // groups
    pad = k - 1
    lead = pad // 2

    xp = jnp.pad(x, ((0, 0), (lead, pad - lead), (0, 0)))
    xg = xp.reshape(b, n + pad, groups, width).transpose(0, 2, 1, 3)  # [b,g,n+pad,W]
    # w[k, i, o]: output channel o belongs to group o // width
    wg = w.reshape(k, width, groups, width).transpose(2, 0, 1, 3)     # [g,k,W,W]

    out = pl.pallas_call(
        functools.partial(_grouped_conv_kernel, kernel_size=k, n=n),
        grid=(b, groups),
        in_specs=[
            pl.BlockSpec((1, 1, n + pad, width), lambda bi, gi: (bi, gi, 0, 0)),
            pl.BlockSpec((1, k, width, width), lambda bi, gi: (gi, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, n, width), lambda bi, gi: (bi, gi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, groups, n, width), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * k * width * c,
            bytes_accessed=(b * n * c * 2 + k * width * c) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(xg, wg)

    out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
    return out + bias.astype(out.dtype)


def _xla_grouped_conv(x, w, bias, groups):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(1,),
        padding=[((w.shape[0] - 1) // 2, w.shape[0] - 1 - (w.shape[0] - 1) // 2)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    return y + bias.astype(y.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def grouped_conv1d(x, w, bias, groups: int):
    """Differentiable grouped conv: Pallas forward on TPU, XLA backward."""
    return grouped_conv1d_pallas(x, w, bias, groups)


def _gc_fwd(x, w, bias, groups):
    return grouped_conv1d_pallas(x, w, bias, groups), (x, w, bias)


def _gc_bwd(groups, res, g):
    x, w, bias = res
    _, vjp = jax.vjp(lambda x_, w_, b_: _xla_grouped_conv(x_, w_, b_, groups),
                     x, w, bias)
    return vjp(g)


grouped_conv1d.defvjp(_gc_fwd, _gc_bwd)


def supports_pallas_grouped_conv(c: int, groups: int, n: int) -> bool:
    width = c // groups
    return (
        jax.default_backend() == "tpu"
        and c % groups == 0
        and width % 8 == 0            # sublane tiling of the W-wide blocks
        and n % 8 == 0
    )


# ---------------------------------------------------------------------------
# Fused ConvPositionEmbedding kernel
#
# The whole module (mask-zero -> conv1 -> mask-zero -> mish -> conv2 ->
# mask-zero -> mish; reference src/f5_tts/model/modules.py:175-201) in ONE
# VMEM pass per (batch, group) program. Two wins over grouped_conv1d above:
#
#   1. MXU shape. A per-group conv dot is [n,64]@[64,64] = 25% of the
#      128x128 systolic array. Here each dot is [n+16,128]@[128,128] at
#      ~full utilization: the contraction dim stacks tap pairs
#      (x[r+2j], x[r+2j+1]) and the output dim holds two tap-pair columns
#      (taps 2j,2j+1 | taps 2j+16,2j+17), whose partial sums land 16 rows
#      apart and are combined with one shifted add:
#         out[i] = Y[i, :64] + Y[i+16, 64:]
#      31 quarter-rate dots become 8 full-rate dots per conv.
#   2. No HBM round-trip for the intermediate activation, the masking, or
#      the Mish between the two convs.
# ---------------------------------------------------------------------------


def _mish_f32(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def _conv31_tap_paired(xp, wblocks, n: int):
    """xp: [n+31, W] (lead pad 15, trail pad 16); wblocks: [8, 2W, 2W].

    Returns the same-padding k=31 conv as f32 [n, W] via 8 tap-paired dots.
    """
    w = xp.shape[1]
    # Mosaic cannot lane-concat operands whose sublane offsets differ, so the
    # row-shifted copy is first realigned to offset 0 by a sublane concat.
    xp_next = jnp.concatenate([xp[1:], jnp.zeros((1, w), xp.dtype)], axis=0)
    x2 = jnp.concatenate([xp, xp_next], axis=1)           # [n+31, 2W]
    acc = jnp.zeros((n + 16, 2 * w), jnp.float32)
    for j in range(8):
        acc = acc + jax.lax.dot_general(
            x2[2 * j : 2 * j + n + 16], wblocks[j],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return acc[:n, :w] + acc[16:, w:]


def _cpe_kernel(len_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, n: int):
    bi = pl.program_id(0)
    length = len_ref[bi]
    xp = x_ref[0, 0]                                       # [n+31, W] bf16
    width = xp.shape[1]
    rows_pad = jax.lax.broadcasted_iota(jnp.int32, (n + 31, 1), 0)
    xp = jnp.where(rows_pad - 15 < length, xp, 0).astype(jnp.bfloat16)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    valid = rows < length

    h = _conv31_tap_paired(xp, w1_ref[0], n) + b1_ref[0, 0].astype(jnp.float32)
    h = _mish_f32(jnp.where(valid, h, 0.0))
    hp = jnp.concatenate([
        jnp.zeros((15, width), jnp.bfloat16),
        h.astype(jnp.bfloat16),
        jnp.zeros((16, width), jnp.bfloat16),
    ], axis=0)

    y = _conv31_tap_paired(hp, w2_ref[0], n) + b2_ref[0, 0].astype(jnp.float32)
    y = _mish_f32(jnp.where(valid, y, 0.0))
    o_ref[0, 0] = y.astype(o_ref.dtype)


def _pack_tap_blocks(w: jax.Array, groups: int) -> jax.Array:
    """[k<=31, W, c] WIO conv weights -> [g, 8, 2W, 2W] tap-pair blocks.

    Block j = [[w[2j],   w[2j+16]],
               [w[2j+1], w[2j+17]]]   (taps >= k are zero).
    """
    k, width, c = w.shape
    g = groups
    wg = w.reshape(k, width, g, width).transpose(2, 0, 1, 3)   # [g, k, W, W]
    wg = jnp.concatenate(
        [wg, jnp.zeros((g, 32 - k, width, width), wg.dtype)], axis=1)
    top = jnp.concatenate([wg[:, 0:16:2], wg[:, 16:32:2]], axis=-1)   # [g,8,W,2W]
    bot = jnp.concatenate([wg[:, 1:17:2], wg[:, 17:33:2]], axis=-1)   # [g,8,W,2W]
    return jnp.concatenate([top, bot], axis=2)                        # [g,8,2W,2W]


def conv_pos_embedding_pallas(
    x: jax.Array,         # [b, n, c]
    w1: jax.Array, b1: jax.Array,
    w2: jax.Array, b2: jax.Array,
    lengths: jax.Array,   # [b] int32 (padding positions >= length are zeroed)
    groups: int,
) -> jax.Array:
    b, n, c = x.shape
    width = c // groups
    cdtype = jnp.bfloat16
    xp = jnp.pad(x.astype(cdtype), ((0, 0), (15, 16), (0, 0)))
    xg = xp.reshape(b, n + 31, groups, width).transpose(0, 2, 1, 3)  # [b,g,n+31,W]
    w1b = _pack_tap_blocks(w1.astype(cdtype), groups)
    w2b = _pack_tap_blocks(w2.astype(cdtype), groups)
    b1g = b1.reshape(groups, 1, width)
    b2g = b2.reshape(groups, 1, width)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, groups),
        in_specs=[
            pl.BlockSpec((1, 1, n + 31, width), lambda bi, gi, *_: (bi, gi, 0, 0)),
            pl.BlockSpec((1, 8, 2 * width, 2 * width), lambda bi, gi, *_: (gi, 0, 0, 0)),
            pl.BlockSpec((1, 1, width), lambda bi, gi, *_: (gi, 0, 0)),
            pl.BlockSpec((1, 8, 2 * width, 2 * width), lambda bi, gi, *_: (gi, 0, 0, 0)),
            pl.BlockSpec((1, 1, width), lambda bi, gi, *_: (gi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, n, width), lambda bi, gi, *_: (bi, gi, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_cpe_kernel, n=n),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, groups, n, width), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * n * 32 * width * c,
            bytes_accessed=(2 * b * n * c + 2 * 32 * width * c) * 2,
            transcendentals=2 * b * n * c,
        ),
        interpret=jax.default_backend() != "tpu",
    )(lengths.astype(jnp.int32), xg, w1b, b1g, w2b, b2g)
    return out.transpose(0, 2, 1, 3).reshape(b, n, c)


def _xla_conv_pos(x, w1, b1, w2, b2, lengths, groups):
    """XLA reference of the fused module (backward path + numerics oracle)."""
    n = x.shape[1]
    valid = (jnp.arange(n)[None, :] < lengths[:, None])[..., None]
    h = jnp.where(valid, x, 0.0)
    h = _xla_grouped_conv(h, w1, b1, groups)
    h = jnp.where(valid, h, 0.0)
    h = _mish_f32(h.astype(jnp.float32)).astype(x.dtype)
    h = _xla_grouped_conv(h, w2, b2, groups)
    h = jnp.where(valid, h, 0.0)
    return _mish_f32(h.astype(jnp.float32)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def conv_pos_embedding_fused(x, w1, b1, w2, b2, lengths, groups: int):
    """Differentiable fused ConvPositionEmbedding: Pallas fwd, XLA bwd."""
    return conv_pos_embedding_pallas(x, w1, b1, w2, b2, lengths, groups)


def _cpe_fwd(x, w1, b1, w2, b2, lengths, groups):
    return conv_pos_embedding_pallas(x, w1, b1, w2, b2, lengths, groups), (
        x, w1, b1, w2, b2, lengths)


def _cpe_bwd(groups, res, g):
    x, w1, b1, w2, b2, lengths = res
    _, vjp = jax.vjp(
        lambda x_, w1_, b1_, w2_, b2_: _xla_conv_pos(x_, w1_, b1_, w2_, b2_, lengths, groups),
        x, w1, b1, w2, b2)
    import numpy as np
    return (*vjp(g), np.zeros(lengths.shape, dtype=jax.dtypes.float0))


conv_pos_embedding_fused.defvjp(_cpe_fwd, _cpe_bwd)


def supports_fused_conv_pos(c: int, groups: int, n: int, k: int) -> bool:
    width = c // groups
    return (
        jax.default_backend() == "tpu"
        and c % groups == 0
        and width == 64               # tap pairing assumes 2W == 128 lanes
        and k == 31
        and n % 8 == 0
    )

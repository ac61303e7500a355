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

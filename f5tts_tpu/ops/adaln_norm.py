"""Fused AdaLN-modulated LayerNorm: y = LN(x) * (1 + scale) + shift.

The DiT runs this chain twice per block plus once in the final norm
(reference: src/f5_tts/model/modules.py:312-347, 743-757). Under XLA the
statistics pass is a convert_reduce fusion over the lane (feature) axis that
measures ~108 GB/s effective (~20% of sampler step time across 45 calls per
ODE step); this Pallas kernel computes the row statistics and applies
normalization + modulation in one VMEM pass (57 vs 77 us/call at the
production tile [2, 1024, 1024] bf16). Plain VPU sum reductions beat the
MXU ones-panel dot trick here (58 vs 62 us) and keep full f32 stats
precision, so `use_dot_stats=False` is the default.

Forward-only kernel: the custom_vjp backward recomputes through the XLA
reference expression, so training numerics are exactly the XLA path's.

`scale`/`shift` are per-sample vectors [b, d] (AdaLN modulation);
`adaln_norm_ref` is the XLA fallback used on CPU and for the VJP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STATS_LANES = 8  # ones-panel width (min lane tile); col 0 = sum, col 1 unused


def _ln_modulate(x, mean, var, scale, shift, eps):
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * (1.0 + scale) + shift


def adaln_norm_ref(x: jax.Array, scale: jax.Array, shift: jax.Array,
                   eps: float = 1e-6) -> jax.Array:
    """XLA fallback; numerics identical to modules.layer_norm + modulation."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = jnp.maximum((xf * xf).mean(axis=-1, keepdims=True) - mean * mean, 0.0)
    y = _ln_modulate(xf, mean, var, scale.astype(jnp.float32)[:, None, :],
                     shift.astype(jnp.float32)[:, None, :], eps)
    return y.astype(x.dtype)


def _adaln_norm_kernel(x_ref, scale_ref, shift_ref, o_ref, *, eps: float,
                       use_dot_stats: bool):
    d = x_ref.shape[2]
    xf = x_ref[0, :, :].astype(jnp.float32)  # [bn, d]
    if use_dot_stats:
        # row sums of x and x^2 as f32 MXU dots against a ones panel: the
        # VPU only squares; no cross-lane reduction at all.
        ones = jnp.ones((d, STATS_LANES), jnp.float32)
        sq = xf * xf
        s1 = jax.lax.dot_general(xf, ones, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)[:, 0:1]
        s2 = jax.lax.dot_general(sq, ones, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)[:, 0:1]
    else:
        s1 = jnp.sum(xf, axis=-1, keepdims=True)
        s2 = jnp.sum(xf * xf, axis=-1, keepdims=True)
    mean = s1 / d
    var = jnp.maximum(s2 / d - mean * mean, 0.0)
    scale = scale_ref[0, 0, :].astype(jnp.float32)[None, :]
    shift = shift_ref[0, 0, :].astype(jnp.float32)[None, :]
    o_ref[0, :, :] = _ln_modulate(xf, mean, var, scale, shift, eps).astype(o_ref.dtype)


def _adaln_norm_fwd_pallas(x, scale, shift, eps, block_n=256, use_dot_stats=False):
    b, n, d = x.shape
    if n % block_n != 0:
        block_n = n
    grid = (b, n // block_n)
    return pl.pallas_call(
        functools.partial(_adaln_norm_kernel, eps=eps, use_dot_stats=use_dot_stats),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_n, d), lambda bi, ni: (bi, ni, 0)),
            pl.BlockSpec((1, 1, d), lambda bi, ni: (bi, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda bi, ni: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_n, d), lambda bi, ni: (bi, ni, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=jax.default_backend() != "tpu",
    )(x, scale[:, None, :], shift[:, None, :])


# ---------------------------------------------------------------------------
# Fused RMSNorm (UNetT pre-norm: 2 per block; plain XLA runs it as separate
# convert_reduce + scale passes, ~0.9 ms/ODE-step at depth 24 dim 1024)
# ---------------------------------------------------------------------------

def _rms_norm_kernel(x_ref, w_ref, o_ref, *, eps: float):
    d = x_ref.shape[2]
    xf = x_ref[0, :, :].astype(jnp.float32)  # [bn, d]
    s2 = jnp.sum(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(s2 / d + eps)
    o_ref[0, :, :] = (y * w_ref[0, 0, :].astype(jnp.float32)).astype(o_ref.dtype)


def rms_norm_ref(x: jax.Array, w: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = (xf * xf).mean(axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)).astype(x.dtype)


def _rms_norm_fwd_pallas(x, w, eps, block_n=256):
    b, n, d = x.shape
    if n % block_n != 0:
        block_n = n
    return pl.pallas_call(
        functools.partial(_rms_norm_kernel, eps=eps),
        grid=(b, n // block_n),
        in_specs=[
            pl.BlockSpec((1, block_n, d), lambda bi, ni: (bi, ni, 0)),
            pl.BlockSpec((1, 1, d), lambda bi, ni: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_n, d), lambda bi, ni: (bi, ni, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=jax.default_backend() != "tpu",
    )(x, w[None, None, :])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def rms_norm_fused(x, w, eps=1e-6):
    """y = x * rsqrt(mean(x^2) + eps) * w for x [b, n, d] (d % 128 == 0).

    Pallas one-VMEM-pass kernel on TPU; XLA reference elsewhere and for the
    backward (same recipe as adaln_norm)."""
    if jax.default_backend() == "tpu" and x.shape[-1] % 128 == 0:
        return _rms_norm_fwd_pallas(x, w, eps)
    return rms_norm_ref(x, w, eps)


def _rms_fwd(x, w, eps):
    return rms_norm_fused(x, w, eps), (x, w)


def _rms_bwd(eps, res, g):
    x, w = res
    _, vjp = jax.vjp(lambda a, b: rms_norm_ref(a, b, eps), x, w)
    return vjp(g)


rms_norm_fused.defvjp(_rms_fwd, _rms_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def adaln_norm(x, scale, shift, eps=1e-6):
    """y = LayerNorm(x) * (1 + scale[:, None]) + shift[:, None].

    x [b, n, d] (d a multiple of 128), scale/shift [b, d]. Pallas on TPU,
    XLA reference elsewhere.
    """
    if jax.default_backend() == "tpu" and x.shape[-1] % 128 == 0:
        return _adaln_norm_fwd_pallas(x, scale, shift, eps)
    return adaln_norm_ref(x, scale, shift, eps)


def _adaln_fwd(x, scale, shift, eps):
    return adaln_norm(x, scale, shift, eps), (x, scale, shift)


def _adaln_bwd(eps, res, g):
    x, scale, shift = res
    _, vjp = jax.vjp(lambda a, b, c: adaln_norm_ref(a, b, c, eps), x, scale, shift)
    return vjp(g)


adaln_norm.defvjp(_adaln_fwd, _adaln_bwd)

"""NN building blocks as pure init/apply functions over parameter pytrees.

Functional equivalents of reference torch modules (src/f5_tts/model/modules.py):
SinusPositionEmbedding (:157-169), TimestepEmbedding (:852-862),
ConvPositionEmbedding (:175-201), GRN (:236-245), ConvNeXtV2Block (:252-280),
RMSNorm (:286-305), AdaLayerNorm (:312-326), AdaLayerNorm_Final (:333-347),
FeedForward (:353-364), Attention + AttnProcessor (:371-556),
DiTBlock (:711-757), MMDiTBlock (:763-846).

Conventions:
- Linear kernels are stored (in, out); apply is `x @ w + b` (MXU layout).
- Params live in float32; compute casts to the caller's dtype, with layernorm,
  softmax, and GRN statistics always in float32.
- Initialization mirrors torch defaults (kaiming-uniform fan-in bounds for
  Linear/Conv1d, N(0,1) for Embedding) so training dynamics are comparable.
- Masks are passed as `lengths: [b] int32` (+ static max length) — jit-safe.
"""

from __future__ import annotations

import math
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp

def _fused_rms_enabled() -> bool:
    """Fused Pallas RMSNorm dispatch (UNetT pre-norms), opt-in via
    F5TTS_FUSED_RMS=1. Measured on-chip (scripts/unett_fwd_ab, E2TTS_Base
    b=2cfg n=1023 bf16): 13.63 ms/fwd fused vs 13.45 unfused at full unroll
    (the XLA rms passes already fuse well; per-pallas-call overhead eats the
    HBM saving), 14.03 vs 14.11 rolled — kept for the rolled/fallback path,
    default OFF. Read at trace time so rtf_bench can flip it per-graph."""
    return os.environ.get("F5TTS_FUSED_RMS", "0") == "1"

from f5tts_tpu.ops.attention import (
    FLAT_ATTN_MAX_N,
    attention as attention_op,
    fused_qkv_rope_attention,
)
from f5tts_tpu.ops.rope import apply_rotary_flat, apply_rotary_partial_heads

Params = dict  # nested dict pytree of jnp arrays


# ---------------------------------------------------------------------------
# Primitive layers
# ---------------------------------------------------------------------------

def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound, dtype=jnp.float32)


def init_linear(key, d_in: int, d_out: int, bias: bool = True, zero: bool = False) -> Params:
    kw, kb = jax.random.split(key)
    if zero:
        w = jnp.zeros((d_in, d_out), dtype=jnp.float32)
    else:
        w = _uniform(kw, (d_in, d_out), 1.0 / math.sqrt(d_in))
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32) if zero else _uniform(kb, (d_out,), 1.0 / math.sqrt(d_in))
    return p


def linear(p: Params, x: jax.Array) -> jax.Array:
    if "w_i8" in p:  # quantized leaf (ops.quant.quantize_dit_params)
        from f5tts_tpu.ops.quant import int8_linear

        return int8_linear(p, x)
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def init_embedding(key, num: int, dim: int) -> Params:
    return {"w": jax.random.normal(key, (num, dim), dtype=jnp.float32)}


def embedding(p: Params, ids: jax.Array) -> jax.Array:
    return p["w"][ids]


def layer_norm(x: jax.Array, weight=None, bias=None, eps: float = 1e-6) -> jax.Array:
    # one-pass statistics (var = E[x^2] - E[x]^2): one fused read of x for
    # both reduces instead of a second (x - mean)^2 pass — LN chains were
    # ~20% of sampler step time as two-pass convert_reduce fusions
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = jnp.maximum((xf * xf).mean(axis=-1, keepdims=True) - mean * mean, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def init_rms_norm(dim: int) -> Params:
    return {"w": jnp.ones((dim,), jnp.float32)}


def rms_norm(p: Params, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    # The fused Pallas RMSNorm (ops.adaln_norm.rms_norm_fused) dispatches on
    # TPU for [b, n, d%128==0] activations when F5TTS_FUSED_RMS=1 (see
    # _fused_rms_enabled for the measured tradeoff). UNetT's scans roll when
    # the kernel is on (unett._scan_unroll) so the compile request doesn't
    # carry 48 per-instance Mosaic payloads (HTTP 413 history).
    if (_fused_rms_enabled() and x.ndim == 3 and x.shape[-1] % 128 == 0
            and jax.default_backend() == "tpu"):
        from f5tts_tpu.ops.adaln_norm import rms_norm_fused

        return rms_norm_fused(x, p["w"], eps)
    xf = x.astype(jnp.float32)
    var = (xf * xf).mean(axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * p["w"].astype(jnp.float32)).astype(x.dtype)


def init_conv1d(key, c_in: int, c_out: int, kernel: int, groups: int = 1) -> Params:
    """Kernel stored [kernel, c_in//groups, c_out] (WIO for NWC conv)."""
    kw, kb = jax.random.split(key)
    fan_in = (c_in // groups) * kernel
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": _uniform(kw, (kernel, c_in // groups, c_out), bound),
        "b": _uniform(kb, (c_out,), bound),
    }


def conv1d(p: Params, x: jax.Array, groups: int = 1, dilation: int = 1,
           padding: str | int = "same") -> jax.Array:
    """x: [b, n, c] (NWC)."""
    if isinstance(padding, int):
        pad = [(padding, padding)]
    elif padding == "same":
        k = p["w"].shape[0]
        total = dilation * (k - 1)
        pad = [(total // 2, total - total // 2)]
    else:
        pad = padding
    # no preferred_element_type: its transpose rule mismatches dtypes under
    # value_and_grad with bf16 operands; XLA accumulates bf16 convs in f32
    # internally anyway
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(1,), padding=pad, rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    return y + p["b"].astype(y.dtype)


def depthwise_conv1d(p: Params, x: jax.Array, dilation: int = 1,
                     padding: int | None = None) -> jax.Array:
    """Depthwise conv (groups == channels) as k shifted multiply-adds.

    Grouped/depthwise convs lower poorly on TPU; for small k this is k
    elementwise FMAs the VPU eats directly. x: [b, n, c]; kernel (k, 1, c).
    Matches conv1d(..., groups=c) exactly.
    """
    kern = p["w"][:, 0, :]  # [k, c]
    k = kern.shape[0]
    total = dilation * (k - 1)
    if padding is None:
        lead = total // 2
    else:
        lead = padding
    n = x.shape[1]
    xp = jnp.pad(x, ((0, 0), (lead, total - lead), (0, 0)))
    y = None
    for i in range(k):
        seg = jax.lax.slice_in_dim(xp, i * dilation, i * dilation + n, axis=1)
        term = seg * kern[i].astype(x.dtype)
        y = term if y is None else y + term
    return y + p["b"].astype(y.dtype)


def mish(x: jax.Array) -> jax.Array:
    xf = x.astype(jnp.float32)
    return (xf * jnp.tanh(jax.nn.softplus(xf))).astype(x.dtype)


def gelu_exact(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=False)


def gelu_tanh(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=True)


# ---------------------------------------------------------------------------
# Position / timestep embeddings
# ---------------------------------------------------------------------------

def sinus_pos_embedding(x: jax.Array, dim: int, scale: float = 1000.0) -> jax.Array:
    """[b] -> [b, dim]; note the (half_dim - 1) denominator (reference :157-169)."""
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1)))
    ang = scale * x.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def init_timestep_embedding(key, dim: int, freq_embed_dim: int = 256) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "mlp1": init_linear(k1, freq_embed_dim, dim),
        "mlp2": init_linear(k2, dim, dim),
    }


def timestep_embedding(p: Params, t: jax.Array, dtype=jnp.float32, freq_embed_dim: int = 256) -> jax.Array:
    h = sinus_pos_embedding(t, freq_embed_dim).astype(dtype)
    h = linear(p["mlp1"], h)
    h = jax.nn.silu(h)
    return linear(p["mlp2"], h)


# ---------------------------------------------------------------------------
# Conv position embedding (reference :175-201)
# ---------------------------------------------------------------------------

def init_conv_pos_embedding(key, dim: int, kernel: int = 31, groups: int = 16) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "conv1": init_conv1d(k1, dim, dim, kernel, groups),
        "conv2": init_conv1d(k2, dim, dim, kernel, groups),
    }


def conv_pos_embedding(p: Params, x: jax.Array, mask: Optional[jax.Array] = None,
                       groups: int = 16) -> jax.Array:
    """x: [b, n, d]; mask: [b, n] bool. Re-zeroes padding after each conv.

    On TPU the grouped convs run as a Pallas kernel (this op executes twice
    per ODE step and XLA's grouped-conv lowering is ~6x off its FLOPs).
    Masks here are padding masks (contiguous prefixes), so the fused kernel
    consumes them as per-sample lengths."""
    from f5tts_tpu.ops.grouped_conv import (
        conv_pos_embedding_fused, grouped_conv1d,
        supports_fused_conv_pos, supports_pallas_grouped_conv)

    g = groups
    b, n, c = x.shape
    k = p["conv1"]["w"].shape[0]
    if supports_fused_conv_pos(c, g, n, k):
        lengths = (jnp.full((b,), n, jnp.int32) if mask is None
                   else jnp.sum(mask, axis=-1).astype(jnp.int32))
        return conv_pos_embedding_fused(
            x, p["conv1"]["w"].astype(x.dtype), p["conv1"]["b"],
            p["conv2"]["w"].astype(x.dtype), p["conv2"]["b"], lengths, g)
    if supports_pallas_grouped_conv(c, g, n):
        def conv(params_c, h):
            return grouped_conv1d(h, params_c["w"].astype(h.dtype),
                                  params_c["b"], g)
    else:
        def conv(params_c, h):
            return conv1d(params_c, h, groups=g)

    if mask is not None:
        m = mask[:, :, None]
        x = jnp.where(m, x, 0.0)
    x = conv(p["conv1"], x)
    if mask is not None:
        x = jnp.where(m, x, 0.0)
    x = mish(x)
    x = conv(p["conv2"], x)
    if mask is not None:
        x = jnp.where(m, x, 0.0)
    x = mish(x)
    return x


# ---------------------------------------------------------------------------
# GRN + ConvNeXt V2 (reference :236-280)
# ---------------------------------------------------------------------------

def init_grn(dim: int) -> Params:
    return {"gamma": jnp.zeros((dim,), jnp.float32), "beta": jnp.zeros((dim,), jnp.float32)}


def grn(p: Params, x: jax.Array) -> jax.Array:
    """Global response norm over the sequence axis (dim=1 of [b, n, d])."""
    xf = x.astype(jnp.float32)
    gx = jnp.sqrt(jnp.sum(xf * xf, axis=1, keepdims=True))  # [b, 1, d]
    nx = gx / (gx.mean(axis=-1, keepdims=True) + 1e-6)
    y = p["gamma"] * (xf * nx) + p["beta"] + xf
    return y.astype(x.dtype)


def init_convnext_v2_block(key, dim: int, intermediate_dim: int, dilation: int = 1) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "dwconv": init_conv1d(k1, dim, dim, 7, groups=dim),
        "norm_w": jnp.ones((dim,), jnp.float32),
        "norm_b": jnp.zeros((dim,), jnp.float32),
        "pw1": init_linear(k2, dim, intermediate_dim),
        "grn": init_grn(intermediate_dim),
        "pw2": init_linear(k3, intermediate_dim, dim),
    }


def convnext_v2_block(p: Params, x: jax.Array, dilation: int = 1) -> jax.Array:
    residual = x
    h = depthwise_conv1d(p["dwconv"], x, dilation=dilation,
                         padding=(dilation * 6) // 2)
    h = layer_norm(h, p["norm_w"], p["norm_b"], eps=1e-6)
    h = linear(p["pw1"], h)
    h = gelu_exact(h)
    h = grn(p["grn"], h)
    h = linear(p["pw2"], h)
    return residual + h


# ---------------------------------------------------------------------------
# AdaLN (reference :312-347)
# ---------------------------------------------------------------------------

def init_adaln(key, dim: int, zero: bool = True) -> Params:
    return {"linear": init_linear(key, dim, 6 * dim, zero=zero)}


def adaln_modulation(p: Params, emb: jax.Array):
    """emb [b, d] -> 6 chunks: shift_msa, scale_msa, gate_msa, shift/scale/gate_mlp."""
    h = linear(p["linear"], jax.nn.silu(emb))
    return jnp.split(h, 6, axis=-1)


def adaln_pre(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    """LayerNorm(no affine) * (1 + scale) + shift (broadcast over seq).

    Fused Pallas kernel on TPU (ops/adaln_norm.py); XLA chain elsewhere."""
    from f5tts_tpu.ops.adaln_norm import adaln_norm

    return adaln_norm(x, scale, shift)


def init_adaln_final(key, dim: int, zero: bool = True) -> Params:
    return {"linear": init_linear(key, dim, 2 * dim, zero=zero)}


def adaln_final(p: Params, x: jax.Array, emb: jax.Array,
                mod: Optional[jax.Array] = None) -> jax.Array:
    h = linear(p["linear"], jax.nn.silu(emb)) if mod is None else mod
    scale, shift = jnp.split(h, 2, axis=-1)  # NOTE: (scale, shift) order (:344)
    return adaln_pre(x, shift, scale)


# ---------------------------------------------------------------------------
# FeedForward (reference :353-364)
# ---------------------------------------------------------------------------

def init_feed_forward(key, dim: int, mult: int = 4, dim_out: Optional[int] = None) -> Params:
    k1, k2 = jax.random.split(key)
    inner = int(dim * mult)
    return {
        "in": init_linear(k1, dim, inner),
        "out": init_linear(k2, inner, dim_out or dim),
    }


def feed_forward(p: Params, x: jax.Array) -> jax.Array:
    return linear(p["out"], gelu_tanh(linear(p["in"], x)))


# ---------------------------------------------------------------------------
# Self-attention (reference :371-556)
# ---------------------------------------------------------------------------

def init_attention(key, dim: int, heads: int, dim_head: int,
                   qk_norm: Optional[str] = None) -> Params:
    ks = jax.random.split(key, 4)
    inner = heads * dim_head
    p = {
        "to_q": init_linear(ks[0], dim, inner),
        "to_k": init_linear(ks[1], dim, inner),
        "to_v": init_linear(ks[2], dim, inner),
        "to_out": init_linear(ks[3], inner, dim),
    }
    if qk_norm == "rms_norm":
        p["q_norm"] = init_rms_norm(dim_head)
        p["k_norm"] = init_rms_norm(dim_head)
    return p


def self_attention(
    p: Params,
    x: jax.Array,                      # [b, n, dim]
    heads: int,
    rope_angles: Optional[jax.Array],  # [>=n, dim_head]
    lengths: Optional[jax.Array] = None,  # [b] valid length; None = dense
    pe_attn_head: Optional[int] = None,
    backend: str = "pallas",
    rope_tabs: Optional[tuple] = None,  # (cos [n,h*d], sin) flat rope tables
) -> jax.Array:
    b, n, _ = x.shape
    if "to_qkv" in p:
        # inference-fused projection (fuse_attention_qkv): one [d, 3*inner]
        # dot reads x from HBM once instead of three times. checkpoint_name
        # tags feed the "attn" remat policy (arch.remat_policy): under remat
        # training the saved qkv/attn_out let the backward replay skip the
        # projection + rope + attention kernel.
        from jax.ad_checkpoint import checkpoint_name

        qkv = checkpoint_name(linear(p["to_qkv"], x), "qkv")
        inner = qkv.shape[-1] // 3
        dh_ = inner // heads
        if (rope_tabs is not None and "q_norm" not in p
                and backend == "pallas" and jax.default_backend() == "tpu"
                and inner % 128 == 0 and dh_ in (64, 128)
                and n % 128 == 0 and n <= FLAT_ATTN_MAX_N):
            # megakernel: RoPE + attention on the flat layout, no head-split
            # transposes, no QKV lane split, output flat for to_out
            o = fused_qkv_rope_attention(qkv, rope_tabs[0], rope_tabs[1],
                                         lengths if lengths is not None
                                         else jnp.full((b,), n, jnp.int32),
                                         heads)
            o = checkpoint_name(o, "attn_out")
            o = linear(p["to_out"], o)
            if lengths is not None:
                mask = jnp.arange(n)[None, :] < lengths[:, None]
                o = jnp.where(mask[:, :, None], o, 0.0)
            return o
        q, k, v = jnp.split(qkv, 3, axis=-1)
    elif "w_i8" in p["to_q"]:
        from f5tts_tpu.ops.quant import int8_linear, int8_linear_pre, quantize_rows

        if "act_mask" in p["to_q"]:
            # outlier-hedged leaves carry their own masked quant + side-dot
            q = int8_linear(p["to_q"], x)
            k = int8_linear(p["to_k"], x)
            v = int8_linear(p["to_v"], x)
        else:
            # quantize the shared input once for all three projections
            xq, xs = quantize_rows(x)
            q = int8_linear_pre(p["to_q"], xq, xs, x.dtype)
            k = int8_linear_pre(p["to_k"], xq, xs, x.dtype)
            v = int8_linear_pre(p["to_v"], xq, xs, x.dtype)
    else:
        q = linear(p["to_q"], x)
        k = linear(p["to_k"], x)
        v = linear(p["to_v"], x)
    dh = q.shape[-1] // heads

    def split_heads(t):
        return t.reshape(b, n, heads, dh).transpose(0, 2, 1, 3)

    if "q_norm" not in p:
        # fast path: rope on the flat [b, n, h*d] layout BEFORE the head
        # split, so the transpose materializes in the native (bf16) dtype.
        # Invalid under qk-norm (per-head rms must precede rotation).
        if rope_angles is not None:
            q = apply_rotary_flat(q, rope_angles, heads, pe_attn_head)
            k = apply_rotary_flat(k, rope_angles, heads, pe_attn_head)
        q, k, v = split_heads(q), split_heads(k), split_heads(v)
    else:
        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        q = rms_norm(p["q_norm"], q)
        k = rms_norm(p["k_norm"], k)
        if rope_angles is not None:
            q = apply_rotary_partial_heads(q, rope_angles, pe_attn_head)
            k = apply_rotary_partial_heads(k, rope_angles, pe_attn_head)

    o = attention_op(q, k, v, lengths=lengths, backend=backend)
    o = o.transpose(0, 2, 1, 3).reshape(b, n, heads * dh)
    o = linear(p["to_out"], o)

    if lengths is not None:
        mask = jnp.arange(n)[None, :] < lengths[:, None]
        o = jnp.where(mask[:, :, None], o, 0.0)
    return o


# ---------------------------------------------------------------------------
# DiT block (reference :711-757)
# ---------------------------------------------------------------------------

def init_dit_block(key, dim: int, heads: int, dim_head: int, ff_mult: int,
                   qk_norm: Optional[str] = None) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "attn_norm": init_adaln(k1, dim, zero=True),  # AdaLN-zero init (dit.py:264-274)
        "attn": init_attention(k2, dim, heads, dim_head, qk_norm),
        "ff": init_feed_forward(k3, dim, ff_mult),
    }


def dit_block(
    p: Params,
    x: jax.Array,
    t_emb: jax.Array,
    heads: int,
    rope_angles: Optional[jax.Array],
    lengths: Optional[jax.Array] = None,
    pe_attn_head: Optional[int] = None,
    backend: str = "pallas",
    mods: Optional[jax.Array] = None,  # [b, 6*dim] precomputed modulation
    rope_tabs: Optional[tuple] = None,  # flat rope tables for the fused kernel
) -> jax.Array:
    if mods is None:
        mods6 = adaln_modulation(p["attn_norm"], t_emb)
    else:
        # sampler-hoisted: the AdaLN linear (dim -> 6*dim, 41% of DiT weight
        # bytes) was applied once for ALL ODE steps outside the NFE scan
        # instead of re-reading its weights from HBM every step
        mods6 = jnp.split(mods, 6, axis=-1)
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = mods6
    norm = adaln_pre(x, shift_msa, scale_msa)
    attn_out = self_attention(
        p["attn"], norm, heads, rope_angles, lengths, pe_attn_head, backend,
        rope_tabs=rope_tabs,
    )
    x = x + gate_msa[:, None, :] * attn_out

    norm = adaln_pre(x, shift_mlp, scale_mlp)
    x = x + gate_mlp[:, None, :] * feed_forward(p["ff"], norm)
    return x


def fuse_attention_qkv(attn: Params, dtype=None) -> Params:
    """Merge to_q/to_k/to_v into one to_qkv linear (and, for MMDiT joint
    attention, to_q_c/to_k_c/to_v_c into to_qkv_c).

    Works on a single block or on depth-stacked params (kernels [..., d, inner]
    concatenated on the output axis). `self_attention` / mmdit._joint_attention
    dispatch on the presence of "to_qkv". int8 quantization composes:
    per-output-channel scales concatenate exactly. `dtype` casts the fused
    kernel (the training path fuses a per-step VIEW of the f32 params and
    casts it straight to the compute dtype so the concat materializes at half
    the bytes — `linear` would cast per-use anyway, so numerics are
    unchanged)."""
    if "to_qkv" in attn or "to_q" not in attn:
        return attn
    cast = (lambda a: a.astype(dtype)) if dtype is not None else (lambda a: a)

    def fuse3(names):
        parts = [attn[nm] for nm in names]
        fused = {"w": jnp.concatenate([cast(p["w"]) for p in parts], axis=-1)}
        if "b" in parts[0]:
            fused["b"] = jnp.concatenate([cast(p["b"]) for p in parts], axis=-1)
        return fused

    drop = {"to_q", "to_k", "to_v", "to_q_c", "to_k_c", "to_v_c"}
    out = {k: v for k, v in attn.items() if k not in drop}
    out["to_qkv"] = fuse3(("to_q", "to_k", "to_v"))
    if "to_q_c" in attn:
        out["to_qkv_c"] = fuse3(("to_q_c", "to_k_c", "to_v_c"))
    return out


def fuse_backbone_qkv(params: Params, dtype=None) -> Params:
    """Apply fuse_attention_qkv to every attention stack a backbone carries
    (DiT/MMDiT: "blocks" + MMDiT's unstacked "last_block"; UNetT:
    "first_half"/"second_half"). Param prep shared by the pipeline, bench.py,
    rtf_bench, and the training step (per-step view)."""
    out = dict(params)
    for stack in ("blocks", "first_half", "second_half", "last_block"):
        if stack in out and isinstance(out[stack], dict) and "attn" in out[stack]:
            grp = dict(out[stack])
            grp["attn"] = fuse_attention_qkv(grp["attn"], dtype=dtype)
            out[stack] = grp
    return out


def tree_cast(params: Any, dtype) -> Any:
    return jax.tree.map(lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a, params)


def remat_policy_for(arch):
    """jax.checkpoint policy for arch.remat_policy, shared by all three
    backbones (checkpoint_name tags live in self_attention):

    - "nothing" (default): full remat — recompute everything on backward.
      Measured fastest for DiT at b<=24 (BENCH_HISTORY r3).
    - "attn_out": save ONLY attention outputs — backward replay skips the
      fwd attention kernel (the flat bwd kernel recomputes its own softmax,
      so the fwd replay buys nothing). DiT's b=24 winner (60.2k frames/s).
    - "attn": save qkv + attention outputs (skips the qkv matmul + rope too,
      at 4x the saved bytes).
    - "dots": XLA's checkpoint_dots.
    """
    rp = getattr(arch, "remat_policy", "nothing")
    if rp == "dots":
        return jax.checkpoint_policies.checkpoint_dots
    if rp == "attn_out":
        return jax.checkpoint_policies.save_only_these_names("attn_out")
    if rp == "attn":
        return jax.checkpoint_policies.save_only_these_names("qkv", "attn_out")
    return None


def count_params(params: Any) -> int:
    return sum(int(a.size) for a in jax.tree.leaves(params) if hasattr(a, "size"))

"""int8 W8A8 quantized inference for the DiT projections.

The reference's fastest serving stack runs the DiT in fp16 under TRT-LLM
(reference: runtime/triton_trtllm/patch/f5tts/modules.py linears); this is an
*optional, faster-than-reference* mode: the six per-token projections in every
DiT block (q/k/v, attn-out, ff-in, ff-out) run as int8 x int8 -> int32 MXU
dots, which XLA lowers natively on TPU v5e at ~321 TOP/s vs ~181 TF/s bf16
(measured, 2048^3; 1.77x).

Scheme (standard dynamic W8A8):
- weights: symmetric per-output-channel int8, quantized once at load;
- activations: symmetric per-token (row) int8, scales computed on the fly
  (one VPU max-reduce that XLA fuses into the preceding elementwise chain);
- accumulation int32, dequantized as acc * (row_scale x col_scale) + bias.

Everything is plain XLA — no Pallas needed; the MXU int8 path is picked up
from dot_general(preferred_element_type=int32) on int8 operands.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Params = dict


def quantize_weight(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[..., k, n] f32/bf16 -> (int8 same shape, f32 scale [..., 1, n]).

    Symmetric per-output-channel over the contraction axis (-2). Leading axes
    (stacked block depth) are preserved.
    """
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    w_i8 = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_i8, scale


def quantize_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[..., k] -> (int8, f32 scale [..., 1]): dynamic per-token symmetric."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    x_i8 = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return x_i8, scale


def int8_linear_pre(p: Params, xq: jax.Array, xs: jax.Array, out_dtype) -> jax.Array:
    """Dot + dequant on pre-quantized activations (xq int8 [..., k],
    xs f32 [..., 1]). Plain XLA: the TPU backend lowers s8xs8->s32 dots to
    the native int8 MXU path and fuses the dequant epilogue; a Pallas version
    was measured 10x SLOWER (Mosaic emulates s8 dots on this toolchain)."""
    nd = xq.ndim
    y = jax.lax.dot_general(
        xq, p["w_i8"],
        (((nd - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = y * (xs * p["w_scale"].reshape(-1))
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(out_dtype)


def int8_linear(p: Params, x: jax.Array) -> jax.Array:
    """Drop-in for modules.linear when p holds {"w_i8", "w_scale"[, "b"]}."""
    xq, xs = quantize_rows(x)
    return int8_linear_pre(p, xq, xs, x.dtype)


_QUANT_LEAVES = (
    ("attn", "to_qkv"),  # inference-fused (modules.fuse_attention_qkv)
    ("attn", "to_q"), ("attn", "to_k"), ("attn", "to_v"), ("attn", "to_out"),
    # MMDiT joint attention (context stream) — dispatched via modules.linear
    ("attn", "to_q_c"), ("attn", "to_k_c"), ("attn", "to_v_c"), ("attn", "to_out_c"),
    ("ff", "in"), ("ff", "out"),
    # MMDiT dual-stream FFNs
    ("ff_x", "in"), ("ff_x", "out"), ("ff_c", "in"), ("ff_c", "out"),
)

# every block stack any backbone carries: DiT/MMDiT "blocks" (+ MMDiT's
# unstacked "last_block"), UNetT "first_half"/"second_half"
_BLOCK_STACKS = ("blocks", "first_half", "second_half", "last_block")


def quantize_dit_params(params: Params) -> Params:
    """Rewrite the big per-token projections of every block to int8.

    Works on DiT, UNetT (first_half/second_half) and MMDiT (blocks +
    last_block) param trees, stacked ([depth, k, n]) or unstacked; all other
    leaves (embeddings, AdaLN modulations, convs, norms, proj_out) stay in
    their original dtype — they are <5% of the matmul FLOPs.
    """
    params = jax.tree.map(lambda a: a, params)  # rebuild containers, share leaves

    def quantize_leaf(d: Params) -> Params:
        w_i8, scale = quantize_weight(d["w"])
        out = {"w_i8": w_i8, "w_scale": scale}
        if "b" in d:
            out["b"] = d["b"]
        return out

    def walk(tree):
        for mod, name in _QUANT_LEAVES:
            if mod in tree and name in tree[mod] and "w" in tree[mod][name]:
                tree[mod][name] = quantize_leaf(tree[mod][name])

    for stack in _BLOCK_STACKS:
        blocks = params.get(stack)
        if blocks is None:
            continue
        if isinstance(blocks, (list, tuple)):
            for blk in blocks:
                walk(blk)
        else:
            walk(blocks)
    return params

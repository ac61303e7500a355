"""DiT backbone — AdaLN-zero diffusion transformer over mel frames.

Functional rebuild of the reference DiT (src/f5_tts/model/backbones/dit.py:170-370):
- TextEmbedding: +1 token shift (0 = filler), curtail/pad to mel length,
  additive freqs_cis position table, ConvNeXtV2 stack with per-block padding
  re-zeroing, optional per-sample variable seq_len, optional zipvoice-style
  average upsampling (dit.py:33-139).
- InputEmbedding: Linear(concat(x, cond, text)) + ConvPositionEmbedding
  (dit.py:145-164).
- Blocks: AdaLN-zero DiTBlocks, stacked parameters + `lax.scan` over depth
  (keeps compile time flat in depth; optional `jax.checkpoint` rematerializes
  activations like the reference's checkpoint_activations).
- cfg packing: cond/uncond concatenated on the batch axis (dit.py:337-346).
- The reference's thread-local text-embed cache across ODE steps (dit.py:239-262)
  becomes an explicit precomputed-text-embed argument: the sampler computes
  text embeddings once, outside the NFE scan.

TPU notes: every shape is static; masks are derived from `lengths` [b]; all
matmul compute happens in the caller-selected dtype (bf16 by default) with f32
layernorm/softmax.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from f5tts_tpu.config import ModelArch
from f5tts_tpu.models import modules as m
from f5tts_tpu.ops.rope import precompute_freqs_cis, rope_freqs_interleaved

TEXT_PRECOMPUTE_MAX_POS = 8192  # reference dit.py:47 (~87s of 24 kHz audio)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_text_embedding(key, arch: ModelArch) -> m.Params:
    text_dim = arch.text_dim or arch.mel_dim
    k_embed, k_blocks = jax.random.split(key)
    p: m.Params = {"embed": m.init_embedding(k_embed, arch.text_num_embeds + 1, text_dim)}
    if arch.conv_layers > 0:
        keys = jax.random.split(k_blocks, arch.conv_layers)
        p["blocks"] = [
            m.init_convnext_v2_block(keys[i], text_dim, text_dim * arch.conv_mult)
            for i in range(arch.conv_layers)
        ]
    return p


def init_input_embedding(key, arch: ModelArch) -> m.Params:
    text_dim = arch.text_dim or arch.mel_dim
    k1, k2 = jax.random.split(key)
    return {
        "proj": m.init_linear(k1, arch.mel_dim * 2 + text_dim, arch.dim),
        "conv_pos": m.init_conv_pos_embedding(k2, arch.dim),
    }


def init_dit(key, arch: ModelArch) -> m.Params:
    """Full DiT parameter pytree. Blocks are stacked on a leading depth axis."""
    k_time, k_text, k_input, k_blocks, k_final, k_proj, k_skip = jax.random.split(key, 7)

    block_keys = jax.random.split(k_blocks, arch.depth)
    blocks = [
        m.init_dit_block(block_keys[i], arch.dim, arch.heads, arch.dim_head,
                         arch.ff_mult, arch.qk_norm)
        for i in range(arch.depth)
    ]
    stacked_blocks = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)

    p: m.Params = {
        "time_embed": m.init_timestep_embedding(k_time, arch.dim),
        "text_embed": init_text_embedding(k_text, arch),
        "input_embed": init_input_embedding(k_input, arch),
        "blocks": stacked_blocks,
        "norm_out": m.init_adaln_final(k_final, arch.dim, zero=True),
        "proj_out": m.init_linear(k_proj, arch.dim, arch.mel_dim, zero=True),
    }
    if arch.long_skip_connection:
        p["long_skip"] = m.init_linear(k_skip, arch.dim * 2, arch.dim, bias=False)
    return p


class DiTStatics:
    """Precomputed constant tables (not trained, not part of the param pytree)."""

    def __init__(self, arch: ModelArch):
        self.arch = arch
        text_dim = arch.text_dim or arch.mel_dim
        self.text_freqs_cis = precompute_freqs_cis(text_dim, TEXT_PRECOMPUTE_MAX_POS)
        self.rope_angles = rope_freqs_interleaved(arch.dim_head, TEXT_PRECOMPUTE_MAX_POS)


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def text_embedding(
    p: m.Params,
    statics: DiTStatics,
    text: jax.Array,                  # [b, nt] int32, -1 padded
    seq_len: int,                     # static mel length to pad/curtail to
    lengths: Optional[jax.Array] = None,  # [b] per-sample valid mel length
    drop_text: bool = False,
    dtype=jnp.float32,
) -> jax.Array:
    """Reference dit.py:86-139. Returns [b, seq_len, text_dim]."""
    arch = statics.arch
    b, nt = text.shape
    text = text + 1  # -1 pad -> 0 filler

    # curtail or pad to seq_len
    if nt >= seq_len:
        text = text[:, :seq_len]
    else:
        text = jnp.pad(text, ((0, 0), (0, seq_len - nt)))

    valid_pos_mask = None
    if lengths is not None:
        seq_pos = jnp.arange(seq_len)[None, :]
        valid_pos_mask = seq_pos < lengths[:, None]
        text = jnp.where(valid_pos_mask, text, 0)

    pad_mask = text == 0  # filler positions (mask_padding semantics)

    # drop_text: static bool (inference cfg packing) or [b] bool array
    # (training-time per-sample CFG dropout under jit)
    if isinstance(drop_text, jax.Array):
        text = jnp.where(drop_text[:, None], 0, text)
    elif drop_text:
        text = jnp.zeros_like(text)

    emb = m.embedding(p["embed"], text).astype(dtype)  # [b, n, text_dim]
    if valid_pos_mask is not None:
        emb = jnp.where(valid_pos_mask[:, :, None], emb, 0.0)

    if arch.conv_layers > 0:
        freqs = statics.text_freqs_cis[:seq_len].astype(dtype)  # [n, d]
        if valid_pos_mask is not None:
            freqs = freqs[None, :, :] * valid_pos_mask[:, :, None].astype(dtype)
            emb = emb + freqs
        else:
            emb = emb + freqs[None, :, :]

        if arch.text_mask_padding:
            emb = jnp.where(pad_mask[:, :, None], 0.0, emb)
            for blk in p["blocks"]:
                emb = m.convnext_v2_block(blk, emb)
                emb = jnp.where(pad_mask[:, :, None], 0.0, emb)
        else:
            for blk in p["blocks"]:
                emb = m.convnext_v2_block(blk, emb)

    if arch.text_embedding_average_upsampling:
        target_lens = lengths if lengths is not None else jnp.full((b,), seq_len, jnp.int32)
        emb = average_upsample_text(emb, ~pad_mask, target_lens)

    return emb


def average_upsample_text(text: jax.Array, text_mask: jax.Array, target_lens: jax.Array) -> jax.Array:
    """Zipvoice-style average upsampling (reference dit.py:55-84), vectorized.

    Each of the `text_len` valid tokens is repeated ~audio_len/text_len times
    (later tokens get the +1 remainder), producing [b, n, d] with positions
    >= audio_len zeroed. Gather-based: no per-sample python loops.
    """
    b, n, d = text.shape
    text_lens = text_mask.sum(axis=1).astype(jnp.int32)  # [b]

    # compact valid tokens to the front: sort by (~mask) is stable
    order = jnp.argsort(~text_mask, axis=1, stable=True)  # valid indices first
    compact = jnp.take_along_axis(text, order[:, :, None], axis=1)  # [b, n, d]

    pos = jnp.arange(n)[None, :]  # [1, n] output (audio) positions
    tl = jnp.maximum(text_lens, 1)[:, None]
    al = jnp.maximum(target_lens, 1)[:, None]
    base = al // tl
    rem = al % tl
    # token j covers: j < tl - rem -> [j*base, (j+1)*base); afterwards blocks of base+1
    cutoff = (tl - rem) * base
    tok = jnp.where(
        pos < cutoff,
        pos // jnp.maximum(base, 1),
        (tl - rem) + (pos - cutoff) // jnp.maximum(base + 1, 1),
    )
    tok = jnp.clip(tok, 0, n - 1)
    out = jnp.take_along_axis(compact, tok[:, :, None].astype(jnp.int32), axis=1)
    valid = (pos < target_lens[:, None]) & (text_lens[:, None] > 0)
    return jnp.where(valid[:, :, None], out, 0.0)


def input_embedding(
    p: m.Params,
    x: jax.Array,
    cond: jax.Array,
    text_embed: jax.Array,
    drop_audio_cond: bool = False,
    audio_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Reference dit.py:145-164."""
    if isinstance(drop_audio_cond, jax.Array):
        cond = jnp.where(drop_audio_cond[:, None, None], 0.0, cond)
    elif drop_audio_cond:
        cond = jnp.zeros_like(cond)
    h = m.linear(p["proj"], jnp.concatenate([x, cond, text_embed], axis=-1))
    h = m.conv_pos_embedding(p["conv_pos"], h, mask=audio_mask) + h
    return h


def dit_apply(
    params: m.Params,
    statics: DiTStatics,
    x_embedded: jax.Array,          # [b, n, dim] output of input_embedding
    t_emb: jax.Array,               # [b, dim]
    lengths: Optional[jax.Array],   # [b] or None
    backend: str = "pallas",
    checkpoint_blocks: bool = False,
    t_mods: Optional[tuple] = None,  # (block_mods [L, b, 6*dim], final_mod [b, 2*dim])
) -> jax.Array:
    """Run the stacked DiT blocks + final AdaLN + projection."""
    arch = statics.arch
    n = x_embedded.shape[1]
    rope = statics.rope_angles[:n]
    if t_mods is None and t_emb is not None:
        # hoist the per-block AdaLN modulation matmuls (dim -> 6*dim per
        # block; 41% of DiT-Base weight bytes) out of the block scan as ONE
        # einsum over the stacked weights. Inside a rematerialized scan the
        # per-block linears would re-read their weights during the backward
        # recompute; hoisted, the mods ride the scan as saved inputs.
        t_mods = hoist_t_mods(params, t_emb)
    block_mods, final_mod = t_mods if t_mods is not None else (None, None)

    # flat cos/sin tables for the fused QKV+RoPE kernel, built once per
    # forward (the kernel path activates only for fused-QKV inference params)
    rope_tabs = None
    if backend == "pallas" and jax.default_backend() == "tpu":
        from f5tts_tpu.ops.rope import rope_flat_tables

        rope_tabs = rope_flat_tables(rope, n, arch.heads, arch.pe_attn_head,
                                     dtype=x_embedded.dtype)

    def body(carry, scanned):
        blk_params, mods = scanned
        h = m.dit_block(
            blk_params, carry, t_emb, arch.heads, rope,
            lengths=lengths, pe_attn_head=arch.pe_attn_head, backend=backend,
            mods=mods, rope_tabs=rope_tabs,
        )
        return h, None

    if checkpoint_blocks or arch.checkpoint_activations:
        # policy notes (measured, DiT-Base b=16-24 n=1024): "attn_out" saves
        # 32 MB/block of bf16 and skips the fwd megakernel replay (~29
        # ms/step; the flat bwd kernel recomputes its own softmax); saving
        # qkv too ("attn") adds 2.1 GB pressure — measured slower
        body = jax.checkpoint(body, policy=m.remat_policy_for(arch))

    x = x_embedded
    if arch.long_skip_connection:
        residual = x
    # unroll so the per-layer parameter slices become static reads — the
    # rolled scan copies each layer's weights out of the stacked arrays every
    # iteration (~15% of INFERENCE step time in device traces). Under remat
    # training the rolled scan measures the same as full unroll (287 vs 293
    # ms/step at b=8 n=1024) with 4x faster compiles, so it defaults rolled;
    # F5TTS_TRAIN_UNROLL overrides for unroll experiments (read at trace).
    if checkpoint_blocks or arch.checkpoint_activations:
        import os as _os

        unroll = int(_os.environ.get("F5TTS_TRAIN_UNROLL", "1"))
    else:
        unroll = arch.depth
    x, _ = jax.lax.scan(body, x, (params["blocks"], block_mods), unroll=unroll)
    if arch.long_skip_connection:
        x = m.linear(params["long_skip"], jnp.concatenate([x, residual], axis=-1))

    x = m.adaln_final(params["norm_out"], x, t_emb, mod=final_mod)
    return m.linear(params["proj_out"], x)


def dit_forward(
    params: m.Params,
    statics: DiTStatics,
    x: jax.Array,                   # [b, n, mel] noised input
    cond: jax.Array,                # [b, n, mel] masked cond audio
    text: jax.Array,                # [b, nt] int ids (-1 padded)
    time: jax.Array,                # [b] or scalar
    lengths: Optional[jax.Array] = None,
    drop_audio_cond: bool = False,
    drop_text: bool = False,
    cfg_infer: bool = False,
    text_embeds: Optional[tuple] = None,  # precomputed (cond_embed, uncond_embed)
    dtype=jnp.float32,
    backend: str = "pallas",
    t_mods: Optional[tuple] = None,  # precomputed AdaLN mods, batch dim == packed batch
) -> jax.Array:
    """Full forward matching reference DiT.forward (dit.py:319-370).

    With cfg_infer=True returns [2b, n, mel]: cond rows then uncond rows.
    `text_embeds` replaces the reference's cross-step thread-local cache.
    `t_mods` (see `precompute_t_mods`) replaces the per-step timestep
    embedding + per-layer AdaLN modulation linears entirely.
    """
    arch = statics.arch
    b, n, _ = x.shape
    if time.ndim == 0:
        time = jnp.broadcast_to(time, (b,))

    t_emb = (None if t_mods is not None
             else m.timestep_embedding(params["time_embed"], time, dtype=dtype))

    audio_mask = None
    if lengths is not None:
        audio_mask = jnp.arange(n)[None, :] < lengths[:, None]

    x = x.astype(dtype)
    cond = cond.astype(dtype)

    if cfg_infer:
        if text_embeds is None:
            te_cond = text_embedding(params["text_embed"], statics, text, n,
                                     lengths=lengths, drop_text=False, dtype=dtype)
            te_uncond = text_embedding(params["text_embed"], statics, text, n,
                                       lengths=lengths, drop_text=True, dtype=dtype)
        else:
            te_cond, te_uncond = text_embeds
        x_c = input_embedding(params["input_embed"], x, cond, te_cond,
                              drop_audio_cond=False, audio_mask=audio_mask)
        x_u = input_embedding(params["input_embed"], x, cond, te_uncond,
                              drop_audio_cond=True, audio_mask=audio_mask)
        h = jnp.concatenate([x_c, x_u], axis=0)
        if t_emb is not None:
            t_emb = jnp.concatenate([t_emb, t_emb], axis=0)
        lengths2 = jnp.concatenate([lengths, lengths], axis=0) if lengths is not None else None
    else:
        if text_embeds is None:
            te = text_embedding(params["text_embed"], statics, text, n,
                                lengths=lengths, drop_text=drop_text, dtype=dtype)
        else:
            te = text_embeds[1] if drop_text else text_embeds[0]
        h = input_embedding(params["input_embed"], x, cond, te,
                            drop_audio_cond=drop_audio_cond, audio_mask=audio_mask)
        lengths2 = lengths

    out = dit_apply(params, statics, h, t_emb, lengths2, backend=backend,
                    t_mods=t_mods)
    return out.astype(jnp.float32)


def hoist_t_mods(params: m.Params, t_emb: jax.Array) -> tuple:
    """Single-step AdaLN hoist: (block_mods [L, b, 6*dim], final_mod [b, 2*dim]).

    Training-time counterpart of `precompute_t_mods` (which folds over all
    sampler steps): computes every block's modulation vectors from one step's
    timestep embedding [b, dim] in a single einsum over the stacked AdaLN
    weights. Numerics match the in-block silu+linear chain."""
    h = jax.nn.silu(t_emb)
    wb = params["blocks"]["attn_norm"]["linear"]["w"].astype(h.dtype)
    bb = params["blocks"]["attn_norm"]["linear"]["b"].astype(h.dtype)
    block_mods = _mods_dot(h, wb) + bb[:, None, :]
    wf = params["norm_out"]["linear"]["w"].astype(h.dtype)
    bf = params["norm_out"]["linear"]["b"].astype(h.dtype)
    final_mod = h @ wf + bf
    return block_mods, final_mod


def _mods_dot(h: jax.Array, wb: jax.Array) -> jax.Array:
    """[m, d] x [L, d, k] -> [L, m, k], consuming wb in its CANONICAL layout.

    jnp.einsum("md,ldk->lmk") makes XLA prefer a d-minormost layout for wb —
    and because wb here is the 138M-param stacked AdaLN weight, the layout
    choice propagates to its gradient, AdamW moments and EMA copy, inserting
    four 1.1 GB {2,1,0}<->{1,2,0} transposes per training step (~13.5 ms,
    measured). dot_general with wb as lhs keeps k minormost (the stored
    layout); the [L, k, m] -> [L, m, k] result transpose is 8 MB."""
    out = jax.lax.dot_general(wb, h, (((1,), (1,)), ((), ())))  # [L, k, m]
    return jnp.transpose(out, (0, 2, 1))


def precompute_t_mods(params: m.Params, t_values: jax.Array, batch: int,
                      dtype=jnp.bfloat16) -> tuple:
    """Hoist ALL timestep-dependent AdaLN work out of the NFE scan.

    The per-layer modulation linears (dim -> 6*dim per block; 138M params =
    41% of DiT-Base weight bytes) are applied with M = batch (=2) inside every
    ODE step, so the sampler re-reads ~280 MB of weights per step for an
    HBM-bound matmul. All step times are known before the scan, so one einsum
    over the stacked block weights computes every step's modulation vectors
    once (reference re-runs AdaLN per step on GPU: modules.py:743-757,
    f5_tts_trtllm.py:325-369 — folding it across steps is TPU-scan-specific).

    Returns (block_mods [L, S, batch, 6*dim], final_mod [S, batch, 2*dim])
    for `t_values` [S]; numerics match the in-step path (same silu/linear
    dtype chain).
    """
    s = t_values.shape[0]
    t_flat = jnp.broadcast_to(t_values[:, None], (s, batch)).reshape(-1)
    emb = m.timestep_embedding(params["time_embed"], t_flat, dtype=dtype)
    h = jax.nn.silu(emb)                                        # [s*b, dim]
    wb = params["blocks"]["attn_norm"]["linear"]["w"].astype(dtype)
    bb = params["blocks"]["attn_norm"]["linear"]["b"].astype(dtype)
    block_mods = _mods_dot(h, wb) + bb[:, None, :]
    depth = wb.shape[0]
    block_mods = block_mods.reshape(depth, s, batch, -1)
    wf = params["norm_out"]["linear"]["w"].astype(dtype)
    bf = params["norm_out"]["linear"]["b"].astype(dtype)
    final_mod = (h @ wf + bf).reshape(s, batch, -1)
    return block_mods, final_mod

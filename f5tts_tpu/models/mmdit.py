"""MMDiT backbone — SD3-style dual-stream (audio + text) transformer.

Rebuild of reference src/f5_tts/model/backbones/mmdit.py:87-262 and the
MMDiTBlock / JointAttnProcessor (src/f5_tts/model/modules.py:563-705, 763-846):

- text stream: embedding + absolute freqs_cis position table (1024 max), pad
  masking (mmdit.py:32-63)
- audio stream: Linear(concat(x, cond)) + conv position embedding (mmdit.py:69-81)
- joint attention: audio and text q/k/v concatenated on the sequence axis with
  separate RoPE per stream; outputs split back (modules.py:563-705)
- last block is context_pre_only: text stream gets only a final AdaLN, no
  ffn/out-proj (modules.py:791, mmdit.py:124)

The depth-1 uniform blocks run as a stacked lax.scan; the structurally
different last block runs unrolled. Joint attention uses an explicit
key-mask (audio prefix + text prefix) and routes through the key-masked
Pallas flash kernel on TPU (ops.attention.masked_flash_attention; the text
stream is padded to keep the joint sequence 128-aligned). ALL AdaLN
modulation matmuls are hoisted out of the block scan (mmdit_hoist_t_mods /
mmdit_precompute_t_mods) — the sampler computes them once for every ODE
step.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from f5tts_tpu.config import ModelArch
from f5tts_tpu.models import modules as m
from f5tts_tpu.ops.rope import apply_rotary, precompute_freqs_cis, rope_freqs_interleaved

TEXT_PRECOMPUTE_MAX_POS = 1024  # reference mmdit.py:39


class MMDiTStatics:
    def __init__(self, arch: ModelArch):
        self.arch = arch
        self.text_freqs_cis = precompute_freqs_cis(arch.dim, TEXT_PRECOMPUTE_MAX_POS)
        self.rope_angles = rope_freqs_interleaved(arch.dim_head, 8192)


def init_mmdit(key, arch: ModelArch) -> m.Params:
    k_time, k_text, k_audio, k_blocks, k_final, k_proj = jax.random.split(key, 6)

    def init_joint_attention(bk, context_pre_only: bool):
        ks = jax.random.split(bk, 8)
        inner = arch.heads * arch.dim_head
        p = {
            "to_q": m.init_linear(ks[0], arch.dim, inner),
            "to_k": m.init_linear(ks[1], arch.dim, inner),
            "to_v": m.init_linear(ks[2], arch.dim, inner),
            "to_q_c": m.init_linear(ks[3], arch.dim, inner),
            "to_k_c": m.init_linear(ks[4], arch.dim, inner),
            "to_v_c": m.init_linear(ks[5], arch.dim, inner),
            "to_out": m.init_linear(ks[6], inner, arch.dim),
        }
        if not context_pre_only:
            p["to_out_c"] = m.init_linear(ks[7], inner, arch.dim)
        if arch.qk_norm == "rms_norm":
            p["q_norm"] = m.init_rms_norm(arch.dim_head)
            p["k_norm"] = m.init_rms_norm(arch.dim_head)
            p["c_q_norm"] = m.init_rms_norm(arch.dim_head)
            p["c_k_norm"] = m.init_rms_norm(arch.dim_head)
        return p

    def init_block(bk, context_pre_only: bool):
        k1, k2, k3, k4, k5 = jax.random.split(bk, 5)
        blk = {
            "attn_norm_x": m.init_adaln(k1, arch.dim, zero=True),
            "attn": init_joint_attention(k2, context_pre_only),
            "ff_x": m.init_feed_forward(k3, arch.dim, arch.ff_mult),
        }
        if context_pre_only:
            blk["attn_norm_c"] = m.init_adaln_final(k4, arch.dim, zero=True)
        else:
            blk["attn_norm_c"] = m.init_adaln(k4, arch.dim, zero=True)
            blk["ff_c"] = m.init_feed_forward(k5, arch.dim, arch.ff_mult)
        return blk

    block_keys = jax.random.split(k_blocks, arch.depth)
    body_blocks = [init_block(block_keys[i], False) for i in range(arch.depth - 1)]

    return {
        "time_embed": m.init_timestep_embedding(k_time, arch.dim),
        "text_embed": {"embed": m.init_embedding(k_text, arch.text_num_embeds + 1, arch.dim)},
        "audio_embed": {
            "linear": m.init_linear(k_audio, 2 * arch.mel_dim, arch.dim),
            "conv_pos": m.init_conv_pos_embedding(jax.random.fold_in(k_audio, 1), arch.dim),
        },
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *body_blocks),
        "last_block": init_block(block_keys[-1], True),
        "norm_out": m.init_adaln_final(k_final, arch.dim, zero=True),
        "proj_out": m.init_linear(k_proj, arch.dim, arch.mel_dim, zero=True),
    }


def mmdit_text_embedding(p, statics, text, drop_text=False, mask_padding=True, dtype=jnp.float32):
    """Reference mmdit.py:42-63."""
    text = text + 1
    pad_mask = text == 0
    if isinstance(drop_text, jax.Array):
        text = jnp.where(drop_text[:, None], 0, text)
    elif drop_text:
        text = jnp.zeros_like(text)
    emb = m.embedding(p["embed"], text).astype(dtype)
    nt = text.shape[1]
    pos = statics.text_freqs_cis[: min(nt, TEXT_PRECOMPUTE_MAX_POS)]
    if nt > pos.shape[0]:  # clamp long positions at the table edge (ref :229)
        pos = jnp.concatenate(
            [pos, jnp.broadcast_to(pos[-1:], (nt - pos.shape[0], pos.shape[1]))], 0)
    emb = emb + pos[None].astype(dtype)
    if mask_padding:
        emb = jnp.where(pad_mask[:, :, None], 0.0, emb)
    return emb


def _joint_attention(p, x, c, heads, rope_audio, rope_text, audio_kmask,
                     text_kmask, use_kernel=False, joint_tabs=None):
    """modules.py:581-705: concat streams, attend, split.

    Fused serving params ("to_qkv"/"to_qkv_c", modules.fuse_attention_qkv)
    with flat rope tables route through the bias-masked flat megakernel
    (ops.attention.fused_qkv_rope_attention_bias): the two streams' fused
    projection outputs are seq-concatenated — the per-row [q|k|v] lane
    layout survives concatenation — roped in VMEM against the concatenated
    per-stream tables, attended in one pass, and emitted flat for the
    to_out projections. No per-stream rope passes, no head-split transposes,
    no QKV lane split in HBM.

    Otherwise use_kernel routes the joint scores through the key-masked
    Pallas flash kernel (ops.attention.masked_flash_attention: the audio
    padding sits in the MIDDLE of the joint sequence, so prefix `lengths`
    can't express the mask; the kernel consumes a [b, n+nt] additive bias
    row instead). Falls back to the XLA path off-TPU or when n+nt isn't
    tile-aligned."""
    from f5tts_tpu.ops.attention import (
        fused_qkv_rope_attention_bias,
        masked_flash_attention,
        mha_reference_masked,
    )

    b, n, _ = x.shape
    nt = c.shape[1]
    fused = "to_qkv" in p
    if fused:
        wq = p["to_qkv"]["w"] if "w" in p["to_qkv"] else p["to_qkv"]["w_i8"]
        dh = wq.shape[1] // 3 // heads
    else:
        wq = p["to_q"]["w"] if "w" in p["to_q"] else p["to_q"]["w_i8"]
        dh = wq.shape[1] // heads

    def heads_split(t):
        return t.reshape(b, -1, heads, dh).transpose(0, 2, 1, 3)

    if fused and joint_tabs is not None and "q_norm" not in p:
        qkv_x = m.linear(p["to_qkv"], x)      # [b, n, 3hd]
        qkv_c = m.linear(p["to_qkv_c"], c)    # [b, nt, 3hd]
        qkv_j = jnp.concatenate([qkv_x, qkv_c], axis=1)
        am = audio_kmask if audio_kmask is not None else jnp.ones((b, n), bool)
        tm = text_kmask if text_kmask is not None else jnp.ones((b, nt), bool)
        kmask = jnp.concatenate([am, tm], axis=1)
        o = fused_qkv_rope_attention_bias(qkv_j, joint_tabs[0], joint_tabs[1],
                                          kmask, heads)
        xo, co = o[:, :n], o[:, n:]
        xo = m.linear(p["to_out"], xo)
        if "to_out_c" in p:
            co = m.linear(p["to_out_c"], co)
        if audio_kmask is not None:
            xo = jnp.where(audio_kmask[:, :, None], xo, 0.0)
        if text_kmask is not None and "to_out_c" in p:
            co = jnp.where(text_kmask[:, :, None], co, 0.0)
        return xo, co

    if fused:
        q, k, v = (heads_split(t) for t in
                   jnp.split(m.linear(p["to_qkv"], x), 3, axis=-1))
        cq, ck, cv = (heads_split(t) for t in
                      jnp.split(m.linear(p["to_qkv_c"], c), 3, axis=-1))
    else:
        q = heads_split(m.linear(p["to_q"], x))
        k = heads_split(m.linear(p["to_k"], x))
        v = heads_split(m.linear(p["to_v"], x))
        cq = heads_split(m.linear(p["to_q_c"], c))
        ck = heads_split(m.linear(p["to_k_c"], c))
        cv = heads_split(m.linear(p["to_v_c"], c))

    if "q_norm" in p:
        q = m.rms_norm(p["q_norm"], q)
        k = m.rms_norm(p["k_norm"], k)
        cq = m.rms_norm(p["c_q_norm"], cq)
        ck = m.rms_norm(p["c_k_norm"], ck)

    q = apply_rotary(q, rope_audio)
    k = apply_rotary(k, rope_audio)
    cq = apply_rotary(cq, rope_text)
    ck = apply_rotary(ck, rope_text)

    qj = jnp.concatenate([q, cq], axis=2)
    kj = jnp.concatenate([k, ck], axis=2)
    vj = jnp.concatenate([v, cv], axis=2)

    am = audio_kmask if audio_kmask is not None else jnp.ones((b, n), bool)
    tm = text_kmask if text_kmask is not None else jnp.ones((b, nt), bool)
    kmask = jnp.concatenate([am, tm], axis=1)  # [b, n+nt]
    if use_kernel:
        o = masked_flash_attention(qj, kj, vj, kmask)
    else:
        o = mha_reference_masked(qj, kj, vj, kmask)
    o = o.transpose(0, 2, 1, 3).reshape(b, n + nt, heads * dh)

    xo, co = o[:, :n], o[:, n:]
    xo = m.linear(p["to_out"], xo)
    if "to_out_c" in p:
        co = m.linear(p["to_out_c"], co)
    if audio_kmask is not None:
        xo = jnp.where(audio_kmask[:, :, None], xo, 0.0)
    if text_kmask is not None and "to_out_c" in p:
        co = jnp.where(text_kmask[:, :, None], co, 0.0)
    return xo, co


def _mmdit_block(blk, x, c, mods_x, mods_c, heads, rope_audio, rope_text,
                 audio_kmask, text_kmask, context_pre_only=False,
                 use_kernel=False, joint_tabs=None):
    """modules.py:816-846. `mods_x`/`mods_c` are the precomputed AdaLN
    modulation vectors ([b, 6*dim]; [b, 2*dim] for the context_pre_only last
    block) — see mmdit_hoist_t_mods."""
    if context_pre_only:
        norm_c = m.adaln_final(blk["attn_norm_c"], c, None, mod=mods_c)
    else:
        c_sm, c_ss, c_gm, c_s2, c_sc2, c_g2 = jnp.split(mods_c, 6, axis=-1)
        norm_c = m.adaln_pre(c, c_sm, c_ss)
    x_sm, x_ss, x_gm, x_s2, x_sc2, x_g2 = jnp.split(mods_x, 6, axis=-1)
    norm_x = m.adaln_pre(x, x_sm, x_ss)

    x_attn, c_attn = _joint_attention(blk["attn"], norm_x, norm_c, heads,
                                      rope_audio, rope_text, audio_kmask,
                                      text_kmask, use_kernel=use_kernel,
                                      joint_tabs=joint_tabs)

    if context_pre_only:
        c = None
    else:
        c = c + c_gm[:, None, :] * c_attn
        norm_c = m.adaln_pre(c, c_s2, c_sc2)
        c = c + c_g2[:, None, :] * m.feed_forward(blk["ff_c"], norm_c)

    x = x + x_gm[:, None, :] * x_attn
    norm_x = m.adaln_pre(x, x_s2, x_sc2)
    x = x + x_g2[:, None, :] * m.feed_forward(blk["ff_x"], norm_x)
    return x, c


def mmdit_hoist_t_mods(params: m.Params, t_emb: jax.Array) -> dict:
    """Hoist EVERY AdaLN modulation matmul out of the block scan.

    t_emb [..., dim] (any leading batch shape) -> mods dict; the stacked
    per-block linears collapse into one einsum over the depth-stacked
    weights (same trick as dit.hoist_t_mods / precompute_t_mods). The
    sampler calls this once for all ODE steps; the training step once per
    step, outside the remat region."""
    h = jax.nn.silu(t_emb)

    def mod(p_adaln):
        from f5tts_tpu.models.dit import _mods_dot

        w = p_adaln["linear"]["w"].astype(h.dtype)
        bias = p_adaln["linear"]["b"].astype(h.dtype)
        if w.ndim == 3:  # stacked [L, d, k]
            hs = h.reshape(-1, h.shape[-1])
            out = _mods_dot(hs, w)  # canonical wb layout (see dit._mods_dot)
            out = out.reshape((w.shape[0],) + h.shape[:-1] + (w.shape[-1],))
            return out + bias.reshape((bias.shape[0],) + (1,) * (h.ndim - 1)
                                      + (bias.shape[-1],))
        return h @ w + bias

    return {
        "blocks_x": mod(params["blocks"]["attn_norm_x"]),
        "blocks_c": mod(params["blocks"]["attn_norm_c"]),
        "last_x": mod(params["last_block"]["attn_norm_x"]),
        "last_c": mod(params["last_block"]["attn_norm_c"]),
        "final": mod(params["norm_out"]),
    }


def mmdit_precompute_t_mods(params: m.Params, t_values: jax.Array, batch: int,
                            dtype=jnp.bfloat16):
    """All-steps AdaLN hoist for the sampler: returns `at(i)` giving the
    step-i mods dict (counterpart of dit.precompute_t_mods)."""
    s = t_values.shape[0]
    t_flat = jnp.broadcast_to(t_values[:, None], (s, batch)).reshape(-1)
    emb = m.timestep_embedding(params["time_embed"], t_flat, dtype=dtype)
    mods = mmdit_hoist_t_mods(params, emb.reshape(s, batch, -1))

    def at(i):
        return {
            "blocks_x": mods["blocks_x"][:, i], "blocks_c": mods["blocks_c"][:, i],
            "last_x": mods["last_x"][i], "last_c": mods["last_c"][i],
            "final": mods["final"][i],
        }

    return at


def mmdit_forward(
    params: m.Params,
    statics: MMDiTStatics,
    x: jax.Array,
    cond: jax.Array,
    text: jax.Array,
    time: jax.Array,
    lengths: Optional[jax.Array] = None,
    drop_audio_cond=False,
    drop_text=False,
    cfg_infer: bool = False,
    text_embeds: Optional[tuple] = None,
    dtype=jnp.float32,
    backend: str = "xla",
    t_mods: Optional[dict] = None,  # precomputed AdaLN mods (mmdit_hoist_t_mods)
) -> jax.Array:
    """Reference mmdit.py:214-262."""
    arch = statics.arch
    b, n, _ = x.shape
    nt = text.shape[1]
    if time.ndim == 0:
        time = jnp.broadcast_to(time, (b,))

    t_emb = (None if t_mods is not None
             else m.timestep_embedding(params["time_embed"], time, dtype=dtype))
    x = x.astype(dtype)
    cond = cond.astype(dtype)

    c_kmask = (text + 1) != 0  # valid text positions (mmdit.py:232)
    audio_kmask = None
    if lengths is not None:
        audio_kmask = jnp.arange(n)[None, :] < lengths[:, None]

    def audio_embed(xx, cc, drop):
        if isinstance(drop, jax.Array):
            cc = jnp.where(drop[:, None, None], 0.0, cc)
        elif drop:
            cc = jnp.zeros_like(cc)
        h = m.linear(params["audio_embed"]["linear"], jnp.concatenate([xx, cc], axis=-1))
        return m.conv_pos_embedding(params["audio_embed"]["conv_pos"], h) + h

    if cfg_infer:
        if text_embeds is None:
            c_c = mmdit_text_embedding(params["text_embed"], statics, text, False,
                                       arch.text_mask_padding, dtype)
            c_u = mmdit_text_embedding(params["text_embed"], statics, text, True,
                                       arch.text_mask_padding, dtype)
        else:
            c_c, c_u = text_embeds
        h = jnp.concatenate([audio_embed(x, cond, False), audio_embed(x, cond, True)], 0)
        c = jnp.concatenate([c_c, c_u], axis=0)
        if t_emb is not None:
            t_emb = jnp.concatenate([t_emb, t_emb], axis=0)
        c_kmask = jnp.concatenate([c_kmask, c_kmask], axis=0)
        if audio_kmask is not None:
            audio_kmask = jnp.concatenate([audio_kmask, audio_kmask], axis=0)
    else:
        if text_embeds is None:
            c = mmdit_text_embedding(params["text_embed"], statics, text, drop_text,
                                     arch.text_mask_padding, dtype)
        else:
            c = text_embeds[1] if (drop_text is True) else text_embeds[0]
        h = audio_embed(x, cond, drop_audio_cond)

    # pad the text stream to a 128 multiple so the joint sequence stays
    # tile-aligned for the masked flash kernel (pad keys masked via c_kmask)
    use_kernel = backend == "pallas" and jax.default_backend() == "tpu"
    if use_kernel and (n + c.shape[1]) % 128 != 0:
        nt_pad = -(-(n + c.shape[1]) // 128) * 128 - n
        c = jnp.pad(c, ((0, 0), (0, nt_pad - c.shape[1]), (0, 0)))
        c_kmask = jnp.pad(c_kmask, ((0, 0), (0, nt_pad - c_kmask.shape[1])))

    rope_audio = statics.rope_angles[:n]
    rope_text = statics.rope_angles[:c.shape[1]]

    # flat rope tables for the bias megakernel: per-stream tables
    # concatenated on the sequence axis, so joint rows rotate with their own
    # stream's positions without in-kernel branching. Built once per forward
    # (hoisted out of the block scan); engages only for fused-QKV params AND
    # backend="pallas" — backend="xla" must stay a pure XLA oracle (and a
    # TP-sharded tree must not feed sharded arrays into an unsharded
    # pallas_call), mirroring self_attention's use_kernel gate.
    joint_tabs = None
    if (use_kernel and "to_qkv" in params["blocks"]["attn"]
            and "q_norm" not in params["blocks"]["attn"]):
        from f5tts_tpu.ops.rope import rope_flat_tables

        ca, sa = rope_flat_tables(rope_audio, n, arch.heads, None, dtype=dtype)
        ct2, st2 = rope_flat_tables(rope_text, c.shape[1], arch.heads, None,
                                    dtype=dtype)
        joint_tabs = (jnp.concatenate([ca, ct2], axis=0),
                      jnp.concatenate([sa, st2], axis=0))

    if t_mods is None:
        # hoist the AdaLN modulation matmuls out of the (possibly remat'd)
        # block scan — they ride the scan as precomputed inputs
        t_mods = mmdit_hoist_t_mods(params, t_emb)

    def body(carry, scanned):
        blk, mx, mc = scanned
        xx, cc = carry
        xx, cc = _mmdit_block(blk, xx, cc, mx, mc, arch.heads, rope_audio,
                              rope_text, audio_kmask, c_kmask,
                              context_pre_only=False, use_kernel=use_kernel,
                              joint_tabs=joint_tabs)
        return (xx, cc), None

    if arch.checkpoint_activations:
        body = jax.checkpoint(body, policy=m.remat_policy_for(arch))
    unroll = 1 if arch.checkpoint_activations else arch.depth - 1
    (h, c), _ = jax.lax.scan(
        body, (h, c),
        (params["blocks"], t_mods["blocks_x"], t_mods["blocks_c"]),
        unroll=max(unroll, 1))
    h, _ = _mmdit_block(params["last_block"], h, c, t_mods["last_x"],
                        t_mods["last_c"], arch.heads, rope_audio, rope_text,
                        audio_kmask, c_kmask, context_pre_only=True,
                        use_kernel=use_kernel, joint_tabs=joint_tabs)

    h = m.adaln_final(params["norm_out"], h, None, mod=t_mods["final"])
    return m.linear(params["proj_out"], h).astype(jnp.float32)

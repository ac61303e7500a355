"""UNetT backbone — flat UNet transformer (E2-TTS).

Rebuild of reference src/f5_tts/model/backbones/unett.py:108-307:
- depth must be even; first-half block outputs are pushed onto a skip stack,
  second-half blocks pop and merge them (concat+proj / add / none)
- the time embedding is prepended to the sequence as a token (unett.py:271-274),
  mask padded with True at position 0
- pre-norm RMSNorm blocks: x = attn(norm(x)) + x; x = ff(norm(x)) + x
- text embedding identical to DiT's but with a 4096-position table and no
  per-sample variable seq_len (unett.py:37-84); input embedding without conv
  masking (unett.py:90-102)

TPU structure: the two halves are two stacked-parameter `lax.scan`s; the skip
stack is the stacked first-half outputs consumed in reverse by the second
scan — no Python-level push/pop, shapes static.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from f5tts_tpu.config import ModelArch
from f5tts_tpu.models import modules as m
from f5tts_tpu.ops.rope import precompute_freqs_cis, rope_freqs_interleaved

TEXT_PRECOMPUTE_MAX_POS = 4096  # reference unett.py:46


def init_unett(key, arch: ModelArch) -> m.Params:
    assert arch.depth % 2 == 0, "UNetT depth must be even"
    text_dim = arch.text_dim or arch.mel_dim
    k_time, k_text, k_input, k_blocks, k_out = jax.random.split(key, 5)

    from f5tts_tpu.models.dit import init_input_embedding, init_text_embedding

    block_keys = jax.random.split(k_blocks, arch.depth)

    def init_block(bk, later_half: bool):
        k1, k2, k3 = jax.random.split(bk, 3)
        blk = {
            "attn_norm": m.init_rms_norm(arch.dim),
            "attn": m.init_attention(k1, arch.dim, arch.heads, arch.dim_head, arch.qk_norm),
            "ff_norm": m.init_rms_norm(arch.dim),
            "ff": m.init_feed_forward(k2, arch.dim, arch.ff_mult),
        }
        if later_half and arch.skip_connect_type == "concat":
            blk["skip_proj"] = m.init_linear(k3, arch.dim * 2, arch.dim, bias=False)
        return blk

    half = arch.depth // 2
    first = [init_block(block_keys[i], False) for i in range(half)]
    second = [init_block(block_keys[half + i], True) for i in range(half)]

    return {
        "time_embed": m.init_timestep_embedding(k_time, arch.dim),
        "text_embed": init_text_embedding(k_text, arch),
        "input_embed": init_input_embedding(k_input, arch),
        "first_half": jax.tree.map(lambda *xs: jnp.stack(xs), *first),
        "second_half": jax.tree.map(lambda *xs: jnp.stack(xs), *second),
        "norm_out": m.init_rms_norm(arch.dim),
        "proj_out": m.init_linear(k_out, arch.dim, arch.mel_dim),
    }


class UNetTStatics:
    def __init__(self, arch: ModelArch):
        assert arch.depth % 2 == 0
        self.arch = arch
        text_dim = arch.text_dim or arch.mel_dim
        self.text_freqs_cis = precompute_freqs_cis(text_dim, TEXT_PRECOMPUTE_MAX_POS)
        self.rope_angles = rope_freqs_interleaved(arch.dim_head, TEXT_PRECOMPUTE_MAX_POS)


def _scan_unroll(arch: ModelArch, backend: str) -> int:
    """Unroll factor for the two half-scans.

    Fully unrolled scans avoid the per-iteration weight copy out of the
    stacked arrays (see models/dit.py) but embed `unroll` copies of every
    Pallas payload in the compile request — with the fused RMSNorm kernel
    dispatched that is 4 payloads/block x 12 blocks/scan, which blew the
    remote-compile tunnel's request cap (HTTP 413). Override with
    F5TTS_UNETT_UNROLL=<k|auto>."""
    import os

    half = arch.depth // 2
    if arch.checkpoint_activations:
        return 1
    env = os.environ.get("F5TTS_UNETT_UNROLL", "auto")
    if env != "auto":
        return max(1, min(int(env), half))
    from f5tts_tpu.models.modules import _fused_rms_enabled

    if _fused_rms_enabled() and backend == "pallas" and jax.default_backend() == "tpu":
        return 1
    return half


def _block(blk, x, heads, rope, lengths, pe_attn_head, backend, skip=None,
           skip_type="concat", rope_tabs=None):
    if skip is not None:
        if skip_type == "concat":
            # block-partitioned matmul instead of concat+proj: x@W_top +
            # skip@W_bot is the same contraction without materializing the
            # [b, n, 2d] concat in HBM (~0.25 ms/ODE-step at dim 1024)
            w = blk["skip_proj"]["w"]
            d = x.shape[-1]
            x = (x @ w[:d].astype(x.dtype)) + (skip @ w[d:].astype(x.dtype))
            if "b" in blk["skip_proj"]:
                x = x + blk["skip_proj"]["b"].astype(x.dtype)
        elif skip_type == "add":
            x = x + skip
    h = m.rms_norm(blk["attn_norm"], x, eps=1e-8)
    x = m.self_attention(blk["attn"], h, heads, rope, lengths, pe_attn_head,
                         backend, rope_tabs=rope_tabs) + x
    h = m.rms_norm(blk["ff_norm"], x, eps=1e-8)
    x = m.feed_forward(blk["ff"], h) + x
    return x


def unett_forward(
    params: m.Params,
    statics: UNetTStatics,
    x: jax.Array,                  # [b, n, mel]
    cond: jax.Array,
    text: jax.Array,               # [b, nt]
    time: jax.Array,               # [b] or scalar
    lengths: Optional[jax.Array] = None,
    drop_audio_cond=False,
    drop_text=False,
    cfg_infer: bool = False,
    text_embeds: Optional[tuple] = None,
    dtype=jnp.float32,
    backend: str = "pallas",
) -> jax.Array:
    """Reference unett.py:244-307."""
    from f5tts_tpu.models.dit import input_embedding, text_embedding

    arch = statics.arch
    b, n, _ = x.shape
    if time.ndim == 0:
        time = jnp.broadcast_to(time, (b,))

    t_emb = m.timestep_embedding(params["time_embed"], time, dtype=dtype)
    x = x.astype(dtype)
    cond = cond.astype(dtype)

    if cfg_infer:
        if text_embeds is None:
            te_c = text_embedding(params["text_embed"], statics, text, n,
                                  drop_text=False, dtype=dtype)
            te_u = text_embedding(params["text_embed"], statics, text, n,
                                  drop_text=True, dtype=dtype)
        else:
            te_c, te_u = text_embeds
        h_c = input_embedding(params["input_embed"], x, cond, te_c, drop_audio_cond=False)
        h_u = input_embedding(params["input_embed"], x, cond, te_u, drop_audio_cond=True)
        h = jnp.concatenate([h_c, h_u], axis=0)
        t_emb = jnp.concatenate([t_emb, t_emb], axis=0)
        lengths = jnp.concatenate([lengths, lengths], axis=0) if lengths is not None else None
    else:
        if text_embeds is None:
            te = text_embedding(params["text_embed"], statics, text, n,
                                drop_text=drop_text, dtype=dtype)
        else:
            te = text_embeds[1] if drop_text else text_embeds[0]
        h = input_embedding(params["input_embed"], x, cond, te,
                            drop_audio_cond=drop_audio_cond)

    # prepend time token (unett.py:271-274). The +1 row breaks the Pallas
    # kernels' 128-alignment, which silently forced the XLA attention path
    # (full [b,h,n,n] scores in HBM) — pad up to the next 128 multiple and
    # mask the pad rows via lengths instead. Live-row outputs are identical
    # (pad keys are masked out of every softmax).
    h = jnp.concatenate([t_emb[:, None, :], h], axis=1)  # [b', n+1, dim]
    lengths_tok = (lengths + 1 if lengths is not None
                   else jnp.full((h.shape[0],), n + 1, jnp.int32))
    n_pad = ((n + 1 + 127) // 128) * 128
    h = jnp.pad(h, ((0, 0), (0, n_pad - n - 1), (0, 0)))
    rope = statics.rope_angles[:n_pad]

    rope_tabs = None
    if backend == "pallas" and jax.default_backend() == "tpu":
        from f5tts_tpu.ops.rope import rope_flat_tables

        rope_tabs = rope_flat_tables(rope, n_pad, arch.heads,
                                     arch.pe_attn_head, dtype=h.dtype)

    def first_body(carry, blk):
        out = _block(blk, carry, arch.heads, rope, lengths_tok,
                     arch.pe_attn_head, backend, rope_tabs=rope_tabs)
        return out, carry  # push pre-block state as the skip (reference pushes x)

    def second_body(carry, inputs):
        blk, skip = inputs
        out = _block(blk, carry, arch.heads, rope, lengths_tok,
                     arch.pe_attn_head, backend,
                     skip=skip, skip_type=arch.skip_connect_type,
                     rope_tabs=rope_tabs)
        return out, None

    half = arch.depth // 2
    unroll = _scan_unroll(arch, backend)
    if arch.checkpoint_activations:
        # per-block remat like the DiT (the skip stack itself is a scan
        # OUTPUT, so it is always saved — only intra-block activations are
        # rematerialized; arch.remat_policy picks what to keep)
        policy = m.remat_policy_for(arch)
        first_body = jax.checkpoint(first_body, policy=policy)
        second_body = jax.checkpoint(second_body, policy=policy)
    h, skips = jax.lax.scan(first_body, h, params["first_half"], unroll=unroll)

    # reverse the skip stack: last pushed is popped first
    skips = jnp.flip(skips, axis=0)

    h, _ = jax.lax.scan(second_body, h, (params["second_half"], skips),
                        unroll=unroll)

    # strip time token + alignment padding
    h = m.rms_norm(params["norm_out"], h, eps=1e-8)[:, 1:n + 1, :]
    return m.linear(params["proj_out"], h).astype(jnp.float32)

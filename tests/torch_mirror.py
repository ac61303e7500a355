"""A compact PyTorch mirror of the DiT forward math, used only in tests.

This re-implements (from the reference's documented behavior, not copied) the
same computation as f5tts_tpu.models.dit so the JAX implementation can be
cross-validated on identical weights: rope convention, AdaLN chunk order,
GRN statistics axis, text-embedding masking, conv padding, etc.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def t_linear(p, x):
    w = torch.from_numpy(np.asarray(p["w"]))
    y = x @ w
    if "b" in p:
        y = y + torch.from_numpy(np.asarray(p["b"]))
    return y


def t_conv1d(p, x, groups=1, dilation=1, padding=0):
    # x: [b, n, c] -> torch conv1d wants [b, c, n]; kernel (k, in/g, out) -> (out, in/g, k)
    w = torch.from_numpy(np.asarray(p["w"])).permute(2, 1, 0)
    b = torch.from_numpy(np.asarray(p["b"]))
    y = F.conv1d(x.transpose(1, 2), w, b, groups=groups, dilation=dilation, padding=padding)
    return y.transpose(1, 2)


def t_layer_norm(x, w=None, b=None, eps=1e-6):
    wt = torch.from_numpy(np.asarray(w)) if w is not None else None
    bt = torch.from_numpy(np.asarray(b)) if b is not None else None
    return F.layer_norm(x, (x.shape[-1],), wt, bt, eps)


def t_sinus_pos(x, dim, scale=1000.0):
    half = dim // 2
    freqs = torch.exp(torch.arange(half).float() * (-math.log(10000.0) / (half - 1)))
    ang = scale * x.unsqueeze(1) * freqs.unsqueeze(0)
    return torch.cat([ang.sin(), ang.cos()], dim=-1)


def t_timestep_embed(p, t):
    h = t_sinus_pos(t, 256)
    h = t_linear(p["mlp1"], h)
    h = F.silu(h)
    return t_linear(p["mlp2"], h)


def t_conv_pos_embed(p, x, mask=None, groups=16):
    if mask is not None:
        x = x.masked_fill(~mask.unsqueeze(-1), 0.0)
    x = t_conv1d(p["conv1"], x, groups=groups, padding=15)
    if mask is not None:
        x = x.masked_fill(~mask.unsqueeze(-1), 0.0)
    x = F.mish(x)
    x = t_conv1d(p["conv2"], x, groups=groups, padding=15)
    if mask is not None:
        x = x.masked_fill(~mask.unsqueeze(-1), 0.0)
    return F.mish(x)


def t_grn(p, x):
    gamma = torch.from_numpy(np.asarray(p["gamma"]))
    beta = torch.from_numpy(np.asarray(p["beta"]))
    gx = torch.norm(x, p=2, dim=1, keepdim=True)
    nx = gx / (gx.mean(dim=-1, keepdim=True) + 1e-6)
    return gamma * (x * nx) + beta + x


def t_convnext(p, x):
    residual = x
    h = t_conv1d(p["dwconv"], x, groups=x.shape[-1], padding=3)
    h = t_layer_norm(h, p["norm_w"], p["norm_b"])
    h = t_linear(p["pw1"], h)
    h = F.gelu(h)
    h = t_grn(p["grn"], h)
    h = t_linear(p["pw2"], h)
    return residual + h


def t_rope_angles(n, dim_head, theta=10000.0):
    freqs = 1.0 / (theta ** (torch.arange(0, dim_head, 2).double() / dim_head))
    ang = torch.outer(torch.arange(n).double(), freqs)
    return torch.repeat_interleave(ang, 2, dim=-1).float()  # [n, dim_head]


def t_rotate_half(x):
    x = x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return torch.stack([-x2, x1], dim=-1).reshape(*x1.shape[:-1], x1.shape[-1] * 2)


def t_apply_rope(x, angles):
    return x * angles.cos() + t_rotate_half(x) * angles.sin()


def t_attention(p, x, heads, angles, mask=None, pe_attn_head=None):
    b, n, _ = x.shape
    q, k, v = t_linear(p["to_q"], x), t_linear(p["to_k"], x), t_linear(p["to_v"], x)
    dh = q.shape[-1] // heads
    q = q.view(b, n, heads, dh).transpose(1, 2)
    k = k.view(b, n, heads, dh).transpose(1, 2)
    v = v.view(b, n, heads, dh).transpose(1, 2)
    if pe_attn_head is None:
        q = t_apply_rope(q, angles)
        k = t_apply_rope(k, angles)
    else:
        q[:, :pe_attn_head] = t_apply_rope(q[:, :pe_attn_head], angles)
        k[:, :pe_attn_head] = t_apply_rope(k[:, :pe_attn_head], angles)
    attn_mask = None
    if mask is not None:
        attn_mask = mask.unsqueeze(1).unsqueeze(1).expand(b, heads, n, n)
    o = F.scaled_dot_product_attention(q, k, v, attn_mask=attn_mask)
    o = o.transpose(1, 2).reshape(b, n, heads * dh)
    o = t_linear(p["to_out"], o)
    if mask is not None:
        o = o.masked_fill(~mask.unsqueeze(-1), 0.0)
    return o


def t_dit_block(p, x, t_emb, heads, angles, mask=None, pe_attn_head=None):
    mod = t_linear(p["attn_norm"]["linear"], F.silu(t_emb))
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = mod.chunk(6, dim=-1)
    norm = t_layer_norm(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
    attn_out = t_attention(p["attn"], norm, heads, angles, mask, pe_attn_head)
    x = x + gate_msa.unsqueeze(1) * attn_out
    norm = t_layer_norm(x) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
    ff = t_linear(p["ff"]["out"], F.gelu(t_linear(p["ff"]["in"], norm), approximate="tanh"))
    x = x + gate_mlp.unsqueeze(1) * ff
    return x


def t_freqs_cis(dim, end, theta=10000.0):
    freqs = 1.0 / (theta ** (torch.arange(0, dim, 2).double()[: dim // 2] / dim))
    ang = torch.outer(torch.arange(end).double(), freqs)
    return torch.cat([ang.cos(), ang.sin()], dim=-1).float()


def t_text_embedding(p, text, seq_len, mask_padding=True, drop_text=False,
                     lengths=None, conv_layers=0):
    text = text + 1
    nt = text.shape[1]
    if nt >= seq_len:
        text = text[:, :seq_len]
    else:
        text = F.pad(text, (0, seq_len - nt), value=0)
    valid_pos_mask = None
    if lengths is not None:
        seq_pos = torch.arange(seq_len).unsqueeze(0)
        valid_pos_mask = seq_pos < lengths.unsqueeze(1)
        text = text.masked_fill(~valid_pos_mask, 0)
    pad_mask = text == 0
    if drop_text:
        text = torch.zeros_like(text)
    emb_table = torch.from_numpy(np.asarray(p["embed"]["w"]))
    emb = emb_table[text]
    if valid_pos_mask is not None:
        emb = emb.masked_fill(~valid_pos_mask.unsqueeze(-1), 0.0)
    if conv_layers > 0:
        freqs = t_freqs_cis(emb.shape[-1], 8192)[:seq_len]
        if valid_pos_mask is not None:
            freqs = freqs.unsqueeze(0) * valid_pos_mask.unsqueeze(-1).float()
            emb = emb + freqs
        else:
            emb = emb + freqs.unsqueeze(0)
        if mask_padding:
            emb = emb.masked_fill(pad_mask.unsqueeze(-1), 0.0)
            for blk in p["blocks"]:
                emb = t_convnext(blk, emb)
                emb = emb.masked_fill(pad_mask.unsqueeze(-1), 0.0)
        else:
            for blk in p["blocks"]:
                emb = t_convnext(blk, emb)
    return emb


def t_rms_norm(p, x, eps=1e-8):
    w = torch.from_numpy(np.asarray(p["w"]))
    var = x.float().pow(2).mean(-1, keepdim=True)
    return x * torch.rsqrt(var + eps) * w


def t_unett_forward(params, arch, x, cond, text, time, lengths=None,
                    drop_audio_cond=False, drop_text=False):
    """UNetT (E2-TTS) forward mirror: prepended time token, RMSNorm pre-norm
    blocks, first-half skip push / second-half concat+proj pop (reference
    src/f5_tts/model/backbones/unett.py:244-307)."""
    import jax  # tree slicing of the stacked halves

    b, n, _ = x.shape
    if time.ndim == 0:
        time = time.repeat(b)
    t_emb = t_timestep_embed(params["time_embed"], time)
    te = t_text_embedding(params["text_embed"], text, n,
                          mask_padding=arch.text_mask_padding,
                          drop_text=drop_text, conv_layers=arch.conv_layers)
    c = torch.zeros_like(cond) if drop_audio_cond else cond
    h = t_linear(params["input_embed"]["proj"], torch.cat([x, c, te], dim=-1))
    h = t_conv_pos_embed(params["input_embed"]["conv_pos"], h) + h

    # prepend time token (unett.py:271-274); mask gets True at position 0
    h = torch.cat([t_emb.unsqueeze(1), h], dim=1)
    mask = None
    if lengths is not None:
        mask = torch.arange(n + 1).unsqueeze(0) < (lengths + 1).unsqueeze(1)
    angles = t_rope_angles(n + 1, arch.dim_head)

    half = arch.depth // 2

    def blk(stacked, i):
        return jax.tree.map(lambda a: np.asarray(a)[i], stacked)

    skips = []
    for i in range(half):
        p = blk(params["first_half"], i)
        skips.append(h)
        a = t_attention(p["attn"], t_rms_norm(p["attn_norm"], h), arch.heads,
                        angles, mask)
        h = a + h
        ffh = t_linear(p["ff"]["out"],
                       F.gelu(t_linear(p["ff"]["in"], t_rms_norm(p["ff_norm"], h)),
                              approximate="tanh"))
        h = ffh + h
    for i in range(half):
        p = blk(params["second_half"], i)
        skip = skips.pop()
        if arch.skip_connect_type == "concat":
            h = t_linear(p["skip_proj"], torch.cat([h, skip], dim=-1))
        elif arch.skip_connect_type == "add":
            h = h + skip
        a = t_attention(p["attn"], t_rms_norm(p["attn_norm"], h), arch.heads,
                        angles, mask)
        h = a + h
        ffh = t_linear(p["ff"]["out"],
                       F.gelu(t_linear(p["ff"]["in"], t_rms_norm(p["ff_norm"], h)),
                              approximate="tanh"))
        h = ffh + h

    h = t_rms_norm(params["norm_out"], h)[:, 1:, :]
    return t_linear(params["proj_out"], h)


# ---------------------------------------------------------------------------
# Full CFM sampler mirror (reference src/f5_tts/model/cfm.py:84-229)
# ---------------------------------------------------------------------------
# Independent of f5tts_tpu.utils: the EPSS index tables and the sway formula
# are transcribed straight from the reference (model/utils.py:205-218,
# cfm.py:211-216), so a wrong table or grid in utils.make_time_grid fails the
# mirror test rather than silently matching.

_EPSS_REF = {
    5: [0, 2, 4, 8, 16, 32],
    6: [0, 2, 4, 6, 8, 16, 32],
    7: [0, 2, 4, 6, 8, 16, 24, 32],
    10: [0, 2, 4, 6, 8, 12, 16, 20, 24, 28, 32],
    12: [0, 2, 4, 6, 8, 10, 12, 14, 16, 20, 24, 28, 32],
    16: [0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 20, 24, 28, 32],
}


def t_time_grid(steps, sway_sampling_coef=-1.0, use_epss=True, t_start=0.0):
    """EPSS (when available, from t=0) else linspace; then the sway shift
    t <- t + s*(cos(pi/2 t) - 1 + t). Reference cfm.py:203-216."""
    if t_start == 0.0 and use_epss and steps in _EPSS_REF:
        t = (1.0 / 32.0) * torch.tensor(_EPSS_REF[steps], dtype=torch.float64)
    else:
        t = torch.linspace(t_start, 1.0, steps + 1, dtype=torch.float64)
    if sway_sampling_coef is not None:
        t = t + sway_sampling_coef * (torch.cos(torch.pi / 2 * t) - 1 + t)
    return t.float()


def t_cfm_sample(forward, params, arch, cond, text, lens, duration, y0,
                 t_grid, cfg_strength=2.0, use_mask=True):
    """Euler CFM sampling loop in torch: prompt-cond masking, per-step CFG
    combine pred + (pred - null)*strength, Euler update, and final prompt
    re-imposition (reference cfm.py:145-153,162-191,218-223).

    `forward` is a backbone mirror like t_dit_forward; `y0` is the SAME noise
    tensor the jax side's make_noise produced (noise generation itself is
    PRNG-specific and is not part of the parity contract)."""
    b, n, d = cond.shape
    cond_mask = torch.arange(n).unsqueeze(0) < lens.unsqueeze(1)
    step_cond = torch.where(cond_mask.unsqueeze(-1), cond, torch.zeros(()))
    lengths = duration if use_mask else None
    x = y0.clone()
    steps = t_grid.shape[0] - 1
    for i in range(steps):
        t_cur = t_grid[i]
        dt = t_grid[i + 1] - t_grid[i]
        tvec = t_cur.repeat(b)
        pred = forward(params, arch, x, step_cond, text, tvec, lengths=lengths)
        null = forward(params, arch, x, step_cond, text, tvec, lengths=lengths,
                       drop_audio_cond=True, drop_text=True)
        v = pred + (pred - null) * cfg_strength
        x = x + dt * v
    return torch.where(cond_mask.unsqueeze(-1), cond, x)


def t_dit_forward(params, arch, x, cond, text, time, lengths=None,
                  drop_audio_cond=False, drop_text=False):
    b, n, _ = x.shape
    if time.ndim == 0:
        time = time.repeat(b)
    t_emb = t_timestep_embed(params["time_embed"], time)
    mask = None
    if lengths is not None:
        mask = torch.arange(n).unsqueeze(0) < lengths.unsqueeze(1)
    te = t_text_embedding(
        params["text_embed"], text, n, mask_padding=arch.text_mask_padding,
        drop_text=drop_text, lengths=lengths, conv_layers=arch.conv_layers,
    )
    c = torch.zeros_like(cond) if drop_audio_cond else cond
    h = t_linear(params["input_embed"]["proj"], torch.cat([x, c, te], dim=-1))
    h = t_conv_pos_embed(params["input_embed"]["conv_pos"], h, mask=mask) + h

    angles = t_rope_angles(n, arch.dim_head)
    blocks = params["blocks"]
    depth = arch.depth
    for i in range(depth):
        blk = {
            k: {
                kk: ({kkk: np.asarray(vvv)[i] for kkk, vvv in vv.items()}
                     if isinstance(vv, dict) else np.asarray(vv)[i])
                for kk, vv in v.items()
            }
            for k, v in blocks.items()
        }
        h = t_dit_block(blk, h, t_emb, arch.heads, angles, mask, arch.pe_attn_head)

    mod = t_linear(params["norm_out"]["linear"], F.silu(t_emb))
    scale, shift = mod.chunk(2, dim=-1)
    h = t_layer_norm(h) * (1 + scale)[:, None, :] + shift[:, None, :]
    return t_linear(params["proj_out"], h)

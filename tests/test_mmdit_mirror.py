"""MMDiT numerics cross-validated against an independent torch mirror."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from f5tts_tpu.config import ModelArch
from f5tts_tpu.models.cfm import BACKBONES

from tests.helpers import denseify
from tests.torch_mirror import (
    t_apply_rope,
    t_conv_pos_embed,
    t_freqs_cis,
    t_layer_norm,
    t_linear,
    t_rope_angles,
    t_timestep_embed,
)

ARCH = ModelArch(dim=64, depth=3, heads=2, dim_head=32, ff_mult=2, mel_dim=16,
                 text_num_embeds=30, text_mask_padding=True)


def t_mmdit_text_embed(p, text, mask_padding=True):
    text = text + 1
    pad_mask = text == 0
    emb_table = torch.from_numpy(np.asarray(p["embed"]["w"]))
    emb = emb_table[text]
    nt = text.shape[1]
    emb = emb + t_freqs_cis(emb.shape[-1], 1024)[:nt].unsqueeze(0)
    if mask_padding:
        emb = emb.masked_fill(pad_mask.unsqueeze(-1), 0.0)
    return emb


def t_joint_attention(p, x, c, heads, rope_a, rope_t, audio_kmask, text_kmask):
    b, n, _ = x.shape
    nt = c.shape[1]
    dh = np.asarray(p["to_q"]["w"]).shape[1] // heads

    def split(t):
        return t.view(b, -1, heads, dh).transpose(1, 2)

    q, k, v = (split(t_linear(p[nm], x)) for nm in ("to_q", "to_k", "to_v"))
    cq, ck, cv = (split(t_linear(p[nm], c)) for nm in ("to_q_c", "to_k_c", "to_v_c"))
    q, k = t_apply_rope(q, rope_a), t_apply_rope(k, rope_a)
    cq, ck = t_apply_rope(cq, rope_t), t_apply_rope(ck, rope_t)
    qj = torch.cat([q, cq], dim=2)
    kj = torch.cat([k, ck], dim=2)
    vj = torch.cat([v, cv], dim=2)
    kmask = torch.cat([
        audio_kmask if audio_kmask is not None else torch.ones(b, n, dtype=torch.bool),
        text_kmask, ], dim=1)
    attn_mask = kmask.unsqueeze(1).unsqueeze(1).expand(b, heads, n + nt, n + nt)
    o = F.scaled_dot_product_attention(qj, kj, vj, attn_mask=attn_mask)
    o = o.transpose(1, 2).reshape(b, n + nt, heads * dh)
    xo, co = o[:, :n], o[:, n:]
    xo = t_linear(p["to_out"], xo)
    if "to_out_c" in p:
        co = t_linear(p["to_out_c"], co)
        co = co.masked_fill(~text_kmask.unsqueeze(-1), 0.0)
    if audio_kmask is not None:
        xo = xo.masked_fill(~audio_kmask.unsqueeze(-1), 0.0)
    return xo, co


def t_mmdit_forward(params, arch, x, cond, text, time, lengths=None):
    b, n, _ = x.shape
    nt = text.shape[1]
    if time.ndim == 0:
        time = time.repeat(b)
    t_emb = t_timestep_embed(params["time_embed"], time)
    c_kmask = (text + 1) != 0
    audio_kmask = None
    if lengths is not None:
        audio_kmask = torch.arange(n).unsqueeze(0) < lengths.unsqueeze(1)

    c = t_mmdit_text_embed(params["text_embed"], text, arch.text_mask_padding)
    h = t_linear(params["audio_embed"]["linear"], torch.cat([x, cond], dim=-1))
    h = t_conv_pos_embed(params["audio_embed"]["conv_pos"], h) + h

    rope_a = t_rope_angles(n, arch.dim_head)
    rope_t = t_rope_angles(nt, arch.dim_head)

    def run_block(p, h, c, pre_only):
        mod_x = t_linear(p["attn_norm_x"]["linear"], F.silu(t_emb))
        xs1, xc1, xg1, xs2, xc2, xg2 = mod_x.chunk(6, dim=-1)
        norm_x = t_layer_norm(h) * (1 + xc1[:, None]) + xs1[:, None]
        if pre_only:
            mod_c = t_linear(p["attn_norm_c"]["linear"], F.silu(t_emb))
            scale, shift = mod_c.chunk(2, dim=-1)
            norm_c = t_layer_norm(c) * (1 + scale)[:, None] + shift[:, None]
        else:
            mod_c = t_linear(p["attn_norm_c"]["linear"], F.silu(t_emb))
            cs1, cc1, cg1, cs2, cc2, cg2 = mod_c.chunk(6, dim=-1)
            norm_c = t_layer_norm(c) * (1 + cc1[:, None]) + cs1[:, None]
        xo, co = t_joint_attention(p["attn"], norm_x, norm_c, arch.heads,
                                   rope_a, rope_t, audio_kmask, c_kmask)
        if pre_only:
            c_new = None
        else:
            c_new = c + cg1.unsqueeze(1) * co
            norm_c2 = t_layer_norm(c_new) * (1 + cc2[:, None]) + cs2[:, None]
            ffc = t_linear(p["ff_c"]["out"],
                           F.gelu(t_linear(p["ff_c"]["in"], norm_c2), approximate="tanh"))
            c_new = c_new + cg2.unsqueeze(1) * ffc
        h = h + xg1.unsqueeze(1) * xo
        norm_x2 = t_layer_norm(h) * (1 + xc2[:, None]) + xs2[:, None]
        ffx = t_linear(p["ff_x"]["out"],
                       F.gelu(t_linear(p["ff_x"]["in"], norm_x2), approximate="tanh"))
        h = h + xg2.unsqueeze(1) * ffx
        return h, c_new

    for i in range(arch.depth - 1):
        p = jax.tree.map(lambda a: np.asarray(a)[i], params["blocks"])
        h, c = run_block(p, h, c, pre_only=False)
    h, _ = run_block(jax.tree.map(np.asarray, params["last_block"]), h, c, pre_only=True)

    mod = t_linear(params["norm_out"]["linear"], F.silu(t_emb))
    scale, shift = mod.chunk(2, dim=-1)
    h = t_layer_norm(h) * (1 + scale)[:, None, :] + shift[:, None, :]
    return t_linear(params["proj_out"], h)


def test_mmdit_matches_torch_mirror():
    bd = BACKBONES["MMDiT"]
    params = denseify(bd.init(jax.random.PRNGKey(0), ARCH))
    statics = bd.statics_cls(ARCH)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 40, 16)).astype(np.float32)
    cond = rng.standard_normal((2, 40, 16)).astype(np.float32)
    text = rng.integers(0, 30, (2, 9)).astype(np.int32)
    text[1, 5:] = -1
    time = rng.uniform(0, 1, (2,)).astype(np.float32)
    lens = np.asarray([40, 30], np.int32)

    out_j = np.asarray(bd.forward(params, statics, jnp.asarray(x), jnp.asarray(cond),
                                  jnp.asarray(text), jnp.asarray(time),
                                  lengths=jnp.asarray(lens), backend="xla"))
    params_np = jax.tree.map(np.asarray, params)
    out_t = t_mmdit_forward(params_np, ARCH, torch.from_numpy(x), torch.from_numpy(cond),
                            torch.from_numpy(text).long(), torch.from_numpy(time),
                            lengths=torch.from_numpy(lens)).detach().numpy()
    np.testing.assert_allclose(out_j, out_t, atol=5e-4, rtol=1e-3)

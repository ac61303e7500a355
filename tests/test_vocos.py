"""Vocos vocoder numerics (torch-mirror cross-check) and checkpoint conversion."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from f5tts_tpu.compat import convert_f5tts_state_dict, convert_vocos_state_dict, extract_ema_state_dict
from f5tts_tpu.config import ModelArch
from f5tts_tpu.models import dit
from f5tts_tpu.vocoder.vocos import Vocos, VocosConfig, init_vocos

CFG = VocosConfig(input_channels=10, dim=32, intermediate_dim=64, num_layers=2,
                  n_fft=64, hop_length=16)


def _torch_vocos_state_dict(cfg: VocosConfig, seed=0):
    g = torch.Generator().manual_seed(seed)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.1

    sd = {
        "backbone.embed.weight": r(cfg.dim, cfg.input_channels, 7),
        "backbone.embed.bias": r(cfg.dim),
        "backbone.norm.weight": 1 + 0.1 * r(cfg.dim),
        "backbone.norm.bias": r(cfg.dim),
        "backbone.final_layer_norm.weight": 1 + 0.1 * r(cfg.dim),
        "backbone.final_layer_norm.bias": r(cfg.dim),
        "head.out.weight": r(cfg.n_fft + 2, cfg.dim),
        "head.out.bias": r(cfg.n_fft + 2),
    }
    for i in range(cfg.num_layers):
        p = f"backbone.convnext.{i}"
        sd.update({
            f"{p}.dwconv.weight": r(cfg.dim, 1, 7),
            f"{p}.dwconv.bias": r(cfg.dim),
            f"{p}.norm.weight": 1 + 0.1 * r(cfg.dim),
            f"{p}.norm.bias": r(cfg.dim),
            f"{p}.pwconv1.weight": r(cfg.intermediate_dim, cfg.dim),
            f"{p}.pwconv1.bias": r(cfg.intermediate_dim),
            f"{p}.pwconv2.weight": r(cfg.dim, cfg.intermediate_dim),
            f"{p}.pwconv2.bias": r(cfg.dim),
            f"{p}.gamma": torch.full((cfg.dim,), 0.5),
        })
    return sd


def _torch_vocos_decode(sd, cfg: VocosConfig, mel):
    """Reference-faithful torch implementation of the Vocos generator."""
    x = F.conv1d(mel, sd["backbone.embed.weight"], sd["backbone.embed.bias"], padding=3)
    x = x.transpose(1, 2)
    x = F.layer_norm(x, (cfg.dim,), sd["backbone.norm.weight"], sd["backbone.norm.bias"], 1e-6)
    for i in range(cfg.num_layers):
        p = f"backbone.convnext.{i}"
        res = x
        h = F.conv1d(x.transpose(1, 2), sd[f"{p}.dwconv.weight"], sd[f"{p}.dwconv.bias"],
                     padding=3, groups=cfg.dim).transpose(1, 2)
        h = F.layer_norm(h, (cfg.dim,), sd[f"{p}.norm.weight"], sd[f"{p}.norm.bias"], 1e-6)
        h = F.linear(h, sd[f"{p}.pwconv1.weight"], sd[f"{p}.pwconv1.bias"])
        h = F.gelu(h)
        h = F.linear(h, sd[f"{p}.pwconv2.weight"], sd[f"{p}.pwconv2.bias"])
        x = res + sd[f"{p}.gamma"] * h
    x = F.layer_norm(x, (cfg.dim,), sd["backbone.final_layer_norm.weight"],
                     sd["backbone.final_layer_norm.bias"], 1e-6)
    h = F.linear(x, sd["head.out.weight"], sd["head.out.bias"]).transpose(1, 2)
    mag, p = h.chunk(2, dim=1)
    mag = torch.clip(torch.exp(mag), max=1e2)
    spec = torch.complex(mag * torch.cos(p), mag * torch.sin(p))
    return torch.istft(spec, cfg.n_fft, cfg.hop_length, cfg.n_fft,
                       torch.hann_window(cfg.n_fft), center=True)


def test_vocos_matches_torch_mirror():
    sd = _torch_vocos_state_dict(CFG)
    params = convert_vocos_state_dict(sd, num_layers=CFG.num_layers)
    t = 24
    mel = torch.randn(2, CFG.input_channels, t, generator=torch.Generator().manual_seed(1))

    wav_t = _torch_vocos_decode(sd, CFG, mel).numpy()
    wav_j = np.asarray(Vocos(params, CFG).decode(jnp.asarray(mel.numpy())))

    assert wav_j.shape == wav_t.shape == (2, (t - 1) * CFG.hop_length)
    np.testing.assert_allclose(wav_j, wav_t, atol=1e-3, rtol=1e-3)


def test_vocos_init_decode_runs():
    params = init_vocos(jax.random.PRNGKey(0), CFG)
    mel = jnp.zeros((1, CFG.input_channels, 16))
    wav = Vocos(params, CFG).decode(mel)
    assert wav.shape == (1, 15 * CFG.hop_length)
    assert np.isfinite(np.asarray(wav)).all()


def test_f5tts_state_dict_conversion_matches_init_shapes():
    arch = ModelArch(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=16,
                     text_num_embeds=30, text_dim=32, conv_layers=2)
    ref = dit.init_dit(jax.random.PRNGKey(0), arch)

    g = torch.Generator().manual_seed(0)

    def r(*shape):
        return torch.randn(*shape, generator=g)

    t = "transformer"
    sd = {
        f"{t}.time_embed.time_mlp.0.weight": r(64, 256),
        f"{t}.time_embed.time_mlp.0.bias": r(64),
        f"{t}.time_embed.time_mlp.2.weight": r(64, 64),
        f"{t}.time_embed.time_mlp.2.bias": r(64),
        f"{t}.text_embed.text_embed.weight": r(31, 32),
        f"{t}.input_embed.proj.weight": r(64, 64),
        f"{t}.input_embed.proj.bias": r(64),
        f"{t}.input_embed.conv_pos_embed.conv1d.0.weight": r(64, 4, 31),
        f"{t}.input_embed.conv_pos_embed.conv1d.0.bias": r(64),
        f"{t}.input_embed.conv_pos_embed.conv1d.2.weight": r(64, 4, 31),
        f"{t}.input_embed.conv_pos_embed.conv1d.2.bias": r(64),
        f"{t}.norm_out.linear.weight": r(128, 64),
        f"{t}.norm_out.linear.bias": r(128),
        f"{t}.proj_out.weight": r(16, 64),
        f"{t}.proj_out.bias": r(16),
    }
    for i in range(2):
        p = f"{t}.text_embed.text_blocks.{i}"
        sd.update({
            f"{p}.dwconv.weight": r(32, 1, 7), f"{p}.dwconv.bias": r(32),
            f"{p}.norm.weight": r(32), f"{p}.norm.bias": r(32),
            f"{p}.pwconv1.weight": r(64, 32), f"{p}.pwconv1.bias": r(64),
            f"{p}.grn.gamma": r(1, 1, 64), f"{p}.grn.beta": r(1, 1, 64),
            f"{p}.pwconv2.weight": r(32, 64), f"{p}.pwconv2.bias": r(32),
        })
    for i in range(2):
        b = f"{t}.transformer_blocks.{i}"
        sd.update({
            f"{b}.attn_norm.linear.weight": r(384, 64), f"{b}.attn_norm.linear.bias": r(384),
            f"{b}.attn.to_q.weight": r(64, 64), f"{b}.attn.to_q.bias": r(64),
            f"{b}.attn.to_k.weight": r(64, 64), f"{b}.attn.to_k.bias": r(64),
            f"{b}.attn.to_v.weight": r(64, 64), f"{b}.attn.to_v.bias": r(64),
            f"{b}.attn.to_out.0.weight": r(64, 64), f"{b}.attn.to_out.0.bias": r(64),
            f"{b}.ff.ff.0.0.weight": r(128, 64), f"{b}.ff.ff.0.0.bias": r(128),
            f"{b}.ff.ff.2.weight": r(64, 128), f"{b}.ff.ff.2.bias": r(64),
        })

    params = convert_f5tts_state_dict(sd, arch)
    # identical tree structure and leaf shapes as a fresh init
    ref_shapes = jax.tree.map(lambda a: a.shape, ref)
    got_shapes = jax.tree.map(lambda a: a.shape, params)
    assert ref_shapes == got_shapes
    # spot-check a transpose: torch (out,in) -> ours (in,out)
    np.testing.assert_allclose(
        np.asarray(params["proj_out"]["w"]),
        sd[f"{t}.proj_out.weight"].numpy().T,
    )


def test_extract_ema_state_dict():
    ckpt = {
        "ema_model_state_dict": {
            "ema_model.transformer.proj_out.weight": 1,
            "initted": 2,
            "step": 3,
        }
    }
    sd = extract_ema_state_dict(ckpt)
    assert sd == {"transformer.proj_out.weight": 1}
    ckpt2 = {"model_state_dict": {"transformer.proj_out.weight": 4}}
    assert extract_ema_state_dict(ckpt2) == {"transformer.proj_out.weight": 4}

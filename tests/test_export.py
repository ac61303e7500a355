"""AOT export (StableHLO) roundtrip on a tiny model."""

import jax
import jax.numpy as jnp
import numpy as np

from f5tts_tpu.compat.export import export_sampler, export_vocoder, load_exported
from f5tts_tpu.config import ModelArch
from f5tts_tpu.models import cfm, dit
from f5tts_tpu.utils import make_time_grid
from f5tts_tpu.vocoder.vocos import VocosConfig, init_vocos, vocos_decode

ARCH = ModelArch(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, mel_dim=16,
                 text_num_embeds=30, text_dim=16, conv_layers=1)


def test_export_sampler_roundtrip(tmp_path):
    params = dit.init_dit(jax.random.PRNGKey(0), ARCH)
    statics = dit.DiTStatics(ARCH)
    path = str(tmp_path / "sampler.stablehlo")
    export_sampler(params, statics, path, batch=1, seq_frames=64, text_len=8,
                   nfe=2, dtype=jnp.float32)

    exported = load_exported(path)
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.standard_normal((1, 64, 16)), jnp.float32)
    text = jnp.asarray(rng.integers(0, 30, (1, 8)), jnp.int32)
    lens = jnp.asarray([16], jnp.int32)
    dur = jnp.asarray([64], jnp.int32)
    key = jax.random.PRNGKey(3)

    out = np.asarray(exported.call(params, cond, text, lens, dur, key))

    t_grid = make_time_grid(2, sway_sampling_coef=-1.0)
    ref = np.asarray(cfm.cfm_sample(params, statics, cond, text, lens, dur, t_grid,
                                    key=key, cfg_strength=2.0, dtype=jnp.float32,
                                    backend="xla"))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_export_vocoder_roundtrip(tmp_path):
    cfg = VocosConfig(input_channels=16, dim=32, intermediate_dim=64, num_layers=1,
                      n_fft=64, hop_length=16)
    voc = init_vocos(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "vocoder.stablehlo")
    export_vocoder(voc, path, batch=1, frames=20, cfg=cfg)

    exported = load_exported(path)
    mel = jnp.asarray(np.random.default_rng(1).standard_normal((1, 16, 20)), jnp.float32)
    out = np.asarray(exported.call(voc, mel))
    ref = np.asarray(vocos_decode(voc, mel, cfg))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def _lin_sd(sd, name, p):
    sd[f"{name}.weight"] = np.asarray(p["w"]).T
    if "b" in p:
        sd[f"{name}.bias"] = np.asarray(p["b"])


def _conv_sd(sd, name, p):
    sd[f"{name}.weight"] = np.transpose(np.asarray(p["w"]), (2, 1, 0))
    sd[f"{name}.bias"] = np.asarray(p["b"])


def _convnext_sd(sd, prefix, p):
    _conv_sd(sd, f"{prefix}.dwconv", p["dwconv"])
    sd[f"{prefix}.norm.weight"] = np.asarray(p["norm_w"])
    sd[f"{prefix}.norm.bias"] = np.asarray(p["norm_b"])
    _lin_sd(sd, f"{prefix}.pwconv1", p["pw1"])
    sd[f"{prefix}.grn.gamma"] = np.asarray(p["grn"]["gamma"]).reshape(1, 1, -1)
    sd[f"{prefix}.grn.beta"] = np.asarray(p["grn"]["beta"]).reshape(1, 1, -1)
    _lin_sd(sd, f"{prefix}.pwconv2", p["pw2"])


def test_unett_converter_roundtrip():
    """Build a reference-layout (torch key schema) state dict from a UNetT
    param tree, convert it back, and require exact tree equality — validates
    the key map against reference unett.py:149-186 (ModuleList indices:
    skip_proj 0, attn_norm 1, attn 2, ff_norm 3, ff 4)."""
    from f5tts_tpu.compat import convert_backbone_state_dict
    from f5tts_tpu.models.unett import init_unett

    arch = ModelArch(dim=64, depth=4, heads=2, dim_head=32, ff_mult=2,
                     mel_dim=16, text_num_embeds=30, text_dim=32,
                     conv_layers=2, skip_connect_type="concat")
    params = init_unett(jax.random.PRNGKey(0), arch)

    sd = {}
    t = "transformer"
    _lin_sd(sd, f"{t}.time_embed.time_mlp.0", params["time_embed"]["mlp1"])
    _lin_sd(sd, f"{t}.time_embed.time_mlp.2", params["time_embed"]["mlp2"])
    sd[f"{t}.text_embed.text_embed.weight"] = np.asarray(params["text_embed"]["embed"]["w"])
    for i, blk in enumerate(params["text_embed"]["blocks"]):
        _convnext_sd(sd, f"{t}.text_embed.text_blocks.{i}", blk)
    _lin_sd(sd, f"{t}.input_embed.proj", params["input_embed"]["proj"])
    _conv_sd(sd, f"{t}.input_embed.conv_pos_embed.conv1d.0",
             params["input_embed"]["conv_pos"]["conv1"])
    _conv_sd(sd, f"{t}.input_embed.conv_pos_embed.conv1d.2",
             params["input_embed"]["conv_pos"]["conv2"])
    sd[f"{t}.norm_out.weight"] = np.asarray(params["norm_out"]["w"])
    _lin_sd(sd, f"{t}.proj_out", params["proj_out"])

    half = arch.depth // 2
    for stack, offset in (("first_half", 0), ("second_half", half)):
        for j in range(half):
            blk = jax.tree.map(lambda a: a[j], params[stack])
            b = f"{t}.layers.{offset + j}"
            sd[f"{b}.1.weight"] = np.asarray(blk["attn_norm"]["w"])
            for nm in ("to_q", "to_k", "to_v"):
                _lin_sd(sd, f"{b}.2.{nm}", blk["attn"][nm])
            _lin_sd(sd, f"{b}.2.to_out.0", blk["attn"]["to_out"])
            sd[f"{b}.3.weight"] = np.asarray(blk["ff_norm"]["w"])
            _lin_sd(sd, f"{b}.4.ff.0.0", blk["ff"]["in"])
            _lin_sd(sd, f"{b}.4.ff.2", blk["ff"]["out"])
            if stack == "second_half":
                _lin_sd(sd, f"{b}.0", blk["skip_proj"])

    out = convert_backbone_state_dict(sd, arch, "UNetT")
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(out)[0]
    assert [k for k, _ in flat_a] == [k for k, _ in flat_b]
    for (ka, va), (_, vb) in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=1e-6,
                                   err_msg=str(ka))


def test_backbone_converter_dispatch_errors():
    import pytest

    from f5tts_tpu.compat import convert_backbone_state_dict

    with pytest.raises(NotImplementedError):
        convert_backbone_state_dict({}, ModelArch(), "MMDiT")

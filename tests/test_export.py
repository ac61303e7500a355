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

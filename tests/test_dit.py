"""DiT backbone numerics: smoke tests + cross-validation vs the torch mirror."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from f5tts_tpu.config import ModelArch
from f5tts_tpu.models import dit
from f5tts_tpu.models import modules as m

from tests.torch_mirror import t_dit_forward

SMALL = ModelArch(
    dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=16,
    text_num_embeds=30, text_dim=32, conv_layers=2, text_mask_padding=True,
)


@pytest.fixture(scope="module")
def small_model():
    params = dit.init_dit(jax.random.PRNGKey(0), SMALL)
    statics = dit.DiTStatics(SMALL)
    return params, statics


def _rand_inputs(b=2, n=64, nt=12, seed=0, arch=SMALL):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((b, n, arch.mel_dim)).astype(np.float32)
    cond = rng.standard_normal((b, n, arch.mel_dim)).astype(np.float32)
    text = rng.integers(0, arch.text_num_embeds, (b, nt)).astype(np.int32)
    text[1, 8:] = -1  # padded row
    time = rng.uniform(0, 1, (b,)).astype(np.float32)
    return x, cond, text, time


def test_dit_forward_shapes(small_model):
    params, statics = small_model
    x, cond, text, time = _rand_inputs()
    out = dit.dit_forward(params, statics, jnp.asarray(x), jnp.asarray(cond),
                          jnp.asarray(text), jnp.asarray(time), backend="xla")
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_dit_forward_cfg_packs_double_batch(small_model):
    params, statics = small_model
    x, cond, text, time = _rand_inputs()
    lens = jnp.asarray([64, 40], dtype=jnp.int32)
    out = dit.dit_forward(params, statics, jnp.asarray(x), jnp.asarray(cond),
                          jnp.asarray(text), jnp.asarray(time), lengths=lens,
                          cfg_infer=True, backend="xla")
    assert out.shape == (4, 64, 16)


def test_zero_init_gives_zero_output(small_model):
    """AdaLN-zero + zero proj_out => untrained model outputs exactly 0."""
    params, statics = small_model
    x, cond, text, time = _rand_inputs()
    out = dit.dit_forward(params, statics, jnp.asarray(x), jnp.asarray(cond),
                          jnp.asarray(text), jnp.asarray(time), backend="xla")
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def _denseify(params, key, scale=0.02):
    """Replace zero-init tensors with small random values so numerics tests
    exercise the full path."""
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(key, len(leaves))
    new = [
        jnp.where(jnp.all(l == 0), jax.random.normal(k, l.shape) * scale, l)
        if jnp.issubdtype(l.dtype, jnp.floating) else l
        for l, k in zip(leaves, keys)
    ]
    return jax.tree.unflatten(treedef, new)


@pytest.mark.parametrize("use_lengths", [False, True])
def test_dit_matches_torch_mirror(small_model, use_lengths):
    params, statics = small_model
    params = _denseify(params, jax.random.PRNGKey(7))
    x, cond, text, time = _rand_inputs()
    lens = jnp.asarray([64, 48], dtype=jnp.int32) if use_lengths else None

    out_j = np.asarray(dit.dit_forward(
        params, statics, jnp.asarray(x), jnp.asarray(cond),
        jnp.asarray(text), jnp.asarray(time), lengths=lens, backend="xla",
    ))

    params_np = jax.tree.map(np.asarray, params)
    out_t = t_dit_forward(
        params_np, SMALL,
        torch.from_numpy(x), torch.from_numpy(cond),
        torch.from_numpy(text).long(), torch.from_numpy(time),
        lengths=torch.tensor([64, 48]) if use_lengths else None,
    ).detach().numpy()

    np.testing.assert_allclose(out_j, out_t, atol=2e-4, rtol=1e-3)


def test_text_embedding_drop_text_array_matches_static(small_model):
    params, statics = small_model
    _, _, text, _ = _rand_inputs()
    te_static = dit.text_embedding(params["text_embed"], statics,
                                   jnp.asarray(text), 64, drop_text=True)
    te_array = dit.text_embedding(params["text_embed"], statics,
                                  jnp.asarray(text), 64,
                                  drop_text=jnp.asarray([True, True]))
    np.testing.assert_allclose(np.asarray(te_static), np.asarray(te_array), atol=1e-6)


def test_param_count_base_config():
    """F5TTS_v1_Base must land at ~335.8M params (reference
    scripts/count_params_gflops.py:21-25)."""
    from f5tts_tpu.config import get_preset

    arch = get_preset("F5TTS_v1_Base", arch=None).arch if False else None
    from f5tts_tpu.config import PRESETS

    base = PRESETS["F5TTS_v1_Base"]
    arch = base.arch
    # vocab 2545 for Emilia pinyin
    import dataclasses
    arch = dataclasses.replace(arch, text_num_embeds=2545)
    params = dit.init_dit(jax.random.PRNGKey(0), arch)
    n = m.count_params(params)
    assert 330e6 < n < 342e6, f"got {n/1e6:.1f}M params"

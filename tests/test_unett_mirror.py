"""UNetT numerics cross-validated against an independent torch mirror."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from f5tts_tpu.config import ModelArch
from f5tts_tpu.models.cfm import BACKBONES

from tests.helpers import denseify
from tests.torch_mirror import t_unett_forward

ARCH = ModelArch(dim=64, depth=4, heads=2, dim_head=32, ff_mult=2, mel_dim=16,
                 text_num_embeds=30, text_dim=32, conv_layers=2,
                 text_mask_padding=True, skip_connect_type="concat")


def test_unett_matches_torch_mirror():
    bd = BACKBONES["UNetT"]
    params = denseify(bd.init(jax.random.PRNGKey(0), ARCH))
    statics = bd.statics_cls(ARCH)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 48, 16)).astype(np.float32)
    cond = rng.standard_normal((2, 48, 16)).astype(np.float32)
    text = rng.integers(0, 30, (2, 10)).astype(np.int32)
    text[1, 6:] = -1
    time = rng.uniform(0, 1, (2,)).astype(np.float32)

    out_j = np.asarray(bd.forward(params, statics, jnp.asarray(x), jnp.asarray(cond),
                                  jnp.asarray(text), jnp.asarray(time), backend="xla"))

    # UNetT text embedding uses the 4096-position table; the mirror's
    # t_text_embedding uses an 8192 table — identical values for n << 4096.
    params_np = jax.tree.map(np.asarray, params)
    out_t = t_unett_forward(params_np, ARCH, torch.from_numpy(x), torch.from_numpy(cond),
                            torch.from_numpy(text).long(), torch.from_numpy(time)).detach().numpy()

    np.testing.assert_allclose(out_j, out_t, atol=5e-4, rtol=1e-3)


def test_unett_seq_extra_tokens_and_aligned_width():
    """UNetT declares its prepended time token (BackboneDef.seq_extra_tokens;
    duration_bucket subtracts it so the padded sequence stays 128-aligned)
    and the odd-width forward runs with the right shape. Exact width
    invariance does NOT hold for UNetT — its text embedding takes no
    per-sample lengths (reference unett.py:54-84), so the ConvNeXt GRN's
    global stats see the padded width — hence shape/finiteness only."""
    bd = BACKBONES["UNetT"]
    assert bd.seq_extra_tokens == 1
    assert BACKBONES["DiT"].seq_extra_tokens == 0
    assert BACKBONES["MMDiT"].seq_extra_tokens == 0

    params = denseify(bd.init(jax.random.PRNGKey(0), ARCH))
    statics = bd.statics_cls(ARCH)
    rng = np.random.default_rng(1)
    n = 47  # 47 + 1 time token = 48, a sublane-aligned width
    x = rng.standard_normal((1, n, 16)).astype(np.float32)
    cond = rng.standard_normal((1, n, 16)).astype(np.float32)
    text = rng.integers(0, 30, (1, 10)).astype(np.int32)
    time = rng.uniform(0, 1, (1,)).astype(np.float32)
    lengths = jnp.asarray([40], jnp.int32)

    out = np.asarray(bd.forward(
        params, statics, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(text),
        jnp.asarray(time), lengths=lengths, backend="xla"))
    assert out.shape == (1, n, 16)
    assert np.isfinite(out).all()

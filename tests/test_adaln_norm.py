"""Fused AdaLN-norm Pallas kernel vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from f5tts_tpu.models import modules as m
from f5tts_tpu.ops import adaln_norm as AN


def _setup(b=2, n=32, d=128, dtype=jnp.float32, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = (jax.random.normal(k1, (b, n, d)) * 3 + 0.5).astype(dtype)
    scale = (jax.random.normal(k2, (b, d)) * 0.2).astype(dtype)
    shift = (jax.random.normal(k3, (b, d)) * 0.2).astype(dtype)
    return x, scale, shift


def test_ref_matches_layer_norm_chain():
    x, scale, shift = _setup()
    got = AN.adaln_norm_ref(x, scale, shift)
    want = m.layer_norm(x) * (1.0 + scale[:, None, :]) + shift[:, None, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_pallas_sum_stats_matches_ref():
    x, scale, shift = _setup()
    got = AN._adaln_norm_fwd_pallas(x, scale, shift, 1e-6, use_dot_stats=False)
    want = AN.adaln_norm_ref(x, scale, shift)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pallas_dot_stats_matches_ref():
    x, scale, shift = _setup()
    got = AN._adaln_norm_fwd_pallas(x, scale, shift, 1e-6, use_dot_stats=True)
    want = AN.adaln_norm_ref(x, scale, shift)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pallas_uneven_block_fallback():
    # n not divisible by block_n collapses to one whole-sequence block
    x, scale, shift = _setup(n=40)
    got = AN._adaln_norm_fwd_pallas(x, scale, shift, 1e-6, block_n=256,
                                    use_dot_stats=False)
    want = AN.adaln_norm_ref(x, scale, shift)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_custom_vjp_matches_ref_grads():
    x, scale, shift = _setup(n=16)

    def loss_kernel(x, s, sh):
        return jnp.sum(jnp.sin(AN.adaln_norm(x, s, sh)))

    def loss_ref(x, s, sh):
        return jnp.sum(jnp.sin(AN.adaln_norm_ref(x, s, sh)))

    g_k = jax.grad(loss_kernel, argnums=(0, 1, 2))(x, scale, shift)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, shift)
    for a, b in zip(g_k, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_rms_norm_fused_kernel_interpret():
    """Fused RMSNorm kernel (interpret) vs the XLA reference, odd block split."""
    from f5tts_tpu.ops.adaln_norm import _rms_norm_fwd_pallas, rms_norm_ref

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 512, 256)) * 1.7, jnp.float32)
    w = jnp.asarray(rng.standard_normal(256), jnp.float32)
    out = _rms_norm_fwd_pallas(x, w, 1e-8)
    ref = rms_norm_ref(x, w, 1e-8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_rms_norm_fused_gradients_match_ref():
    from f5tts_tpu.ops.adaln_norm import rms_norm_fused, rms_norm_ref

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((2, 64, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal(128), jnp.float32)
    g1 = jax.grad(lambda a, b: jnp.sum(rms_norm_fused(a, b) ** 2), argnums=(0, 1))(x, w)
    g2 = jax.grad(lambda a, b: jnp.sum(rms_norm_ref(a, b) ** 2), argnums=(0, 1))(x, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)

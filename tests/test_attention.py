"""Flash-attention kernel vs the XLA reference (Pallas interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f5tts_tpu.ops.attention import flash_attention, mha_reference


def _qkv(b=2, h=2, n=256, d=64, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    return mk(), mk(), mk()


def test_flash_matches_reference_dense():
    q, k, v = _qkv()
    lengths = jnp.asarray([256, 256], jnp.int32)
    out = np.asarray(flash_attention(q, k, v, lengths))
    ref = np.asarray(mha_reference(q, k, v, lengths))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_flash_matches_reference_varlen():
    q, k, v = _qkv(n=512)
    lengths = jnp.asarray([300, 130], jnp.int32)
    out = np.asarray(flash_attention(q, k, v, lengths))
    ref = np.asarray(mha_reference(q, k, v, lengths))
    # valid query rows must match; padded query rows are free (zeroed upstream)
    for bi, ln in enumerate([300, 130]):
        np.testing.assert_allclose(out[bi, :, :ln], ref[bi, :, :ln], atol=2e-5, rtol=1e-4)
    # dead q blocks are written as zeros
    np.testing.assert_allclose(out[1, :, 256:], 0.0, atol=1e-6)


def test_flash_gradient_flows():
    q, k, v = _qkv(n=128)
    lengths = jnp.asarray([128, 100], jnp.int32)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, lengths) ** 2)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, lengths) ** 2)

    rq, rk, rv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    # gradients only meaningful for valid positions; padded-query outputs differ
    # (ref rows are uniform-softmax garbage, flash rows are zero) so compare
    # only the valid region of batch row 1
    np.testing.assert_allclose(np.asarray(gq[0]), np.asarray(rq[0]), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gq[1, :, :100]), np.asarray(rq[1, :, :100]),
                               atol=1e-4, rtol=1e-3)

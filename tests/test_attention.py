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
    # valid query rows must match; padded query rows are unspecified (they are
    # re-zeroed downstream by the output mask in self_attention) but must be
    # finite so they cannot poison the masked output
    for bi, ln in enumerate([300, 130]):
        np.testing.assert_allclose(out[bi, :, :ln], ref[bi, :, :ln], atol=2e-5, rtol=1e-4)
    assert np.isfinite(out).all()


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
    # dk/dv: batch row 0 is fully valid -> its cotangent flow matches exactly;
    # row 1's padded-query ref rows contribute garbage in the ref, so compare
    # only row 0 for k/v
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(rk[0]), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gv[0]), np.asarray(rv[0]), atol=1e-4, rtol=1e-3)


def test_flash_bwd_dkv_varlen_row():
    """k/v grads for a masked row: compare against a per-row dense reference
    truncated to the valid length (exact semantics, no padded-row garbage)."""
    rng = np.random.default_rng(3)
    n, ln = 256, 180
    q, k, v = (jnp.asarray(rng.standard_normal((1, 2, n, 64)), jnp.float32)
               for _ in range(3))
    lengths = jnp.asarray([ln], jnp.int32)

    def loss(q, k, v):
        out = flash_attention(q, k, v, lengths)
        return jnp.sum(out[:, :, :ln] ** 2)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    qt, kt, vt = q[:, :, :ln], k[:, :, :ln], v[:, :, :ln]

    def loss_t(qt, kt, vt):
        return jnp.sum(mha_reference(qt, kt, vt) ** 2)

    rq, rk, rv = jax.grad(loss_t, argnums=(0, 1, 2))(qt, kt, vt)
    np.testing.assert_allclose(np.asarray(gq[:, :, :ln]), np.asarray(rq), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gk[:, :, :ln]), np.asarray(rk), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gv[:, :, :ln]), np.asarray(rv), atol=1e-4, rtol=1e-3)
    # grads for padded kv positions are zero
    np.testing.assert_allclose(np.asarray(gk[:, :, ln:]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gv[:, :, ln:]), 0.0, atol=1e-6)


def test_flash_loop_variant_matches_reference(monkeypatch):
    """Force the online-softmax loop kernel (used for n > 2048) at small n."""
    import f5tts_tpu.ops.attention as A

    monkeypatch.setattr(A, "SINGLE_PASS_MAX_N", 0)
    q, k, v = _qkv(n=512, seed=9)
    lengths = jnp.asarray([512, 300], jnp.int32)
    out = np.asarray(A.flash_attention(q, k, v, lengths))
    ref = np.asarray(A.mha_reference(q, k, v, lengths))
    for bi, ln in enumerate([512, 300]):
        np.testing.assert_allclose(out[bi, :, :ln], ref[bi, :, :ln], atol=2e-5, rtol=1e-4)

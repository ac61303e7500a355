"""Mask helpers and bucketing utilities."""

import jax
import jax.numpy as jnp
import numpy as np

from f5tts_tpu.utils import (
    duration_bucket,
    lens_to_mask,
    mask_from_frac_lengths,
    mask_from_start_end_indices,
    maybe_masked_mean,
    round_up,
)


def test_lens_to_mask():
    m = np.asarray(lens_to_mask(jnp.asarray([2, 0, 4]), 4))
    np.testing.assert_array_equal(m, [[1, 1, 0, 0], [0, 0, 0, 0], [1, 1, 1, 1]])


def test_mask_from_start_end():
    m = np.asarray(mask_from_start_end_indices(jnp.asarray([1]), jnp.asarray([3]), 5))
    np.testing.assert_array_equal(m, [[0, 1, 1, 0, 0]])


def test_mask_from_frac_lengths_bounds():
    key = jax.random.PRNGKey(0)
    seq_len = jnp.asarray([100, 50])
    frac = jnp.asarray([0.7, 1.0])
    rand = jax.random.uniform(key, (2,))
    m = np.asarray(mask_from_frac_lengths(seq_len, frac, rand, 100))
    assert m[0].sum() == 70
    assert m[1, :50].sum() == 50 and m[1, 50:].sum() == 0
    # span is contiguous
    idx = np.where(m[0])[0]
    assert (np.diff(idx) == 1).all()


def test_maybe_masked_mean():
    t = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 4, 3))
    mask = jnp.asarray([[True, True, False, False]])
    out = np.asarray(maybe_masked_mean(t, mask))
    np.testing.assert_allclose(out[0], [1.5, 2.5, 3.5])
    out_nomask = np.asarray(maybe_masked_mean(t))
    np.testing.assert_allclose(out_nomask[0], [4.5, 5.5, 6.5])


def test_round_up_and_bucket():
    assert round_up(1, 256) == 256
    assert round_up(256, 256) == 256
    assert round_up(257, 256) == 512
    assert duration_bucket(100) == 256
    assert duration_bucket(300) == 512
    assert duration_bucket(99999, max_frames=4096) == 4096
    assert duration_bucket(100, bucket_size=128, max_frames=512) == 128
    # UNetT time token: width + extra stays bucket-aligned (128-lane tiles)
    assert duration_bucket(100, extra_tokens=1) == 255
    assert duration_bucket(1023, extra_tokens=1) == 1023
    assert duration_bucket(1024, extra_tokens=1) == 1279
    assert duration_bucket(99999, max_frames=4096, extra_tokens=1) == 4096
    # width always covers the requested frames
    for f in (1, 255, 256, 257, 1023, 1024, 4095, 4096):
        assert duration_bucket(f, extra_tokens=1) >= f

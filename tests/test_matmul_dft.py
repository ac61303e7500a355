"""Matmul-DFT paths (the TPU/MXU formulation) vs the FFT paths."""

import jax.numpy as jnp
import numpy as np

from f5tts_tpu.ops.stft import (
    hann_window,
    irdft_frames,
    istft_center,
    rdft_magnitude,
    stft_magnitude,
)


def test_rdft_magnitude_matches_rfft():
    rng = np.random.default_rng(0)
    frames = rng.standard_normal((3, 7, 256)).astype(np.float32)
    mag_m = np.asarray(rdft_magnitude(jnp.asarray(frames), 256))
    mag_f = np.abs(np.fft.rfft(frames, axis=-1))
    np.testing.assert_allclose(mag_m, mag_f, atol=2e-3, rtol=1e-4)


def test_irdft_matches_irfft():
    rng = np.random.default_rng(1)
    spec = np.fft.rfft(rng.standard_normal((2, 5, 256)), axis=-1)
    time_m = np.asarray(irdft_frames(jnp.asarray(spec.real, jnp.float32),
                                     jnp.asarray(spec.imag, jnp.float32), 256))
    time_f = np.fft.irfft(spec, n=256, axis=-1)
    np.testing.assert_allclose(time_m, time_f, atol=1e-4, rtol=1e-4)


def test_stft_magnitude_matmul_flag_equivalence():
    rng = np.random.default_rng(2)
    wav = (rng.standard_normal((1, 4096)) * 0.1).astype(np.float32)
    w = hann_window(1024)
    a = np.asarray(stft_magnitude(jnp.asarray(wav), w, use_matmul_dft=False))
    b = np.asarray(stft_magnitude(jnp.asarray(wav), w, use_matmul_dft=True))
    np.testing.assert_allclose(a, b, atol=5e-3, rtol=1e-3)


def test_istft_matmul_flag_equivalence():
    rng = np.random.default_rng(3)
    real = rng.standard_normal((1, 513, 12)).astype(np.float32)
    imag = rng.standard_normal((1, 513, 12)).astype(np.float32)
    imag[:, 0] = imag[:, -1] = 0
    w = hann_window(1024)
    a = np.asarray(istft_center(jnp.asarray(real), jnp.asarray(imag), w,
                                use_matmul_dft=False))
    b = np.asarray(istft_center(jnp.asarray(real), jnp.asarray(imag), w,
                                use_matmul_dft=True))
    np.testing.assert_allclose(a, b, atol=1e-3, rtol=1e-3)

"""STFT / iSTFT / mel front-end numerics, cross-checked against torch (CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from f5tts_tpu.config import MelConfig
from f5tts_tpu.ops.mel import MelFrontend, mel_filterbank
from f5tts_tpu.ops.stft import frame_signal, hann_window, istft_center, stft_magnitude


def _rand_wav(b=2, l=24000, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((b, l)) * 0.1).astype(np.float32)


def test_hann_window_matches_torch():
    w = np.asarray(hann_window(1024))
    wt = torch.hann_window(1024).numpy()
    np.testing.assert_allclose(w, wt, atol=1e-6)


def test_frame_signal_shapes_and_values():
    x = np.arange(32, dtype=np.float32)[None, :]
    frames = np.asarray(frame_signal(jnp.asarray(x), 8, 4))
    assert frames.shape == (1, 7, 8)
    np.testing.assert_array_equal(frames[0, 0], np.arange(8))
    np.testing.assert_array_equal(frames[0, 2], np.arange(8, 16))


def test_stft_magnitude_matches_torch_center():
    wav = _rand_wav()
    w = hann_window(1024)
    mag = np.asarray(stft_magnitude(jnp.asarray(wav), w, n_fft=1024, hop=256, win_length=1024))
    spec_t = torch.stft(
        torch.from_numpy(wav), 1024, hop_length=256, win_length=1024,
        window=torch.hann_window(1024), center=True, pad_mode="reflect",
        normalized=False, onesided=True, return_complex=True,
    ).abs().numpy()
    assert mag.shape == spec_t.shape
    # f32 FFT implementations differ at ~1e-2 absolute on O(100) magnitudes
    np.testing.assert_allclose(mag, spec_t, atol=3e-2, rtol=1e-2)


def test_istft_matches_torch():
    rng = np.random.default_rng(1)
    t = 40
    real = rng.standard_normal((2, 513, t)).astype(np.float32)
    imag = rng.standard_normal((2, 513, t)).astype(np.float32)
    # make DC/Nyquist real so the complex spectrum is a valid rfft output
    imag[:, 0, :] = 0.0
    imag[:, -1, :] = 0.0
    w = hann_window(1024)
    wav = np.asarray(istft_center(jnp.asarray(real), jnp.asarray(imag), w, n_fft=1024, hop=256))
    spec_t = torch.complex(torch.from_numpy(real), torch.from_numpy(imag))
    wav_t = torch.istft(
        spec_t, 1024, hop_length=256, win_length=1024,
        window=torch.hann_window(1024), center=True,
    ).numpy()
    assert wav.shape == wav_t.shape
    np.testing.assert_allclose(wav, wav_t, atol=1e-3, rtol=1e-3)


def test_stft_istft_roundtrip():
    wav = _rand_wav(b=1, l=256 * 50)
    w = hann_window(1024)
    x = jnp.asarray(wav)
    frames_pad = jnp.pad(x, ((0, 0), (512, 512)), mode="reflect")
    fr = frame_signal(frames_pad, 1024, 256) * w[None, None, :]
    spec = jnp.fft.rfft(fr, axis=-1)
    spec = jnp.transpose(spec, (0, 2, 1))
    rec = np.asarray(istft_center(jnp.real(spec), jnp.imag(spec), w))
    n = rec.shape[-1]
    # interior must reconstruct the original signal
    np.testing.assert_allclose(rec[:, 1024:n - 1024], wav[:, 1024:n - 1024], atol=1e-4)


def test_mel_filterbank_htk_properties():
    fb = mel_filterbank(24000, 1024, 100, mel_scale="htk", norm=None)
    assert fb.shape == (100, 513)
    assert (fb >= 0).all()
    # every filter is nonzero somewhere; peaks ascend in frequency
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all()
    assert fb.sum() > 0


def test_mel_filterbank_slaney_norm():
    fb = mel_filterbank(24000, 1024, 100, mel_scale="slaney", norm="slaney")
    fb_unnorm = mel_filterbank(24000, 1024, 100, mel_scale="slaney", norm=None)
    # slaney norm scales each filter by 2/bandwidth: sums must differ per filter
    ratio = fb.sum(axis=1) / np.clip(fb_unnorm.sum(axis=1), 1e-9, None)
    # 2/bandwidth: constant in the linear (<1 kHz) region, strictly decreasing
    # in the log region
    assert (np.diff(ratio) <= 1e-7).all()
    assert ratio[-1] < ratio[0] * 0.5


@pytest.mark.parametrize("variant", ["vocos", "bigvgan"])
def test_mel_frontend_shapes(variant):
    cfg = MelConfig(mel_spec_type=variant)
    fe = MelFrontend(cfg)
    wav = jnp.asarray(_rand_wav(b=2, l=256 * 100))
    mel = fe(wav)
    assert mel.shape[0] == 2 and mel.shape[1] == 100
    expected_t = 100 + 1 if variant == "vocos" else 100
    assert mel.shape[2] == expected_t
    assert np.isfinite(np.asarray(mel)).all()
    assert np.asarray(mel).min() >= np.log(1e-5) - 1e-6


def test_mel_frontend_matches_torch_vocos_pipeline():
    """Full vocos mel vs a torch.stft + numpy-filterbank pipeline (same fb)."""
    cfg = MelConfig()
    fe = MelFrontend(cfg)
    wav = _rand_wav(b=2, l=24000)
    mel_j = np.asarray(fe(jnp.asarray(wav)))

    spec_t = torch.stft(
        torch.from_numpy(wav), 1024, hop_length=256, win_length=1024,
        window=torch.hann_window(1024), center=True, pad_mode="reflect",
        normalized=False, onesided=True, return_complex=True,
    ).abs()
    fb = torch.from_numpy(np.asarray(fe.fb))
    mel_t = torch.log(torch.clamp(fb @ spec_t, min=1e-5)).numpy()
    np.testing.assert_allclose(mel_j, mel_t, atol=2e-2, rtol=1e-2)


def test_dft_matrix_cache_survives_multiple_traces():
    # regression: the lru-cached DFT matrices once memoized jnp values staged
    # into the FIRST jit trace; any later trace at a new shape crashed with
    # UnexpectedTracerError (second serving compile bucket)
    import jax
    import jax.numpy as jnp
    from f5tts_tpu.ops.stft import istft_center

    def run(n_frames):
        f = 1024 // 2 + 1
        real = jnp.ones((1, n_frames, f), jnp.float32) * 0.01
        imag = jnp.zeros((1, n_frames, f), jnp.float32)
        win = hann_window(1024)
        out = jax.jit(lambda r, i: istft_center(
            r, i, win, n_fft=1024, hop=256))(real, imag)
        return out.shape

    run(8)
    run(16)  # second distinct-shape trace must not raise

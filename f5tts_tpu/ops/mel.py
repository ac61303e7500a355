"""Log-mel front end.

Two variants, matching the reference numerics:

- "vocos": torchaudio.transforms.MelSpectrogram semantics — center=True
  reflect-pad STFT, power=1 (magnitude), HTK mel scale, no filterbank norm —
  then log(clamp(1e-5)) (reference: src/f5_tts/model/modules.py:80-109).
- "bigvgan": manual reflect pad (n_fft-hop)//2, center=False STFT,
  sqrt(|.|^2 + 1e-9), librosa Slaney mel scale with slaney area-norm, then
  log(clamp(1e-5)) (reference: src/f5_tts/model/modules.py:35-77).

Filterbanks are built in numpy from the standard triangular-filter formulas
(HTK: m = 2595 log10(1 + f/700); Slaney: linear below 1 kHz, log above) —
no librosa/torchaudio dependency.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from f5tts_tpu.config import MelConfig
from f5tts_tpu.ops.stft import hann_window, stft_magnitude, stft_magnitude_eps


# ---------------------------------------------------------------------------
# Mel scales
# ---------------------------------------------------------------------------

def _hz_to_mel_htk(f: np.ndarray) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _mel_to_hz_htk(m: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, f / f_sp)


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), f_sp * m)


def _triangular_filterbank(all_freqs: np.ndarray, f_pts: np.ndarray) -> np.ndarray:
    """[n_freqs], [n_mels+2] -> [n_freqs, n_mels] triangular filters."""
    f_diff = f_pts[1:] - f_pts[:-1]  # [n_mels+1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels+2]
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    return np.maximum(0.0, np.minimum(down, up))


def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
    mel_scale: str = "htk",  # "htk" (torchaudio default) | "slaney" (librosa default)
    norm: str | None = None,  # None | "slaney"
) -> np.ndarray:
    """[n_mels, n_fft//2+1] filterbank matrix."""
    if fmax is None:
        fmax = sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    if mel_scale == "htk":
        m_min, m_max = _hz_to_mel_htk(np.asarray([fmin, fmax], dtype=np.float64))
        m_pts = np.linspace(m_min, m_max, n_mels + 2)
        f_pts = _mel_to_hz_htk(m_pts)
    elif mel_scale == "slaney":
        m_min, m_max = _hz_to_mel_slaney(np.asarray([fmin, fmax]))
        m_pts = np.linspace(m_min, m_max, n_mels + 2)
        f_pts = _mel_to_hz_slaney(m_pts)
    else:
        raise ValueError(f"unknown mel_scale: {mel_scale}")

    fb = _triangular_filterbank(all_freqs, f_pts)  # [n_freqs, n_mels]
    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]
    return fb.T.astype(np.float32)  # [n_mels, n_freqs]


# ---------------------------------------------------------------------------
# Front end
# ---------------------------------------------------------------------------

class MelFrontend:
    """wav [b, l] -> log-mel [b, n_mels, t]. Constants precomputed once."""

    def __init__(self, cfg: MelConfig | None = None, **kwargs):
        self.cfg = cfg or MelConfig(**kwargs)
        c = self.cfg
        self.window = hann_window(c.win_length)
        if c.mel_spec_type == "vocos":
            fb = mel_filterbank(
                c.target_sample_rate, c.n_fft, c.n_mel_channels,
                mel_scale="htk", norm=None,
            )
        elif c.mel_spec_type == "bigvgan":
            fb = mel_filterbank(
                c.target_sample_rate, c.n_fft, c.n_mel_channels,
                mel_scale="slaney", norm="slaney",
            )
        else:
            raise ValueError(f"unknown mel_spec_type: {c.mel_spec_type}")
        self.fb = jnp.asarray(fb)
        self._fn = partial(
            _log_mel,
            n_fft=c.n_fft,
            hop=c.hop_length,
            win_length=c.win_length,
            variant=c.mel_spec_type,
        )

    def __call__(self, wav: jax.Array) -> jax.Array:
        if wav.ndim == 1:
            wav = wav[None, :]
        return self._fn(wav, self.window, self.fb)

    def frames_to_mel_bnd(self, wav: jax.Array) -> jax.Array:
        """wav -> [b, t, n_mels] (sequence-major layout used by the CFM model)."""
        return jnp.transpose(self(wav), (0, 2, 1))


@partial(jax.jit, static_argnames=("n_fft", "hop", "win_length", "variant"))
def _log_mel(wav, window, fb, *, n_fft, hop, win_length, variant):
    if variant == "vocos":
        mag = stft_magnitude(wav, window, n_fft=n_fft, hop=hop, win_length=win_length, center=True)
    else:
        mag = stft_magnitude_eps(wav, window, n_fft=n_fft, hop=hop, pad=(n_fft - hop) // 2)
    mel = jnp.einsum("mf,bft->bmt", fb, mag)
    return jnp.log(jnp.clip(mel, 1e-5, None))

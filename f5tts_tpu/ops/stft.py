"""STFT / iSTFT ops, TPU-first.

Framing is done with `lax.conv_general_dilated_patches` (a strided-patch
extraction XLA lowers to efficient data movement), the DFT via `jnp.fft.rfft`
(XLA FFT), and the iSTFT overlap-add via R = n_fft//hop shifted adds — no
scatter, fully static shapes.

Behavioral parity targets:
- vocos mel path: torch.stft(center=True, pad_mode="reflect", onesided),
  used by torchaudio MelSpectrogram (reference: src/f5_tts/model/modules.py:80-109)
- bigvgan mel path: manual reflect pad (n_fft-hop)/2 then center=False stft
  (reference: src/f5_tts/model/modules.py:35-77)
- iSTFT head of Vocos: torch.istft(center=True) semantics; the conv/matmul
  formulation mirrors the reference's TensorRT-exportable conv-STFT
  (reference: src/f5_tts/runtime/triton_trtllm/scripts/conv_stft.py:101-234).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window (torch.hann_window default, periodic=True)."""
    n = np.arange(win_length, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    return jnp.asarray(w, dtype=dtype)


def _reflect_pad_1d(x: jax.Array, pad: int) -> jax.Array:
    """Reflect-pad the last axis (no edge duplication, same as torch 'reflect')."""
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")


def frame_signal(x: jax.Array, frame_length: int, hop: int) -> jax.Array:
    """[b, l] -> [b, t, frame_length] strided frames; t = (l - frame_length)//hop + 1."""
    b, l = x.shape
    # conv_general_dilated_patches on NCW input returns [b, frame_length, t]
    patches = jax.lax.conv_general_dilated_patches(
        x[:, None, :],
        filter_shape=(frame_length,),
        window_strides=(hop,),
        padding="VALID",
    )
    return jnp.transpose(patches, (0, 2, 1))


@partial(jax.jit, static_argnames=("n_fft", "hop", "win_length", "center", "use_matmul_dft"))
def stft_magnitude(
    x: jax.Array,
    window: jax.Array,
    n_fft: int = 1024,
    hop: int = 256,
    win_length: int = 1024,
    center: bool = True,
    use_matmul_dft: Optional[bool] = None,
) -> jax.Array:
    """Magnitude STFT of [b, l] -> [b, n_fft//2+1, t].

    center=True: reflect-pad n_fft//2 both sides (torch.stft center semantics).
    On TPU the rDFT runs as a matmul (MXU); elsewhere jnp.fft.rfft.
    """
    assert win_length == n_fft, "win_length < n_fft padding not implemented"
    if use_matmul_dft is None:
        use_matmul_dft = jax.default_backend() == "tpu"
    if center:
        x = _reflect_pad_1d(x, n_fft // 2)
    frames = frame_signal(x, n_fft, hop)  # [b, t, n_fft]
    frames = frames * window[None, None, :]
    if use_matmul_dft:
        mag = rdft_magnitude(frames, n_fft)
    else:
        mag = jnp.abs(jnp.fft.rfft(frames.astype(jnp.float32), n=n_fft, axis=-1))
    return jnp.transpose(mag, (0, 2, 1))


def stft_magnitude_eps(
    x: jax.Array,
    window: jax.Array,
    n_fft: int = 1024,
    hop: int = 256,
    pad: int | None = None,
    eps: float = 1e-9,
) -> jax.Array:
    """BigVGAN-style magnitude: manual reflect pad then center=False STFT,
    sqrt(re^2 + im^2 + eps) (reference: modules.py:57-72)."""
    if pad is None:
        pad = (n_fft - hop) // 2
    x = _reflect_pad_1d(x, pad)
    frames = frame_signal(x, n_fft, hop)
    frames = frames * window[None, None, :]
    if jax.default_backend() == "tpu":
        cos_m, sin_m = _rdft_matrices(n_fft)
        f32 = frames.astype(jnp.float32)
        re, im = f32 @ cos_m, f32 @ sin_m
        mag = jnp.sqrt(re * re + im * im + eps)
    else:
        spec = jnp.fft.rfft(frames.astype(jnp.float32), n=n_fft, axis=-1)
        mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + eps)
    return jnp.transpose(mag, (0, 2, 1))


# ---------------------------------------------------------------------------
# DFT as matmul (MXU path — XLA TPU FFT is emulated; a 1024-point rDFT is a
# [*, 1024] @ [1024, 513] matmul, exactly the reference's TensorRT conv-STFT
# formulation, conv_stft.py:101-144)
# ---------------------------------------------------------------------------

import functools as _functools


@_functools.lru_cache(maxsize=8)
def _rdft_matrices(n_fft: int):
    """(cos [n_fft, F], sin [n_fft, F]) with F = n_fft//2+1 for forward rDFT.

    Returns NUMPY arrays — see the _irdft_matrices note (cached jnp values
    become stale tracers across jit traces)."""
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(n_fft)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


@_functools.lru_cache(maxsize=8)
def _irdft_matrices(n_fft: int):
    """(Cr [F, n_fft], Ci [F, n_fft]): time = Re @ Cr + Im @ Ci (exact irfft).

    NOTE: returns NUMPY arrays on purpose. Returning jnp arrays from an
    lru_cache is a trace-leak bomb: the first call under jit memoizes values
    staged into THAT trace, and every later trace (a second serving compile
    bucket) dies with UnexpectedTracerError. numpy constants are embedded
    per-compile instead."""
    f = n_fft // 2 + 1
    k = np.arange(f)
    n = np.arange(n_fft)
    ang = 2.0 * np.pi * np.outer(k, n) / n_fft
    scale = np.full((f, 1), 2.0 / n_fft)
    scale[0] = 1.0 / n_fft
    scale[-1] = 1.0 / n_fft
    cr = np.cos(ang) * scale
    ci = -np.sin(ang) * scale
    ci[0] = 0.0
    ci[-1] = 0.0
    return cr.astype(np.float32), ci.astype(np.float32)


def rdft_magnitude(frames: jax.Array, n_fft: int) -> jax.Array:
    """[..., n_fft] windowed frames -> [..., n_fft//2+1] |rDFT| via matmul."""
    cos_m, sin_m = _rdft_matrices(n_fft)
    f32 = frames.astype(jnp.float32)
    re = f32 @ cos_m
    im = f32 @ sin_m
    return jnp.sqrt(re * re + im * im + 1e-12)


def irdft_frames(real: jax.Array, imag: jax.Array, n_fft: int) -> jax.Array:
    """[..., F] complex halves -> [..., n_fft] time frames via matmul."""
    cr, ci = _irdft_matrices(n_fft)
    return real.astype(jnp.float32) @ cr + imag.astype(jnp.float32) @ ci


def overlap_add(frames: jax.Array, hop: int) -> jax.Array:
    """[b, t, frame_length] -> [b, (t-1)*hop + frame_length] via R shifted adds.

    Requires frame_length % hop == 0. Static-shape, scatter-free: each of the
    R = frame_length//hop chunks contributes one shifted, contiguous add.
    """
    b, t, frame_length = frames.shape
    assert frame_length % hop == 0
    r = frame_length // hop
    out_len = (t - 1) * hop + frame_length
    chunks = frames.reshape(b, t, r, hop)
    out = jnp.zeros((b, out_len), dtype=frames.dtype)
    for j in range(r):
        seg = chunks[:, :, j, :].reshape(b, t * hop)
        out = out.at[:, j * hop : j * hop + t * hop].add(seg)
    return out


@partial(jax.jit, static_argnames=("n_fft", "hop", "use_matmul_dft"))
def istft_center(
    real: jax.Array,
    imag: jax.Array,
    window: jax.Array,
    n_fft: int = 1024,
    hop: int = 256,
    use_matmul_dft: Optional[bool] = None,
) -> jax.Array:
    """Inverse STFT with center=True trimming (torch.istft semantics).

    real/imag: [b, n_fft//2+1, t] -> wav [b, t*hop] (center-trimmed, then the
    reference conv-stft pipeline's effective output length for hop-aligned t).

    On TPU the inverse rDFT runs as a matmul on the MXU (XLA FFT is emulated
    there); elsewhere jnp.fft.irfft.

    Normalizes by the squared-window overlap envelope; envelope positions below
    1e-11 are left unnormalized (torch uses the same guard).
    """
    if use_matmul_dft is None:
        use_matmul_dft = jax.default_backend() == "tpu"
    if use_matmul_dft:
        frames = irdft_frames(jnp.transpose(real, (0, 2, 1)),
                              jnp.transpose(imag, (0, 2, 1)), n_fft)
    else:
        spec = jax.lax.complex(real.astype(jnp.float32), imag.astype(jnp.float32))
        spec = jnp.transpose(spec, (0, 2, 1))  # [b, t, f]
        frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)  # [b, t, n_fft]
    frames = frames * window[None, None, :]
    wav = overlap_add(frames, hop)  # [b, (t-1)*hop + n_fft]

    t = real.shape[-1]
    win_sq = (window * window)[None, None, :]
    env = overlap_add(jnp.broadcast_to(win_sq, (1, t, n_fft)), hop)[0]
    wav = jnp.where(env > 1e-11, wav / jnp.where(env > 1e-11, env, 1.0), wav)

    half = n_fft // 2
    return wav[:, half : half + (t - 1) * hop]

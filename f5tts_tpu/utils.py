"""Tensor/mask helpers and ODE time-grid utilities.

Behavioral parity targets (reference file:line):
- lens_to_mask / mask_from_frac_lengths / mask_from_start_end_indices:
  src/f5_tts/model/utils.py:53-77
- get_epss_timesteps (Empirically Pruned Step Sampling grids):
  src/f5_tts/model/utils.py:205-218
- sway sampling shift: src/f5_tts/model/cfm.py:215-216

All functions are shape-static and jit-friendly.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def lens_to_mask(lens: jax.Array, length: int) -> jax.Array:
    """[b] lengths -> [b, length] bool mask. Static `length` (jit-safe)."""
    seq = jnp.arange(length, dtype=lens.dtype)
    return seq[None, :] < lens[:, None]


def mask_from_start_end_indices(start: jax.Array, end: jax.Array, length: int) -> jax.Array:
    """[b] start/end -> [b, length] bool mask for [start, end) spans."""
    seq = jnp.arange(length, dtype=start.dtype)
    return (seq[None, :] >= start[:, None]) & (seq[None, :] < end[:, None])


def mask_from_frac_lengths(
    seq_len: jax.Array, frac_lengths: jax.Array, rand: jax.Array, length: int
) -> jax.Array:
    """Random span mask covering `frac_lengths` of each sample's valid length.

    `rand` ~ U[0,1) [b] picks the span start (reference: utils.py:69-77).
    """
    lengths = (frac_lengths * seq_len.astype(frac_lengths.dtype)).astype(jnp.int32)
    max_start = seq_len.astype(jnp.int32) - lengths
    start = jnp.clip((max_start.astype(frac_lengths.dtype) * rand).astype(jnp.int32), 0, None)
    end = start + lengths
    return mask_from_start_end_indices(start, end, length)


def maybe_masked_mean(t: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """[b n d] -> [b d] mean over valid positions (reference: utils.py:80-88)."""
    if mask is None:
        return t.mean(axis=1)
    t = jnp.where(mask[:, :, None], t, 0.0)
    num = t.sum(axis=1)
    den = jnp.clip(mask.astype(t.dtype).sum(axis=1), 1.0, None)
    return num / den[:, None]


# ---------------------------------------------------------------------------
# ODE time grids
# ---------------------------------------------------------------------------

# Empirically Pruned Step Sampling: indices into a 32-step uniform grid
# (reference: utils.py:205-218; dt = 1/32).
_EPSS_TIMESTEPS: dict[int, list[int]] = {
    5: [0, 2, 4, 8, 16, 32],
    6: [0, 2, 4, 6, 8, 16, 32],
    7: [0, 2, 4, 6, 8, 16, 24, 32],
    10: [0, 2, 4, 6, 8, 12, 16, 20, 24, 28, 32],
    12: [0, 2, 4, 6, 8, 10, 12, 14, 16, 20, 24, 28, 32],
    16: [0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 20, 24, 28, 32],
}


def get_epss_timesteps(n: int, dtype=jnp.float32) -> jax.Array:
    """EPSS pruned grid for n steps, or uniform linspace if no table entry."""
    idx = _EPSS_TIMESTEPS.get(n)
    if idx is None:
        return jnp.linspace(0.0, 1.0, n + 1, dtype=dtype)
    return (np.asarray(idx, dtype=np.float64) / 32.0).astype(dtype)


def sway_timesteps(t: jax.Array, sway_sampling_coef: float | None) -> jax.Array:
    """t <- t + s * (cos(pi/2 * t) - 1 + t) (reference: cfm.py:215-216)."""
    if sway_sampling_coef is None:
        return t
    return t + sway_sampling_coef * (jnp.cos(math.pi / 2.0 * t) - 1.0 + t)


def make_time_grid(
    steps: int,
    sway_sampling_coef: float | None = None,
    use_epss: bool = True,
    t_start: float = 0.0,
    dtype=jnp.float32,
) -> jax.Array:
    """Full sampling time grid: EPSS (or linspace) + sway shift.

    Reference: cfm.py:203-216 — EPSS only applies when starting at t=0.
    Returns [steps+1] array of t values in [0, 1].
    """
    if t_start == 0.0 and use_epss:
        t = get_epss_timesteps(steps, dtype=dtype)
    else:
        t = jnp.linspace(t_start, 1.0, steps + 1, dtype=dtype)
    return sway_timesteps(t, sway_sampling_coef)


# ---------------------------------------------------------------------------
# Shape bucketing (compile-cache discipline for variable-length inputs)
# ---------------------------------------------------------------------------

def round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


def duration_bucket(n_frames: int, bucket_size: int = 256, max_frames: int = 4096,
                    extra_tokens: int = 0) -> int:
    """Round a frame count up to a compile bucket boundary.

    The reference re-runs dynamic shapes per request; under jit we pad to a
    small set of bucket shapes so XLA compiles once per bucket.

    `extra_tokens`: sequence tokens the backbone prepends on top of the mel
    frames (UNetT's time token, BackboneDef.seq_extra_tokens). The returned
    mel width keeps width+extra_tokens a bucket_size multiple, so the
    transformer sequence stays 128-lane aligned — otherwise the +1 token
    forces every block up to the next 128-row tile (n=1024 -> 1152 rows,
    +12.5% on every matmul and attention pass).
    """
    w = min(max(round_up(n_frames + extra_tokens, bucket_size), bucket_size),
            max_frames + extra_tokens)
    return w - extra_tokens


# ---------------------------------------------------------------------------
# Persistent compilation cache
# ---------------------------------------------------------------------------

def enable_compilation_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a stable on-disk dir.

    Remote compiles of the big fused sampler graphs take 2-11 min through
    the axon tunnel and are NOT cached across processes by default; with
    this enabled, a fresh process deserializes the executable in seconds.
    Used by bench.py, the serving front ends (warmup sweep), and rtf_bench.

    Disable with F5TTS_COMPILE_CACHE=0; override the location with
    F5TTS_COMPILE_CACHE=/some/dir. Returns the directory in use (or None).
    """
    import os

    env = os.environ.get("F5TTS_COMPILE_CACHE", "")
    if env == "0":
        return None
    path = env or path or os.path.join(os.getcwd(), ".jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path

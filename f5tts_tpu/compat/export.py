"""AOT model export via jax.export (StableHLO).

The reference's deployment story builds TensorRT engines offline
(runtime/triton_trtllm/run.sh stage 1-2: convert_checkpoint + trtllm-build,
plus the ONNX/TRT vocoder export in scripts/export_vocoder_to_onnx.py). The
TPU-native equivalent is ahead-of-time lowering of the jitted functions to
StableHLO: portable artifacts that any compatible runtime (or a later jax
version) can deserialize and execute without retracing Python.

Exports:
- `export_sampler(...)`: the full NFE-scan CFM sampler at a fixed
  (batch, seq_bucket, text_len, nfe) signature
- `export_vocoder(...)`: the Vocos decode at a fixed (batch, frames)

Artifacts are single files written with `serialize()`; load with
`jax.export.deserialize(path.read_bytes()).call(*args)`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def export_sampler(
    params: dict,
    statics,
    out_path: str,
    batch: int = 1,
    seq_frames: int = 1024,
    text_len: int = 256,
    nfe: int = 16,
    sway_sampling_coef: float = -1.0,
    cfg_strength: float = 2.0,
    dtype=jnp.bfloat16,
    backend: str = "xla",   # exported artifacts avoid pallas custom calls by default
    backbone=None,
) -> str:
    from f5tts_tpu.models import cfm
    from f5tts_tpu.utils import make_time_grid

    t_grid = make_time_grid(nfe, sway_sampling_coef=sway_sampling_coef)

    def fn(params, cond, text, lens, duration, key):
        return cfm.cfm_sample(
            params, statics, cond, text, lens, duration, t_grid,
            key=key, cfg_strength=cfg_strength, dtype=dtype, backend=backend,
            backbone=backbone,
        )

    mel_dim = statics.arch.mel_dim
    args = (
        params,
        jnp.zeros((batch, seq_frames, mel_dim), jnp.float32),
        jnp.zeros((batch, text_len), jnp.int32),
        jnp.zeros((batch,), jnp.int32),
        jnp.full((batch,), seq_frames, jnp.int32),
        jax.random.PRNGKey(0),
    )
    exported = jax.export.export(jax.jit(fn))(*args)
    data = exported.serialize()
    with open(out_path, "wb") as f:
        f.write(data)
    return out_path


def export_vocoder(voc_params: dict, out_path: str, batch: int = 1,
                   frames: int = 1024, cfg=None) -> str:
    from f5tts_tpu.vocoder.vocos import VocosConfig, vocos_decode

    cfg = cfg or VocosConfig()

    def fn(params, mel):
        return vocos_decode(params, mel, cfg)

    args = (voc_params, jnp.zeros((batch, cfg.input_channels, frames), jnp.float32))
    exported = jax.export.export(jax.jit(fn))(*args)
    with open(out_path, "wb") as f:
        f.write(exported.serialize())
    return out_path


def load_exported(path: str):
    """Deserialize an exported artifact; returns an object with `.call(*args)`."""
    with open(path, "rb") as f:
        return jax.export.deserialize(bytearray(f.read()))

"""Vocos vocoder: mel [b, 100, t] -> waveform [b, (t-1)*hop].

TPU-native rebuild of the charactr/vocos-mel-24khz generator the reference
loads from HF hub (reference: src/f5_tts/infer/utils_infer.py:106-129) and
exports to TensorRT via a conv-STFT formulation (reference:
src/f5_tts/runtime/triton_trtllm/scripts/export_vocoder_to_onnx.py:45-75,
conv_stft.py:193-234). Architecture (public Vocos):

- embed Conv1d(100 -> dim, k=7)
- num_layers x ConvNeXt-v1 blocks (dwconv k7 / LN / pw 1536 / GELU / pw /
  layer-scale gamma) + final LayerNorm
- ISTFT head: Linear(dim -> n_fft + 2) -> split (log-mag | phase) ->
  clip(exp(mag), 1e2) -> complex spec -> iSTFT (center), hann window.

The iSTFT is the overlap-add kernel from f5tts_tpu.ops.stft (scatter-free,
R=4 shifted adds), validated against torch.istft.

Weight import from the HF `pytorch_model.bin` uses
f5tts_tpu.compat.torch_import.convert_vocos_state_dict.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from f5tts_tpu.models import modules as m
from f5tts_tpu.ops.stft import hann_window, istft_center


@dataclass(frozen=True)
class VocosConfig:
    input_channels: int = 100
    dim: int = 512
    intermediate_dim: int = 1536
    num_layers: int = 8
    n_fft: int = 1024
    hop_length: int = 256


def init_vocos(key, cfg: VocosConfig = VocosConfig()) -> m.Params:
    ks = jax.random.split(key, cfg.num_layers + 3)
    layer_scale = 1.0 / cfg.num_layers
    blocks = []
    for i in range(cfg.num_layers):
        k1, k2, k3 = jax.random.split(ks[i], 3)
        blocks.append({
            "dwconv": m.init_conv1d(k1, cfg.dim, cfg.dim, 7, groups=cfg.dim),
            "norm_w": jnp.ones((cfg.dim,), jnp.float32),
            "norm_b": jnp.zeros((cfg.dim,), jnp.float32),
            "pw1": m.init_linear(k2, cfg.dim, cfg.intermediate_dim),
            "pw2": m.init_linear(k3, cfg.intermediate_dim, cfg.dim),
            "gamma": jnp.full((cfg.dim,), layer_scale, jnp.float32),
        })
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "embed": m.init_conv1d(ks[-3], cfg.input_channels, cfg.dim, 7),
        "in_norm_w": jnp.ones((cfg.dim,), jnp.float32),
        "in_norm_b": jnp.zeros((cfg.dim,), jnp.float32),
        "blocks": stacked,
        "final_norm_w": jnp.ones((cfg.dim,), jnp.float32),
        "final_norm_b": jnp.zeros((cfg.dim,), jnp.float32),
        "head": m.init_linear(ks[-2], cfg.dim, cfg.n_fft + 2),
    }


def _convnext_v1_block(p: m.Params, x: jax.Array) -> jax.Array:
    residual = x
    h = m.depthwise_conv1d(p["dwconv"], x, padding=3)
    h = m.layer_norm(h, p["norm_w"], p["norm_b"], eps=1e-6)
    h = m.linear(p["pw1"], h)
    h = m.gelu_exact(h)
    h = m.linear(p["pw2"], h)
    return residual + p["gamma"].astype(h.dtype) * h


@partial(jax.jit, static_argnames=("n_fft", "hop", "dtype"))
def _vocos_apply(params, mel_bnd, window, n_fft, hop, dtype=jnp.float32):
    x = mel_bnd.astype(dtype)                       # [b, t, 100]
    x = m.conv1d(params["embed"], x, padding=3)      # [b, t, dim]
    x = m.layer_norm(x, params["in_norm_w"], params["in_norm_b"], eps=1e-6)

    def body(carry, blk):
        return _convnext_v1_block(blk, carry), None

    num_layers = jax.tree.leaves(params["blocks"])[0].shape[0]
    x, _ = jax.lax.scan(body, x, params["blocks"], unroll=num_layers)
    x = m.layer_norm(x, params["final_norm_w"], params["final_norm_b"], eps=1e-6)

    h = m.linear(params["head"], x).astype(jnp.float32)  # [b, t, n_fft+2]
    mag, phase = jnp.split(h, 2, axis=-1)                # [b, t, n_fft//2+1] each
    mag = jnp.clip(jnp.exp(mag), None, 1e2)
    real = mag * jnp.cos(phase)
    imag = mag * jnp.sin(phase)
    real = jnp.transpose(real, (0, 2, 1))                # [b, f, t]
    imag = jnp.transpose(imag, (0, 2, 1))
    return istft_center(real, imag, window, n_fft=n_fft, hop=hop)


class Vocos:
    """Callable vocoder: mel [b, n_mels, t] (log-mel) -> wav [b, (t-1)*hop]."""

    def __init__(self, params: m.Params, cfg: VocosConfig = VocosConfig(),
                 dtype=jnp.float32):
        self.params = params
        self.cfg = cfg
        self.dtype = dtype
        self.window = hann_window(cfg.n_fft)

    def decode(self, mel: jax.Array) -> jax.Array:
        mel_bnd = jnp.transpose(mel, (0, 2, 1))
        return _vocos_apply(self.params, mel_bnd, self.window,
                            self.cfg.n_fft, self.cfg.hop_length, self.dtype)

    def __call__(self, mel: jax.Array) -> jax.Array:
        return self.decode(mel)


def vocos_decode(params: m.Params, mel: jax.Array, cfg: VocosConfig = VocosConfig(),
                 dtype=jnp.float32) -> jax.Array:
    """Functional one-shot decode; mel is [b, n_mels, t]."""
    window = hann_window(cfg.n_fft)
    return _vocos_apply(params, jnp.transpose(mel, (0, 2, 1)), window,
                        cfg.n_fft, cfg.hop_length, dtype)

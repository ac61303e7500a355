"""BigVGAN v2 generator: mel [b, 100, t] -> waveform [b, t*256].

JAX rebuild of the nvidia/bigvgan_v2_24khz_100band_256x generator the
reference loads as a git submodule (reference: src/f5_tts/infer/
utils_infer.py:130-144; forced fp32 per :273, CUDA kernel disabled :137-140).

Architecture (BigVGAN paper / public config for the 24 kHz 100-band 256x
model): conv_pre(100->1536, k7) -> 6 x [ConvTranspose1d upsample (rates
4,4,2,2,2,2; kernels 8,8,4,4,4,4) -> 3 parallel AMP blocks (kernels 3,7,11;
dilations 1,3,5) averaged] -> anti-aliased snakebeta -> conv_post(k7, no
bias) -> clamp [-1, 1].

- snakebeta (log scale): x + 1/(exp(beta)+eps) * sin^2(exp(alpha)·x)
- every activation is anti-aliased: 2x kaiser-sinc upsample -> snake ->
  2x kaiser-sinc downsample (alias-free-torch formulation)

Weight-normed checkpoints are folded at conversion time (the reference calls
remove_weight_norm before inference). Runs in float32 (matching the
reference's BigVGAN dtype policy).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class BigVGANConfig:
    num_mels: int = 100
    upsample_rates: tuple = (4, 4, 2, 2, 2, 2)
    upsample_kernel_sizes: tuple = (8, 8, 4, 4, 4, 4)
    upsample_initial_channel: int = 1536
    resblock_kernel_sizes: tuple = (3, 7, 11)
    resblock_dilation_sizes: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    use_bias_at_final: bool = False
    use_tanh_at_final: bool = False
    snake_logscale: bool = True


# ---------------------------------------------------------------------------
# Kaiser-windowed sinc anti-aliasing filters (alias-free-torch formulation)
# ---------------------------------------------------------------------------

def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size)
    f = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    f = f / f.sum()
    return f.astype(np.float32)


def _upsample2_filter(ratio: int = 2) -> np.ndarray:
    kernel_size = int(6 * ratio // 2) * 2
    return kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)


def _downsample2_filter(ratio: int = 2) -> np.ndarray:
    kernel_size = int(6 * ratio // 2) * 2
    return kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)


def upsample1d_2x(x: jax.Array, filt: jax.Array) -> jax.Array:
    """[b, c, t] -> [b, c, 2t] anti-aliased (replicate pad + conv_transpose)."""
    b, c, t = x.shape
    ratio = 2
    kernel_size = filt.shape[0]
    stride = ratio
    pad = kernel_size // ratio - 1
    pad_left = pad * stride + (kernel_size - stride) // 2
    pad_right = pad * stride + (kernel_size - stride + 1) // 2
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)), mode="edge")
    k = jnp.broadcast_to(filt[None, None, :], (c, 1, kernel_size))
    y = ratio * _grouped_conv_transpose(x, k, stride)
    return y[:, :, pad_left : y.shape[2] - pad_right]


def _grouped_conv_transpose(x: jax.Array, k: jax.Array, stride: int) -> jax.Array:
    """Depthwise conv_transpose1d: x [b,c,t], k [c,1,ks] -> [b,c,(t-1)s+ks]."""
    b, c, t = x.shape
    ks = k.shape[2]
    # dilate input with stride, then depthwise correlate with flipped kernel
    y = jnp.zeros((b, c, (t - 1) * stride + 1), x.dtype)
    y = y.at[:, :, ::stride].set(x)
    k_flip = jnp.flip(k, axis=2)  # conv_transpose correlates with flipped kernel
    y = jnp.pad(y, ((0, 0), (0, 0), (ks - 1, ks - 1)))
    out = jax.lax.conv_general_dilated(
        y, jnp.transpose(k_flip, (2, 1, 0)),  # [ks, 1, c] WIO
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NCW", "WIO", "NCW"),
        feature_group_count=c,
    )
    return out


def downsample1d_2x(x: jax.Array, filt: jax.Array) -> jax.Array:
    """[b, c, t] -> [b, c, t//2] anti-aliased."""
    b, c, t = x.shape
    kernel_size = filt.shape[0]
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    pad_left = half_size - int(even)
    pad_right = half_size
    x = jnp.pad(x, ((0, 0), (0, 0), (pad_left, pad_right)), mode="edge")
    k = jnp.broadcast_to(filt[None, None, :], (c, 1, kernel_size))
    return jax.lax.conv_general_dilated(
        x, jnp.transpose(k, (2, 1, 0)),
        window_strides=(2,), padding="VALID",
        dimension_numbers=("NCW", "WIO", "NCW"),
        feature_group_count=c,
    )


# ---------------------------------------------------------------------------
# Snake activations
# ---------------------------------------------------------------------------

def snakebeta(x: jax.Array, alpha: jax.Array, beta: jax.Array,
              logscale: bool = True, eps: float = 1e-9) -> jax.Array:
    """x + 1/(beta+eps) * sin^2(alpha*x), per-channel alpha/beta [c]."""
    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta)
    a = alpha[None, :, None]
    b = beta[None, :, None]
    return x + (1.0 / (b + eps)) * jnp.sin(a * x) ** 2


def aa_snake(x: jax.Array, alpha: jax.Array, beta: jax.Array,
             up_filt: jax.Array, down_filt: jax.Array) -> jax.Array:
    """Anti-aliased activation: up 2x -> snakebeta -> down 2x."""
    x = upsample1d_2x(x, up_filt)
    x = snakebeta(x, alpha, beta)
    return downsample1d_2x(x, down_filt)


# ---------------------------------------------------------------------------
# Generator
# ---------------------------------------------------------------------------

def _conv_init(key, c_in, c_out, k):
    # matches torch Conv1d default init bounds
    fan_in = c_in * k
    bound = 1.0 / math.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (c_out, c_in, k), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (c_out,), jnp.float32, -bound, bound),
    }


def init_bigvgan(key, cfg: BigVGANConfig = BigVGANConfig()) -> dict:
    keys = iter(jax.random.split(key, 512))
    ch = cfg.upsample_initial_channel
    p: dict = {"conv_pre": _conv_init(next(keys), cfg.num_mels, ch, 7)}

    def _convtranspose_init(key, c_in, c_out, k):
        # torch ConvTranspose1d weight layout [in, out, k]; fan_in = c_out*k
        bound = 1.0 / math.sqrt(c_out * k)
        kw, kb = jax.random.split(key)
        return {
            "w": jax.random.uniform(kw, (c_in, c_out, k), jnp.float32, -bound, bound),
            "b": jax.random.uniform(kb, (c_out,), jnp.float32, -bound, bound),
        }

    ups = []
    resblocks = []
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        c_in, c_out = ch // (2**i), ch // (2 ** (i + 1))
        ups.append(_convtranspose_init(next(keys), c_in, c_out, k))
        for kr, dils in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            blk = {"convs1": [], "convs2": [], "alpha1": [], "beta1": [],
                   "alpha2": [], "beta2": []}
            for d in dils:
                blk["convs1"].append(_conv_init(next(keys), c_out, c_out, kr))
                blk["convs2"].append(_conv_init(next(keys), c_out, c_out, kr))
                blk["alpha1"].append(jnp.zeros((c_out,), jnp.float32))
                blk["beta1"].append(jnp.zeros((c_out,), jnp.float32))
                blk["alpha2"].append(jnp.zeros((c_out,), jnp.float32))
                blk["beta2"].append(jnp.zeros((c_out,), jnp.float32))
            resblocks.append(blk)
    p["ups"] = ups
    p["resblocks"] = resblocks
    c_final = ch // (2 ** len(cfg.upsample_rates))
    p["activation_post"] = {"alpha": jnp.zeros((c_final,), jnp.float32),
                            "beta": jnp.zeros((c_final,), jnp.float32)}
    post = _conv_init(next(keys), c_final, 1, 7)
    if not cfg.use_bias_at_final:
        post.pop("b")
    p["conv_post"] = post
    return p


def _conv1d_ncw(p, x, dilation=1, padding=None):
    k = p["w"].shape[2]
    if padding is None:
        padding = dilation * (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, jnp.transpose(p["w"], (2, 1, 0)),
        window_strides=(1,), padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCW", "WIO", "NCW"),
    )
    if "b" in p:
        y = y + p["b"][None, :, None]
    return y


def _convtranspose1d_ncw(p, x, stride, k):
    """torch ConvTranspose1d(stride=s, padding=(k-s)//2) semantics."""
    b, c_in, t = x.shape
    c_out = p["w"].shape[1]  # torch layout [in, out, k]
    pad = (k - stride) // 2
    y = jnp.zeros((b, c_in, (t - 1) * stride + 1), x.dtype)
    y = y.at[:, :, ::stride].set(x)
    w = jnp.flip(p["w"], axis=2)         # [in, out, k]
    y = jnp.pad(y, ((0, 0), (0, 0), (k - 1, k - 1)))
    out = jax.lax.conv_general_dilated(
        y, jnp.transpose(w, (2, 0, 1)),   # WIO: [k, in, out]
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NCW", "WIO", "NCW"),
    )
    if pad > 0:
        out = out[:, :, pad:-pad]
    if "b" in p:
        out = out + p["b"][None, :, None]
    return out


class BigVGAN:
    def __init__(self, params: dict, cfg: BigVGANConfig = BigVGANConfig()):
        self.params = params
        self.cfg = cfg
        self.up_filt = jnp.asarray(_upsample2_filter())
        self.down_filt = jnp.asarray(_downsample2_filter())
        self._decode = jax.jit(partial(_bigvgan_apply, cfg=cfg))

    def decode(self, mel: jax.Array) -> jax.Array:
        """log-mel [b, n_mels, t] -> wav [b, t * prod(upsample_rates)]."""
        return self._decode(self.params, mel, self.up_filt, self.down_filt)

    def __call__(self, mel: jax.Array) -> jax.Array:
        return self.decode(mel)


def _amp_block(blk, x, kr, dils, up_filt, down_filt):
    for i, d in enumerate(dils):
        h = aa_snake(x, blk["alpha1"][i], blk["beta1"][i], up_filt, down_filt)
        h = _conv1d_ncw(blk["convs1"][i], h, dilation=d)
        h = aa_snake(h, blk["alpha2"][i], blk["beta2"][i], up_filt, down_filt)
        h = _conv1d_ncw(blk["convs2"][i], h, dilation=1)
        x = x + h
    return x


def _bigvgan_apply(params, mel, up_filt, down_filt, cfg: BigVGANConfig):
    x = _conv1d_ncw(params["conv_pre"], mel.astype(jnp.float32))
    n_res = len(cfg.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = _convtranspose1d_ncw(params["ups"][i], x, u, k)
        acc = None
        for j, (kr, dils) in enumerate(zip(cfg.resblock_kernel_sizes,
                                           cfg.resblock_dilation_sizes)):
            blk = params["resblocks"][i * n_res + j]
            h = _amp_block(blk, x, kr, dils, up_filt, down_filt)
            acc = h if acc is None else acc + h
        x = acc / n_res
    x = aa_snake(x, params["activation_post"]["alpha"],
                 params["activation_post"]["beta"], up_filt, down_filt)
    x = _conv1d_ncw(params["conv_post"], x)
    if cfg.use_tanh_at_final:
        x = jnp.tanh(x)
    else:
        x = jnp.clip(x, -1.0, 1.0)
    return x[:, 0, :]


# ---------------------------------------------------------------------------
# Checkpoint conversion (HF nvidia/bigvgan_* generator state dict)
# ---------------------------------------------------------------------------

def _fold_weight_norm(sd: dict, name: str) -> np.ndarray:
    """weight_g * weight_v / ||weight_v|| (per output channel), or plain weight."""
    if f"{name}.weight" in sd:
        return np.asarray(sd[f"{name}.weight"], np.float32)
    g = np.asarray(sd[f"{name}.weight_g"], np.float32)
    v = np.asarray(sd[f"{name}.weight_v"], np.float32)
    norm = np.sqrt((v**2).sum(axis=(1, 2), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def convert_bigvgan_state_dict(sd: dict, cfg: BigVGANConfig = BigVGANConfig()) -> dict:
    """HF generator.pt state dict -> f5tts_tpu BigVGAN pytree."""
    def conv(name, bias=True):
        p = {"w": jnp.asarray(_fold_weight_norm(sd, name))}
        if bias and f"{name}.bias" in sd:
            p["b"] = jnp.asarray(np.asarray(sd[f"{name}.bias"], np.float32))
        return p

    p: dict = {"conv_pre": conv("conv_pre")}
    ups = []
    for i in range(len(cfg.upsample_rates)):
        ups.append(conv(f"ups.{i}.0"))
    p["ups"] = ups

    resblocks = []
    n_res = len(cfg.resblock_kernel_sizes)
    for m in range(len(cfg.upsample_rates) * n_res):
        dils = cfg.resblock_dilation_sizes[m % n_res]
        blk = {"convs1": [], "convs2": [], "alpha1": [], "beta1": [],
               "alpha2": [], "beta2": []}
        for i in range(len(dils)):
            blk["convs1"].append(conv(f"resblocks.{m}.convs1.{i}"))
            blk["convs2"].append(conv(f"resblocks.{m}.convs2.{i}"))
            blk["alpha1"].append(jnp.asarray(
                np.asarray(sd[f"resblocks.{m}.activations.{2*i}.act.alpha"], np.float32).reshape(-1)))
            blk["beta1"].append(jnp.asarray(
                np.asarray(sd[f"resblocks.{m}.activations.{2*i}.act.beta"], np.float32).reshape(-1)))
            blk["alpha2"].append(jnp.asarray(
                np.asarray(sd[f"resblocks.{m}.activations.{2*i+1}.act.alpha"], np.float32).reshape(-1)))
            blk["beta2"].append(jnp.asarray(
                np.asarray(sd[f"resblocks.{m}.activations.{2*i+1}.act.beta"], np.float32).reshape(-1)))
        resblocks.append(blk)
    p["resblocks"] = resblocks
    p["activation_post"] = {
        "alpha": jnp.asarray(np.asarray(sd["activation_post.act.alpha"], np.float32).reshape(-1)),
        "beta": jnp.asarray(np.asarray(sd["activation_post.act.beta"], np.float32).reshape(-1)),
    }
    p["conv_post"] = conv("conv_post", bias=cfg.use_bias_at_final)
    return p

"""Conditional flow matching: training loss + fused ODE sampler.

Rebuild of the reference CFM wrapper (src/f5_tts/model/cfm.py:34-302), but
TPU-shaped:

- `cfm_loss` — masked-infilling CFM regression: x0~N(0,I), t~U[0,1],
  phi = (1-t)x0 + t*x1, flow = x1-x0, random span mask (frac 0.7-1.0) builds
  the infilling cond, per-sample CFG dropout (audio 0.3 / both 0.2), masked
  MSE over the span (reference cfm.py:231-302). All randomness from one
  jax PRNG key; fully jittable.
- `cfm_sample` — the reference's `odeint(fn, y0, t)` + per-step host dispatch
  (cfm.py:218) becomes ONE `lax.scan` over NFE steps inside a single jit:
  text embeddings are computed once before the scan (replacing the
  thread-local cache, dit.py:239-262), CFG cond/uncond are packed as a 2B
  batch per step (dit.py:337-346), Euler/midpoint updates use a precomputed
  EPSS+sway time grid (cfm.py:203-216), and the final mel re-imposes the
  prompt frames (cfm.py:223).

Shapes are static: `seq_len` is a compile bucket; per-sample durations arrive
as `duration: [b] int32` and masking handles the tail.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from f5tts_tpu.config import CFMConfig, ModelArch
from f5tts_tpu.models import dit
from f5tts_tpu.models import modules as m
from f5tts_tpu.utils import lens_to_mask, mask_from_frac_lengths


class BackboneDef(NamedTuple):
    """Static description of a backbone: hashable, safe as a jit static arg."""

    name: str
    init: Callable          # (key, arch) -> params
    statics_cls: type       # arch -> statics (constant tables)
    forward: Callable       # (params, statics, x, cond, text, time, ...) -> flow
    precompute_text_embeds: Callable  # (params, statics, text, n, lengths, dtype) -> (cond, uncond)
    # (params, t_values [S], batch, dtype) -> at(i) giving step-i AdaLN mods
    # (None for backbones without AdaLN, e.g. UNetT's time token)
    precompute_mods: Optional[Callable] = None
    # sequence tokens the backbone prepends beyond the mel frames (UNetT's
    # time token); duration_bucket subtracts this so seq stays 128-aligned
    seq_extra_tokens: int = 0


def _dit_text_embeds(params, statics, text, n, lengths, dtype):
    te_c = dit.text_embedding(params["text_embed"], statics, text, n,
                              lengths=lengths, drop_text=False, dtype=dtype)
    te_u = dit.text_embedding(params["text_embed"], statics, text, n,
                              lengths=lengths, drop_text=True, dtype=dtype)
    return te_c, te_u


def _unett_text_embeds(params, statics, text, n, lengths, dtype):
    # UNetT text embedding has no per-sample seq_len variant (unett.py:54-84)
    te_c = dit.text_embedding(params["text_embed"], statics, text, n,
                              lengths=None, drop_text=False, dtype=dtype)
    te_u = dit.text_embedding(params["text_embed"], statics, text, n,
                              lengths=None, drop_text=True, dtype=dtype)
    return te_c, te_u


def _mmdit_text_embeds(params, statics, text, n, lengths, dtype):
    from f5tts_tpu.models.mmdit import mmdit_text_embedding

    arch = statics.arch
    te_c = mmdit_text_embedding(params["text_embed"], statics, text, False,
                                arch.text_mask_padding, dtype)
    te_u = mmdit_text_embedding(params["text_embed"], statics, text, True,
                                arch.text_mask_padding, dtype)
    return te_c, te_u


def _make_backbones():
    from f5tts_tpu.models.mmdit import MMDiTStatics, init_mmdit, mmdit_forward
    from f5tts_tpu.models.unett import UNetTStatics, init_unett, unett_forward

    from f5tts_tpu.models.mmdit import mmdit_precompute_t_mods

    def _dit_mods(params, t_values, batch, dtype):
        block_mods, final_mods = dit.precompute_t_mods(params, t_values, batch,
                                                       dtype=dtype)
        return lambda i: (block_mods[:, i], final_mods[i])

    return {
        "DiT": BackboneDef("DiT", dit.init_dit, dit.DiTStatics, dit.dit_forward,
                           _dit_text_embeds, _dit_mods),
        "UNetT": BackboneDef("UNetT", init_unett, UNetTStatics, unett_forward,
                             _unett_text_embeds,  # time token, no AdaLN
                             seq_extra_tokens=1),
        "MMDiT": BackboneDef("MMDiT", init_mmdit, MMDiTStatics, mmdit_forward,
                             _mmdit_text_embeds, mmdit_precompute_t_mods),
    }


BACKBONES: dict[str, BackboneDef] = _make_backbones()
DIT = BACKBONES["DiT"]


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------

def cfm_loss(
    params: m.Params,
    statics,
    key: jax.Array,
    mel: jax.Array,            # [b, n, d] target mel (x1)
    text: jax.Array,           # [b, nt] int ids, -1 padded
    lens: jax.Array,           # [b] valid mel lengths
    cfg: CFMConfig = CFMConfig(),
    dtype=jnp.bfloat16,
    backend: str = "pallas",
    backbone: BackboneDef = None,
) -> tuple[jax.Array, dict]:
    """Returns (scalar loss, aux dict). Reference: cfm.py:231-302."""
    b, n, d = mel.shape
    k_frac, k_start, k_x0, k_t, k_drop_audio, k_drop_both = jax.random.split(key, 6)

    mask = lens_to_mask(lens, n)  # [b, n]

    frac = jax.random.uniform(
        k_frac, (b,), minval=cfg.frac_lengths_mask[0], maxval=cfg.frac_lengths_mask[1]
    )
    rand_span_mask = mask_from_frac_lengths(lens, frac, jax.random.uniform(k_start, (b,)), n)
    rand_span_mask = rand_span_mask & mask

    x1 = mel
    x0 = jax.random.normal(k_x0, x1.shape, dtype=x1.dtype)
    time = jax.random.uniform(k_t, (b,))

    t = time[:, None, None]
    phi = (1.0 - t) * x0 + t * x1
    flow = x1 - x0

    cond = jnp.where(rand_span_mask[:, :, None], 0.0, x1)

    # CFG dropout, per-sample (reference draws one python random() per batch,
    # cfm.py:286-291; per-sample is the jit-native equivalent)
    drop_audio = jax.random.uniform(k_drop_audio, (b,)) < cfg.audio_drop_prob
    drop_both = jax.random.uniform(k_drop_both, (b,)) < cfg.cond_drop_prob
    drop_audio = drop_audio | drop_both
    drop_text = drop_both

    forward = (backbone or DIT).forward
    pred = forward(
        params, statics, phi, cond, text, time,
        lengths=lens, drop_audio_cond=drop_audio, drop_text=drop_text,
        dtype=dtype, backend=backend,
    )

    se = (pred.astype(jnp.float32) - flow.astype(jnp.float32)) ** 2
    span = rand_span_mask[:, :, None].astype(jnp.float32)
    loss = (se * span).sum() / jnp.clip(span.sum() * d, 1.0, None)
    return loss, {"pred": pred, "cond": cond, "rand_span_mask": rand_span_mask}


# ---------------------------------------------------------------------------
# Sampling
# ---------------------------------------------------------------------------

def make_noise(
    key: jax.Array, batch: int, seq_len: int, num_channels: int,
    duration: jax.Array, shared: bool = True, dtype=jnp.float32,
    noise_max_len: Optional[int] = None,
) -> jax.Array:
    """Sampling noise y0. The reference reseeds per sample so every batch row
    gets an identical noise prefix (cfm.py:196-201 — batch result == single
    result); `shared=True` reproduces that by broadcasting one noise panel.
    Positions >= duration are zeroed (pad_sequence semantics).

    `noise_max_len`: generate the panel at a fixed length and slice to
    seq_len, so the same (key, duration) yields the same audio no matter
    which compile bucket the request landed in."""
    gen_len = max(noise_max_len or seq_len, seq_len)
    if shared:
        noise = jax.random.normal(key, (gen_len, num_channels), dtype=dtype)[:seq_len]
        noise = jnp.broadcast_to(noise[None], (batch, seq_len, num_channels))
    else:
        noise = jax.random.normal(key, (batch, gen_len, num_channels),
                                  dtype=dtype)[:, :seq_len]
    valid = lens_to_mask(duration, seq_len)
    return jnp.where(valid[:, :, None], noise, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("arch_statics", "steps", "method", "dtype", "backend",
                     "use_mask", "backbone"),
)
def _sample_scan(
    params,
    arch_statics,       # backbone statics (hashable static)
    y0,                 # [b, n, d] noise
    step_cond,          # [b, n, d] masked cond mel
    text,               # [b, nt]
    duration,           # [b] total lengths
    t_grid,             # [steps+1]
    cfg_strength,       # scalar
    steps: int,
    method: str = "euler",
    dtype=jnp.bfloat16,
    backend: str = "pallas",
    use_mask: bool = True,
    backbone: BackboneDef = None,
):
    statics = arch_statics
    bdef = backbone or DIT
    b, n, d = y0.shape
    lengths = duration if use_mask else None

    # text embeds once (reference cache, done properly outside the NFE loop)
    te_cond, te_uncond = bdef.precompute_text_embeds(params, statics, text, n,
                                                     lengths, dtype)

    # every step's t is known here, so ALL timestep-AdaLN work (41% of DiT
    # weight bytes otherwise re-read each step) is hoisted out of the scan
    # (DiT and MMDiT; UNetT's time rides the sequence as a token)
    mods_at = None
    if bdef.precompute_mods is not None:
        if method == "euler":
            t_values = t_grid[:steps]
        else:  # midpoint evaluates at t and t + dt/2; v2 index = steps + i
            dts = t_grid[1:] - t_grid[:-1]
            t_values = jnp.concatenate([t_grid[:steps],
                                        t_grid[:steps] + 0.5 * dts])
        mods_at = bdef.precompute_mods(params, t_values, 2 * b, dtype)

    def flow_fn(x, t_scalar, t_idx):
        kw = {}
        if mods_at is not None:
            kw["t_mods"] = mods_at(t_idx)
        pred_cfg = bdef.forward(
            params, statics, x, step_cond, text, t_scalar,
            lengths=lengths, cfg_infer=True, text_embeds=(te_cond, te_uncond),
            dtype=dtype, backend=backend, **kw,
        )
        pred, null_pred = jnp.split(pred_cfg, 2, axis=0)
        return pred + (pred - null_pred) * cfg_strength

    def euler_step(x, i):
        t_cur = t_grid[i]
        dt = t_grid[i + 1] - t_grid[i]
        v = flow_fn(x, jnp.broadcast_to(t_cur, (b,)), i)
        return x + dt * v.astype(x.dtype), None

    def midpoint_step(x, i):
        t_cur = t_grid[i]
        dt = t_grid[i + 1] - t_grid[i]
        v1 = flow_fn(x, jnp.broadcast_to(t_cur, (b,)), i)
        x_mid = x + 0.5 * dt * v1.astype(x.dtype)
        v2 = flow_fn(x_mid, jnp.broadcast_to(t_cur + 0.5 * dt, (b,)), steps + i)
        return x + dt * v2.astype(x.dtype), None

    step = euler_step if method == "euler" else midpoint_step
    x, _ = jax.lax.scan(step, y0, jnp.arange(steps))
    return x


def cfm_sample(
    params: m.Params,
    statics,
    cond: jax.Array,               # [b, n, d] prompt mel, zero-padded to bucket n
    text: jax.Array,               # [b, nt] int ids (-1 padded)
    lens: jax.Array,               # [b] prompt lengths (frames)
    duration: jax.Array,           # [b] total lengths (frames), <= n
    t_grid: jax.Array,             # [steps+1] precomputed (EPSS + sway)
    *,
    key: jax.Array | None = None,
    y0: jax.Array | None = None,
    cfg_strength: float = 2.0,
    method: str = "euler",
    dtype=jnp.bfloat16,
    backend: str = "pallas",
    use_mask: bool = True,
    edit_mask: Optional[jax.Array] = None,
    no_ref_audio: bool = False,
    vocoder: Optional[Callable[[jax.Array], jax.Array]] = None,
    backbone: BackboneDef = None,
    noise_max_len: Optional[int] = None,
) -> jax.Array:
    """Generate mel [b, n, d] (or waveform if `vocoder` given).

    Mirrors reference CFM.sample (cfm.py:84-229) minus host-side text
    handling (tokenization happens upstream). `duration` must already include
    the reference-enforced minimum (max(text_len, lens) + 1).
    """
    b, n, d = cond.shape
    steps = int(t_grid.shape[0]) - 1

    cond_mask = lens_to_mask(lens, n)
    if edit_mask is not None:
        cond_mask = cond_mask & edit_mask
    if no_ref_audio:
        cond = jnp.zeros_like(cond)
    step_cond = jnp.where(cond_mask[:, :, None], cond, 0.0)

    if y0 is None:
        assert key is not None, "need key or y0"
        y0 = make_noise(key, b, n, d, duration, shared=True, dtype=jnp.float32,
                        noise_max_len=noise_max_len)

    sampled = _sample_scan(
        params, statics, y0, step_cond, text, duration,
        t_grid.astype(jnp.float32), jnp.float32(cfg_strength),
        steps, method=method, dtype=dtype, backend=backend, use_mask=use_mask,
        backbone=backbone,
    )

    out = jnp.where(cond_mask[:, :, None], cond, sampled)
    if vocoder is not None:
        return vocoder(jnp.transpose(out, (0, 2, 1)))
    return out


def duplicate_test_start(
    key: jax.Array,
    gt_mel: jax.Array,        # [b, n_gt, d] ground-truth mel to restart from
    seq_len: int,             # padded bucket length
    cond_seq_len: int,        # prompt length (frames)
    duration: jax.Array,      # [b]
    steps: int,
    t_inter: float = 0.1,
    sway_sampling_coef: float | None = None,
) -> tuple[jax.Array, jax.Array, int]:
    """Mid-trajectory restart diagnostic (reference cfm.py:141-143,205-209):
    `duplicate_test` blends the ground truth (shifted past the prompt) into
    the initial noise at t=t_inter and integrates the remaining steps.

    Returns (y0, t_grid, remaining_steps) to pass into `cfm_sample` as
    (y0=..., t_grid=...).
    """
    b, n_gt, d = gt_mel.shape
    # test_cond: gt mel shifted to start right after the prompt (ref :143)
    test_cond = jnp.zeros((b, seq_len, d), gt_mel.dtype)
    take = min(n_gt, seq_len - cond_seq_len)
    test_cond = jax.lax.dynamic_update_slice(
        test_cond, gt_mel[:, :take, :], (0, cond_seq_len, 0))

    y0 = make_noise(key, b, seq_len, d, duration, shared=True)
    y0 = (1.0 - t_inter) * y0 + t_inter * test_cond

    remaining = max(int(steps * (1.0 - t_inter)), 1)
    t = jnp.linspace(t_inter, 1.0, remaining + 1, dtype=jnp.float32)
    if sway_sampling_coef is not None:
        from f5tts_tpu.utils import sway_timesteps

        t = sway_timesteps(t, sway_sampling_coef)
    return y0, t, remaining


def compute_duration(
    text_lens: jax.Array, prompt_lens: jax.Array, requested: jax.Array, max_duration: int
) -> jax.Array:
    """duration = max(max(text_len, lens) + 1, requested), clamped
    (reference cfm.py:135-138)."""
    return jnp.clip(jnp.maximum(jnp.maximum(text_lens, prompt_lens) + 1, requested), None, max_duration)

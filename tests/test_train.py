"""Training stack: sampler, collate, numpy mel, trainer loop, checkpointing."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from f5tts_tpu.config import CFMConfig, MelConfig, ModelArch, TrainConfig
from f5tts_tpu.models import dit
from f5tts_tpu.ops.mel import MelFrontend
from f5tts_tpu.train.dataset import DynamicBatchSampler, NumpyMel, Sample, collate
from f5tts_tpu.train.step import init_train_state, make_optimizer, make_train_step

ARCH = ModelArch(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, mel_dim=8,
                 text_num_embeds=30, text_dim=16, conv_layers=1)


def test_dynamic_batch_sampler_packing():
    frame_lens = [10, 20, 30, 40, 50, 200]
    s = DynamicBatchSampler(frame_lens, frames_threshold=60, max_samples=3,
                            random_seed=0, drop_residual=False)
    batches = list(s)
    flat = [i for b in batches for i in b]
    assert 5 not in flat  # oversized (200 > 60) dropped
    assert sorted(flat) == [0, 1, 2, 3, 4]
    for b in batches:
        assert sum(frame_lens[i] for i in b) <= 60
        assert len(b) <= 3


def test_dynamic_batch_sampler_epoch_shuffle_deterministic():
    frame_lens = list(range(10, 200, 7))
    s1 = DynamicBatchSampler(frame_lens, 300, random_seed=42)
    s2 = DynamicBatchSampler(frame_lens, 300, random_seed=42)
    s1.set_epoch(3)
    s2.set_epoch(3)
    assert list(s1) == list(s2)
    s2.set_epoch(4)
    assert list(s1) != list(s2)


def test_collate_bucket_padding():
    samples = [Sample(mel=np.ones((70, 8), np.float32), text="abc"),
               Sample(mel=np.ones((50, 8), np.float32), text="de")]
    batch = collate(samples, bucket_frames=64)
    assert batch["mel"].shape == (2, 128, 8)
    np.testing.assert_array_equal(batch["mel_lengths"], [70, 50])
    assert batch["mel"][1, 60].sum() == 0  # padded region zeroed


def test_numpy_mel_matches_device_mel():
    cfg = MelConfig()
    nm = NumpyMel(cfg)
    fe = MelFrontend(cfg)
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(24000) * 0.1).astype(np.float32)
    m_np = nm(wav)                                          # [t, d]
    m_dev = np.asarray(fe.frames_to_mel_bnd(jnp.asarray(wav[None])))[0]
    assert m_np.shape == m_dev.shape
    np.testing.assert_allclose(m_np, m_dev, atol=2e-2, rtol=1e-2)


def _synthetic_batch(b=2, n=64, nt=8, seed=0):
    rng = np.random.default_rng(seed)
    mel = jnp.asarray(rng.standard_normal((b, n, ARCH.mel_dim)), jnp.float32)
    text = jnp.asarray(rng.integers(0, 30, (b, nt)), jnp.int32)
    lens = jnp.asarray([n] * b, jnp.int32)
    return mel, text, lens


def test_train_step_reduces_loss():
    params = dit.init_dit(jax.random.PRNGKey(0), ARCH)
    statics = dit.DiTStatics(ARCH)
    tx = make_optimizer(1e-3, warmup_updates=2, total_updates=1000)
    state = init_train_state(params, tx)
    step = jax.jit(make_train_step(statics, tx, CFMConfig(audio_drop_prob=0.0, cond_drop_prob=0.0),
                                   dtype=jnp.float32, backend="xla"))
    mel, text, lens = _synthetic_batch()
    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(30):
        state, metrics = step(state, jax.random.fold_in(key, i % 4), mel, text, lens)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 30
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
    assert all(np.isfinite(losses))


def test_fused_optimizer_matches_optax():
    # fused clip+AdamW+EMA single-pass update == the optax chain, leaf for
    # leaf, over several steps (incl. a clipped step via huge lr-free grads)
    from f5tts_tpu.train.step import OptHParams

    params = dit.init_dit(jax.random.PRNGKey(0), ARCH)
    statics = dit.DiTStatics(ARCH)
    hp = OptHParams(1e-3, warmup_updates=2, total_updates=100,
                    max_grad_norm=0.05)  # low clip: exercises the clip branch
    tx = make_optimizer(hp.learning_rate, hp.warmup_updates, hp.total_updates,
                        hp.max_grad_norm)
    cfg = CFMConfig(audio_drop_prob=0.0, cond_drop_prob=0.0)
    kw = dict(dtype=jnp.float32, backend="xla", ema_update_every=2,
              ema_update_after_step=1)
    step_ref = jax.jit(make_train_step(statics, tx, cfg, **kw))
    step_fused = jax.jit(make_train_step(statics, tx, cfg, hp=hp, **kw))

    s_ref = init_train_state(params, tx)
    s_fused = init_train_state(params, tx)
    mel, text, lens = _synthetic_batch()
    key = jax.random.PRNGKey(7)
    for i in range(4):
        k = jax.random.fold_in(key, i)
        s_ref, m_ref = step_ref(s_ref, k, mel, text, lens)
        s_fused, m_fused = step_fused(s_fused, k, mel, text, lens)
        np.testing.assert_allclose(float(m_ref["grad_norm"]),
                                   float(m_fused["grad_norm"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_ref.params), jax.tree.leaves(s_fused.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_ref.ema_params), jax.tree.leaves(s_fused.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5)
    # opt_state structure identical (checkpoint interchangeability)
    ref_leaves = jax.tree.leaves(s_ref.opt_state)
    fused_leaves = jax.tree.leaves(s_fused.opt_state)
    assert len(ref_leaves) == len(fused_leaves)
    for a, b in zip(ref_leaves, fused_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5)


def test_bf16_state_tracks_f32_state():
    """Numerics gate for the low-memory state (VERDICT r4 #2): bf16-stored
    moments/EMA with f32 update math track the f32-state fused step closely
    over several steps — the drift must stay at bf16 rounding scale, far
    below the update magnitude."""
    from f5tts_tpu.train.step import OptHParams

    params = dit.init_dit(jax.random.PRNGKey(0), ARCH)
    statics = dit.DiTStatics(ARCH)
    hp = OptHParams(1e-3, warmup_updates=2, total_updates=100)
    tx = make_optimizer(hp.learning_rate, hp.warmup_updates, hp.total_updates)
    cfg = CFMConfig(audio_drop_prob=0.0, cond_drop_prob=0.0)
    kw = dict(dtype=jnp.float32, backend="xla", ema_update_every=2,
              ema_update_after_step=1)
    step = jax.jit(make_train_step(statics, tx, cfg, hp=hp, **kw))

    s32 = init_train_state(params, tx)
    s16 = init_train_state(params, tx, moment_dtype=jnp.bfloat16,
                           ema_dtype=jnp.bfloat16)
    adam16 = s16.opt_state[1][0]
    assert all(a.dtype == jnp.bfloat16 for a in jax.tree.leaves(adam16.mu))
    assert all(a.dtype == jnp.bfloat16 for a in jax.tree.leaves(s16.ema_params))
    assert all(a.dtype == jnp.float32 for a in jax.tree.leaves(s16.params))

    mel, text, lens = _synthetic_batch()
    key = jax.random.PRNGKey(7)
    for i in range(6):
        k = jax.random.fold_in(key, i)
        s32, m32 = step(s32, k, mel, text, lens)
        s16, m16 = step(s16, k, mel, text, lens)
        np.testing.assert_allclose(float(m16["loss"]), float(m32["loss"]),
                                   rtol=1e-3)
    # bf16 state stays bf16 across steps (no silent f32 promotion)
    adam16 = s16.opt_state[1][0]
    assert all(a.dtype == jnp.bfloat16 for a in jax.tree.leaves(adam16.mu))
    assert all(a.dtype == jnp.bfloat16 for a in jax.tree.leaves(s16.ema_params))
    # params drift: relative to the PARAMETER SCALE the divergence after six
    # updates must be tiny (bf16 moment rounding, not a broken update)
    num = den = 0.0
    for a, b in zip(jax.tree.leaves(s16.params), jax.tree.leaves(s32.params)):
        num += float(jnp.sum((a - b) ** 2))
        den += float(jnp.sum(jnp.asarray(b, jnp.float32) ** 2))
    assert (num / max(den, 1e-12)) ** 0.5 < 2e-3, (num, den)


def test_trainer_bf16_state_wiring(tmp_path):
    """Trainer(bf16_state=True): moments/EMA stored bf16, state donated to
    the step (defaulted together — the config that fits 645M MMDiT_Base
    single-chip), steps numerically sane."""
    from f5tts_tpu.config import TrainConfig
    from f5tts_tpu.train.trainer import Trainer

    params = dit.init_dit(jax.random.PRNGKey(0), ARCH)
    tr = Trainer(params, dit.DiTStatics(ARCH),
                 TrainConfig(batch_size_per_device=800, max_samples=4,
                             num_warmup_updates=2, save_per_updates=1000,
                             last_per_updates=1000, save_dir=str(tmp_path),
                             logger=None),
                 backend="xla", dtype=jnp.float32, total_updates=16,
                 bf16_state=True)
    adam = tr.state.opt_state[1][0]
    assert all(a.dtype == jnp.bfloat16 for a in jax.tree.leaves(adam.mu))
    assert all(a.dtype == jnp.bfloat16
               for a in jax.tree.leaves(tr.state.ema_params))
    mel, text, lens = _synthetic_batch()
    st, m = tr._step_fn(tr.state, jax.random.PRNGKey(1), mel, text, lens)
    assert np.isfinite(float(m["loss"]))
    adam2 = st.opt_state[1][0]
    assert all(a.dtype == jnp.bfloat16 for a in jax.tree.leaves(adam2.mu))
    tr.ckpt.close()


def test_ema_update_cadence():
    params = dit.init_dit(jax.random.PRNGKey(0), ARCH)
    statics = dit.DiTStatics(ARCH)
    tx = make_optimizer(1e-3, 2, 100)
    state = init_train_state(params, tx)
    step = jax.jit(make_train_step(statics, tx, CFMConfig(), ema_update_every=2,
                                   ema_update_after_step=0, dtype=jnp.float32, backend="xla"))
    mel, text, lens = _synthetic_batch()
    s1, _ = step(state, jax.random.PRNGKey(1), mel, text, lens)
    # step 1: not an update step (1 % 2 != 0) -> ema unchanged
    l0 = jax.tree.leaves(state.ema_params)[0]
    l1 = jax.tree.leaves(s1.ema_params)[0]
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    s2, _ = step(s1, jax.random.PRNGKey(2), mel, text, lens)
    l2 = [np.asarray(x) for x in jax.tree.leaves(s2.ema_params)]
    p2 = [np.asarray(x) for x in jax.tree.leaves(s2.params)]
    # step 2: ema updated (tracks params with decay)
    assert any(not np.array_equal(a, np.asarray(b)) for a, b in zip(l2, jax.tree.leaves(s1.ema_params)))


def test_checkpoint_roundtrip(tmp_path):
    from f5tts_tpu.train.checkpoint import CheckpointManager

    params = dit.init_dit(jax.random.PRNGKey(0), ARCH)
    statics = dit.DiTStatics(ARCH)
    tx = make_optimizer(1e-3, 2, 100)
    state = init_train_state(params, tx)
    step = jax.jit(make_train_step(statics, tx, CFMConfig(), dtype=jnp.float32, backend="xla"))
    mel, text, lens = _synthetic_batch()
    state, _ = step(state, jax.random.PRNGKey(1), mel, text, lens)

    mgr = CheckpointManager(str(tmp_path / "ckpts"), keep_last_n=2)
    mgr.save(state, wait=True)
    assert mgr.latest_step() == 1

    fresh = init_train_state(params, tx)
    restored = mgr.restore(fresh)
    assert restored is not None
    assert int(restored.step) == 1
    a = jax.tree.leaves(state.params)[3]
    b = jax.tree.leaves(restored.params)[3]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_checkpoint_heartbeat_does_not_evict_milestones(tmp_path):
    """Heartbeats keep their own single slot; milestones rotate separately
    (reference model_last.pt vs model_<step>.pt, trainer.py:150-183)."""
    from f5tts_tpu.train.checkpoint import CheckpointManager, load_params

    params = dit.init_dit(jax.random.PRNGKey(0), ARCH)
    tx = make_optimizer(1e-3, 2, 100)
    state = init_train_state(params, tx)

    mgr = CheckpointManager(str(tmp_path / "ckpts"), keep_last_n=2)
    mgr.save(state, step=10, wait=True)                  # milestone
    mgr.save(state, step=20, wait=True)                  # milestone
    mgr.save(state, step=21, wait=True, heartbeat=True)  # heartbeat
    mgr.save(state, step=22, wait=True, heartbeat=True)  # heartbeat (evicts 21)

    assert sorted(mgr.mngr.all_steps()) == [10, 20]      # milestones intact
    assert mgr.last_mngr.all_steps() == [22]             # only newest heartbeat
    assert mgr.latest_step() == 22

    fresh = init_train_state(params, tx)
    restored = mgr.restore(fresh)                        # newest = heartbeat
    assert restored is not None
    mgr.close()

    # load_params prefers the newest step across milestones + heartbeat
    p = load_params(str(tmp_path / "ckpts"), use_ema=True)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(p)[0]),
        np.asarray(jax.tree.leaves(state.ema_params)[0]))


def test_trainer_loop_with_synthetic_dataset(tmp_path):
    from f5tts_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)

    class TinyDataset:
        def __len__(self):
            return 8

        def get_frame_len(self, i):
            return 48 + 8 * (i % 3)

        def __getitem__(self, i):
            r = np.random.default_rng(i)
            return Sample(mel=r.standard_normal((48 + 8 * (i % 3), ARCH.mel_dim)).astype(np.float32),
                          text="ab cd")

    params = dit.init_dit(jax.random.PRNGKey(0), ARCH)
    statics = dit.DiTStatics(ARCH)
    cfg = TrainConfig(batch_size_per_device=200, max_samples=4, epochs=6,
                      learning_rate=1e-3, num_warmup_updates=2,
                      save_per_updates=100, last_per_updates=4,
                      save_dir=str(tmp_path / "ck"), logger=None)
    vocab = {c: i for i, c in enumerate(" abcd")}
    tr = Trainer(params, statics, cfg, vocab_char_map=vocab, tokenizer="char",
                 total_updates=50, dtype=jnp.float32, backend="xla")
    metrics = tr.train(TinyDataset(), resumable_with_seed=1, max_updates=5, log_every=1)
    assert int(tr.state.step) == 5
    assert np.isfinite(metrics["loss"])

    # resume: a fresh trainer picks up from the checkpoint
    tr2 = Trainer(dit.init_dit(jax.random.PRNGKey(9), ARCH), statics, cfg,
                  vocab_char_map=vocab, tokenizer="char",
                  total_updates=50, dtype=jnp.float32, backend="xla")
    assert tr2.maybe_resume() == 5


def test_trainer_log_samples(tmp_path):
    """Per-checkpoint sample synthesis writes ref+gen wavs (reference
    trainer.py:408-438)."""
    import os

    from f5tts_tpu.train.trainer import Trainer
    from f5tts_tpu.vocoder.vocos import Vocos, VocosConfig, init_vocos

    from f5tts_tpu.train.dataset import Sample

    class TinyDataset:
        def __len__(self):
            return 8  # two batches form; the residual batch is dropped

        def get_frame_len(self, i):
            return 48

        def __getitem__(self, i):
            r = np.random.default_rng(i)
            return Sample(mel=r.standard_normal((48, ARCH.mel_dim)).astype(np.float32),
                          text="ab cd")

    params = dit.init_dit(jax.random.PRNGKey(0), ARCH)
    statics = dit.DiTStatics(ARCH)
    voc_cfg = VocosConfig(input_channels=ARCH.mel_dim, dim=16, intermediate_dim=32,
                          num_layers=1, n_fft=64, hop_length=16)
    voc = Vocos(init_vocos(jax.random.PRNGKey(1), voc_cfg), voc_cfg)
    cfg = TrainConfig(batch_size_per_device=200, max_samples=4, epochs=2,
                      learning_rate=1e-3, num_warmup_updates=1,
                      save_per_updates=1, last_per_updates=1,
                      save_dir=str(tmp_path / "ck"), logger=None, log_samples=True)
    vocab = {c: i for i, c in enumerate(" abcd")}
    tr = Trainer(params, statics, cfg, vocab_char_map=vocab, tokenizer="char",
                 total_updates=10, dtype=jnp.float32, backend="xla",
                 vocoder=voc.decode)
    tr.train(TinyDataset(), resumable_with_seed=1, max_updates=1, log_every=1)
    sample_dir = tmp_path / "ck" / "samples"
    files = os.listdir(sample_dir)
    assert any("gen" in f for f in files) and any("ref" in f for f in files)


def test_noema_step_variant_identical():
    """The no-EMA step variant (dispatched on the 9/10 steps where alpha==1)
    must be numerically IDENTICAL to the full fused step, and must forward
    the EMA tree unchanged (BENCH_HISTORY r4 EMA-skip dispatch)."""
    from f5tts_tpu.train.step import OptHParams

    params = dit.init_dit(jax.random.PRNGKey(0), ARCH)
    statics = dit.DiTStatics(ARCH)
    hp = OptHParams(learning_rate=1e-3, warmup_updates=5, total_updates=50)
    tx = make_optimizer(1e-3, warmup_updates=5, total_updates=50)
    kw = dict(dtype=jnp.float32, backend="xla", hp=hp,
              ema_update_every=3, ema_update_after_step=0)
    step = make_train_step(statics, tx, **kw)
    step_jit = jax.jit(step)
    noema_jit = jax.jit(step.noema)

    mel, text, lens = _synthetic_batch()
    s_ref = init_train_state(params, tx)
    s_alt = init_train_state(params, tx)
    for i in range(6):
        k = jax.random.PRNGKey(i)
        s_ref, m_ref = step_jit(s_ref, k, mel, text, lens)
        nxt = i + 1
        if nxt % 3 != 0:  # EMA provably skipped (alpha == 1)
            prev_ema = s_alt.ema_params
            s_alt, m_alt = noema_jit(s_alt, k, mel, text, lens)
            # tree forwarded untouched
            for a, b in zip(jax.tree.leaves(prev_ema),
                            jax.tree.leaves(s_alt.ema_params)):
                assert a is b or np.array_equal(np.asarray(a), np.asarray(b))
        else:
            s_alt, m_alt = step_jit(s_alt, k, mel, text, lens)
        np.testing.assert_allclose(float(m_ref["loss"]), float(m_alt["loss"]),
                                   rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_ref), jax.tree.leaves(s_alt)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)

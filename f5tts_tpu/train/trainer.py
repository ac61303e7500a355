"""Trainer: the training loop over the jitted CFM step.

Rebuild of reference src/f5_tts/model/trainer.py:26-442, TPU-shaped:

- one jitted train step (loss+grad+AdamW+clip+EMA) instead of
  Accelerate/DDP; DP happens by sharding each batch over the mesh "data"
  axis (XLA psums grads), TP by the param specs in f5tts_tpu.parallel.
- DynamicBatchSampler frame-budget batching with per-epoch seeded shuffle
  and deterministic mid-epoch resume (skip_first_batches semantics,
  trainer.py:333-349) — the sampler is rebuilt with the same seed and the
  first `resume_batch` batches are skipped.
- warmup scaled like the reference: num_warmup_updates is interpreted
  per-device and multiplied by the DP world size (trainer.py:316-319).
- EMA on the update cadence (trainer.py:386-388); checkpoints save
  model+optimizer+EMA+step (orbax), heartbeat every last_per_updates,
  numbered every save_per_updates with rotation.
- tensorboard logging (wandb hooks gated on availability, trainer.py:59-102).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from f5tts_tpu.config import CFMConfig, TrainConfig
from f5tts_tpu.models.cfm import DIT, BackboneDef
from f5tts_tpu.text.pinyin import convert_char_to_pinyin
from f5tts_tpu.text.vocab import list_str_to_idx, list_str_to_tensor
from f5tts_tpu.train.checkpoint import CheckpointManager
from f5tts_tpu.train.dataset import DynamicBatchSampler, collate
from f5tts_tpu.train.step import (OptHParams, init_train_state,
                                  make_optimizer, make_train_step)


class Trainer:
    def __init__(
        self,
        params: dict,
        statics,
        train_cfg: TrainConfig,
        cfm_cfg: CFMConfig = CFMConfig(),
        backbone: BackboneDef = DIT,
        vocab_char_map: Optional[dict] = None,
        tokenizer: str = "pinyin",
        total_updates: Optional[int] = None,
        mesh=None,
        dtype=jnp.bfloat16,
        backend: str = "pallas",  # flash fwd+bwd on TPU; auto-falls back to XLA off-TPU
        logger: Optional[str] = None,
        log_dir: str = "runs",
        sample_fn: Optional[Callable] = None,
        vocoder: Optional[Callable] = None,  # mel [b,d,t] -> wav; enables log_samples
        zero1: bool = False,  # ZeRO-1: shard AdamW moments + EMA over "data"
        bf16_state: bool = False,  # store mu/nu + EMA in bf16 (half the
        # f32 optimizer state; fused update still computes f32 — what
        # lets full-size MMDiT_Base train single-chip without donation)
    ):
        self.cfg = train_cfg
        self.backbone = backbone
        self.statics = statics
        self.vocab_char_map = vocab_char_map
        self.tokenizer = tokenizer
        self.mesh = mesh

        dp_size = 1
        if mesh is not None:
            dp_size = mesh.shape.get("data", 1)
        self.dp_size = dp_size

        warmup = train_cfg.num_warmup_updates * dp_size
        total = total_updates or (warmup * 10)
        hp = OptHParams(train_cfg.learning_rate, warmup, total,
                        train_cfg.max_grad_norm)
        self.tx = make_optimizer(
            train_cfg.learning_rate, warmup, total, train_cfg.max_grad_norm
        )
        sdt = jnp.bfloat16 if bf16_state else None
        self.state = init_train_state(params, self.tx,
                                      moment_dtype=sdt, ema_dtype=sdt)
        step_impl = make_train_step(
            statics, self.tx, cfm_cfg,
            ema_decay=train_cfg.ema_decay,
            ema_update_every=train_cfg.ema_update_every,
            ema_update_after_step=train_cfg.ema_update_after_step,
            dtype=dtype, backend=backend, backbone=backbone, hp=hp,
        )
        # donate the state (opt-in): without aliasing, params/opt/EMA
        # (~6.7 GB f32 at 336M params) double-buffer across the step; the
        # trainer only ever uses the RETURNED state after a call. Off by
        # Donate the carried state (no in/out double-buffer). The dev tunnel
        # still rejects f32-state donation at dispatch (InvalidArgument,
        # measured r5 at every size), but ACCEPTS it when the moments/EMA
        # ride bf16 (bf16_state) — which is also the config whose smaller
        # state makes donation matter (645M MMDiT_Base single-chip:
        # 149.5 ms/step b=4, BENCH_HISTORY r5). Default accordingly;
        # F5TTS_DONATE_STATE=1/0 force-overrides for directly-attached
        # chips (which accept f32 donation) or rejecting backends.
        env = os.environ.get("F5TTS_DONATE_STATE")
        if env is not None:
            donate = (0,) if env != "0" else ()
        else:
            donate = (0,) if bf16_state else ()
        # ZeRO-1 (opt-in, mesh required): AdamW mu/nu + the EMA tree shard
        # over "data" (parallel/mesh.py:zero1_param_specs) — the reference
        # replicates all of it per rank (DDP). Cuts the f32 state from
        # 4x params to (1 + 3/dp)x per device: MMDiT_Base's 10.3 GB state
        # becomes ~3.6 GB at dp=8, which is what makes full-size 645M
        # training fit. out_shardings pin the layout so every step consumes
        # exactly the layout the previous one produced (no re-gather drift).
        self._state_sh = None
        if zero1 and mesh is not None:
            from f5tts_tpu.parallel.mesh import (replicated,
                                                 shard_train_state,
                                                 train_state_shardings)

            self.state = shard_train_state(self.state, mesh, zero1=True)
            rep = replicated(mesh)
            self._state_sh = train_state_shardings(self.state, mesh, zero1=True)
            self._metric_sh = {"loss": rep, "grad_norm": rep}
        _jkw = dict(donate_argnums=donate)
        if self._state_sh is not None:
            _jkw["out_shardings"] = (self._state_sh, self._metric_sh)
        self._step_fn = jax.jit(step_impl, **_jkw)
        # EMA-skip dispatch (fused path): on the 9/10 steps where the EMA
        # update is alpha==1 (ema_pytorch update_every cadence), run a
        # variant that forwards the EMA tree by buffer — drops a 2.7 GB/step
        # read+write sweep (~1.5% step time at b=24; BENCH_HISTORY r4).
        # Host-side dispatch on the step counter; a tree-wide lax.cond blows
        # remote compile past 10 min.
        self._noema_fn = (jax.jit(step_impl.noema, **_jkw)
                          if hp is not None else None)
        self._ema_every = train_cfg.ema_update_every
        # gradient accumulation path (reference trainer.py:63-68,364)
        self._grad_fn = jax.jit(step_impl.grad_step)
        self._apply_fn = jax.jit(step_impl.apply_step, **_jkw)
        self._accum = max(train_cfg.grad_accumulation_steps, 1)
        # ONE dispatch per micro-batch: an un-jitted tree.map(jnp.add) issues
        # a remote dispatch per param leaf (~2-3 ms each over the tunnel;
        # hundreds of leaves dwarf the step itself)
        self._accum_fn = jax.jit(lambda acc, g: jax.tree.map(jnp.add, acc, g))
        self._mean_fn = jax.jit(
            lambda g, k: jax.tree.map(lambda x: x / k, g),
            static_argnums=1)

        self.ckpt = CheckpointManager(train_cfg.save_dir, train_cfg.keep_last_n_checkpoints)
        self.writer = None
        logger = logger if logger is not None else train_cfg.logger
        if logger == "tensorboard":
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.writer = SummaryWriter(log_dir=log_dir)
            except Exception:
                self.writer = None
        elif logger == "wandb":
            try:
                import wandb

                wandb.init(project="CFM-TTS", dir=log_dir)
                self.writer = "wandb"
            except Exception:
                self.writer = None
        self.sample_fn = sample_fn
        self.vocoder = vocoder
        self._last_sample = None  # (mel [t,d], text) from the latest batch

    # -- helpers ------------------------------------------------------------

    def tokenize(self, texts: list, pad_to: Optional[int] = None) -> np.ndarray:
        if self.tokenizer == "pinyin":
            # dataset prep scripts store ALREADY-converted pinyin token lists
            # (reference prepare_emilia.py:139-141 stores the list; trainer
            # never re-converts) — re-running convert_char_to_pinyin on them
            # would shred 'ni3' into per-ASCII-char tokens
            if texts and isinstance(texts[0], (list, tuple)):
                return list_str_to_idx(texts, self.vocab_char_map, pad_to=pad_to)
            return list_str_to_idx(convert_char_to_pinyin(texts), self.vocab_char_map, pad_to=pad_to)
        if self.tokenizer == "char":
            return list_str_to_idx(texts, self.vocab_char_map, pad_to=pad_to)
        return list_str_to_tensor(texts, pad_to=pad_to)

    def _log(self, metrics: dict, step: int) -> None:
        if jax.process_index() != 0:  # one writer per pod, like accelerate
            return
        if self.writer == "wandb":
            import wandb

            wandb.log(metrics, step=step)
        elif self.writer is not None:
            for k, v in metrics.items():
                self.writer.add_scalar(k, v, step)

    def _device_put_batch(self, mel, text_ids, lens):
        if self.mesh is None:
            return jnp.asarray(mel), jnp.asarray(text_ids), jnp.asarray(lens)
        from jax.sharding import NamedSharding, PartitionSpec as P

        dsh = NamedSharding(self.mesh, P("data"))
        return (jax.device_put(jnp.asarray(mel), dsh),
                jax.device_put(jnp.asarray(text_ids), dsh),
                jax.device_put(jnp.asarray(lens), dsh))

    def _log_sample(self, update: int) -> None:
        """Per-checkpoint sample synthesis (reference trainer.py:408-438):
        clone the first item of the latest batch with the EMA weights and
        write ref + generated wavs under save_dir/samples."""
        if self.vocoder is None or self._last_sample is None:
            return
        import os

        import numpy as np

        from f5tts_tpu.models import cfm as cfm_mod
        from f5tts_tpu.utils import duration_bucket, make_time_grid

        mel_ref, text = self._last_sample
        ref_frames = mel_ref.shape[0]
        total = min(ref_frames * 2, 4096)
        n_bucket = duration_bucket(total, 256, 4096,
                                   self.backbone.seq_extra_tokens)
        cond = np.zeros((1, n_bucket, mel_ref.shape[1]), np.float32)
        cond[0, :ref_frames] = mel_ref
        # doubled text for the cloned continuation (reference trainer.py:411:
        # list texts get [" "] spliced between, strings a plain space)
        doubled = (list(text) + [" "] + list(text) if isinstance(text, (list, tuple))
                   else text + " " + text)
        text_ids = self.tokenize([doubled])
        t_grid = make_time_grid(32, sway_sampling_coef=-1.0)
        out = cfm_mod.cfm_sample(
            self.state.ema_params, self.statics, jnp.asarray(cond),
            jnp.asarray(text_ids), jnp.asarray([ref_frames], jnp.int32),
            jnp.asarray([total], jnp.int32), t_grid,
            key=jax.random.PRNGKey(update), cfg_strength=2.0,
            dtype=jnp.float32, backend="xla", backbone=self.backbone,
        )
        sample_dir = os.path.join(self.cfg.save_dir, "samples")
        os.makedirs(sample_dir, exist_ok=True)
        from f5tts_tpu.infer import audio_io

        gen = jnp.transpose(out[:, ref_frames:total, :], (0, 2, 1))
        ref = jnp.transpose(jnp.asarray(mel_ref[None]), (0, 2, 1))
        wav_gen = np.asarray(self.vocoder(gen))[0]
        wav_ref = np.asarray(self.vocoder(ref))[0]
        audio_io.write_wav(os.path.join(sample_dir, f"update_{update}_gen.wav"),
                           wav_gen, 24000)
        audio_io.write_wav(os.path.join(sample_dir, f"update_{update}_ref.wav"),
                           wav_ref, 24000)

    # -- resume -------------------------------------------------------------

    def maybe_resume(self) -> int:
        restored = self.ckpt.restore(self.state)
        if restored is not None:
            if self._state_sh is not None:
                # re-establish the ZeRO-1 layout on the restored trees
                restored = jax.tree.map(jax.device_put, restored, self._state_sh)
            self.state = restored
            return int(restored.step)
        return 0

    # -- loop ---------------------------------------------------------------

    def train(self, dataset, resumable_with_seed: Optional[int] = 666,
              max_updates: Optional[int] = None, log_every: int = 10) -> dict:
        cfg = self.cfg
        start_update = self.maybe_resume()
        key = jax.random.PRNGKey(resumable_with_seed or 0)

        frame_lens = [dataset.get_frame_len(i) for i in range(len(dataset))]
        sampler = DynamicBatchSampler(
            frame_lens,
            frames_threshold=cfg.batch_size_per_device * self.dp_size,
            max_samples=cfg.max_samples,
            random_seed=resumable_with_seed,
        )

        updates_per_epoch = max(len(sampler) // max(cfg.grad_accumulation_steps, 1), 1)
        start_epoch = start_update // updates_per_epoch
        skip_batches = (start_update % updates_per_epoch) * cfg.grad_accumulation_steps

        update = start_update
        t0 = time.time()
        last_metrics: dict = {}
        accum_grads = None
        accum_loss = 0.0
        accum_count = 0
        for epoch in range(start_epoch, cfg.epochs):
            sampler.set_epoch(epoch)
            for bi, batch_idx in enumerate(sampler):
                if epoch == start_epoch and bi < skip_batches:
                    continue
                # batch rows must be divisible over the data axis
                if self.dp_size > 1 and len(batch_idx) % self.dp_size != 0:
                    batch_idx = batch_idx[:(len(batch_idx) // self.dp_size) * self.dp_size]
                    if not batch_idx:
                        continue
                if jax.process_count() > 1:
                    # per-host loading: every process sees the same sampler
                    # sequence, loads audio only for its own rows, and pads to
                    # the globally-agreed width (train/multihost.py)
                    from f5tts_tpu.train import multihost as mh
                    from f5tts_tpu.parallel.mesh import batch_sharding

                    dsh = batch_sharding(self.mesh)
                    width = mh.global_pad_width([frame_lens[i] for i in batch_idx])
                    texts = [dataset.get_text(i) for i in batch_idx]
                    text_ids_g = self.tokenize(texts)
                    rows = mh.process_local_rows(dsh, len(batch_idx))
                    samples = [dataset[batch_idx[r]] for r in range(rows.start, rows.stop)]
                    local = collate(samples, pad_to=width)
                    mel = mh.assemble_global(dsh, local["mel"], len(batch_idx))
                    lens = mh.assemble_global(dsh, local["mel_lengths"], len(batch_idx))
                    text_ids = mh.assemble_global(
                        dsh, np.ascontiguousarray(text_ids_g[rows]), len(batch_idx))
                    if self.cfg.log_samples and len(samples):
                        t0_len = int(local["mel_lengths"][0])
                        self._last_sample = (local["mel"][0, :t0_len].copy(),
                                             samples[0].text)
                else:
                    samples = [dataset[i] for i in batch_idx]
                    batch = collate(samples)
                    text_ids = self.tokenize(batch["text"])
                    if self.cfg.log_samples:
                        t0_len = int(batch["mel_lengths"][0])
                        self._last_sample = (batch["mel"][0, :t0_len].copy(),
                                             batch["text"][0])
                    mel, text_ids, lens = self._device_put_batch(
                        batch["mel"], text_ids, batch["mel_lengths"])

                key, sub = jax.random.split(key)
                if self._accum == 1:
                    # host-side `update` mirrors state.step, so the
                    # post-increment counter decides whether EMA fires
                    # without fetching the device scalar
                    fn = (self._noema_fn
                          if (self._noema_fn is not None
                              and (update + 1) % self._ema_every != 0)
                          else self._step_fn)
                    self.state, metrics = fn(self.state, sub, mel, text_ids, lens)
                else:
                    loss, grads = self._grad_fn(self.state.params, sub, mel, text_ids, lens)
                    accum_grads = (grads if accum_grads is None
                                   else self._accum_fn(accum_grads, grads))
                    accum_loss = accum_loss + loss
                    accum_count += 1
                    if accum_count < self._accum:
                        continue
                    mean_grads = self._mean_fn(accum_grads, self._accum)
                    self.state, metrics = self._apply_fn(
                        self.state, accum_loss / self._accum, mean_grads)
                    accum_grads, accum_loss, accum_count = None, 0.0, 0
                update = int(self.state.step)

                if update % log_every == 0:
                    last_metrics = {k: float(v) for k, v in metrics.items()}
                    last_metrics["updates_per_s"] = log_every / max(time.time() - t0, 1e-9)
                    t0 = time.time()
                    self._log(last_metrics, update)

                # milestone checkpoints rotate; the heartbeat is its own
                # slot and never evicts a milestone (reference model_last.pt
                # vs model_<step>.pt, trainer.py:150-183)
                if update % cfg.save_per_updates == 0:
                    self.ckpt.save(self.state)
                    # sample synthesis on the main process only (reference
                    # trainer.py:408: is_main_process guard)
                    if jax.process_index() == 0:
                        if self.sample_fn is not None:
                            self.sample_fn(self.state.ema_params, update)
                        if cfg.log_samples:
                            self._log_sample(update)
                elif update % cfg.last_per_updates == 0:
                    self.ckpt.save(self.state, heartbeat=True)

                if max_updates is not None and update >= max_updates:
                    self.ckpt.save(self.state, wait=True, heartbeat=True)
                    return last_metrics
        self.ckpt.save(self.state, wait=True, heartbeat=True)
        return last_metrics

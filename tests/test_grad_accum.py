"""Gradient accumulation path in the Trainer."""

import jax
import jax.numpy as jnp
import numpy as np

from f5tts_tpu.config import CFMConfig, ModelArch, TrainConfig
from f5tts_tpu.models import dit
from f5tts_tpu.train.dataset import Sample

ARCH = ModelArch(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, mel_dim=8,
                 text_num_embeds=30, text_dim=16, conv_layers=1)


class TinyDataset:
    def __len__(self):
        return 8

    def get_frame_len(self, i):
        return 48

    def __getitem__(self, i):
        r = np.random.default_rng(i)
        return Sample(mel=r.standard_normal((48, ARCH.mel_dim)).astype(np.float32),
                      text="ab cd")


def test_grad_accumulation_update_cadence(tmp_path):
    from f5tts_tpu.train.trainer import Trainer

    params = dit.init_dit(jax.random.PRNGKey(0), ARCH)
    statics = dit.DiTStatics(ARCH)
    cfg = TrainConfig(batch_size_per_device=100, max_samples=2, epochs=4,
                      learning_rate=1e-3, num_warmup_updates=2,
                      grad_accumulation_steps=2,
                      save_per_updates=100, last_per_updates=100,
                      save_dir=str(tmp_path / "ck"), logger=None)
    vocab = {c: i for i, c in enumerate(" abcd")}
    tr = Trainer(params, statics, cfg, vocab_char_map=vocab, tokenizer="char",
                 total_updates=50, dtype=jnp.float32, backend="xla")
    ds = TinyDataset()
    metrics = tr.train(ds, resumable_with_seed=1, max_updates=3, log_every=1)
    # 8 samples / 2-per-batch = 4 batches/epoch -> 2 updates/epoch at accum=2
    assert int(tr.state.step) == 3
    assert np.isfinite(metrics["loss"])

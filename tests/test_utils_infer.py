"""Reference-shaped one-call API (infer/utils_infer.py) on a tiny model."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from f5tts_tpu.config import MelConfig, ModelArch, ModelConfig, SamplingConfig
from f5tts_tpu.infer import audio_io
from f5tts_tpu.infer import utils_infer as UI
from f5tts_tpu.models import dit
from f5tts_tpu.text.vocab import load_vocab
from f5tts_tpu.vocoder.vocos import Vocos, VocosConfig, init_vocos

ARCH = ModelArch(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=100,
                 text_num_embeds=2545, text_dim=32, conv_layers=1)


def _model_obj():
    cfg = ModelConfig(
        arch=ARCH, mel_spec=MelConfig(),
        sampling=dataclasses.replace(SamplingConfig(), nfe_steps=2, max_duration=512),
    )
    vocab = load_vocab("f5tts_tpu/data/vocab_emilia_pinyin.txt")
    params = dit.init_dit(jax.random.PRNGKey(0), ARCH)
    return UI.LoadedModel(params=params, config=cfg, vocab=vocab,
                          dtype=jnp.float32, backend="xla")


def _vocoder():
    voc_cfg = VocosConfig(input_channels=100, dim=32, intermediate_dim=64, num_layers=1)
    return Vocos(init_vocos(jax.random.PRNGKey(1), voc_cfg), voc_cfg).decode


def test_infer_process_end_to_end():
    model = _model_obj()
    voc = _vocoder()
    rng = np.random.default_rng(0)
    ref = (rng.standard_normal(24000) * 0.05).astype(np.float32)
    wave, sr, mel = UI.infer_process(
        (ref, 24000), "a reference.", "hello world", model, voc,
        nfe_step=2, show_info=lambda *_: None)
    assert sr == 24000 and wave.ndim == 1 and len(wave) > 1000
    assert np.isfinite(wave).all() and mel.shape[0] == 100
    # pipeline is cached per vocoder
    assert model.pipeline(voc) is model.pipeline(voc)


def test_infer_batch_process_streaming_and_batch():
    model = _model_obj()
    voc = _vocoder()
    rng = np.random.default_rng(1)
    ref = (rng.standard_normal(24000) * 0.05).astype(np.float32)
    wave, sr, mel = UI.infer_batch_process(
        (ref, 24000), "a reference.", ["hello.", "world."], model, voc, nfe_step=2)
    assert len(wave) > 1000 and mel.shape[0] == 100
    chunks = list(UI.infer_batch_process(
        (ref, 24000), "a reference.", ["hi."], model, voc,
        streaming=True, chunk_size=1024, nfe_step=2))
    assert chunks and all(len(c[0]) <= 1024 and c[1] == 24000 for c in chunks)


def test_remove_silence_for_generated_wav(tmp_path):
    sr = 24000
    tone = 0.2 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr).astype(np.float32)
    wav = np.concatenate([tone, np.zeros(3 * sr, np.float32), tone])
    path = os.path.join(tmp_path, "x.wav")
    audio_io.write_wav(path, wav, sr)
    UI.remove_silence_for_generated_wav(path)
    out, _ = audio_io.read_wav(path)
    assert len(out) < len(wav)  # internal silence collapsed
    assert len(out) >= 2 * len(tone)  # speech kept


def test_load_model_and_vocoder_presets():
    # smallest preset shape check: loader path only (random init, no ckpt)
    voc = UI.load_vocoder("vocos")
    assert callable(voc)
    model = UI.load_model("F5TTS_Small") if "F5TTS_Small" in UI.PRESETS else None
    if model is not None:
        assert model.config.arch.text_num_embeds == 2545

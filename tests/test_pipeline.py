"""End-to-end inference pipeline on a tiny model (CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from f5tts_tpu.config import MelConfig, ModelArch, SamplingConfig
from f5tts_tpu.infer import audio_io
from f5tts_tpu.infer.pipeline import InferencePipeline
from f5tts_tpu.models import dit
from f5tts_tpu.text.vocab import load_vocab
from f5tts_tpu.vocoder.vocos import Vocos, VocosConfig, init_vocos

ARCH = ModelArch(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=100,
                 text_num_embeds=2545, text_dim=32, conv_layers=1)


def _pipeline():
    params = dit.init_dit(jax.random.PRNGKey(0), ARCH)
    statics = dit.DiTStatics(ARCH)
    voc_cfg = VocosConfig(input_channels=100, dim=32, intermediate_dim=64, num_layers=1)
    vocoder = Vocos(init_vocos(jax.random.PRNGKey(1), voc_cfg), voc_cfg)
    vocab = load_vocab("f5tts_tpu/data/vocab_emilia_pinyin.txt")
    return InferencePipeline(
        params=params, statics=statics, vocoder=vocoder.decode,
        vocab_char_map=vocab, mel_cfg=MelConfig(),
        sampling=dataclasses.replace(SamplingConfig(), nfe_steps=2, max_duration=512),
        tokenizer="pinyin", dtype=jnp.float32, backend="xla", bucket_size=128,
    )


def test_end_to_end_infer():
    pipe = _pipeline()
    rng = np.random.default_rng(0)
    ref_wav = (rng.standard_normal(24000) * 0.05).astype(np.float32)  # 1 s
    wave, sr, mel = pipe.infer(ref_wav, 24000, "a reference.", "hello world", seed=0, nfe_step=2)
    assert sr == 24000
    assert wave.ndim == 1 and len(wave) > 1000
    assert np.isfinite(wave).all()
    assert mel.shape[0] == 100 and mel.shape[1] > 0


def test_long_utterance_bucket_end_to_end():
    """A ~28 s generation rides a n>2048 bucket through the full pipeline
    (the reference serves 3000-frame profiles; VERDICT r4 #1). fix_duration
    pins the sampler to the 2816 bucket; output must cover the requested
    duration and stay finite."""
    pipe = _pipeline()
    pipe.sampling = dataclasses.replace(pipe.sampling, max_duration=4096)
    rng = np.random.default_rng(1)
    ref_wav = (rng.standard_normal(24000) * 0.05).astype(np.float32)
    fix_s = 2800 * 256 / 24000  # ~29.9 s total -> 2816 bucket
    wave, sr, mel = pipe.infer(ref_wav, 24000, "a reference.",
                               "a long utterance", seed=0, nfe_step=2,
                               fix_duration=fix_s)
    assert sr == 24000
    assert np.isfinite(wave).all()
    # generated part = total minus the ~1 s reference prompt
    assert len(wave) > (2800 - 128) * 256 - 24000 - 4096


def test_infer_deterministic_with_seed():
    pipe = _pipeline()
    rng = np.random.default_rng(0)
    ref_wav = (rng.standard_normal(24000) * 0.05).astype(np.float32)
    w1, _, _ = pipe.infer(ref_wav, 24000, "ref.", "hi there", seed=7, nfe_step=2)
    w2, _, _ = pipe.infer(ref_wav, 24000, "ref.", "hi there", seed=7, nfe_step=2)
    np.testing.assert_array_equal(w1, w2)


def test_infer_stream_yields_chunks():
    pipe = _pipeline()
    rng = np.random.default_rng(0)
    ref_wav = (rng.standard_normal(24000) * 0.05).astype(np.float32)
    chunks = list(pipe.infer_stream(ref_wav, 24000, "ref. ", ["hello world."],
                                    chunk_size=2048, seed=0, nfe_step=2))
    assert len(chunks) >= 2
    total = sum(len(c[0]) for c in chunks)
    assert total > 2048
    assert all(sr == 24000 for _, sr in chunks)


def test_resample_roundtrip():
    rng = np.random.default_rng(0)
    wav = rng.standard_normal(16000).astype(np.float32)
    up = audio_io.resample(wav, 16000, 24000)
    assert abs(len(up) - 24000) <= 2
    down = audio_io.resample(up, 24000, 16000)
    assert abs(len(down) - 16000) <= 2


def test_wav_io_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(1000) * 0.1).astype(np.float32)
    p = str(tmp_path / "x.wav")
    audio_io.write_wav(p, wav, 24000)
    back, sr = audio_io.read_wav(p)
    assert sr == 24000
    np.testing.assert_allclose(back, wav, atol=1e-3)


def test_clip_ref_audio_under_12s():
    rng = np.random.default_rng(0)
    sr = 24000
    # 20 s of speech-like noise with a silence gap at 5 s
    wav = (rng.standard_normal(sr * 20) * 0.1).astype(np.float32)
    wav[sr * 5 : sr * 7] = 0.0
    clipped = audio_io.clip_ref_audio(wav, sr)
    assert len(clipped) <= sr * 12 + sr  # 12 s + keep_silence margin
    assert len(clipped) > sr  # kept something


def test_pipeline_mmdit_backbone_end_to_end():
    """InferencePipeline drives the MMDiT backbone (MMDiT_Base preset wiring:
    cfm.BACKBONES['MMDiT']) through chunked infer AND the batched serving
    path — backbone parity at the pipeline level, not just the forward."""
    import dataclasses

    from f5tts_tpu.config import MelConfig, ModelArch, SamplingConfig
    from f5tts_tpu.infer.pipeline import InferencePipeline
    from f5tts_tpu.models import cfm, mmdit
    from f5tts_tpu.text.vocab import load_vocab
    from f5tts_tpu.vocoder.vocos import Vocos, VocosConfig, init_vocos

    arch = ModelArch(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2,
                     mel_dim=100, text_num_embeds=2545,
                     text_mask_padding=True)
    params = mmdit.init_mmdit(jax.random.PRNGKey(0), arch)
    voc_cfg = VocosConfig(input_channels=100, dim=32, intermediate_dim=64,
                          num_layers=1)
    voc = Vocos(init_vocos(jax.random.PRNGKey(1), voc_cfg), voc_cfg)
    pipe = InferencePipeline(
        params=params, statics=mmdit.MMDiTStatics(arch), vocoder=voc.decode,
        vocab_char_map=load_vocab("f5tts_tpu/data/vocab_emilia_pinyin.txt"),
        mel_cfg=MelConfig(),
        sampling=dataclasses.replace(SamplingConfig(), nfe_steps=2,
                                     max_duration=512),
        tokenizer="pinyin", dtype=jnp.float32, backend="xla",
        bucket_size=128, backbone=cfm.BACKBONES["MMDiT"])

    rng = np.random.default_rng(0)
    ref = (rng.standard_normal(12000) * 0.05).astype(np.float32)
    wave, sr, mel = pipe.infer(ref, 24000, "a ref. ", "hello there")
    assert sr == 24000 and len(wave) > 0 and np.isfinite(wave).all()
    assert mel.shape[0] == 100

    waves = pipe.generate_batch(
        [{"ref_wav": ref, "ref_text": "a ref. ", "gen_text": "hi"},
         {"ref_wav": ref, "ref_text": "a ref. ", "gen_text": "hello world"}],
        nfe_step=2)
    assert len(waves) == 2 and all(np.isfinite(w).all() for w in waves)

"""CLI parsing, speech editing, socket streaming server."""

import dataclasses
import socket
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from f5tts_tpu.config import MelConfig, ModelArch, SamplingConfig
from f5tts_tpu.infer.cli import build_parser, load_config, split_voice_segments
from f5tts_tpu.infer.pipeline import InferencePipeline
from f5tts_tpu.infer.speech_edit import build_edit_cond, edit_speech
from f5tts_tpu.models import dit
from f5tts_tpu.text.vocab import load_vocab
from f5tts_tpu.vocoder.vocos import Vocos, VocosConfig, init_vocos

ARCH = ModelArch(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, mel_dim=100,
                 text_num_embeds=2545, text_dim=16, conv_layers=1)


def _pipeline():
    params = dit.init_dit(jax.random.PRNGKey(0), ARCH)
    statics = dit.DiTStatics(ARCH)
    voc_cfg = VocosConfig(input_channels=100, dim=32, intermediate_dim=64, num_layers=1)
    vocoder = Vocos(init_vocos(jax.random.PRNGKey(1), voc_cfg), voc_cfg)
    return InferencePipeline(
        params=params, statics=statics, vocoder=vocoder.decode,
        vocab_char_map=load_vocab("f5tts_tpu/data/vocab_emilia_pinyin.txt"),
        mel_cfg=MelConfig(),
        sampling=dataclasses.replace(SamplingConfig(), nfe_steps=2, max_duration=512),
        tokenizer="pinyin", dtype=jnp.float32, backend="xla", bucket_size=128,
    )


def test_split_voice_segments():
    segs = split_voice_segments("Hello there. [town] Hi! [country] Howdy. [missing] x")
    assert segs[0] == ("main", "Hello there.")
    assert segs[1] == ("town", "Hi!")
    assert segs[2] == ("country", "Howdy.")
    assert segs[3] == ("missing", "x")


def test_cli_config_toml_and_overrides(tmp_path):
    toml = tmp_path / "c.toml"
    toml.write_text(
        'model = "F5TTS_v1_Base"\nref_audio = "a.wav"\nref_text = "hi"\n'
        'gen_text = "x"\nnfe_step = 16\n[voices.town]\nref_audio = "t.wav"\nref_text = "t"\n'
    )
    args = build_parser().parse_args(["-c", str(toml), "--nfe_step", "8"])
    cfg = load_config(args)
    assert cfg["nfe_step"] == 8  # CLI overrides toml
    assert cfg["ref_audio"] == "a.wav"
    assert cfg["voices"]["town"]["ref_audio"] == "t.wav"


def test_build_edit_cond():
    t, d = 100, 4
    mel = np.arange(t * d, dtype=np.float32).reshape(t, d)
    sr, hop = 24000, 256
    spf = hop / sr  # seconds per frame
    # edit frames [20, 30) with a fixed duration of 15 frames
    cond, mask = build_edit_cond(mel, [(20 * spf, 30 * spf)], [15 * spf], sr, hop)
    assert cond.shape[0] == 100 - 10 + 15
    assert mask.sum() == 100 - 10
    np.testing.assert_array_equal(cond[:20], mel[:20])           # kept prefix
    np.testing.assert_array_equal(cond[20:35], 0)                 # zeroed edit span
    np.testing.assert_array_equal(cond[35:], mel[30:])            # kept suffix
    assert not mask[20:35].any() and mask[:20].all() and mask[35:].all()


def test_edit_speech_end_to_end():
    pipe = _pipeline()
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(24000) * 0.05).astype(np.float32)
    out, sr = edit_speech(pipe, wav, 24000, "hello there", [(0.3, 0.5)],
                          fix_durations=[0.25], nfe_step=2)
    assert sr == 24000
    assert np.isfinite(out).all()
    assert len(out) > 10000


def test_socket_server_roundtrip():
    from f5tts_tpu.infer.socket_client import listen_to_f5tts
    from f5tts_tpu.infer.socket_server import TTSStreamingProcessor, start_server

    pipe = _pipeline()
    rng = np.random.default_rng(0)
    ref = (rng.standard_normal(12000) * 0.05).astype(np.float32)
    proc = TTSStreamingProcessor(pipe, ref, 24000, "ref text.",
                                 first_chunk_chars=(12, 40))

    # free port
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    th = threading.Thread(target=start_server,
                          args=("127.0.0.1", port, proc, None, 1), daemon=True)
    th.start()
    time.sleep(0.3)
    stats = listen_to_f5tts("Hello world.", "127.0.0.1", port, out_path="")
    assert stats["samples"] > 1000
    assert stats["ttfb_s"] is not None and stats["ttfb_s"] < stats["total_s"] + 1e-9
    th.join(timeout=10)


def test_split_low_ttfb_whitespace_collapse():
    """Sentence coverage must be exact even when the input has collapsed
    whitespace runs (double spaces, newlines) — the old prefix-length cursor
    desynced and re-synthesized stray text."""
    from f5tts_tpu.infer.socket_server import TTSStreamingProcessor

    proc = TTSStreamingProcessor.__new__(TTSStreamingProcessor)  # skip __init__
    proc.first_chunk_chars = (12, 40, 80)

    text = "A b.  C d.\nE f. " + "This is a longer sentence for the tail. " * 3
    chunks = proc._split_low_ttfb(text)
    assert all(c.strip() for c in chunks)
    # every sentence appears exactly once, none duplicated or invented
    joined = " ".join(chunks)
    assert joined.count("A b.") == 1
    assert joined.count("C d.") == 1
    assert joined.count("E f.") == 1
    assert joined.count("longer sentence") == 3
    # no stray punctuation-only chunk
    assert all(any(ch.isalnum() for ch in c) for c in chunks)
    # first chunk honors the smallest budget
    assert len(chunks[0].encode("utf-8")) <= 12

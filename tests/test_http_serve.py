"""HTTP serving end-to-end: server handler + latency-sweep client."""

import dataclasses
import socket
import threading
from http.server import ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np

from f5tts_tpu.config import MelConfig, ModelArch, SamplingConfig
from f5tts_tpu.infer import audio_io
from f5tts_tpu.infer.client_http import run_sweep
from f5tts_tpu.infer.pipeline import InferencePipeline
from f5tts_tpu.infer.serve import DynamicBatcher, make_handler
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


def test_http_server_roundtrip(tmp_path):
    pipe = _pipeline()
    rng = np.random.default_rng(0)
    ref = str(tmp_path / "ref.wav")
    audio_io.write_wav(ref, (rng.standard_normal(12000) * 0.05).astype(np.float32), 24000)

    batcher = DynamicBatcher(pipe, max_batch_size=2, max_queue_delay_s=0.05)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(batcher, 24000))
    port = server.server_address[1]
    th = threading.Thread(target=server.serve_forever, daemon=True)
    th.start()
    try:
        stats = run_sweep(f"http://127.0.0.1:{port}",
                          {"ref_path": ref, "ref_text": "ref.", "gen_text": "hello world"},
                          n=3, concurrency=2)
        assert stats["errors"] == 0
        assert stats["requests"] == 3
        assert stats["audio_seconds"] > 0.5
        assert stats["latency_p99_s"] >= stats["latency_p50_s"]
    finally:
        server.shutdown()
        batcher.close()


def test_grpc_server_roundtrip(tmp_path):
    import grpc  # noqa: F401  (skip if missing)

    from f5tts_tpu.infer.grpc_server import serve, synthesize

    pipe = _pipeline()
    rng = np.random.default_rng(0)
    ref = str(tmp_path / "ref.wav")
    audio_io.write_wav(ref, (rng.standard_normal(12000) * 0.05).astype(np.float32), 24000)

    batcher = DynamicBatcher(pipe, max_batch_size=2, max_queue_delay_s=0.01)
    import socket as _socket

    s = _socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    server = serve(batcher, 24000, "127.0.0.1", port)
    try:
        wav_bytes = synthesize(f"127.0.0.1:{port}", ref, "ref.", "hello world",
                               timeout=120)
        assert wav_bytes[:4] == b"RIFF"
        assert len(wav_bytes) > 10000
        # server-side stats over gRPC (the write_triton_stats scrape analogue)
        from f5tts_tpu.infer.grpc_server import fetch_stats

        st = fetch_stats(f"127.0.0.1:{port}", timeout=30)
        assert st["success_count"] == 1 and st["error_count"] == 0
        assert st["exec_avg_ms"] is not None
    finally:
        server.stop(0)
        batcher.close()


def test_save_spectrogram(tmp_path):
    from f5tts_tpu.infer.viz import save_spectrogram

    mel = np.random.default_rng(0).standard_normal((100, 50)).astype(np.float32)
    p = str(tmp_path / "spec.png")
    save_spectrogram(mel, p)
    import os

    assert os.path.getsize(p) > 1000


def test_http_stream_endpoint(tmp_path):
    """/tts_stream: chunked s16le PCM with low-TTFB descending text budgets;
    total samples match a couple of generated chunks."""
    from f5tts_tpu.infer.client_http import send_request_stream

    pipe = _pipeline()
    rng = np.random.default_rng(1)
    ref = str(tmp_path / "ref.wav")
    audio_io.write_wav(ref, (rng.standard_normal(12000) * 0.05).astype(np.float32), 24000)

    batcher = DynamicBatcher(pipe, max_batch_size=2)
    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 make_handler(batcher, 24000, pipeline=pipe))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        ttfb, total, n_samples = send_request_stream(
            f"http://127.0.0.1:{port}",
            {"ref_path": ref, "ref_text": "ref.",
             "gen_text": "Hello there. This is a second, rather longer "
                         "sentence to force another chunk."})
        assert n_samples > 2000
        assert 0 < ttfb <= total
    finally:
        server.shutdown()
        batcher.close()


def test_chunk_text_low_ttfb_budgets():
    from f5tts_tpu.infer.pipeline import chunk_text, chunk_text_low_ttfb

    text = ("One. Two three four. Five six seven eight nine ten. "
            "Eleven twelve thirteen fourteen fifteen sixteen seventeen. "
            "Another long tail sentence that should pack at the full budget.")
    chunks = chunk_text_low_ttfb(text, first_chunk_chars=(12, 40, 80))
    assert len(chunks[0].encode()) <= 12 or chunks[0].endswith(".")
    # no text lost or duplicated
    joined = " ".join(chunks).split()
    ref = " ".join(chunk_text(text, 135)).split()
    assert joined == ref


def test_http_stream_first_chunk_requests_fine_bucket(tmp_path):
    """The /tts_stream handler marks only the FIRST text chunk fine_bucket."""
    from f5tts_tpu.infer.client_http import send_request_stream

    pipe = _pipeline()
    seen_flags = []
    orig = pipe.generate_batch_async

    def spy(reqs, **kw):
        seen_flags.extend(bool(r.get("fine_bucket")) for r in reqs)
        return orig(reqs, **kw)

    pipe.generate_batch_async = spy
    rng = np.random.default_rng(1)
    ref = str(tmp_path / "ref.wav")
    audio_io.write_wav(ref, (rng.standard_normal(12000) * 0.05).astype(np.float32), 24000)

    batcher = DynamicBatcher(pipe, max_batch_size=1)
    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 make_handler(batcher, 24000, pipeline=pipe))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        send_request_stream(
            f"http://127.0.0.1:{port}",
            {"ref_path": ref, "ref_text": "ref.",
             "gen_text": "Hello there. This is a second, rather longer "
                         "sentence to force another chunk."})
    finally:
        server.shutdown()
        batcher.close()
    assert len(seen_flags) >= 2
    assert seen_flags[0] is True and not any(seen_flags[1:])


def test_grpc_stream_roundtrip(tmp_path):
    """SynthesizeStream: multiple PCM chunks, first marked fine_bucket."""
    import grpc  # noqa: F401  (skip if missing)

    from f5tts_tpu.infer.grpc_server import serve, synthesize_stream

    pipe = _pipeline()
    seen_flags = []
    orig = pipe.generate_batch_async

    def spy(reqs, **kw):
        seen_flags.extend(bool(r.get("fine_bucket")) for r in reqs)
        return orig(reqs, **kw)

    pipe.generate_batch_async = spy
    rng = np.random.default_rng(0)
    ref = str(tmp_path / "ref.wav")
    audio_io.write_wav(ref, (rng.standard_normal(12000) * 0.05).astype(np.float32), 24000)

    batcher = DynamicBatcher(pipe, max_batch_size=1)
    import socket as _socket

    s = _socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    server = serve(batcher, 24000, "127.0.0.1", port)
    try:
        chunks = list(synthesize_stream(
            f"127.0.0.1:{port}", ref, "ref.",
            "Hello there. This is a second, rather longer sentence "
            "to force another chunk.", timeout=180))
        assert len(chunks) >= 2
        assert all(len(c) % 2 == 0 and len(c) > 0 for c in chunks)
        pcm = np.frombuffer(b"".join(chunks), "<i2")
        assert np.isfinite(pcm.astype(np.float32)).all() and len(pcm) > 2000
    finally:
        server.stop(0)
        batcher.close()
    assert seen_flags[0] is True and not any(seen_flags[1:])

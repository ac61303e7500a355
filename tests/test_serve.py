"""Batched generation and the dynamic-batching serving layer."""

import dataclasses
import threading

import jax
import jax.numpy as jnp
import numpy as np

from f5tts_tpu.config import MelConfig, ModelArch, SamplingConfig
from f5tts_tpu.infer.pipeline import InferencePipeline
from f5tts_tpu.infer.serve import DynamicBatcher
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


def _req(seed, text="hello there"):
    rng = np.random.default_rng(seed)
    return {"ref_wav": (rng.standard_normal(12000) * 0.05).astype(np.float32),
            "ref_text": "ref. ", "gen_text": text}


def test_generate_batch_shapes():
    pipe = _pipeline()
    waves = pipe.generate_batch([_req(0), _req(1, "a much longer target text here")],
                                nfe_step=2)
    assert len(waves) == 2
    assert all(np.isfinite(w).all() for w in waves)
    assert len(waves[1]) > len(waves[0])  # longer text -> longer audio


def test_dynamic_batcher_groups_requests():
    pipe = _pipeline()
    calls = []
    orig = pipe.generate_batch_async

    def spy(reqs, **kw):
        calls.append(len(reqs))
        return orig(reqs, **kw)

    pipe.generate_batch_async = spy
    batcher = DynamicBatcher(pipe, max_batch_size=4, max_queue_delay_s=0.5)
    try:
        results = [None] * 3

        def worker(i):
            results[i] = batcher.submit(_req(i))

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert all(r is not None and len(r) > 0 for r in results)
        assert max(calls) > 1  # at least one call actually batched
    finally:
        batcher.close()


def test_dynamic_batcher_propagates_errors():
    pipe = _pipeline()

    def boom(reqs, **kw):
        raise ValueError("bad batch")

    pipe.generate_batch_async = boom
    batcher = DynamicBatcher(pipe, max_batch_size=2, max_queue_delay_s=0.01)
    try:
        import pytest

        with pytest.raises(RuntimeError, match="bad batch"):
            batcher.submit(_req(0), timeout=10)
    finally:
        batcher.close()


def test_dynamic_batcher_propagates_finalize_errors():
    # errors in the result-fetch stage (finalizer thread) must also reach
    # the waiting client, not hang it
    pipe = _pipeline()

    def boom(pending):
        raise ValueError("bad fetch")

    pipe.finalize_batch = boom
    batcher = DynamicBatcher(pipe, max_batch_size=2, max_queue_delay_s=0.01)
    try:
        import pytest

        with pytest.raises(RuntimeError, match="bad fetch"):
            batcher.submit(_req(0), timeout=30)
    finally:
        batcher.close()


def test_warmup_requests_hit_requested_buckets():
    """The warmup sweep must compile EXACTLY the requested frame buckets:
    fix_duration pins the estimator (the byte-ratio path overshoots ~4x
    with a short warmup ref text)."""
    import jax.numpy as jnp

    from f5tts_tpu.infer.pipeline import estimate_duration_frames
    from f5tts_tpu.models import cfm
    from f5tts_tpu.utils import duration_bucket

    sr, hop = 24000, 256
    for frames in (256, 512, 1024):
        gen_text = "w " * max(int(frames * 0.1), 8)
        est = estimate_duration_frames(
            189, "warm up. ", gen_text, 1.0, frames * hop / sr, sr, hop)
        # token count ~ len(gen_text)/1 chars; ref ~189 frames; both far
        # below the bucket for every requested size here
        total = int(cfm.compute_duration(
            jnp.asarray([len(gen_text)]), jnp.asarray([189]),
            jnp.asarray([est]), 4096)[0])
        assert duration_bucket(total, 256, 4096) == frames, (frames, est, total)


def test_warmup_bucket_mapping_backbone_aware():
    """serve.warmup maps requested sizes to the widths the pipeline will
    actually select: DiT keeps 128k widths, UNetT shifts to 128k-1 so its
    prepended time token stays 128-aligned (utils.duration_bucket)."""
    from f5tts_tpu.utils import duration_bucket

    def widths(sizes, extra):
        return sorted({duration_bucket(f - extra, 256, 4096, extra)
                       for f in sizes})

    assert widths([256, 512, 1024], extra=0) == [256, 512, 1024]
    assert widths([256, 512, 1024], extra=1) == [255, 511, 1023]
    # pinning fix_duration to the mapped width re-selects the same bucket
    for extra in (0, 1):
        for w in widths([256, 512, 1024], extra):
            assert duration_bucket(w, 256, 4096, extra) == w


def test_batcher_stats_and_http_stats_endpoint():
    """Serving observability (VERDICT r3 #6): the batcher exports queue-delay /
    batch-occupancy / execute-time counters plus compile-shape events, and
    the HTTP server serves them at GET /stats."""
    import json
    import urllib.request
    from http.server import ThreadingHTTPServer

    from f5tts_tpu.infer.serve import make_handler

    pipe = _pipeline()
    batcher = DynamicBatcher(pipe, max_batch_size=4, max_queue_delay_s=0.2)
    try:
        # two concurrent requests -> one batch of 2 (cold shapes: nothing
        # warmed this pipeline yet)
        results = [None, None]

        def call(i):
            results[i] = batcher.submit(_req(i))

        ts = [threading.Thread(target=call, args=(i,)) for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert all(r is not None for r in results)

        s = batcher.stats.snapshot()
        assert s["success_count"] == 2 and s["error_count"] == 0
        assert s["batch_count"] == 1 and s["batch_occupancy"] == {"2": 1}
        assert s["queue_delay_avg_ms"] is not None
        assert s["exec_avg_ms"] is not None and s["exec_avg_ms"] > 0
        assert len(s["compile_shapes"]) == 1
        assert s["cold_shape_events"]  # first time this shape is seen
        assert "COLD" in batcher.stats.summary()

        # a repeat PAIR of the same shape is warm now (a single request
        # would be batch=1 — a different executable, hence cold)
        ts = [threading.Thread(target=call, args=(i,)) for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        s2 = batcher.stats.snapshot()
        assert len(s2["cold_shape_events"]) == len(s["cold_shape_events"])
        assert s2["compile_shapes"]["b2_n256"] == 2

        server = ThreadingHTTPServer(("127.0.0.1", 0),
                                     make_handler(batcher, pipe.sr))
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()
        try:
            with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats",
                                        timeout=10) as r:
                body = json.loads(r.read())
            assert body["success_count"] == 4
            assert body["batch_occupancy"]["2"] == 2
        finally:
            server.shutdown()
    finally:
        batcher.close()


def test_batch_size_bucketing_pads_to_power_of_two():
    """Odd batch sizes pad to the next power of two by duplicating the last
    request (every distinct batch size is its own multi-minute remote
    compile): 3 requests -> one b=4 executable, 3 results, stats record the
    PADDED size."""
    pipe = _pipeline()
    waves = pipe.generate_batch([_req(0), _req(1), _req(2, "some other text")],
                                nfe_step=2)
    assert len(waves) == 3
    assert all(len(w) > 0 and np.isfinite(w).all() for w in waves)
    # the executable shape is the padded batch
    assert any(k[0] == 4 for k in pipe.seen_serve_shapes)
    assert not any(k[0] == 3 for k in pipe.seen_serve_shapes)
    # a fresh 4-request batch reuses the same executable (not cold)
    pending = pipe.generate_batch_async([_req(i) for i in range(4)], nfe_step=2)
    assert pending[1][3] is False or pending[1][3] == False  # noqa: E712
    assert len(pipe.finalize_batch(pending)) == 4


def _pipeline256():
    """bucket_size=256 variant: the fine first-chunk bucket (half
    granularity, 128) only differs from the coarse one above 128."""
    params = dit.init_dit(jax.random.PRNGKey(0), ARCH)
    statics = dit.DiTStatics(ARCH)
    voc_cfg = VocosConfig(input_channels=100, dim=32, intermediate_dim=64, num_layers=1)
    vocoder = Vocos(init_vocos(jax.random.PRNGKey(1), voc_cfg), voc_cfg)
    return InferencePipeline(
        params=params, statics=statics, vocoder=vocoder.decode,
        vocab_char_map=load_vocab("f5tts_tpu/data/vocab_emilia_pinyin.txt"),
        mel_cfg=MelConfig(),
        sampling=dataclasses.replace(SamplingConfig(), nfe_steps=2, max_duration=512),
        tokenizer="pinyin", dtype=jnp.float32, backend="xla", bucket_size=256,
    )


def test_fine_bucket_gated_on_warm_shape():
    """fine_bucket requests ride the half-granularity bucket ONLY after that
    exact shape has been compiled (cold fine shapes must not trigger a
    mid-stream compile)."""
    pipe = _pipeline256()
    req = dict(_req(0), fix_duration=300 * 256 / 24000, fine_bucket=True)

    h, meta = pipe.generate_batch_async([req])
    assert meta[2] == 512, "cold fine shape must fall back to the coarse bucket"
    assert all(np.isfinite(w).all() for w in pipe.finalize_batch((h, meta)))

    # warm the fine shape explicitly (what serve_bench / warmup does)
    pipe.generate_batch([dict(req, fine_bucket=False)], bucket_size=128)

    h2, meta2 = pipe.generate_batch_async([req])
    assert meta2[2] == 384, "warm fine shape should engage"
    assert all(np.isfinite(w).all() for w in pipe.finalize_batch((h2, meta2)))

    # explicit bucket_size override bypasses the fine logic entirely
    h3, meta3 = pipe.generate_batch_async([req], bucket_size=256)
    assert meta3[2] == 512
    pipe.finalize_batch((h3, meta3))


def test_fine_gate_requires_finalize_not_dispatch():
    """ADVICE r4: the fine gate keys on finalize-complete shapes, not
    dispatch-time seen shapes — a dispatched-but-unfinalized fine warm is
    still (remotely) compiling and must not capture a live stream."""
    pipe = _pipeline256()
    req = dict(_req(0), fix_duration=300 * 256 / 24000, fine_bucket=True)

    # dispatch the fine shape but do NOT finalize yet
    h, meta = pipe.generate_batch_async(
        [dict(req, fine_bucket=False)], bucket_size=128)
    assert meta[4] in pipe.seen_serve_shapes  # dispatch-time tracker has it

    h2, meta2 = pipe.generate_batch_async([req])
    assert meta2[2] == 512, "unfinalized fine shape must not open the gate"

    pipe.finalize_batch((h, meta))  # warm completes
    h3, meta3 = pipe.generate_batch_async([req])
    assert meta3[2] == 384, "finalized fine shape should engage"
    pipe.finalize_batch((h2, meta2))
    pipe.finalize_batch((h3, meta3))


def test_fine_bucket_autowarm_background():
    """fine_autowarm: a cold fine miss compiles the fine shape in the
    background; later identical requests engage it."""
    import time as _t

    pipe = _pipeline256()
    pipe.fine_autowarm = True
    req = dict(_req(0), fix_duration=300 * 256 / 24000, fine_bucket=True)

    h, meta = pipe.generate_batch_async([req])
    assert meta[2] == 512  # first hit is coarse; warm kicked off in background
    pipe.finalize_batch((h, meta))

    deadline = _t.time() + 120
    got = None
    while _t.time() < deadline:
        h2, meta2 = pipe.generate_batch_async([req])
        pipe.finalize_batch((h2, meta2))
        got = meta2[2]
        if got == 384:
            break
        _t.sleep(0.5)
    assert got == 384, f"autowarm never engaged (last bucket {got})"

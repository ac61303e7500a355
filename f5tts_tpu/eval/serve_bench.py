"""Client-server benchmark: HTTP front end + dynamic batcher at concurrency C.

Mirrors the reference's Triton client-server benchmark (README.md:131-140:
26 prompt/target pairs, concurrency 2, 1x L20 -> RTF 0.0394, avg latency
253 ms; runtime/triton_trtllm/benchmark.py + client_grpc.py:425-447): spins
up the stdlib HTTP server over the DynamicBatcher (max_batch_size 4 / 1 ms
queue window, matching config.pbtxt), fires N distinct requests from C
client threads, and reports aggregate RTF + latency percentiles.

Every request carries a DIFFERENT (ref wav, gen text) pair — the axon tunnel
memoizes (executable, inputs), so identical payloads would measure cache
hits, not the device (see CLAUDE.md).

Usage: python -m f5tts_tpu.eval.serve_bench [--requests 26] [--concurrency 2]
Prints ONE JSON line on stdout.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import threading
import time
from http.server import ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np

# ~4.5 s and ~9 s of speech at the reference speaking rate; together with the
# ~4 s refs they land in the 768/1024-frame buckets warmed below
GEN_SHORT = ("The quick brown fox jumps over the lazy dog while the "
             "morning sun rises slowly over the quiet valley town.")
GEN_LONG = GEN_SHORT + (" Meanwhile the river keeps flowing past the old "
                        "stone bridge, carrying small boats and fallen "
                        "leaves toward the distant sea, and the fishermen "
                        "wave at every traveler passing by the shore road.")


def build_pipeline(nfe: int, quantization: str = "none"):
    from f5tts_tpu.config import PRESETS, MelConfig, SamplingConfig
    from f5tts_tpu.infer.pipeline import InferencePipeline
    from f5tts_tpu.models import dit
    from f5tts_tpu.text.vocab import load_vocab
    from f5tts_tpu.vocoder.vocos import Vocos, VocosConfig, init_vocos

    on_tpu = jax.default_backend() == "tpu"
    arch = dataclasses.replace(PRESETS["F5TTS_v1_Base"].arch, text_num_embeds=2545)
    params = dit.init_dit(jax.random.PRNGKey(0), arch)
    voc = Vocos(init_vocos(jax.random.PRNGKey(1), VocosConfig()), VocosConfig())
    return InferencePipeline(
        params=params, statics=dit.DiTStatics(arch), vocoder=voc.decode,
        vocab_char_map=load_vocab("f5tts_tpu/data/vocab_emilia_pinyin.txt"),
        mel_cfg=MelConfig(),
        sampling=dataclasses.replace(SamplingConfig(), nfe_steps=nfe),
        tokenizer="pinyin",
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        backend="pallas" if on_tpu else "xla",
        quantization=quantization,
    )


def make_payloads(n: int, sr: int, profile: str = "long") -> list[dict]:
    """Request sets:

    - "long": ~4 s refs + 8.0/10.8 s total durations (4-6.8 s generated) —
      a HARSHER set than the reference's protocol, kept as the stress row.
    - "ref": ~2 s refs + 5.4 s totals (~3.4 s generated), matching the
      scale of the reference's wenetspeech4tts prompt/text pairs
      (runtime/triton_trtllm benchmark: short Chinese sentences) — the
      apples-to-apples row for its 253 ms avg-latency figure.
    """
    import base64
    import io
    import struct

    rng = np.random.default_rng(0)
    payloads = []
    for i in range(n):
        ref_secs = (3.8 + 0.02 * (i % 8)) if profile == "long" else (1.9 + 0.02 * (i % 8))
        ref_len = int(sr * ref_secs)
        ref = (rng.standard_normal(ref_len) * 0.05).astype(np.float32)
        pcm = (np.clip(ref, -1, 1) * 32767).astype("<i2").tobytes()
        hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVEfmt " + struct.pack(
            "<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16) + b"data" + struct.pack("<I", len(pcm))
        gen = (GEN_SHORT if i % 2 == 0 else GEN_LONG) + f" Take {i}."
        if profile == "long":
            fix = 8.0 if i % 2 == 0 else 10.8  # 768/1024-frame buckets
        else:
            gen = GEN_SHORT + f" Take {i}."
            fix = 5.4  # 512-frame bucket
        payloads.append({
            "ref_audio_b64": base64.b64encode(hdr + pcm).decode(),
            "ref_text": "This is the reference voice sample for the benchmark. ",
            "gen_text": gen,
            # pin totals to exact compile buckets so the sweep hits exactly
            # the warmed executables
            "fix_duration": fix,
        })
    return payloads


def main(argv=None):
    from f5tts_tpu.infer.client_http import send_request
    from f5tts_tpu.infer.serve import DynamicBatcher, make_handler

    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=26)
    ap.add_argument("--concurrency", type=int, default=2)
    ap.add_argument("--nfe", type=int, default=16)
    ap.add_argument("--max_batch", type=int, default=4)
    ap.add_argument("--quantization", default="none")
    ap.add_argument("--window_ms", type=float, nargs="+", default=[1.0],
                    help="dynamic-batching windows to sweep; best-p50 row "
                         "becomes the headline JSON")
    ap.add_argument("--fine_stream", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="warm + use the half-granularity first-chunk "
                         "bucket in the TTFB sweep")
    ap.add_argument("--stream", type=int, default=0,
                    help="also measure TTFB over N /tts_stream requests "
                         "(low-TTFB descending-budget path)")
    ap.add_argument("--profile", choices=["long", "ref"], default="long",
                    help="'long' = 8/10.8 s totals (stress); 'ref' = 5.4 s "
                         "totals matching the reference protocol's request "
                         "scale (its 253 ms avg-latency row)")
    args = ap.parse_args(argv)

    # compiled buckets persist across bench/server restarts (same cache
    # bench.py and serve.warmup use) — repeat runs deserialize in seconds
    from f5tts_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    pipe = build_pipeline(args.nfe, args.quantization)
    sr = pipe.sr

    # pre-compile the exact (bucket, batch) combos the sweep will hit (with
    # C concurrent clients, batches of size 1..min(C, max_batch) form); a
    # cold remote compile mid-sweep would dominate the latency numbers
    rng = np.random.default_rng(99)
    t0 = time.time()
    warm_combos = ((8.0, GEN_SHORT), (10.8, GEN_LONG)) if args.profile == "long" \
        else ((5.4, GEN_SHORT),)
    warm_ref_secs = 4 if args.profile == "long" else 2  # match payload refs:
    # the ref-wav sample bucket is part of the compile shape
    for fd, gen in warm_combos:
        for bsz in range(1, min(args.concurrency, args.max_batch) + 1):
            # same ref/gen text LENGTHS as the sweep payloads so the token
            # axis lands in the same compile bucket (pipeline pads nt to 64s)
            reqs = [{
                "ref_wav": (rng.standard_normal(sr * warm_ref_secs) * 0.05).astype(np.float32),
                "ref_text": "This is the reference voice sample for the benchmark. ",
                "gen_text": gen + f" Warm {j}.",
                "fix_duration": fd,
            } for j in range(bsz)]
            pipe.generate_batch(reqs)
            print(f"warmed fix_duration={fd} batch={bsz} "
                  f"({time.time()-t0:.0f}s)", file=sys.stderr)

    payloads = make_payloads(args.requests, sr, args.profile)

    def run_once(window_ms: float):
        batcher = DynamicBatcher(pipe, max_batch_size=args.max_batch,
                                 max_queue_delay_s=window_ms / 1000.0)
        server = ThreadingHTTPServer(("127.0.0.1", 0),
                                     make_handler(batcher, sr, pipeline=pipe))
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{port}"

        lock = threading.Lock()
        latencies: list[float] = []
        samples: list[int] = []
        errors: list[str] = []
        work = list(enumerate(payloads))  # C workers drain distinct payloads

        def worker():
            while True:
                with lock:
                    if not work:
                        return
                    _, p = work.pop()
                try:
                    lat, ns = send_request(url, p)
                    with lock:
                        latencies.append(lat)
                        samples.append(ns)
                except Exception as e:
                    with lock:
                        errors.append(str(e))

        t0 = time.perf_counter()
        threads = [threading.Thread(target=worker) for _ in range(args.concurrency)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        server.shutdown()
        srv_stats = batcher.stats.snapshot()
        print(batcher.stats.summary(), file=sys.stderr)
        batcher.close()
        lat = np.asarray(latencies) if latencies else np.zeros(1)
        audio_s = sum(samples) / sr
        return {
            "window_ms": window_ms,
            "rtf": round(wall / max(audio_s, 1e-9), 5),
            "requests": len(latencies), "errors": len(errors),
            "wall_s": round(wall, 2), "audio_seconds": round(audio_s, 1),
            "latency_avg_ms": round(float(lat.mean()) * 1e3, 1),
            "latency_p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 1),
            "latency_p99_ms": round(float(np.percentile(lat, 99)) * 1e3, 1),
            "server_stats": srv_stats,
        }

    def run_stream(n: int):
        """TTFB sweep over the /tts_stream low-TTFB path (serial clients:
        TTFB is a per-stream property, not a saturation one)."""
        from f5tts_tpu.infer.client_http import send_request_stream

        batcher = DynamicBatcher(pipe, max_batch_size=args.max_batch)
        server = ThreadingHTTPServer(("127.0.0.1", 0),
                                     make_handler(batcher, sr, pipeline=pipe))
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()
        ttfbs, totals = [], []
        try:
            # warm the stream-path buckets (each descending text budget hits
            # its own duration bucket) with one untimed request
            warm = dict(payloads[0])
            warm.pop("fix_duration", None)
            send_request_stream(f"http://127.0.0.1:{port}", warm)
            if args.fine_stream:
                # compile the half-granularity FIRST-chunk bucket the
                # handler requests via fine_bucket (identical ref/text
                # shape to the sweep payloads), so the timed TTFBs ride it
                import base64
                import io

                from f5tts_tpu.infer import audio_io
                from f5tts_tpu.infer.pipeline import chunk_text_low_ttfb

                wav, in_sr = audio_io.read_wav(
                    io.BytesIO(base64.b64decode(payloads[0]["ref_audio_b64"])))
                first = chunk_text_low_ttfb(payloads[0]["gen_text"])[0]
                t0 = time.time()
                req = {"ref_wav": audio_io.resample(wav, in_sr, sr),
                       "ref_text": payloads[0]["ref_text"],
                       "gen_text": first, "speed": None}
                # the fine shape key includes batch size: the sweep sends
                # streams sequentially (b=1), but if run concurrently the
                # batcher can merge two first chunks into b=2 — warm both so
                # neither silently falls back to the coarse bucket
                for wb in (1, 2):
                    pipe.generate_batch(
                        [dict(req) for _ in range(wb)],
                        bucket_size=max(pipe.bucket_size // 2, 128))
                print(f"warmed fine first-chunk bucket at b=1,2 "
                      f"({time.time()-t0:.0f}s)", file=sys.stderr)
            for p in payloads[:n]:
                p = dict(p)
                p.pop("fix_duration", None)  # budgets pick their own durations
                ttfb, total, ns = send_request_stream(
                    f"http://127.0.0.1:{port}", p)
                ttfbs.append(ttfb)
                totals.append(total)
        finally:
            server.shutdown()
            batcher.close()
        return {
            "stream_requests": len(ttfbs),
            "ttfb_p50_ms": round(float(np.percentile(ttfbs, 50)) * 1e3, 1),
            "ttfb_p90_ms": round(float(np.percentile(ttfbs, 90)) * 1e3, 1),
            "stream_total_p50_ms": round(float(np.percentile(totals, 50)) * 1e3, 1),
        }

    # batch-window sweep (VERDICT r2 item 4): window-vs-latency trade on the
    # real chip. b=1 already compute-saturates the chip, so batching buys no
    # throughput — small/zero windows should win on latency.
    rows = [run_once(w) for w in args.window_ms]
    for r in rows:
        print(f"[serve-bench] window={r['window_ms']:g}ms rtf={r['rtf']} "
              f"avg={r['latency_avg_ms']}ms p50={r['latency_p50_ms']}ms "
              f"p99={r['latency_p99_ms']}ms errors={r['errors']}",
              file=sys.stderr)
    best = min(rows, key=lambda r: r["latency_p50_ms"])
    stream_stats = {}
    if args.stream:
        stream_stats = run_stream(args.stream)
        print(f"[serve-bench] stream: {stream_stats}", file=sys.stderr)
    print(json.dumps({
        "metric": "serve_rtf_concurrency%d" % args.concurrency,
        "value": best["rtf"],
        "unit": "rtf",
        "vs_baseline": round(0.0394 / best["rtf"], 3),
        "extra": {
            **best,
            **stream_stats,
            "baseline_latency_avg_ms": 253.0,
            "window_sweep": rows,
            "nfe": args.nfe, "max_batch": args.max_batch,
            "quant": args.quantization,
        },
    }))


if __name__ == "__main__":
    main()

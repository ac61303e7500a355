"""Batched TTS serving: dynamic request batching over the jitted sampler.

The TPU-side equivalent of the reference's Triton deployment
(src/f5_tts/runtime/triton_trtllm/model_repo_f5_tts/f5_tts/config.pbtxt:
max_batch_size 4 with a 1 ms dynamic_batching queue, and the python backend's
execute() loop, 1/model.py:176-269): requests arriving within a small window
are padded to one compile bucket and run as a single batch through
`InferencePipeline.generate_batch`.

Front end: a stdlib HTTP server (POST /tts with JSON
{"ref_audio_b64"| "ref_path", "ref_text", "gen_text"}) returning WAV bytes.
The batcher is transport-agnostic — the socket streaming server can sit in
front of it as well.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import queue
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from f5tts_tpu.infer import audio_io
from f5tts_tpu.infer.pipeline import InferencePipeline


@dataclass
class _Request:
    payload: dict
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[np.ndarray] = None
    error: Optional[str] = None
    t_enqueue: float = field(default_factory=time.perf_counter)
    t_dispatch: float = 0.0


class BatcherStats:
    """Server-side serving counters — the analogue of the Triton stats the
    reference scrapes into a summary (client_grpc.py:50 write_triton_stats,
    :425-447): per-request queue delay, per-batch execute time and occupancy,
    and compile-shape events (a new (batch, bucket) combo after warmup means
    a multi-minute remote compile landed inside a request)."""

    _MAX_SAMPLES = 100_000

    def __init__(self):
        self._lock = threading.Lock()
        self.reset()

    def reset(self):
        with self._lock:
            self.n_success = 0
            self.n_error = 0
            self.queue_delays: list[float] = []
            self.exec_times: list[float] = []       # per batch, dispatch->results
            self.batch_sizes: list[int] = []
            self.shapes_seen: dict[tuple, int] = {}  # (batch, n_bucket) -> hits
            self.new_shape_events: list[tuple] = []  # shapes first seen mid-serve

    def record_dispatch(self, batch: list, now: float):
        with self._lock:
            if len(self.queue_delays) < self._MAX_SAMPLES:
                self.queue_delays.extend(now - r.t_enqueue for r in batch)
            self.batch_sizes.append(len(batch))

    def record_shape(self, batch_size: int, n_bucket: int, cold: bool = False):
        """`cold` comes from the pipeline's persistent shape tracking
        (InferencePipeline.seen_serve_shapes), so warmup sweeps run directly
        on the pipeline mark their shapes warm for every later batcher."""
        key = (batch_size, n_bucket)
        with self._lock:
            if cold:
                self.new_shape_events.append(key)
            self.shapes_seen[key] = self.shapes_seen.get(key, 0) + 1

    def record_done(self, n_requests: int, exec_s: float, ok: bool):
        with self._lock:
            if len(self.exec_times) < self._MAX_SAMPLES:
                self.exec_times.append(exec_s)
            if ok:
                self.n_success += n_requests
            else:
                self.n_error += n_requests

    def snapshot(self) -> dict:
        def pct(xs, q):
            return round(float(np.percentile(xs, q)) * 1e3, 2) if xs else None

        with self._lock:
            qd, et, bs = self.queue_delays, self.exec_times, self.batch_sizes
            occ = {}
            for b in bs:
                occ[str(b)] = occ.get(str(b), 0) + 1
            return {
                "request_count": self.n_success + self.n_error,
                "success_count": self.n_success,
                "error_count": self.n_error,
                "batch_count": len(bs),
                "avg_batch_size": round(sum(bs) / len(bs), 2) if bs else None,
                "batch_occupancy": occ,
                "queue_delay_avg_ms": (round(sum(qd) / len(qd) * 1e3, 2)
                                       if qd else None),
                "queue_delay_p50_ms": pct(qd, 50),
                "queue_delay_p99_ms": pct(qd, 99),
                "exec_avg_ms": (round(sum(et) / len(et) * 1e3, 2)
                                if et else None),
                "exec_p50_ms": pct(et, 50),
                "exec_p99_ms": pct(et, 99),
                "compile_shapes": {f"b{b}_n{n}": c
                                   for (b, n), c in sorted(self.shapes_seen.items())},
                "cold_shape_events": [f"b{b}_n{n}"
                                      for b, n in self.new_shape_events],
            }

    def summary(self) -> str:
        """Human-readable report in the spirit of the reference's
        write_triton_stats output."""
        s = self.snapshot()
        lines = [
            "serving stats:",
            f"  requests: {s['request_count']} "
            f"(ok {s['success_count']} / err {s['error_count']})",
            f"  batches: {s['batch_count']}, avg occupancy "
            f"{s['avg_batch_size']}, histogram {s['batch_occupancy']}",
            f"  queue delay ms: avg {s['queue_delay_avg_ms']} "
            f"p50 {s['queue_delay_p50_ms']} p99 {s['queue_delay_p99_ms']}",
            f"  batch execute ms: avg {s['exec_avg_ms']} "
            f"p50 {s['exec_p50_ms']} p99 {s['exec_p99_ms']}",
            f"  compile shapes (batch,bucket)->hits: {s['compile_shapes']}",
        ]
        if s["cold_shape_events"]:
            lines.append(f"  COLD shapes first seen mid-serve (likely remote "
                         f"compiles inside requests): {s['cold_shape_events']}")
        return "\n".join(lines)


class DynamicBatcher:
    """Collect requests for up to `max_queue_delay_s`, run up to
    `max_batch_size` of them as one padded batch."""

    def __init__(self, pipeline: InferencePipeline, max_batch_size: int = 4,
                 max_queue_delay_s: float = 0.001):
        self.pipeline = pipeline
        self.max_batch_size = max_batch_size
        self.max_queue_delay_s = max_queue_delay_s
        self.stats = BatcherStats()
        self.q: "queue.Queue[_Request]" = queue.Queue()
        # two-stage pipeline: the dispatch loop issues the NEXT batch's
        # device call while the finalizer thread blocks on the previous
        # one's result fetch — the host->device round trip (~80 ms over the
        # dev tunnel) overlaps device compute instead of serializing with it
        self._pending: "queue.Queue[tuple]" = queue.Queue(maxsize=2)
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()
        self._finalizer = threading.Thread(target=self._finalize_loop, daemon=True)
        self._finalizer.start()

    def submit(self, payload: dict, timeout: float = 120.0) -> np.ndarray:
        req = _Request(payload)
        self.q.put(req)
        if not req.done.wait(timeout):
            raise TimeoutError("tts request timed out")
        if req.error:
            raise RuntimeError(req.error)
        return req.result

    def close(self):
        self._stop.set()
        self.thread.join(timeout=5)
        self._finalizer.join(timeout=5)

    def _loop(self):
        while not self._stop.is_set():
            try:
                first = self.q.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.time() + self.max_queue_delay_s
            while len(batch) < self.max_batch_size:
                remaining = deadline - time.time()
                if remaining <= 0:
                    break
                try:
                    batch.append(self.q.get(timeout=remaining))
                except queue.Empty:
                    break
            self._run(batch)

    def _run(self, batch: list[_Request]):
        now = time.perf_counter()
        for r in batch:
            r.t_dispatch = now
        self.stats.record_dispatch(batch, now)
        try:
            pending = self.pipeline.generate_batch_async(
                [r.payload for r in batch])
            # pending = (handle, (ref_lens, totals, n_bucket, shape_is_cold))
            meta = pending[1]
            self.stats.record_shape(len(batch), meta[2],
                                    cold=bool(meta[3]) if len(meta) > 3 else False)
            self._pending.put((batch, pending))  # finalizer fetches + replies
        except Exception as e:  # propagate per-request
            self.stats.record_done(len(batch), time.perf_counter() - now, False)
            for r in batch:
                r.error = f"{type(e).__name__}: {e}"
                r.done.set()

    def _finalize_loop(self):
        while not (self._stop.is_set() and self._pending.empty()):
            try:
                batch, pending = self._pending.get(timeout=0.1)
            except queue.Empty:
                continue
            try:
                waves = self.pipeline.finalize_batch(pending)
                self.stats.record_done(
                    len(batch), time.perf_counter() - batch[0].t_dispatch, True)
                for r, w in zip(batch, waves):
                    r.result = w
                    r.done.set()
            except Exception as e:
                self.stats.record_done(
                    len(batch), time.perf_counter() - batch[0].t_dispatch, False)
                for r in batch:
                    r.error = f"{type(e).__name__}: {e}"
                    r.done.set()


def _wav_bytes(wave: np.ndarray, sr: int) -> bytes:
    import struct

    pcm = (np.clip(wave, -1, 1) * 32767).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVEfmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16) + b"data" + struct.pack("<I", len(pcm))
    return hdr + pcm


def warmup(pipeline: InferencePipeline, buckets: list[int] | None = None,
           batch_sizes: list[int] | None = None) -> None:
    """Pre-compile the jitted sampler for the shape buckets the server will
    serve (first-request compiles take minutes on a cold pod; a warmup sweep
    moves them to startup)."""
    import time

    buckets = buckets or [256, 512, 1024]
    batch_sizes = batch_sizes or [1, 2, 4]
    sr = pipeline.sr
    # cold-start insurance: compiled buckets persist across server restarts
    from f5tts_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    # map each requested size to the bucket width the pipeline actually
    # selects (backbone-aware: UNetT widths are 128k-1 so its prepended time
    # token keeps the padded sequence 128-aligned, utils.duration_bucket)
    from f5tts_tpu.utils import duration_bucket

    extra = pipeline.backbone.seq_extra_tokens
    buckets = sorted({duration_bucket(f - extra, pipeline.bucket_size,
                                      pipeline.sampling.max_duration, extra)
                      for f in buckets})
    for frames in buckets:
        for b in batch_sizes:
            # pin the duration with fix_duration so the sweep compiles
            # EXACTLY the requested frame bucket: the byte-ratio estimator
            # scales by the ref clip's frames-per-byte (~21 with a short ref
            # text) and overshot ~4x, compiling buckets nobody asked for
            reqs = [{
                "ref_wav": np.zeros(int(sr * 2.0), np.float32),
                "ref_text": "warm up. ",
                "gen_text": "w " * max(int(frames * 0.1), 8),
                "fix_duration": frames * pipeline.hop / sr,
            } for _ in range(b)]
            t0 = time.time()
            try:
                pipeline.generate_batch(reqs)
                print(f"warmup bucket={frames} batch={b}: {time.time()-t0:.1f}s")
            except Exception as e:
                print(f"warmup bucket={frames} batch={b} failed: {e}")


def make_handler(batcher: DynamicBatcher, sr: int,
                 pipeline: Optional[InferencePipeline] = None):
    """HTTP handler: POST /tts (batched, full WAV response), GET /stats
    (JSON BatcherStats snapshot — the Triton-stats analogue) and, when
    `pipeline` is given, POST /tts_stream — a chunked s16le PCM stream with
    the socket server's low-TTFB policy (small, growing first-chunk text
    budgets, reference socket_server.py:139-143): the first audio bytes
    leave after the FIRST small text chunk's synthesis instead of the whole
    request's."""

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path == "/stats":
                out = json.dumps(batcher.stats.snapshot()).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(out)))
                self.end_headers()
                self.wfile.write(out)
            else:
                self.send_error(404)

        def _read_body(self):
            length = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(length))
            if "ref_audio_b64" in body:
                raw = base64.b64decode(body["ref_audio_b64"])
                wav, in_sr = audio_io.read_wav(io.BytesIO(raw))
            else:
                wav, in_sr = audio_io.read_wav(body["ref_path"])
            return audio_io.resample(wav, in_sr, sr), body

        def do_POST(self):
            if self.path == "/tts":
                self._tts()
            elif self.path == "/tts_stream" and pipeline is not None:
                self._tts_stream()
            else:
                self.send_error(404)

        def _tts(self):
            try:
                wav, body = self._read_body()
                wave = batcher.submit({
                    "ref_wav": wav,
                    "ref_text": body.get("ref_text", ""),
                    "gen_text": body["gen_text"],
                    "speed": body.get("speed"),
                    "fix_duration": body.get("fix_duration"),
                })
                out = _wav_bytes(wave, sr)
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Content-Length", str(len(out)))
                self.end_headers()
                self.wfile.write(out)
            except Exception as e:
                self.send_error(500, f"{type(e).__name__}: {e}")

        def _tts_stream(self):
            from f5tts_tpu.infer.pipeline import chunk_text_low_ttfb

            try:
                wav, body = self._read_body()
                ref_text = body.get("ref_text", "")
                if not ref_text.endswith((". ", "。")):
                    ref_text = ref_text + ". " if not ref_text.endswith(".") \
                        else ref_text + " "
                chunks = chunk_text_low_ttfb(body["gen_text"])
            except Exception as e:
                self.send_error(500, f"{type(e).__name__}: {e}")
                return
            self.send_response(200)
            self.send_header("Content-Type",
                             f"audio/L16;rate={sr};channels=1")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def emit(data: bytes):
                self.wfile.write(f"{len(data):X}\r\n".encode())
                self.wfile.write(data)
                self.wfile.write(b"\r\n")

            try:
                # each text chunk rides the batched serving path (warmed
                # buckets, i16 wire format, shared device queue with /tts).
                # The FIRST chunk asks for the half-granularity duration
                # bucket (pipeline.generate_batch_async fine_bucket): up to
                # bucket_size/2 fewer padded sampler rows off the TTFB,
                # engaged only once that shape is warm.
                for ci, text_chunk in enumerate(chunks):
                    wave = batcher.submit({
                        "ref_wav": wav,
                        "ref_text": ref_text,
                        "gen_text": text_chunk,
                        "speed": body.get("speed"),
                        "fine_bucket": ci == 0,
                    })
                    pcm = (np.clip(wave, -1, 1) * 32767).astype("<i2").tobytes()
                    if pcm:
                        emit(pcm)
                        self.wfile.flush()
            except Exception:
                # do NOT emit the chunked terminator on a mid-stream failure:
                # a cleanly terminated stream is indistinguishable from
                # success. Drop the connection so the client sees an error.
                self.close_connection = True
                return
            self.wfile.write(b"0\r\n\r\n")

    return Handler


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--model", default="F5TTS_v1_Base")
    p.add_argument("--ckpt_file", default="")
    p.add_argument("--vocab_file", default="")
    p.add_argument("--max_batch_size", type=int, default=4)
    p.add_argument("--max_queue_delay_ms", type=float, default=1.0)
    p.add_argument("--warmup_buckets", type=int, nargs="*", default=[512, 1024],
                   help="compile these duration buckets at startup")
    p.add_argument("--fine_stream", action="store_true",
                   help="auto-warm half-granularity first-chunk buckets for "
                        "/tts_stream in the background (lower TTFB after the "
                        "first stream of a given ref/text shape)")
    args = p.parse_args(argv)

    from f5tts_tpu.infer.api import F5TTS

    tts = F5TTS(model=args.model, ckpt_file=args.ckpt_file, vocab_file=args.vocab_file)
    if args.fine_stream:
        tts.pipeline.fine_autowarm = True
    if args.warmup_buckets:
        # the pipeline pads batches to powers of two, so warming {1, 2, 4,
        # ... max_batch} covers EVERY batch size the server can form
        sizes = [1 << i for i in range(args.max_batch_size.bit_length())
                 if (1 << i) <= args.max_batch_size]
        warmup(tts.pipeline, args.warmup_buckets, sizes)
    batcher = DynamicBatcher(tts.pipeline, args.max_batch_size,
                             args.max_queue_delay_ms / 1000.0)
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(batcher, tts.mel_cfg.target_sample_rate,
                                              pipeline=tts.pipeline))
    print(f"serving on {args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()

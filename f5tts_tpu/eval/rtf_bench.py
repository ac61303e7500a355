"""RTF / latency benchmark harness.

Rebuild of the reference benchmark surfaces:
- offline RTF with DiT-vs-vocoder stage split, written to rtf.txt
  (reference runtime/triton_trtllm/benchmark.py:387-468)
- latency percentiles p50/p90/p95/p99 (reference client_grpc.py:425-447)

Runs the flagship sampler at several sequence buckets and batch sizes on the
local device; used by bench.py and directly via
    python -m f5tts_tpu.eval.rtf_bench
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def percentile_stats(samples_s: list[float]) -> dict:
    a = np.asarray(samples_s)
    return {
        "avg_s": float(a.mean()),
        "p50_s": float(np.percentile(a, 50)),
        "p90_s": float(np.percentile(a, 90)),
        "p95_s": float(np.percentile(a, 95)),
        "p99_s": float(np.percentile(a, 99)),
    }


def bench_sampler(
    model: str = "F5TTS_v1_Base",
    nfe: int = 16,
    seq_frames: int = 1024,
    prompt_frames: int = 256,
    batch: int = 1,
    runs: int = 5,
    dtype=None,
    backend: str = None,
    quantization: str = "none",
    fused: bool = True,
) -> dict:
    from f5tts_tpu.config import PRESETS
    from f5tts_tpu.models import cfm
    from f5tts_tpu.models.cfm import BACKBONES
    from f5tts_tpu.utils import enable_compilation_cache, make_time_grid
    from f5tts_tpu.vocoder.vocos import Vocos, VocosConfig, init_vocos

    enable_compilation_cache()

    on_tpu = jax.default_backend() == "tpu"
    dtype = dtype or (jnp.bfloat16 if on_tpu else jnp.float32)
    backend = backend or ("pallas" if on_tpu else "xla")

    mcfg = PRESETS[model]
    arch = dataclasses.replace(mcfg.arch, text_num_embeds=2545)
    bd = BACKBONES[mcfg.backbone]
    # production pipeline picks compile buckets of width (128k - extra_tokens)
    # so the backbone's prepended tokens keep the sequence 128-aligned
    # (utils.duration_bucket); bench the same widths (UNetT: 1024 -> 1023)
    seq_frames -= bd.seq_extra_tokens
    params = bd.init(jax.random.PRNGKey(0), arch)
    if dtype != jnp.float32:
        from f5tts_tpu.models.modules import tree_cast

        params = tree_cast(params, dtype)
    from f5tts_tpu.models.modules import fuse_backbone_qkv

    params = fuse_backbone_qkv(params)  # serving-path param prep
    if quantization == "int8":
        from f5tts_tpu.ops.quant import quantize_dit_params

        params = quantize_dit_params(params)
    statics = bd.statics_cls(arch)
    voc = Vocos(init_vocos(jax.random.PRNGKey(1), VocosConfig()), VocosConfig())

    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.standard_normal((batch, seq_frames, 100)) * 0.1, jnp.float32)
    text = jnp.asarray(rng.integers(1, 2545, (batch, 128)), jnp.int32)
    lens = jnp.full((batch,), prompt_frames, jnp.int32)
    duration = jnp.full((batch,), seq_frames, jnp.int32)
    t_grid = make_time_grid(nfe, sway_sampling_coef=-1.0)

    # params ride as explicit jit ARGUMENTS, never closure constants: jax
    # inlines closed-over arrays as stablehlo dense constants, so a closure
    # graph serializes at ~0.9-1.5 GB (the whole weight tree embedded) and
    # trips the remote-compile tunnel's request cap (HTTP 413) — as args the
    # same E2TTS fused graph lowers to ~11 MB (measured, round 4)
    jit_sample = jax.jit(lambda p, key: cfm.cfm_sample(
        p, statics, cond, text, lens, duration, t_grid,
        key=key, cfg_strength=2.0, dtype=dtype,
        backend=backend, backbone=bd))

    def sample_only(key):
        return jit_sample(params, key)

    jit_voc = jax.jit(lambda vp, mel: Vocos(vp, VocosConfig()).decode(
        jnp.transpose(mel, (0, 2, 1))))

    def voc_only(mel):
        return jit_voc(voc.params, mel)

    # hard sync: fetch a scalar — under the axon tunnel block_until_ready()
    # can return before remote execution finishes, and repeated identical
    # inputs are served from a (executable, args) memo (see CLAUDE.md)
    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    # compile (key 1000+ so timed keys below never repeat warmup inputs)
    mel = sample_only(jax.random.PRNGKey(1000))
    sync(mel)
    sync(voc_only(mel))

    dit_times, voc_times, total_times = [], [], []
    for i in range(runs):
        t0 = time.perf_counter()
        mel = sample_only(jax.random.PRNGKey(i))
        sync(mel)
        t1 = time.perf_counter()
        wav = voc_only(mel)
        sync(wav)
        t2 = time.perf_counter()
        dit_times.append(t1 - t0)
        voc_times.append(t2 - t1)
        total_times.append(t2 - t0)

    hop, sr = 256, 24000
    audio_s = batch * (seq_frames - prompt_frames) * hop / sr
    total = float(np.mean(total_times))
    out = {
        "model": model, "nfe": nfe, "batch": batch, "seq_frames": seq_frames,
        "audio_seconds_per_batch": audio_s,
        "dit_s": float(np.mean(dit_times)),
        "vocoder_s": float(np.mean(voc_times)),
        "total_s": total,
        "rtf": total / audio_s,
        "audio_seconds_per_s": audio_s / total,
        "latency": percentile_stats(total_times),
        "backend": backend,
        "quantization": quantization,
        "device": str(jax.devices()[0]),
    }

    if fused:
        # production serving config: sampler + vocoder + scalar checksum in
        # ONE jitted dispatch (bench.py and the serve path run this shape).
        # The staged loop above syncs between stages, so its vocoder_s is
        # dominated by the tunnel round-trip (~2-30 ms), not device time —
        # fused_rtf is the honest end-to-end number; the staged split is
        # kept for the DiT-vs-vocoder attribution the reference reports.
        def make_fused():
            jit_f = jax.jit(lambda p, vp, key: jnp.sum(
                Vocos(vp, VocosConfig()).decode(jnp.transpose(cfm.cfm_sample(
                    p, statics, cond, text, lens, duration, t_grid,
                    key=key, cfg_strength=2.0, dtype=dtype,
                    backend=backend, backbone=bd), (0, 2, 1))
                ).astype(jnp.float32)))

            def fused_fn(key):
                return jit_f(params, voc.params, key)

            return fused_fn

        fused_fn = make_fused()
        try:
            warm = float(fused_fn(jax.random.PRNGKey(2000)))  # compile + warmup
        except Exception as e:
            # environment limit, not a numerics failure: the E2TTS fused
            # graph at FULL unroll (24 blocks x NFE scan + vocoder in one
            # jit, one Mosaic payload per unrolled megakernel instance) can
            # exceed the dev tunnel's remote-compile request cap (HTTP 413).
            # Retry with ROLLED half-scans: 1 payload set per scan instead
            # of 12, at a measured ~4.5% step cost (scripts/unett_fwd_ab) —
            # far cheaper than losing the single-dispatch serving shape.
            if mcfg.backbone != "UNetT":
                out["fused_error"] = f"{type(e).__name__}: {str(e)[:200]}"
                return out
            import os

            prev = os.environ.get("F5TTS_UNETT_UNROLL")
            os.environ["F5TTS_UNETT_UNROLL"] = "1"
            try:
                fused_fn = make_fused()  # fresh jit cache -> retrace
                warm = float(fused_fn(jax.random.PRNGKey(2000)))
                out["fused_unroll"] = 1
            except Exception as e2:
                out["fused_error"] = f"{type(e2).__name__}: {str(e2)[:200]}"
                return out
            finally:
                if prev is None:
                    os.environ.pop("F5TTS_UNETT_UNROLL", None)
                else:
                    os.environ["F5TTS_UNETT_UNROLL"] = prev
        assert np.isfinite(warm)  # catch a NaN-producing compile variant here
        fused_times = []
        for i in range(runs):
            t0 = time.perf_counter()
            v = float(fused_fn(jax.random.PRNGKey(100 + i)))
            fused_times.append(time.perf_counter() - t0)
            assert np.isfinite(v)
        ft = float(np.mean(fused_times))
        out["fused_total_s"] = ft
        out["fused_rtf"] = ft / audio_s
        out["fused_audio_seconds_per_s"] = audio_s / ft
        # fused_rtf is the headline serving number — keep its tail latency
        # attribution too, not just the mean (ADVICE r2)
        out["fused_latency"] = percentile_stats(fused_times)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="F5TTS_v1_Base")
    p.add_argument("--nfe", type=int, default=16)
    p.add_argument("--seq_frames", type=int, default=1024)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--runs", type=int, default=5)
    p.add_argument("--quantization", default="none", choices=["none", "int8"])
    p.add_argument("--output", default="rtf.txt")
    p.add_argument("--no_fused", action="store_true",
                   help="skip the fused one-dispatch measurement "
                        "(saves one extra XLA compile)")
    args = p.parse_args(argv)
    stats = bench_sampler(args.model, args.nfe, args.seq_frames,
                          batch=args.batch, runs=args.runs,
                          quantization=args.quantization,
                          fused=not args.no_fused)
    line = json.dumps(stats)
    print(line)
    with open(args.output, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()

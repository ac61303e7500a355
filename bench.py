"""Benchmark: zero-shot inference RTF of F5TTS_v1_Base at 16 NFE on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Protocol mirrors the reference's offline benchmark configuration
(BASELINE.md): F5-TTS Base DiT (336M) + Vocos, 16 NFE Euler with sway -1.0
and CFG 2.0, batch 1. Baseline RTF for vs_baseline is the reference's
offline TRT-LLM batch-1 RTF = 0.0402 on 1x NVIDIA L20
(reference: README.md:131-140). vs_baseline = baseline_rtf / our_rtf
(>1 means faster than the reference's best serving stack).

Weights are randomly initialized (the reference snapshot ships no
checkpoints); RTF is architecture- and shape-determined, not weight-
determined.

The headline config uses int8 W8A8 on the block projections (the XLA-native
s8 MXU path, ops/quant.py). Quality bound (scripts/int8_quality_ab.py, 20
fixed-seed prompts on the real chip, random-init weights with activated
AdaLN): int8-vs-bf16 mel rel-L2 1.52% / wav SNR 34.6 dB at 16 NFE — the
same magnitude as bf16's own drift vs f32 (1.37% / 35.4 dB), i.e. int8 adds
no more error than running bf16 at all does. 0.85% / 38.9 dB at 32 NFE.
Re-validate against real weights with `int8_quality_ab --ckpt`. Set
F5TTS_QUANT=none for the bf16 path.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_RTF = 0.0402  # reference offline TRT-LLM bs=1 on L20

NFE = 16
SEQ_FRAMES = 1024          # ~10.9 s of audio at hop 256 / 24 kHz
HOP = 256
SR = 24000
PROMPT_FRAMES = 256


def main():
    from f5tts_tpu.config import PRESETS
    from f5tts_tpu.models import cfm, dit
    from f5tts_tpu.utils import enable_compilation_cache, make_time_grid
    from f5tts_tpu.vocoder.vocos import Vocos, VocosConfig, init_vocos

    # the cold int8 sampler compile is ~11 min through the remote-compile
    # tunnel; the persistent cache drops repeat invocations to seconds
    enable_compilation_cache()

    on_tpu = jax.default_backend() == "tpu"
    backend = "pallas" if on_tpu else "xla"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    arch = dataclasses.replace(PRESETS["F5TTS_v1_Base"].arch, text_num_embeds=2545)
    params = dit.init_dit(jax.random.PRNGKey(0), arch)
    if dtype == jnp.bfloat16:
        from f5tts_tpu.models.modules import tree_cast

        params = tree_cast(params, jnp.bfloat16)
    # optional faster-than-reference serving mode (not the headline metric)
    import os

    # serving-path param prep (infer/pipeline.py does the same at load time):
    # merge q/k/v projections so the fused QKV+RoPE attention kernel engages
    from f5tts_tpu.models.modules import fuse_backbone_qkv

    params = fuse_backbone_qkv(params)

    quant = os.environ.get("F5TTS_QUANT", "int8" if on_tpu else "none")
    if quant == "int8":
        from f5tts_tpu.ops.quant import quantize_dit_params

        params = quantize_dit_params(params)
    statics = dit.DiTStatics(arch)
    voc = Vocos(init_vocos(jax.random.PRNGKey(1), VocosConfig()), VocosConfig())

    rng = np.random.default_rng(0)
    b = 1
    cond = jnp.asarray(rng.standard_normal((b, SEQ_FRAMES, 100)) * 0.1, jnp.float32)
    text = jnp.asarray(rng.integers(1, 2545, (b, 128)), jnp.int32)
    lens = jnp.full((b,), PROMPT_FRAMES, jnp.int32)
    duration = jnp.full((b,), SEQ_FRAMES, jnp.int32)
    t_grid = make_time_grid(NFE, sway_sampling_coef=-1.0, use_epss=True)

    @jax.jit
    def generate(params, cond, text, lens, duration, key):
        mel = cfm.cfm_sample(
            params, statics, cond, text, lens, duration, t_grid,
            key=key, cfg_strength=2.0, dtype=dtype, backend=backend,
        )
        wav = voc.decode(jnp.transpose(mel, (0, 2, 1)))
        # scalar checksum: fetching it forces real device completion — under
        # the axon tunnel block_until_ready() can return before execution
        # finishes, which once produced a bogus 83x RTF
        return jnp.sum(wav.astype(jnp.float32))

    key = jax.random.PRNGKey(42)

    # compile + warmup (value fetch = hard sync)
    float(generate(params, cond, text, lens, duration, key))

    runs = 5
    t0 = time.perf_counter()
    vals = [generate(params, cond, text, lens, duration, jax.random.PRNGKey(i))
            for i in range(runs)]
    checksum = sum(float(v) for v in vals)
    elapsed = (time.perf_counter() - t0) / runs
    assert np.isfinite(checksum)

    gen_frames = SEQ_FRAMES - PROMPT_FRAMES
    audio_s = gen_frames * HOP / SR
    rtf = elapsed / audio_s
    audio_s_per_s = audio_s / elapsed

    print(
        json.dumps({
            "metric": "rtf_f5ttsv1base_16nfe_bs1",
            "value": round(rtf, 5),
            "unit": "rtf",
            "vs_baseline": round(BASELINE_RTF / rtf, 3),
            "extra": {
                "audio_seconds_per_s_per_chip": round(audio_s_per_s, 2),
                "wall_s_per_utt": round(elapsed, 4),
                "backend": backend,
                "device": str(jax.devices()[0]),
                "nfe": NFE,
                "seq_frames": SEQ_FRAMES,
                "quant": quant,
            },
        })
    )


if __name__ == "__main__":
    sys.exit(main())

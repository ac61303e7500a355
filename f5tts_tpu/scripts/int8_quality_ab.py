"""int8 W8A8 vs bf16 quality A/B on the real chip (VERDICT r1 item 3).

Fixed-seed sampling at 16 and 32 NFE over >=20 varied prompts (different
seeds, texts, prompt lengths, durations inside one compile bucket), comparing
the quantized pipeline's mel/waveform against the bf16 pipeline:

- mel MAE + relative L2 over generated (non-prompt) frames
- log-spectral distance (the mels are log-magnitude already)
- waveform SNR through the same vocoder

With --ckpt a real F5TTS checkpoint is used; without one the A/B runs on
fixed-seed random-init weights — that still bounds the numeric drift int8
introduces through 22 blocks x NFE steps, but absolute quality claims need
real weights (random init lacks the outlier channels trained weights have).

Usage: python -m f5tts_tpu.scripts.int8_quality_ab [--ckpt x.safetensors]
       [--prompts 20] [--nfe 16 32]
"""

from __future__ import annotations

import argparse
import dataclasses
import json

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="")
    ap.add_argument("--prompts", type=int, default=20)
    ap.add_argument("--nfe", type=int, nargs="+", default=[16, 32])
    ap.add_argument("--frames", type=int, default=1024)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from f5tts_tpu.config import PRESETS
    from f5tts_tpu.models import cfm, dit
    from f5tts_tpu.models.modules import fuse_backbone_qkv, tree_cast
    from f5tts_tpu.ops.quant import quantize_dit_params
    from f5tts_tpu.utils import make_time_grid
    from f5tts_tpu.vocoder.vocos import Vocos, VocosConfig, init_vocos

    on_tpu = jax.default_backend() == "tpu"
    backend = "pallas" if on_tpu else "xla"
    n = args.frames

    arch = dataclasses.replace(PRESETS["F5TTS_v1_Base"].arch, text_num_embeds=2545)
    if args.ckpt:
        from f5tts_tpu.compat.torch_import import (
            convert_backbone_state_dict_audited, load_torch_checkpoint)

        sd = load_torch_checkpoint(args.ckpt)
        params, unconsumed = convert_backbone_state_dict_audited(sd, arch, "DiT")
        assert not unconsumed, unconsumed[:5]
        weights = "reference"
    else:
        params = dit.init_dit(jax.random.PRNGKey(0), arch)
        weights = "random-init"
    params = fuse_backbone_qkv(tree_cast(params, jnp.bfloat16))
    params_i8 = quantize_dit_params(params)
    statics = dit.DiTStatics(arch)
    voc = Vocos(init_vocos(jax.random.PRNGKey(1), VocosConfig()), VocosConfig())

    grids = {k: make_time_grid(k, sway_sampling_coef=-1.0, use_epss=True)
             for k in args.nfe}

    def run(params, cond, text, lens, duration, key, nfe):
        mel = cfm.cfm_sample(
            params, statics, cond, text, lens, duration, grids[nfe],
            key=key, cfg_strength=2.0, dtype=jnp.bfloat16 if on_tpu else jnp.float32,
            backend=backend)
        wav = voc.decode(jnp.transpose(mel, (0, 2, 1)))
        return mel, wav

    run_j = jax.jit(run, static_argnames=("nfe",))

    rng = np.random.default_rng(123)
    report = {}
    for nfe in args.nfe:
        maes, rel2, lsd, snr = [], [], [], []
        for i in range(args.prompts):
            prompt = int(rng.integers(128, 384))
            dur = int(rng.integers(max(prompt + 256, 640), n + 1))
            cond = jnp.asarray(rng.standard_normal((1, n, 100)) * 0.4, jnp.float32)
            text = jnp.asarray(rng.integers(1, 2545, (1, 128)), jnp.int32)
            lens = jnp.full((1,), prompt, jnp.int32)
            duration = jnp.full((1,), dur, jnp.int32)
            key = jax.random.PRNGKey(i)
            mel_b, wav_b = run_j(params, cond, text, lens, duration, key, nfe)
            mel_q, wav_q = run_j(params_i8, cond, text, lens, duration, key, nfe)
            mel_b = np.asarray(mel_b[0, prompt:dur], np.float32)
            mel_q = np.asarray(mel_q[0, prompt:dur], np.float32)
            wav_b = np.asarray(wav_b[0], np.float32)[prompt * 256: dur * 256]
            wav_q = np.asarray(wav_q[0], np.float32)[prompt * 256: dur * 256]
            maes.append(np.mean(np.abs(mel_b - mel_q)))
            rel2.append(np.linalg.norm(mel_b - mel_q) /
                        max(np.linalg.norm(mel_b), 1e-9))
            lsd.append(np.sqrt(np.mean((mel_b - mel_q) ** 2)))
            noise = np.sum((wav_b - wav_q) ** 2)
            snr.append(10 * np.log10(np.sum(wav_b ** 2) / max(noise, 1e-12)))
        report[f"nfe{nfe}"] = {
            "mel_mae_mean": round(float(np.mean(maes)), 5),
            "mel_mae_max": round(float(np.max(maes)), 5),
            "mel_rel_l2_mean": round(float(np.mean(rel2)), 5),
            "lsd_mean": round(float(np.mean(lsd)), 5),
            "wav_snr_db_mean": round(float(np.mean(snr)), 2),
            "wav_snr_db_min": round(float(np.min(snr)), 2),
            "prompts": args.prompts,
        }
        print(f"[int8-ab] nfe{nfe}: {report[f'nfe{nfe}']}")
    print(json.dumps({"weights": weights, "device": str(jax.devices()[0]),
                      **report}))


if __name__ == "__main__":
    main()

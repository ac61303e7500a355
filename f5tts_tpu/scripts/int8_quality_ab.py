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


def _activate_zero_init(params, key):
    """Replace all-zero float leaves (AdaLN-zero modulation linears, final
    norm) with small random values so random-init A/Bs exercise real signal
    flow. Scale 0.05 keeps gates/scales in a realistic trained-model range."""
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    out = []
    for leaf, k in zip(leaves, keys):
        if (hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)
                and leaf.size > 0 and not bool(jnp.any(leaf != 0))):
            leaf = 0.05 * jax.random.normal(k, leaf.shape, leaf.dtype)
        out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def _inject_outlier_channels(params, key, n_channels: int = 8,
                             scale: float = 100.0):
    """Simulate the outlier channels trained transformers develop (the known
    weakness of per-token symmetric W8A8): multiply a fixed set of residual-
    stream channels — the output columns of every block's attn.to_out and
    ff.out, the projections that write the residual — by `scale`. The SAME
    channel indices persist across all layers (the empirically observed LLM
    pattern), so downstream activations carry heavy-tailed channels into
    every quantized projection's per-token amax. The modified weights feed
    BOTH the bf16 reference and the int8 pipeline, so measured drift is
    attributable to quantization alone."""
    import jax
    import jax.numpy as jnp

    params = jax.tree.map(lambda a: a, params)
    dim = params["blocks"]["attn"]["to_out"]["w"].shape[-1]
    idx = jax.random.choice(key, dim, (n_channels,), replace=False)
    mult = jnp.ones((dim,), jnp.float32).at[idx].set(scale)

    for mod, name in (("attn", "to_out"), ("ff", "out")):
        leaf = dict(params["blocks"][mod][name])
        leaf["w"] = leaf["w"] * mult
        if "b" in leaf:
            leaf["b"] = leaf["b"] * mult
        grp = dict(params["blocks"][mod])
        grp[name] = leaf
        blocks = dict(params["blocks"])
        blocks[mod] = grp
        params["blocks"] = blocks
    return params


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="")
    ap.add_argument("--prompts", type=int, default=20)
    ap.add_argument("--nfe", type=int, nargs="+", default=[16, 32])
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--outlier-sim", action="store_true",
                    help="inject heavy-tailed residual channels (100x, 8 of "
                         "1024, persistent across layers) into the weights "
                         "before the A/B — a stand-in for the outlier "
                         "channels real checkpoints develop (VERDICT r2 "
                         "weak #2)")
    ap.add_argument("--outlier-scale", type=float, default=100.0)
    ap.add_argument("--outlier-channels", type=int, default=8)
    ap.add_argument("--smooth", action="store_true",
                    help="enable the outlier hedge: per-channel activation "
                         "equalization (quant.residual_channel_scales) in "
                         "the quantized tree")
    ap.add_argument("--context-fp32", action="store_true",
                    help="also run an f32 sampler and report bf16-vs-f32 "
                         "drift with the same metrics: if int8-vs-bf16 is "
                         "the same order as bf16-vs-f32 (the error everyone "
                         "already accepts), int8 is safe to promote")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from f5tts_tpu.config import PRESETS
    from f5tts_tpu.models import cfm, dit
    from f5tts_tpu.models.modules import fuse_backbone_qkv, tree_cast
    from f5tts_tpu.ops.quant import quantize_dit_params
    from f5tts_tpu.utils import enable_compilation_cache, make_time_grid

    enable_compilation_cache()
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
        # raw random-init DiT is an IDENTITY function: AdaLN-zero gates
        # multiply every block's contribution by 0 (dit.py zero-init), so an
        # int8-vs-bf16 A/B on raw init weights compares 0 with 0 (first run
        # of this script measured exactly that: MAE 0.0, SNR = the eps
        # clamp). Randomize the zero-init modulation weights so all blocks
        # contribute signal through the quantized matmuls.
        params = _activate_zero_init(params, jax.random.PRNGKey(42))
        weights = "random-init (AdaLN activated)"
    if args.outlier_sim:
        params = _inject_outlier_channels(
            params, jax.random.PRNGKey(7), n_channels=args.outlier_channels,
            scale=args.outlier_scale)
        weights += (f" + outlier-sim ({args.outlier_channels}ch "
                    f"x{args.outlier_scale:g})")
    params_f32 = fuse_backbone_qkv(tree_cast(params, jnp.float32)) \
        if args.context_fp32 else None
    params = fuse_backbone_qkv(tree_cast(params, jnp.bfloat16))
    params_i8 = quantize_dit_params(params, smooth=args.smooth)
    if args.smooth:
        weights += " + smooth"
    statics = dit.DiTStatics(arch)
    voc = Vocos(init_vocos(jax.random.PRNGKey(1), VocosConfig()), VocosConfig())

    grids = {k: make_time_grid(k, sway_sampling_coef=-1.0, use_epss=True)
             for k in args.nfe}

    def run(params, cond, text, lens, duration, key, nfe, dt):
        mel = cfm.cfm_sample(
            params, statics, cond, text, lens, duration, grids[nfe],
            key=key, cfg_strength=2.0, dtype=dt, backend=backend)
        wav = voc.decode(jnp.transpose(mel, (0, 2, 1)))
        return mel, wav

    run_j = jax.jit(run, static_argnames=("nfe", "dt"))
    bf = jnp.bfloat16 if on_tpu else jnp.float32

    def deltas(ref, test, prompt, dur):
        """ref/test: (mel [1,n,d], wav [1,n*256]) device arrays."""
        mel_r = np.asarray(ref[0][0, prompt:dur], np.float32)
        mel_t = np.asarray(test[0][0, prompt:dur], np.float32)
        wav_r = np.asarray(ref[1][0], np.float32)[prompt * 256: dur * 256]
        wav_t = np.asarray(test[1][0], np.float32)[prompt * 256: dur * 256]
        noise = np.sum((wav_r - wav_t) ** 2)
        return {
            "mel_mae": float(np.mean(np.abs(mel_r - mel_t))),
            "mel_rel_l2": float(np.linalg.norm(mel_r - mel_t)
                                / max(np.linalg.norm(mel_r), 1e-9)),
            "lsd": float(np.sqrt(np.mean((mel_r - mel_t) ** 2))),
            "wav_snr_db": float(10 * np.log10(np.sum(wav_r ** 2)
                                              / max(noise, 1e-12))),
        }

    def summarize(rows):
        keys = rows[0].keys()
        out = {}
        for k in keys:
            vals = [r[k] for r in rows]
            out[f"{k}_mean"] = round(float(np.mean(vals)), 5)
            out[f"{k}_worst"] = round(float(np.min(vals) if "snr" in k
                                            else np.max(vals)), 5)
        out["prompts"] = len(rows)
        return out

    rng = np.random.default_rng(123)
    report = {}
    for nfe in args.nfe:
        i8_rows, bf_rows = [], []
        for i in range(args.prompts):
            prompt = int(rng.integers(128, 384))
            dur = int(rng.integers(max(prompt + 256, 640), n + 1))
            cond = jnp.asarray(rng.standard_normal((1, n, 100)) * 0.4, jnp.float32)
            text = jnp.asarray(rng.integers(1, 2545, (1, 128)), jnp.int32)
            lens = jnp.full((1,), prompt, jnp.int32)
            duration = jnp.full((1,), dur, jnp.int32)
            key = jax.random.PRNGKey(i)
            out_b = run_j(params, cond, text, lens, duration, key, nfe, bf)
            out_q = run_j(params_i8, cond, text, lens, duration, key, nfe, bf)
            i8_rows.append(deltas(out_b, out_q, prompt, dur))
            if params_f32 is not None:
                out_f = run_j(params_f32, cond, text, lens, duration, key,
                              nfe, jnp.float32)
                bf_rows.append(deltas(out_f, out_b, prompt, dur))
        report[f"nfe{nfe}"] = {"int8_vs_bf16": summarize(i8_rows)}
        if bf_rows:
            report[f"nfe{nfe}"]["bf16_vs_f32"] = summarize(bf_rows)
        print(f"[int8-ab] nfe{nfe}: {report[f'nfe{nfe}']}")
    print(json.dumps({"weights": weights, "device": str(jax.devices()[0]),
                      **report}))


if __name__ == "__main__":
    main()

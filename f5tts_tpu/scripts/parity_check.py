"""One-command weights-level parity gate against a reference checkpoint.

BASELINE.md north star: "F5TTS_v1_Base mel outputs allclose vs reference at
16/32 NFE under fixed seeds". This gate runs end-to-end the moment a real
`SWivid/F5-TTS` checkpoint file is available:

1. **Digestion audit** — convert the checkpoint with key accounting
   (compat.torch_import.convert_backbone_state_dict_audited) and FAIL on any
   unconsumed weight tensor (a silently-dropped weight means wrong audio with
   no error).
2. **Fixed-seed sampling** — run the jitted CFM sampler at 16 and 32 NFE
   (euler, cfg 2.0, sway -1.0 — the reference eval protocol,
   src/f5_tts/eval/eval_infer_batch.sh:5-11) on deterministic synthetic
   prompts and print mel checksums.
3. **Golden comparison** — with `--golden golden.npz` (mels exported from the
   reference with scripts equivalent to its infer pipeline under the same
   seeds), assert allclose and print per-config max/mean deltas;
   with `--write-golden out.npz`, save this run's mels as the golden.

Usage:
    python -m f5tts_tpu.scripts.parity_check --ckpt model_1250000.safetensors \
        [--model F5TTS_v1_Base] [--vocab path] [--golden golden.npz]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys

import numpy as np


def build_fixed_inputs(arch, n: int = 1024, nt: int = 64, b: int = 1, seed: int = 0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    cond = jnp.asarray(rng.standard_normal((b, n, arch.mel_dim)) * 0.5, jnp.float32)
    text = jnp.asarray(rng.integers(1, arch.text_num_embeds, (b, nt)), jnp.int32)
    lens = jnp.full((b,), n // 4, jnp.int32)       # 1/4 prompt
    duration = jnp.full((b,), n, jnp.int32)
    return cond, text, lens, duration


def run_configs(params, statics, nfe_list, seed: int = 0, dtype=None):
    import jax
    import jax.numpy as jnp

    from f5tts_tpu.models import cfm
    from f5tts_tpu.utils import make_time_grid

    if dtype is None:
        dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    arch = statics.arch
    cond, text, lens, duration = build_fixed_inputs(arch)
    outs = {}
    for nfe in nfe_list:
        t_grid = make_time_grid(nfe, sway_sampling_coef=-1.0)
        mel = cfm.cfm_sample(
            params, statics, cond, text, lens, duration, t_grid,
            key=jax.random.PRNGKey(seed), cfg_strength=2.0, method="euler",
            dtype=dtype, backend=backend)
        outs[f"nfe{nfe}"] = np.asarray(mel, np.float32)
    return outs


def run_mirror_golden(params, statics, backbone: str, n: int = 256,
                      nfe: int = 7, atol: float = 2e-2, rtol: float = 2e-2) -> int:
    """Run the full torch CFM sampler mirror (euler + EPSS + sway + CFG +
    cond re-imposition, tests/torch_mirror.py) on the SAME converted weights
    and noise, and compare mel-level against `cfm_sample`. Returns 0/2.

    This is the offline cross-implementation golden: it exercises the whole
    time-grid/CFG/noise plumbing through an independent implementation, so it
    catches integration bugs that forward-level mirrors and repo-vs-repo
    goldens cannot. Runs in f32 on CPU for both sides (torch has no TPU)."""
    import os
    import sys as _sys

    import jax
    import jax.numpy as jnp
    import torch

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if repo_root not in _sys.path:
        _sys.path.insert(0, repo_root)
    try:
        from tests import torch_mirror as tm
    except ImportError as e:
        print(f"[parity] mirror golden needs the repo checkout (tests/): {e}")
        return 2

    from f5tts_tpu.models import cfm
    from f5tts_tpu.utils import make_time_grid

    forwards = {"DiT": tm.t_dit_forward, "UNetT": tm.t_unett_forward}
    if backbone not in forwards:
        print(f"[parity] no torch mirror for backbone {backbone}; skipping")
        return 0

    arch = statics.arch
    cond, text, lens, duration = build_fixed_inputs(arch, n=n, nt=min(n // 4, 64))
    t_grid = make_time_grid(nfe, sway_sampling_coef=-1.0)
    y0 = cfm.make_noise(jax.random.PRNGKey(0), cond.shape[0], n, arch.mel_dim,
                        duration, shared=True)
    bd = cfm.BACKBONES[backbone]
    mel_jax = np.asarray(cfm.cfm_sample(
        params, statics, cond, text, lens, duration, t_grid, y0=y0,
        cfg_strength=2.0, method="euler", dtype=jnp.float32, backend="xla",
        backbone=bd))

    params_np = jax.tree.map(np.asarray, params)
    mel_t = tm.t_cfm_sample(
        forwards[backbone], params_np, arch,
        torch.from_numpy(np.asarray(cond)), torch.from_numpy(np.asarray(text)).long(),
        torch.from_numpy(np.asarray(lens)), torch.from_numpy(np.asarray(duration)),
        torch.from_numpy(np.array(y0)),
        tm.t_time_grid(nfe, sway_sampling_coef=-1.0), cfg_strength=2.0,
    ).numpy()

    d = np.abs(mel_jax - mel_t)
    ok = np.allclose(mel_jax, mel_t, atol=atol, rtol=rtol)
    print(f"[parity] mirror golden ({backbone}, n={n}, nfe={nfe}): "
          f"max|d|={d.max():.4e} mean|d|={d.mean():.4e} {'OK' if ok else 'FAIL'}")
    return 0 if ok else 2


def leg_vocoder_decode(outs: dict, kind: str, ckpt_path: str,
                       voc_cfg=None) -> tuple[str, str]:
    """Decode this run's nfe-16 mel through a REAL converted vocoder and
    sanity-check the waveform (finite, non-silent). kind: vocos | bigvgan.
    `voc_cfg` overrides the full-size config (tests use a tiny one)."""
    import jax.numpy as jnp

    from f5tts_tpu.compat.torch_import import load_torch_checkpoint

    mel = next(iter(outs.values()))  # [b, n, d]
    mel_bdt = jnp.transpose(jnp.asarray(mel), (0, 2, 1))
    sd = load_torch_checkpoint(ckpt_path)
    if kind == "vocos":
        from f5tts_tpu.compat.torch_import import convert_vocos_state_dict
        from f5tts_tpu.vocoder.vocos import Vocos, VocosConfig

        cfg = voc_cfg or VocosConfig()
        voc = Vocos(convert_vocos_state_dict(sd, num_layers=cfg.num_layers), cfg)
    else:
        from f5tts_tpu.vocoder.bigvgan import (BigVGAN, BigVGANConfig,
                                               convert_bigvgan_state_dict)

        cfg = voc_cfg or BigVGANConfig()
        voc = BigVGAN(convert_bigvgan_state_dict(sd, cfg), cfg)
    wav = np.asarray(voc.decode(mel_bdt))
    if not np.all(np.isfinite(wav)):
        return "FAIL", f"{kind}: non-finite waveform"
    rms = float(np.sqrt(np.mean(wav ** 2)))
    if rms <= 1e-7:
        return "FAIL", f"{kind}: silent waveform (rms {rms:.2e})"
    return "OK", f"{kind}: wav {wav.shape}, rms {rms:.4f}"


def leg_int8_ab(params, statics, nfe: int = 16, n: int = 512,
                smooth: bool = False) -> tuple[str, str]:
    """int8-vs-highprec drift on the REAL weights (the BENCH_HISTORY quality
    gate, scripts/int8_quality_ab.py, as one parity leg): mel rel-L2 + SNR
    at the serving NFE. Pass/fail bound: rel-L2 < 10% (clean trained weights
    measured ~1.5%; heavy outliers push plain int8 to ~6% — if this trips,
    rerun with --smooth)."""
    import jax
    import jax.numpy as jnp

    from f5tts_tpu.models import cfm
    from f5tts_tpu.models.modules import fuse_backbone_qkv
    from f5tts_tpu.ops.quant import quantize_dit_params
    from f5tts_tpu.utils import make_time_grid

    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    hp_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    arch = statics.arch
    cond, text, lens, duration = build_fixed_inputs(arch, n=n, nt=min(n // 4, 64))
    t_grid = make_time_grid(nfe, sway_sampling_coef=-1.0)

    fused = fuse_backbone_qkv(params)
    kw = dict(key=jax.random.PRNGKey(0), cfg_strength=2.0, method="euler",
              backend=backend)
    mel_hp = np.asarray(cfm.cfm_sample(fused, statics, cond, text, lens,
                                       duration, t_grid, dtype=hp_dtype, **kw),
                        np.float32)
    qtree = quantize_dit_params(fused, smooth=smooth)
    mel_q = np.asarray(cfm.cfm_sample(qtree, statics, cond, text, lens,
                                      duration, t_grid, dtype=hp_dtype, **kw),
                       np.float32)
    rel = float(np.linalg.norm(mel_q - mel_hp) / (np.linalg.norm(mel_hp) + 1e-12))
    snr = float(10 * np.log10(np.mean(mel_hp ** 2)
                              / (np.mean((mel_q - mel_hp) ** 2) + 1e-12)))
    detail = (f"int8{'+smooth' if smooth else ''} vs {np.dtype(hp_dtype).name}: "
              f"mel rel-L2 {rel * 100:.2f}%, SNR {snr:.1f} dB @ {nfe} NFE")
    return ("OK" if rel < 0.10 else "FAIL"), detail


def leg_metric_smoke(wav: np.ndarray, sr: int, workdir: str,
                     ecapa_ckpt: str = "", utmos_ckpt: str = "") -> list[tuple]:
    """WER/SIM/UTMOS smoke on one decoded waveform: each scorer loads its
    real weights (strict loaders) and produces a finite score. Legs without
    weights report SKIP."""
    import os

    from f5tts_tpu.infer import audio_io

    rows = []
    gen_path = os.path.join(workdir, "parity_gen.wav")
    audio_io.write_wav(gen_path, wav.astype(np.float32), sr)

    # WER backend (whisper transcription through infer.asr)
    try:
        from f5tts_tpu.infer.asr import transcribe

        hypo = transcribe(wav.astype(np.float32), sr, language="en")
        rows.append(("wer-asr", "OK", f"transcript: {hypo[:60]!r}"))
    except Exception as e:
        rows.append(("wer-asr", "SKIP", f"{type(e).__name__}: {e}"))

    if ecapa_ckpt:
        try:
            from f5tts_tpu.eval.utils_eval import run_sim

            sim = run_sim([(gen_path, gen_path)], ecapa_ckpt)[0]["sim"]
            ok = np.isfinite(sim) and sim > 0.95  # self-sim must be ~1
            rows.append(("sim", "OK" if ok else "FAIL", f"self-sim {sim:.4f}"))
        except Exception as e:
            rows.append(("sim", "FAIL", f"{type(e).__name__}: {e}"))
    else:
        rows.append(("sim", "SKIP", "no --ecapa_ckpt"))

    if utmos_ckpt:
        try:
            import torch

            from f5tts_tpu.eval.utmos22 import load_predictor

            model = load_predictor(utmos_ckpt)
            score = float(model(torch.from_numpy(wav.astype(np.float32))[None], sr)[0])
            ok = np.isfinite(score) and 0.0 < score < 6.0
            rows.append(("utmos", "OK" if ok else "FAIL", f"MOS {score:.3f}"))
        except Exception as e:
            rows.append(("utmos", "FAIL", f"{type(e).__name__}: {e}"))
    else:
        rows.append(("utmos", "SKIP", "no --utmos_ckpt"))
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--model", default="F5TTS_v1_Base")
    ap.add_argument("--vocab", default="")
    ap.add_argument("--nfe", type=int, nargs="+", default=[16, 32])
    ap.add_argument("--golden", default="", help="golden .npz to compare against")
    ap.add_argument("--write-golden", default="", help="write this run's mels")
    ap.add_argument("--mirror-golden", action="store_true",
                    help="also run the independent torch CFM sampler mirror "
                         "(tests/torch_mirror.py) on the converted weights and "
                         "compare mel-level — an offline cross-implementation "
                         "golden that needs no reference-side export")
    ap.add_argument("--mirror-n", type=int, default=256,
                    help="sequence length for the torch mirror run (torch-cpu "
                         "is slow; 256 frames keeps a 336M ckpt check in "
                         "minutes)")
    ap.add_argument("--mirror-nfe", type=int, default=7)
    ap.add_argument("--atol", type=float, default=2e-2)
    ap.add_argument("--rtol", type=float, default=2e-2)
    ap.add_argument("--full", action="store_true",
                    help="run EVERY validation leg the provided weights "
                         "allow in one invocation (VERDICT r3 #8): digestion "
                         "audit -> mirror golden -> vocoder decode sanity -> "
                         "int8 A/B (+--smooth variant) -> WER/SIM/UTMOS "
                         "smoke. Legs without weights report SKIP; any "
                         "executed leg failing exits 2.")
    ap.add_argument("--vocos_ckpt", default="", help="vocos weights (.pt/.safetensors)")
    ap.add_argument("--bigvgan_ckpt", default="", help="bigvgan generator weights")
    ap.add_argument("--ecapa_ckpt", default="", help="wavlm_large_finetune.pth for SIM")
    ap.add_argument("--utmos_ckpt", default="", help="utmos22_strong state dict")
    ap.add_argument("--smooth", action="store_true",
                    help="also run the int8 outlier-hedge variant in the A/B leg")
    ap.add_argument("--workdir", default=".",
                    help="where --full writes its smoke wav")
    args = ap.parse_args(argv)
    if args.full:
        args.mirror_golden = True

    import jax

    from f5tts_tpu.compat.torch_import import (
        convert_backbone_state_dict_audited, load_torch_checkpoint)
    from f5tts_tpu.config import PRESETS
    from f5tts_tpu.models.cfm import BACKBONES
    from f5tts_tpu.text.vocab import load_vocab

    cfg = PRESETS[args.model]
    if args.vocab:
        vocab = load_vocab(args.vocab)
    else:
        from importlib.resources import files

        vocab = load_vocab(str(files("f5tts_tpu").joinpath("data/vocab_emilia_pinyin.txt")))
    arch = dataclasses.replace(cfg.arch, text_num_embeds=len(vocab))

    # 1. digestion audit
    sd = load_torch_checkpoint(args.ckpt)
    params, unconsumed = convert_backbone_state_dict_audited(sd, arch, cfg.backbone)
    n_leaves = len(jax.tree.leaves(params))
    print(f"[parity] converted {len(sd)} checkpoint tensors -> {n_leaves} param leaves")
    if unconsumed:
        print(f"[parity] FAIL: {len(unconsumed)} unconsumed weight tensors:")
        for k in unconsumed[:20]:
            print(f"  - {k}")
        sys.exit(2)
    print("[parity] digestion audit OK: zero unconsumed weight tensors")

    # 2. fixed-seed sampling
    statics = BACKBONES[cfg.backbone].statics_cls(arch)
    outs = run_configs(params, statics, args.nfe)
    for name, mel in outs.items():
        print(f"[parity] {name}: mel shape {mel.shape} "
              f"checksum {float(np.sum(mel)):.6f} mean {float(np.mean(mel)):.6f}")
        if not np.all(np.isfinite(mel)):
            print(f"[parity] FAIL: non-finite mel at {name}")
            sys.exit(2)

    # 3. cross-implementation mirror golden (no reference export needed)
    if args.mirror_golden:
        rc = run_mirror_golden(params, statics, cfg.backbone,
                               n=args.mirror_n, nfe=args.mirror_nfe)
        if rc:
            sys.exit(rc)

    # 3b. --full: every remaining validation leg in one pass
    if args.full:
        legs: list[tuple] = []
        voc_wav = None
        for kind, path in (("vocos", args.vocos_ckpt),
                           ("bigvgan", args.bigvgan_ckpt)):
            if not path:
                legs.append((f"vocoder-{kind}", "SKIP", f"no --{kind}_ckpt"))
                continue
            try:
                status, detail = leg_vocoder_decode(outs, kind, path)
            except Exception as e:
                status, detail = "FAIL", f"{type(e).__name__}: {e}"
            legs.append((f"vocoder-{kind}", status, detail))

        try:
            status, detail = leg_int8_ab(params, statics)
            legs.append(("int8-ab", status, detail))
            if args.smooth:
                status, detail = leg_int8_ab(params, statics, smooth=True)
                legs.append(("int8-ab-smooth", status, detail))
        except Exception as e:
            legs.append(("int8-ab", "FAIL", f"{type(e).__name__}: {e}"))

        # metric smoke runs on a real decoded wav when a vocoder leg ran,
        # else on a synthetic tone (scorer-loading is still exercised)
        sr = 24000
        if args.vocos_ckpt:
            try:
                import jax.numpy as jnp

                from f5tts_tpu.compat.torch_import import (
                    convert_vocos_state_dict, load_torch_checkpoint)
                from f5tts_tpu.vocoder.vocos import Vocos, VocosConfig

                voc = Vocos(convert_vocos_state_dict(
                    load_torch_checkpoint(args.vocos_ckpt)), VocosConfig())
                mel = next(iter(outs.values()))[:1]
                voc_wav = np.asarray(voc.decode(
                    jnp.transpose(jnp.asarray(mel), (0, 2, 1))))[0]
            except Exception:
                voc_wav = None
        if voc_wav is None:
            t = np.arange(sr, dtype=np.float32) / sr
            voc_wav = (0.1 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        legs.extend(leg_metric_smoke(voc_wav, sr, args.workdir,
                                     args.ecapa_ckpt, args.utmos_ckpt))

        print("\n[parity] --full summary:")
        width = max(len(name) for name, _, _ in legs)
        for name, status, detail in legs:
            print(f"  {name:<{width}}  {status:<5}  {detail}")
        if any(status == "FAIL" for _, status, _ in legs):
            sys.exit(2)

    # 4. golden comparison
    if args.write_golden:
        np.savez(args.write_golden, **outs)
        print(f"[parity] wrote golden {args.write_golden}")
    if args.golden:
        golden = np.load(args.golden)
        failed = False
        for name, mel in outs.items():
            ref = golden[name]
            d = np.abs(mel - ref)
            ok = np.allclose(mel, ref, atol=args.atol, rtol=args.rtol)
            print(f"[parity] {name}: max|d|={d.max():.4e} mean|d|={d.mean():.4e} "
                  f"{'OK' if ok else 'FAIL'}")
            failed |= not ok
        sys.exit(2 if failed else 0)
    print("[parity] PASS (no golden provided; checksums above)")


if __name__ == "__main__":
    main()

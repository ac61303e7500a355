"""Training-step throughput bench (frames/s/chip) on the real TPU.

Measures the full jitted train step (cfm_loss + AdamW + EMA) for
F5TTS_v1_Base at a given batch/frames, following the tunnel-safe protocol
(BENCH_HISTORY.md): queue several steps with VARIED inputs before one sync,
and force completion by fetching a scalar checksum.

Usage: python -m f5tts_tpu.scripts.train_bench [--batch 16] [--frames 1024]
       [--no-fuse-qkv] [--steps 8] [--backend pallas]
"""

from __future__ import annotations

import argparse
import dataclasses
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--no-fuse-qkv", action="store_true")
    ap.add_argument("--donate", action="store_true",
                    help="donate the state: no in/out double-buffer — fits "
                         "full-size MMDiT_Base (645M) single-chip (the dev "
                         "tunnel accepts donation again as of round 5)")
    ap.add_argument("--preset", default="F5TTS_v1_Base")
    ap.add_argument("--dim", type=int, default=None,
                    help="override arch dim (e.g. MMDiT_Base at dim 768 is "
                         "~DiT-Base params; the 645M full size needs buffer "
                         "donation, which the dev tunnel rejects)")
    ap.add_argument("--heads", type=int, default=None)
    ap.add_argument("--remat-policy", default="nothing",
                    choices=["nothing", "dots", "attn", "attn_out"])
    ap.add_argument("--no-remat", action="store_true",
                    help="disable activation checkpointing (fits at b<=8)")
    ap.add_argument("--split-apply", action="store_true",
                    help="run grad_step and apply_step as two jits: the "
                         "grad jit never holds the optimizer state and the "
                         "apply jit never holds activations, nearly halving "
                         "peak HBM vs the fused step (what fits full-size "
                         "MMDiT_Base 645M single-chip without donation)")
    ap.add_argument("--bf16-state", action="store_true",
                    help="store AdamW moments + EMA in bf16 (state/2; "
                         "fits full-size MMDiT_Base single-chip)")
    ap.add_argument("--ema-skip", action="store_true",
                    help="dispatch the no-EMA step variant on the 9/10 steps "
                         "where the EMA update is a provable no-op")
    ap.add_argument("--inner-scan", type=int, default=0,
                    help="run K train steps inside ONE jit (lax.scan over "
                         "the carried state): amortizes the dev tunnel's "
                         "per-dispatch round trip, measuring device ms/step")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from f5tts_tpu.config import PRESETS
    from f5tts_tpu.models import cfm
    from f5tts_tpu.train.step import (OptHParams, init_train_state,
                                      make_optimizer, make_train_step)

    preset = PRESETS[args.preset]
    over = {}
    if args.dim:
        over["dim"] = args.dim
    if args.heads:
        over["heads"] = args.heads
    arch = dataclasses.replace(preset.arch, text_num_embeds=2545,
                               checkpoint_activations=not args.no_remat,
                               remat_policy=args.remat_policy, **over)
    bdef = cfm.BACKBONES[preset.backbone]
    params = bdef.init(jax.random.PRNGKey(0), arch)
    statics = bdef.statics_cls(arch)
    hp = OptHParams(learning_rate=7.5e-5, warmup_updates=1000,
                    total_updates=10000)
    tx = make_optimizer(learning_rate=7.5e-5, warmup_updates=1000,
                        total_updates=10000)
    sdt = jnp.bfloat16 if args.bf16_state else None
    state = init_train_state(params, tx, moment_dtype=sdt, ema_dtype=sdt)
    raw_step = make_train_step(
        statics, tx, backend=args.backend, backbone=bdef,
        fuse_qkv=not args.no_fuse_qkv, hp=hp)
    step_fn = jax.jit(raw_step, donate_argnums=(0,) if args.donate else ())
    noema_fn = (jax.jit(raw_step.noema,
                        donate_argnums=(0,) if args.donate else ())
                if args.ema_skip else None)

    b, n = args.batch, args.frames
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((b, n, arch.mel_dim)) * 0.3, jnp.float32)
    text = jnp.asarray(rng.integers(1, 2545, (b, 256)), jnp.int32)
    lens = jnp.asarray(rng.integers(n // 2, n + 1, (b,)), jnp.int32)

    if args.inner_scan:
        K = args.inner_scan

        def multi(state, key, mel, text, lens):
            def body(st, i):
                st2, mm = raw_step(st, jax.random.fold_in(key, i),
                                   mel * (1.0 + 0.001 * i.astype(jnp.float32)),
                                   text, lens)
                return st2, mm["loss"]

            st, losses = jax.lax.scan(body, state, jnp.arange(K))
            return st, losses

        jit_multi = jax.jit(multi)
        t0 = time.time()
        state2, losses = jit_multi(state, jax.random.PRNGKey(0), mel, text, lens)
        l0 = float(losses[0])
        print(f"compile+first dispatch ({K} steps): {time.time()-t0:.1f}s "
              f"loss0={l0:.4f}")
        runs = []
        for r in range(3):
            t0 = time.time()
            state2, losses = jit_multi(state, jax.random.PRNGKey(10 + r),
                                       mel * (1.0 + 0.05 * r), text, lens)
            total = float(jnp.sum(losses))
            runs.append((time.time() - t0) / K)
            assert np.isfinite(total)
        dt = min(runs)
        frames_per_s = b * n / dt
        print(f"batch={b} frames={n} inner_scan={K}")
        print(f"{dt * 1e3:.1f} ms/step  {frames_per_s / 1e3:.1f}k frames/s/chip  "
              f"(~{frames_per_s * 256 / 24000:.0f} audio-s/s)")
        return

    if args.split_apply:
        grad_fn = jax.jit(raw_step.grad_step)
        apply_fn = jax.jit(raw_step.apply_step)

        def step_fn(st, key, mel_, text_, lens_):
            loss, grads = grad_fn(st.params, key, mel_, text_, lens_)
            st2, mm = apply_fn(st, loss, grads)
            return st2, mm
        noema_fn = None

    t0 = time.time()
    state, m = step_fn(state, jax.random.PRNGKey(0), mel, text, lens)
    loss0 = float(m["loss"])  # compile + hard sync
    print(f"compile+first step: {time.time() - t0:.1f}s  loss={loss0:.4f}")

    # warm (non-compile) sync
    state, m = step_fn(state, jax.random.PRNGKey(1), mel * 1.01, text, lens)
    float(m["loss"])

    if noema_fn is not None:  # compile + warm the no-EMA variant too
        state, m = noema_fn(state, jax.random.PRNGKey(900), mel * 1.02, text, lens)
        float(m["loss"])

    t0 = time.time()
    losses = []
    for i in range(2, args.steps + 2):
        # ema_pytorch cadence: EMA touches the tree on 1 step in
        # ema_update_every (10) — the bench alternates 9:1 like production
        fn = noema_fn if (noema_fn is not None and i % 10 != 0) else step_fn
        state, m = fn(state, jax.random.PRNGKey(i),
                      mel * (1.0 + 0.01 * i), text, lens)
        losses.append(m["loss"])
    total = sum(float(v) for v in losses)  # scalar fetch forces completion
    dt = (time.time() - t0) / args.steps
    assert np.isfinite(total)

    frames_per_s = b * n / dt
    print(f"batch={b} frames={n} fuse_qkv={not args.no_fuse_qkv} "
          f"backend={args.backend}")
    print(f"{dt * 1e3:.1f} ms/step  {frames_per_s / 1e3:.1f}k frames/s/chip  "
          f"(~{frames_per_s * 256 / 24000:.0f} audio-s/s)")


if __name__ == "__main__":
    main()

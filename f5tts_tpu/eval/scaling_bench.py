"""Data-parallel scaling-efficiency benchmark.

BASELINE north star: audio-seconds/s/chip at 1 chip, 1 host, and N hosts with
>=0.9 scaling efficiency. This harness measures DP scaling of either the
sampler (utterance batches sharded over the mesh "data" axis) or the train
step (psum-ed gradients) on whatever devices are available:

- on a pod slice: `python -m f5tts_tpu.eval.scaling_bench --devices 1 4 8`
- on this container (1 real chip): validated functionally on the virtual
  CPU mesh (`--force_cpu 8`), where it exercises exactly the sharding layout
  a pod run would use; wall-clock efficiency numbers are only meaningful on
  real multi-chip hardware.

Efficiency(N) = throughput(N) / (N * throughput(1)).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np


def bench_dp_sampling(n_devices: int, model: str = "F5TTS_v1_Small",
                      seq_frames: int = 256, nfe: int = 2,
                      per_device_batch: int = 2, reps: int = 3) -> dict:
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from f5tts_tpu.config import PRESETS
    from f5tts_tpu.models import cfm
    from f5tts_tpu.models.cfm import BACKBONES
    from f5tts_tpu.parallel.mesh import make_mesh
    from f5tts_tpu.utils import make_time_grid

    mcfg = PRESETS[model]
    arch = dataclasses.replace(mcfg.arch, text_num_embeds=256)
    bd = BACKBONES[mcfg.backbone]
    params = bd.init(jax.random.PRNGKey(0), arch)
    statics = bd.statics_cls(arch)

    mesh = make_mesh(data=n_devices, model=1, devices=jax.devices()[:n_devices])
    dsh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    params = jax.tree.map(lambda a: jax.device_put(a, rep), params)

    b = per_device_batch * n_devices
    rng = np.random.default_rng(0)
    cond = jax.device_put(jnp.asarray(rng.standard_normal((b, seq_frames, 100)) * 0.1,
                                      jnp.float32), dsh)
    text = jax.device_put(jnp.asarray(rng.integers(1, 256, (b, 64)), jnp.int32), dsh)
    lens = jax.device_put(jnp.full((b,), seq_frames // 4, jnp.int32), dsh)
    dur = jax.device_put(jnp.full((b,), seq_frames, jnp.int32), dsh)
    t_grid = make_time_grid(nfe, sway_sampling_coef=-1.0, use_epss=False)

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    def run(key):
        # scalar checksum: fetching forces completion (tunnel sync hazard,
        # see CLAUDE.md); the pallas backend auto-wraps in shard_map under
        # the ambient mesh set below
        backend = "pallas" if on_tpu else "xla"
        mel = cfm.cfm_sample(params, statics, cond, text, lens, dur, t_grid,
                             key=key, cfg_strength=2.0, dtype=dtype,
                             backend=backend, backbone=bd)
        return jnp.sum(mel.astype(jnp.float32))

    with jax.set_mesh(mesh):
        float(run(jax.random.PRNGKey(1000)))  # compile+warm, key never reused
        t0 = time.perf_counter()
        vals = [run(jax.random.PRNGKey(i)) for i in range(reps)]
        assert np.isfinite(sum(float(v) for v in vals))
        dt = (time.perf_counter() - t0) / reps

    audio_s = b * (seq_frames - seq_frames // 4) * 256 / 24000
    return {"devices": n_devices, "batch": b, "wall_s": dt,
            "audio_s_per_s": audio_s / dt,
            "audio_s_per_s_per_device": audio_s / dt / n_devices}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--model", default="F5TTS_v1_Small")
    p.add_argument("--force_cpu", type=int, default=0,
                   help="force N virtual CPU devices (functional validation)")
    p.add_argument("--seq_frames", type=int, default=256)
    p.add_argument("--nfe", type=int, default=2)
    args = p.parse_args(argv)

    if args.force_cpu:
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.force_cpu}"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    avail = len(jax.devices())
    results = []
    base = None
    for n in args.devices:
        if n > avail:
            continue
        r = bench_dp_sampling(n, args.model, args.seq_frames, args.nfe)
        if base is None:
            base = r["audio_s_per_s"]
        r["scaling_efficiency"] = r["audio_s_per_s"] / (base * n)
        results.append(r)
        print(json.dumps(r))
    return results


if __name__ == "__main__":
    main()

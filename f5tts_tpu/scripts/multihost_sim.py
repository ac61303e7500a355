"""Multi-process (multi-host) training-step simulation on CPU devices.

Exercises the pod input pipeline (train/multihost.py: identical
DynamicBatchSampler sequence on every process, process-local row
materialization, `jax.make_array_from_process_local_data` assembly) through
ONE real train step under `jax.distributed` — the counterpart of the
reference's Accelerate/DDP multi-rank launch (reference
src/f5_tts/model/trainer.py:57-68 NCCL process group; here: gloo CPU
collectives standing in for ICI/DCN).

Launch N copies of this script with distinct --process_id against one
coordinator; each prints one line `RESULT loss=<f> cksum=<f> rows=<slice>`.
All processes must agree on loss/cksum (the psum'd step is SPMD), and the
result must match the single-process oracle (tests/test_multihost_sim.py).

Usage (2-process simulation, 4 virtual CPU devices each):
  XLA_FLAGS=--xla_force_host_platform_device_count=4 \
    python -m f5tts_tpu.scripts.multihost_sim --process_id 0 --num_processes 2 &
  XLA_FLAGS=--xla_force_host_platform_device_count=4 \
    python -m f5tts_tpu.scripts.multihost_sim --process_id 1 --num_processes 2
"""

from __future__ import annotations

import argparse

import numpy as np

GLOBAL_ROWS = 8
N_FRAMES = 64
N_TOKENS = 16
MEL_DIM = 16
VOCAB = 64


def _row_mel(i: int) -> np.ndarray:
    """Deterministic per-row mel: any process can materialize any row
    identically (stands in for 'load audio for the rows you own')."""
    rng = np.random.default_rng(1000 + i)
    return rng.standard_normal((N_FRAMES, MEL_DIM)).astype(np.float32)


def _row_len(i: int) -> int:
    return int(N_FRAMES - (i % 3) * 8)


def _row_text(i: int) -> np.ndarray:
    rng = np.random.default_rng(2000 + i)
    return rng.integers(0, VOCAB, (N_TOKENS,)).astype(np.int32)


def run(process_id: int = 0, num_processes: int = 1,
        coordinator: str = "127.0.0.1:29777") -> dict:
    """Initialize distributed JAX (unless single-process), assemble the
    process-sharded global batch, run ONE train step. Returns metrics."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    if num_processes > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from f5tts_tpu.config import CFMConfig, ModelArch
    from f5tts_tpu.models import dit
    from f5tts_tpu.parallel.mesh import make_mesh
    from f5tts_tpu.train import multihost
    from f5tts_tpu.train.step import (init_train_state, make_optimizer,
                                      make_train_step)

    n_dev = jax.device_count()
    mesh = make_mesh(data=n_dev, model=1, devices=jax.devices())
    dsh = NamedSharding(mesh, P("data"))

    arch = ModelArch(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2,
                     mel_dim=MEL_DIM, text_num_embeds=VOCAB, text_dim=32,
                     conv_layers=1)
    params = dit.init_dit(jax.random.PRNGKey(0), arch)
    statics = dit.DiTStatics(arch)
    tx = make_optimizer(1e-4, warmup_updates=10, total_updates=100)
    state = init_train_state(params, tx)
    # DP-only layout: params/opt replicated on every device, batch sharded
    rep = NamedSharding(mesh, P())
    state = jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), rep), state)

    # ---- pod input pipeline (train/multihost.py) --------------------------
    # every process derives the SAME pad width from shared duration
    # estimates, materializes only its own rows, and assembles globally
    rows = multihost.process_local_rows(dsh, GLOBAL_ROWS)
    width = multihost.global_pad_width([_row_len(i) for i in range(GLOBAL_ROWS)],
                                       bucket_frames=64)
    local_idx = range(rows.start, rows.stop)
    mel_local = np.stack([_row_mel(i)[:width] for i in local_idx])
    text_local = np.stack([_row_text(i) for i in local_idx])
    lens_local = np.asarray([_row_len(i) for i in local_idx], np.int32)

    mel = multihost.assemble_global(dsh, mel_local, GLOBAL_ROWS)
    text = multihost.assemble_global(dsh, text_local, GLOBAL_ROWS)
    lens = multihost.assemble_global(dsh, lens_local, GLOBAL_ROWS)

    step_fn = make_train_step(statics, tx, CFMConfig(), dtype=jnp.float32,
                              backend="xla")
    with jax.set_mesh(mesh):
        new_state, metrics = jax.jit(step_fn)(state, jax.random.PRNGKey(1),
                                              mel, text, lens)
        loss = float(metrics["loss"])
        # parameter checksum proves every process applied the same update
        cksum = float(sum(jnp.sum(jnp.abs(a.astype(jnp.float32)))
                          for a in jax.tree.leaves(new_state.params)))

    # ---- ZeRO-1 leg: moments/EMA sharded over "data" ACROSS PROCESSES -----
    # The virtual-mesh ZeRO-1 tests run in one process; here the moment
    # shards genuinely live on different HOSTS and the reduce-scatter /
    # all-gather ride the (gloo) inter-process collectives. Numerics must
    # match the replicated step above exactly (same init/key/batch).
    from f5tts_tpu.parallel.mesh import (replicated, shard_train_state,
                                         train_state_shardings)

    z0 = shard_train_state(init_train_state(params, tx), mesh, zero1=True)
    z_sh = train_state_shardings(z0, mesh, zero1=True)
    repsh = replicated(mesh)
    with jax.set_mesh(mesh):
        zjit = jax.jit(step_fn, out_shardings=(
            z_sh, {"loss": repsh, "grad_norm": repsh}))
        z1, zmetrics = zjit(z0, jax.random.PRNGKey(1), mel, text, lens)
        z_loss = float(zmetrics["loss"])
        z_cksum = float(sum(jnp.sum(jnp.abs(a.astype(jnp.float32)))
                            for a in jax.tree.leaves(z1.params)))
    mu = z1.opt_state[1][0].mu["blocks"]["attn"]["to_q"]["w"]
    z_dist = int(tuple(mu.addressable_shards[0].data.shape) != tuple(mu.shape))
    # under multi-process, each process must hold only ITS devices' shards
    z_local_shards = len(mu.addressable_shards)

    return {"loss": loss, "cksum": cksum, "rows": (rows.start, rows.stop),
            "devices": n_dev, "process_id": process_id,
            "z_loss": z_loss, "z_cksum": z_cksum, "z_dist": z_dist,
            "z_local_shards": z_local_shards}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--process_id", type=int, default=0)
    p.add_argument("--num_processes", type=int, default=1)
    p.add_argument("--coordinator", default="127.0.0.1:29777")
    args = p.parse_args(argv)
    r = run(args.process_id, args.num_processes, args.coordinator)
    print(f"RESULT loss={r['loss']:.8f} cksum={r['cksum']:.4f} "
          f"rows={r['rows'][0]}:{r['rows'][1]} devices={r['devices']} "
          f"z_loss={r['z_loss']:.8f} z_cksum={r['z_cksum']:.4f} "
          f"z_dist={r['z_dist']} z_local={r['z_local_shards']}",
          flush=True)


if __name__ == "__main__":
    main()

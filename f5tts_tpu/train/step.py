"""Training step: AdamW + warmup/decay schedule + grad clip + EMA.

Optimization recipe mirrors the reference Trainer (src/f5_tts/model/trainer.py):
- AdamW (trainer.py:138-143)
- linear warmup 1e-8 -> peak lr over num_warmup_updates, then linear decay
  back to 1e-8 over the remainder (SequentialLR, trainer.py:322-326)
- global-norm gradient clipping at max_grad_norm (trainer.py:379-380)
- EMA of model weights (ema_pytorch semantics: decay 0.999, update_every 10,
  update_after_step 100; trainer.py:106-108)

Everything is one jitted function; DP gradient psum is inserted by XLA when
the batch is sharded over the mesh "data" axis and params are replicated on it.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from f5tts_tpu.config import CFMConfig
from f5tts_tpu.models import cfm, dit


class TrainState(NamedTuple):
    step: jax.Array          # scalar int32, update counter
    params: dict
    opt_state: optax.OptState
    ema_params: dict


class OptHParams(NamedTuple):
    """Hyperparameters mirroring make_optimizer, for the fused update path."""

    learning_rate: float
    warmup_updates: int
    total_updates: int
    max_grad_norm: float = 1.0
    weight_decay: float = 0.01
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8


def _make_schedule(hp: OptHParams):
    decay_updates = max(hp.total_updates - hp.warmup_updates, 1)
    return optax.join_schedules(
        [
            optax.linear_schedule(1e-8, hp.learning_rate, hp.warmup_updates),
            optax.linear_schedule(hp.learning_rate, 1e-8, decay_updates),
        ],
        boundaries=[hp.warmup_updates],
    )


def make_optimizer(
    learning_rate: float,
    warmup_updates: int,
    total_updates: int,
    max_grad_norm: float = 1.0,
    weight_decay: float = 0.01,
) -> optax.GradientTransformation:
    """AdamW with the reference's warmup->decay ramp (trainer.py:316-326)."""
    hp = OptHParams(learning_rate, warmup_updates, total_updates,
                    max_grad_norm, weight_decay)
    return optax.chain(
        optax.clip_by_global_norm(hp.max_grad_norm),
        optax.adamw(_make_schedule(hp), b1=hp.b1, b2=hp.b2, eps=hp.eps,
                    weight_decay=hp.weight_decay),
    )


def init_train_state(params: dict, tx: optax.GradientTransformation,
                     moment_dtype=None, ema_dtype=None) -> TrainState:
    """`moment_dtype`/`ema_dtype` (e.g. jnp.bfloat16) opt into low-memory
    optimizer state: mu/nu and the EMA tree are STORED in the reduced dtype
    while the fused update still computes in f32 (make_train_step casts per
    leaf). At MMDiT_Base (645M) scale this halves the 10.3 GB f32 state to
    ~5.2 GB — the difference between fitting and OOMing single-chip without
    buffer donation (which the dev tunnel rejects). Numerics gate:
    tests/test_train.py::test_bf16_state_tracks_f32_state."""
    opt_state = tx.init(params)
    if moment_dtype is not None:
        def cast_moments(node):
            if isinstance(node, optax.ScaleByAdamState):
                return node._replace(
                    mu=jax.tree.map(lambda a: a.astype(moment_dtype), node.mu),
                    nu=jax.tree.map(lambda a: a.astype(moment_dtype), node.nu))
            if isinstance(node, tuple):
                mapped = [cast_moments(c) for c in node]
                return (type(node)(*mapped) if hasattr(node, "_fields")
                        else tuple(mapped))
            return node
        opt_state = cast_moments(opt_state)
    ema = jax.tree.map(
        lambda a: a.astype(ema_dtype) if ema_dtype is not None else a, params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt_state,
        ema_params=ema,
    )


def make_train_step(
    statics: dit.DiTStatics,
    tx: optax.GradientTransformation,
    cfg: CFMConfig = CFMConfig(),
    ema_decay: float = 0.999,
    ema_update_every: int = 10,
    ema_update_after_step: int = 100,
    dtype=jnp.bfloat16,
    backend: str = "pallas",
    backbone=None,
    fuse_qkv: bool = True,
    hp: Optional[OptHParams] = None,
):
    """Returns a jittable fn(state, key, mel, text, lens) -> (state, metrics).

    `hp` (the hyperparameters `tx` was built from) opts into the FUSED
    optimizer+EMA update: clip+AdamW+EMA as one elementwise pass per leaf
    instead of optax's multi-sweep chain (same numerics, same opt_state
    structure — checkpoints stay interchangeable).

    backend="pallas" engages the flash-attention forward+backward kernels on
    TPU (O(n) attention memory); off-TPU it falls back to the XLA path
    automatically (ops.attention.attention dispatch).

    fuse_qkv=True applies the inference QKV fusion to a per-step VIEW of the
    params (the optimizer state stays on the unfused to_q/to_k/to_v tree;
    grads flow back through the concat's slice VJP). On TPU with
    backend="pallas" this routes attention through the fused QKV+RoPE
    megakernel, whose custom VJP drives the Pallas flash backward."""
    from f5tts_tpu.models import modules as m

    bdef = backbone or cfm.DIT
    schedule = _make_schedule(hp) if hp is not None else None

    def loss_fn(params, key, mel, text, lens):
        if fuse_qkv:
            params = m.fuse_backbone_qkv(params, dtype=dtype)
        loss, _ = cfm.cfm_loss(params, statics, key, mel, text, lens,
                               cfg=cfg, dtype=dtype, backend=backend,
                               backbone=bdef)
        return loss

    def grad_step(params, key, mel, text, lens):
        """One micro-batch: (loss, grads). Used directly for gradient
        accumulation (reference trainer.py:63-68,364: accumulate grads over
        `grad_accumulation_steps` micro-batches, sync/update at the boundary)."""
        return jax.value_and_grad(loss_fn)(params, key, mel, text, lens)

    def ema_step(ema_params, params, step):
        """EMA tree update as ONE fused elementwise pass per leaf.

        The three-branch semantics (keep / copy / decay-average) collapse
        into a single scalar mixing coefficient computed once per step:
        e' = alpha*e + (1-alpha)*p with alpha in {1, 0, ema_decay}. The
        original two-jnp.where-per-leaf chain lowered to ~3 VPU passes over
        the 336M-param tree (~6% of step time in device traces); a whole-tree
        lax.cond skips the sweep entirely 9 of 10 steps but blows XLA compile
        time past 10 minutes, so the scalar-alpha form is the keeper."""
        do_update = (step % ema_update_every) == 0
        past_warmup = step > ema_update_after_step
        alpha = jnp.where(do_update,
                          jnp.where(past_warmup, ema_decay, 0.0),
                          1.0).astype(jnp.float32)
        return jax.tree.map(
            lambda e, p: e * alpha.astype(e.dtype)
            + p.astype(e.dtype) * (1.0 - alpha).astype(e.dtype),
            ema_params, params)

    def _ema_alpha(step):
        do_update = (step % ema_update_every) == 0
        past_warmup = step > ema_update_after_step
        return jnp.where(do_update,
                         jnp.where(past_warmup, ema_decay, 0.0),
                         1.0).astype(jnp.float32)

    def fused_apply(state: TrainState, loss, grads, skip_ema: bool = False):
        """Clip + AdamW + EMA as ONE elementwise pass per leaf.

        The optax chain walks the 336M-param tree several times (clip scale,
        adam moments, decayed weights, lr scale, apply, then EMA): ~9 extra
        HBM sweeps of 1.3 GB f32 each. This computes the whole update in a
        single tree.map whose per-leaf body XLA fuses into one read-modify-
        write. Numerics match optax exactly (bias correction with count+1,
        clip scale applied to the raw grads, decoupled weight decay, then
        the scalar-alpha EMA) — tests/test_train.py asserts allclose against
        the optax path."""
        clip_state, (adam_state, wd_state, sched_state) = state.opt_state
        gnorm = optax.global_norm(grads)
        gscale = jnp.where(gnorm < hp.max_grad_norm, 1.0,
                           hp.max_grad_norm / gnorm).astype(jnp.float32)
        count_inc = adam_state.count + 1
        lr = schedule(sched_state.count).astype(jnp.float32)
        bc1 = 1.0 - hp.b1 ** count_inc.astype(jnp.float32)
        bc2 = 1.0 - hp.b2 ** count_inc.astype(jnp.float32)
        step = state.step + 1
        alpha = _ema_alpha(step)

        def leaf(p, g, mu, nu, e):
            # compute in f32 regardless of the STORED moment dtype (bf16
            # moments opt-in, init_train_state moment_dtype); for f32 state
            # every astype below is a no-op and numerics stay bit-identical
            g = g.astype(jnp.float32) * gscale
            mu2 = hp.b1 * mu.astype(jnp.float32) + (1.0 - hp.b1) * g
            nu2 = hp.b2 * nu.astype(jnp.float32) + (1.0 - hp.b2) * g * g
            upd = (mu2 / bc1) / (jnp.sqrt(nu2 / bc2) + hp.eps) + hp.weight_decay * p
            p2 = p - lr * upd
            mu2, nu2 = mu2.astype(mu.dtype), nu2.astype(nu.dtype)
            if skip_ema:
                # steps the EMA provably skips (step % update_every != 0 ->
                # alpha == 1): pass the tree through UNTOUCHED — jit forwards
                # identity outputs by buffer, dropping the 2.7 GB/step
                # read+write of e*1 + p*0
                return p2, mu2, nu2, e
            e2 = e * alpha.astype(e.dtype) + p2.astype(e.dtype) * (1.0 - alpha).astype(e.dtype)
            return p2, mu2, nu2, e2

        quad = jax.tree.map(leaf, state.params, grads, adam_state.mu,
                            adam_state.nu, state.ema_params)
        is4 = lambda x: isinstance(x, tuple)  # noqa: E731
        pick = lambda i: jax.tree.map(lambda q: q[i], quad, is_leaf=is4)  # noqa: E731
        opt_state = (clip_state,
                     (adam_state._replace(count=count_inc, mu=pick(1), nu=pick(2)),
                      wd_state, sched_state._replace(count=sched_state.count + 1)))
        return (
            TrainState(step=step, params=pick(0), opt_state=opt_state,
                       ema_params=pick(3)),
            {"loss": loss, "grad_norm": gnorm},
        )

    def optax_apply(state: TrainState, loss, grads):
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        step = state.step + 1
        # EMA (ema_pytorch semantics): copy weights until update_after_step,
        # then decay-average every `ema_update_every` updates.
        ema_params = ema_step(state.ema_params, params, step)
        gnorm = optax.global_norm(grads)
        return (
            TrainState(step=step, params=params, opt_state=opt_state, ema_params=ema_params),
            {"loss": loss, "grad_norm": gnorm},
        )

    apply_impl = fused_apply if hp is not None else optax_apply

    def apply_step(state: TrainState, loss, grads):
        """Apply pre-computed (averaged) grads: optimizer + EMA + counter."""
        return apply_impl(state, loss, grads)

    def train_step(state: TrainState, key, mel, text, lens):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, key, mel, text, lens)
        return apply_impl(state, loss, grads)

    def train_step_noema(state: TrainState, key, mel, text, lens):
        """Variant for steps where the EMA update is a provable no-op
        (state.step % ema_update_every != ema_update_every - 1, i.e. the
        POST-increment step is not a multiple of update_every): identical
        numerics, ema tree forwarded by buffer. Jit this separately and
        dispatch host-side on the step counter (a tree-wide lax.cond blows
        remote compile past 10 min — BENCH_HISTORY r3). Fused path only."""
        loss, grads = jax.value_and_grad(loss_fn)(state.params, key, mel, text, lens)
        if hp is None:
            return optax_apply(state, loss, grads)
        return fused_apply(state, loss, grads, skip_ema=True)

    train_step.grad_step = grad_step
    train_step.apply_step = apply_step
    train_step.noema = train_step_noema
    return train_step

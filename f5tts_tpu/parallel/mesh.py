"""Device mesh + parameter sharding for the DiT.

The reference's parallelism inventory (SURVEY.md §2.6) maps to one global
mesh with two axes:

- "data": DP for training batches / eval prompt shards / the CFG cond-uncond
  2B batch at inference (reference packs them on the batch axis, dit.py:337-346
  — here that axis is simply sharded).
- "model": TP of the DiT, the head-sharding scheme the reference implements
  with TRT-LLM ColumnLinear/RowLinear (reference:
  runtime/triton_trtllm/patch/f5tts/modules.py:147-185 and the q/k/v head
  splitter in scripts/convert_checkpoint.py:16-23,169-193): q/k/v and ffn-in
  kernels column-sharded, attn-out and ffn-out row-sharded. The RowLinear
  allreduce becomes an XLA-inserted psum — no hand-written comm.

Gradients data-parallel-reduce automatically under jit when params are
replicated across "data" and batches are sharded over it.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


# Column-parallel projections: output channels sharded over "model" (the
# reference's ColumnLinear set, convert_checkpoint.py:169-193, extended to
# the inference-fused "to_qkv" leaf and MMDiT's context-stream leaves).
# "to_qkv" stores [d, 3*h*dh] as a flat [q|k|v] concat (modules.
# fuse_attention_qkv); a "model"-shard of its last axis crosses the q/k/v
# block boundaries for tp>1, which GSPMD handles with one reshard at the
# qkv split — semantics are unchanged, and the dryrun asserts allclose.
_COL = {
    ("attn", "to_q"), ("attn", "to_k"), ("attn", "to_v"), ("attn", "to_qkv"),
    ("attn", "to_q_c"), ("attn", "to_k_c"), ("attn", "to_v_c"),
    ("attn", "to_qkv_c"),
    ("ff", "in"), ("ff_x", "in"), ("ff_c", "in"),
}
# Row-parallel projections: contraction axis sharded; XLA inserts the psum
# the reference implements as RowLinear's allreduce.
_ROW = {
    ("attn", "to_out"), ("attn", "to_out_c"),
    ("ff", "out"), ("ff_x", "out"), ("ff_c", "out"),
}


def _spec_for_path(path: tuple, ndim: int) -> P:
    """TP rules keyed on param-tree path suffixes. Stacked block params carry a
    leading depth axis, handled by padding the spec with None on the left.

    Covers the plain f32/bf16 leaves ({"w","b"}) and the int8-quantized
    serving leaves ({"w_i8","w_scale","b"}, ops.quant.quantize_dit_params):
    w_i8 shards like w; w_scale ([..., 1, n] per-output-channel) shards with
    column-parallel leaves and stays replicated for row-parallel ones (the
    scale axis is the un-sharded output axis there)."""
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    if len(names) < 3:
        return P(*([None] * ndim))
    mod_name = tuple(names[-3:-1])
    leaf = names[-1]

    col = mod_name in _COL
    row = mod_name in _ROW

    spec = [None] * ndim
    if col and leaf in ("w", "b", "w_i8", "w_scale"):
        spec[-1] = "model"
    elif row and leaf in ("w", "w_i8") and ndim >= 2:
        spec[-2] = "model"
    # row-parallel "b" and "w_scale" stay replicated: they apply to the
    # (un-sharded) output channels after the psum.
    return P(*spec)


def dit_param_specs(params) -> dict:
    """PartitionSpec pytree matching the DiT param pytree (TP on "model")."""
    return jax.tree_util.tree_map_with_path(
        lambda path, a: _spec_for_path(path, a.ndim), params
    )


def shard_params(params, mesh: Mesh, specs=None):
    if specs is None:
        specs = dit_param_specs(params)
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), params, specs,
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# -- ZeRO-1: optimizer-moment / EMA sharding over the data axis --------------
#
# The reference trains with DDP (replicated AdamW state on every rank,
# accelerate's default — reference src/f5_tts/model/trainer.py:138-143). At
# F5TTS scale that replicates 3 extra f32 trees (mu, nu, EMA = 3x params);
# for MMDiT_Base (645M) the f32 state alone is ~10.3 GB — over half an HBM.
# ZeRO-1 (Rajbhandari et al., 2019) shards those trees across data-parallel
# ranks; on TPU this is just a PartitionSpec: give mu/nu/EMA leaves a "data"
# axis on a free dimension and let GSPMD insert the reduce-scatter (grads ->
# sharded moment update) and all-gather (sharded param delta -> replicated
# params) over ICI. The update math in train/step.py is elementwise per leaf,
# so no code change there — only the state layout and the jit out_shardings.


def _zero1_axis(shape: tuple, data: int, tp_spec: P):
    """Largest axis divisible by the data-axis size that TP leaves unsharded."""
    best = None
    for i, s in enumerate(shape):
        if i < len(tp_spec) and tp_spec[i] is not None:
            continue
        if s >= data and s % data == 0:
            if best is None or s > shape[best]:
                best = i
    return best


def _zero1_spec_leaf(a, tp_spec: P, data: int) -> P:
    ndim = getattr(a, "ndim", len(getattr(a, "shape", ())))
    spec = list(tp_spec) + [None] * (ndim - len(tp_spec))
    axis = _zero1_axis(tuple(a.shape), data, tp_spec) if ndim else None
    if axis is not None:
        spec[axis] = "data"
    return P(*spec)


def zero1_param_specs(params, mesh: Mesh, param_specs=None) -> dict:
    """Specs for the optimizer-moment / EMA mirror of `params`: TP spec plus a
    "data" shard on each leaf's largest free divisible axis. Leaves with no
    qualifying axis (tiny biases, scalars) stay replicated over data."""
    data = mesh.shape.get("data", 1)
    if param_specs is None:
        param_specs = dit_param_specs(params)
    return jax.tree.map(
        lambda a, s: _zero1_spec_leaf(a, s, data), params, param_specs
    )


def train_state_shardings(state, mesh: Mesh, zero1: bool = True):
    """NamedSharding pytree for a train.step.TrainState: params TP-sharded
    (replicated over "data" — DP), optimizer moments + EMA ZeRO-1-sharded
    over "data" when `zero1`. Use both to device_put the state AND as jit
    out_shardings so the layout is stable across steps (without the out
    constraint GSPMD may leave the updated params data-sharded, pushing an
    all-gather into the NEXT step's forward instead of the update)."""
    param_specs = dit_param_specs(state.params)
    state_specs = zero1_param_specs(state.params, mesh, param_specs) if zero1 \
        else param_specs

    def named(spec_tree):
        return jax.tree.map(lambda s: NamedSharding(mesh, s), spec_tree)

    return type(state)(
        step=NamedSharding(mesh, P()),
        params=named(param_specs),
        opt_state=named(opt_state_specs(state.opt_state, state.params,
                                        state_specs)),
        ema_params=named(state_specs),
    )


def opt_state_specs(opt_state, params, state_specs):
    """Spec tree for an optax state: map STRUCTURALLY, not by leaf shape.
    mu/nu (and any other param-mirror subtree) share the params treedef, so
    the full `state_specs` tree substitutes wherever a subtree matches it;
    everything else (schedule/clip counters, EmptyState) stays replicated.
    Shape-keyed mapping collided same-shape leaves with different TP specs
    (square to_q col vs to_out row kernels; [depth,dim] col kernels vs
    biases), leaving the losers' moments on a layout mismatched to their
    grads (ADVICE r4)."""
    params_td = jax.tree.structure(params)

    def rec(node):
        if node is None:
            return None
        if jax.tree.structure(node) == params_td:
            return state_specs
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            mapped = [rec(c) for c in node]
            if hasattr(node, "_fields"):  # NamedTuple (optax states)
                return type(node)(*mapped)
            return type(node)(mapped) if isinstance(node, list) else tuple(mapped)
        return P()

    return rec(opt_state)


def shard_train_state(state, mesh: Mesh, zero1: bool = True):
    """device_put a TrainState onto the mesh per train_state_shardings."""
    sh = train_state_shardings(state, mesh, zero1=zero1)
    return jax.tree.map(jax.device_put, state, sh)

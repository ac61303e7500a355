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


def _spec_for_path(path: tuple, ndim: int) -> P:
    """TP rules keyed on param-tree path suffixes. Stacked block params carry a
    leading depth axis, handled by padding the spec with None on the left."""
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]

    def ends(*suffix):
        return tuple(names[-len(suffix):]) == suffix

    col = None  # spec for the last axis
    row = None  # spec for the second-to-last axis
    if ends("attn", "to_q", "w") or ends("attn", "to_k", "w") or ends("attn", "to_v", "w"):
        col = "model"
    elif ends("attn", "to_q", "b") or ends("attn", "to_k", "b") or ends("attn", "to_v", "b"):
        col = "model"
    elif ends("attn", "to_out", "w"):
        row = "model"
    elif ends("ff", "in", "w"):
        col = "model"
    elif ends("ff", "in", "b"):
        col = "model"
    elif ends("ff", "out", "w"):
        row = "model"

    spec = [None] * ndim
    if col is not None:
        spec[-1] = col
    if row is not None and ndim >= 2:
        spec[-2] = row
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

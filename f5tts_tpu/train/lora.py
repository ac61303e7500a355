"""Style-LoRA adapters: low-rank finetuning of the DiT.

BASELINE.json names style-LoRA finetuning as a build target; the reference
snapshot contains no LoRA code (SURVEY.md §2.6 note), so this is a new
design: A·B adapters on the attention qkv/out and ffn in/out projections of
every DiT block, stored as a separate small pytree.

- merge-at-forward: w_eff = w + (alpha/rank) * A @ B, computed inside jit
  (a rank-r matmul per layer, negligible next to the block matmuls; XLA
  fuses the add into the consumer).
- sharding: A is replicated, B follows the base weight's TP spec — a
  column-sharded base (qkv/ffn-in) shards B's output dim on "model"; a
  row-sharded base (attn-out/ffn-out) shards A's input dim.
- training: gradients flow only through the adapter pytree; the base params
  are closed over as constants.
- export/merge: `merge_lora` folds adapters into base weights for serving.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from f5tts_tpu.models import cfm
from f5tts_tpu.models import modules as m

# DiT block projections that receive adapters (path suffix under blocks.attn / blocks.ff)
DEFAULT_TARGETS = ("to_q", "to_k", "to_v", "to_out", "in", "out")


class LoRAConfig(NamedTuple):
    rank: int = 8
    alpha: float = 16.0
    targets: tuple = DEFAULT_TARGETS


def _target_kernels(params: dict, targets: tuple) -> dict:
    """Subtree of stacked block kernels to adapt: {attn: {to_q: w...}, ff: {...}}."""
    out: dict = {}
    blocks = params["blocks"]
    for group in ("attn", "ff"):
        for name, sub in blocks[group].items():
            if name in targets and isinstance(sub, dict) and "w" in sub:
                out.setdefault(group, {})[name] = sub["w"]
    return out


def init_lora(key, params: dict, cfg: LoRAConfig = LoRAConfig()) -> dict:
    """LoRA pytree mirroring the adapted kernels: each leaf {a: [L, in, r],
    b: [L, r, out]} with a ~ N(0, 1/r), b = 0 (standard LoRA init)."""
    kernels = _target_kernels(params, cfg.targets)
    leaves, treedef = jax.tree.flatten(kernels)
    keys = jax.random.split(key, len(leaves))
    adapters = []
    for w, k in zip(leaves, keys):
        depth, d_in, d_out = w.shape
        a = jax.random.normal(k, (depth, d_in, cfg.rank), jnp.float32) / jnp.sqrt(cfg.rank)
        b = jnp.zeros((depth, cfg.rank, d_out), jnp.float32)
        adapters.append({"a": a, "b": b})
    return jax.tree.unflatten(treedef, adapters)


def apply_lora(params: dict, lora: dict, cfg: LoRAConfig = LoRAConfig()) -> dict:
    """Return params with adapted kernels w + (alpha/rank)·A@B (inside jit)."""
    scale = cfg.alpha / cfg.rank

    out = dict(params)
    blocks = {g: dict(v) if isinstance(v, dict) else v for g, v in params["blocks"].items()}
    for group, subs in lora.items():
        for name, ab in subs.items():
            base = blocks[group][name]
            delta = jnp.einsum("lir,lro->lio", ab["a"], ab["b"]) * scale
            blocks[group] = dict(blocks[group])
            blocks[group][name] = dict(base, w=base["w"] + delta.astype(base["w"].dtype))
    out["blocks"] = blocks
    return out


merge_lora = apply_lora  # merging for export is the same computation, materialized


def lora_param_specs(lora: dict, base_specs: dict) -> dict:
    """TP sharding for adapters: B inherits the base column sharding; A the
    base row sharding (see module docstring)."""
    from jax.sharding import PartitionSpec as P

    def spec_for(group, name):
        base = base_specs["blocks"][group][name]["w"]  # [L, in, out] spec
        a_spec = P(None, base[1] if len(base) > 2 else None, None)
        b_spec = P(None, None, base[2] if len(base) > 2 else None)
        return {"a": a_spec, "b": b_spec}

    return {
        group: {name: spec_for(group, name) for name in subs}
        for group, subs in lora.items()
    }


def make_lora_train_step(
    base_params: dict,
    statics,
    tx: optax.GradientTransformation,
    cfg: LoRAConfig = LoRAConfig(),
    cfm_cfg=None,
    dtype=jnp.bfloat16,
    backend: str = "xla",
):
    """fn(lora, opt_state, key, mel, text, lens) -> (lora, opt_state, metrics).
    Only the adapter pytree is optimized."""
    from f5tts_tpu.config import CFMConfig

    cfm_cfg = cfm_cfg or CFMConfig()

    def loss_fn(lora, key, mel, text, lens):
        merged = apply_lora(base_params, lora, cfg)
        loss, _ = cfm.cfm_loss(merged, statics, key, mel, text, lens,
                               cfg=cfm_cfg, dtype=dtype, backend=backend)
        return loss

    def step(lora, opt_state, key, mel, text, lens):
        loss, grads = jax.value_and_grad(loss_fn)(lora, key, mel, text, lens)
        updates, opt_state = tx.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return step


def count_lora_params(lora: dict) -> int:
    return m.count_params(lora)


def load_lora(path: str) -> dict:
    """Load an adapter pytree saved by finetune_cli --lora (pickle)."""
    import pickle

    with open(path, "rb") as f:
        return pickle.load(f)


def merge_for_serving(base_params: dict, lora: dict,
                      cfg: LoRAConfig = LoRAConfig(),
                      quantization: str = "none") -> dict:
    """The full style-LoRA serving pipeline in one call: merge adapters into
    the base weights, fuse qkv (modules.fuse_backbone_qkv), optionally int8-
    quantize (ops.quant.quantize_dit_params). The result is the tree
    InferencePipeline serves and parallel.mesh.dit_param_specs TP-shards —
    adapters trained on the unfused layout compose with the fused/int8/TP
    serving stack because merging happens before fusion."""
    merged = merge_lora(base_params, lora, cfg)
    merged = m.fuse_backbone_qkv(merged)
    if quantization == "int8":
        from f5tts_tpu.ops.quant import quantize_dit_params

        merged = quantize_dit_params(merged)
    elif quantization != "none":
        raise ValueError(f"unknown quantization {quantization!r}")
    return merged

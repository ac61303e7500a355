"""Checkpointing: orbax-backed save/rotate/resume with EMA payload.

Mirrors the reference Trainer checkpoint contract
(src/f5_tts/model/trainer.py:150-263):
- numbered checkpoints every `save_per_updates` with keep-last-N rotation
- a "last" heartbeat checkpoint every `last_per_updates` (orbax: the latest
  step in the manager; `load_latest` prefers it)
- payload: model params + optimizer state + EMA params + update counter
- inference-side loading: EMA weights by default (`use_ema=True`), matching
  utils_infer.py:209-227.

Also exports reference-format interop: `save_safetensors_ema` writes the
EMA weights in the reference's key schema so reference tooling can read them.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from f5tts_tpu.train.step import TrainState


class CheckpointManager:
    """Two independent orbax managers, mirroring the reference's split
    between the `model_last.pt` heartbeat (overwritten, never rotated
    against milestones) and rotated numbered `model_<step>.pt` checkpoints
    (trainer.py:150-183). A single shared rotation would let frequent
    heartbeats evict the milestone the user expected to keep."""

    def __init__(self, save_dir: str, keep_last_n: int = -1):
        self.save_dir = os.path.abspath(save_dir)
        os.makedirs(self.save_dir, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=None if keep_last_n is None or keep_last_n < 0 else max(keep_last_n, 1),
            create=True,
        )
        # milestones live at the save_dir root (back-compat with dirs saved
        # before the split); the heartbeat in its own subdir, keep only 1
        self.mngr = ocp.CheckpointManager(self.save_dir, options=options)
        self.last_mngr = ocp.CheckpointManager(
            os.path.join(self.save_dir, "last"),
            options=ocp.CheckpointManagerOptions(max_to_keep=1, create=True),
        )

    def save(self, state: TrainState, step: Optional[int] = None, wait: bool = False,
             heartbeat: bool = False) -> None:
        step = int(state.step) if step is None else step
        mngr = self.last_mngr if heartbeat else self.mngr
        mngr.save(step, args=ocp.args.StandardSave(state_to_pytree(state)))
        if wait:
            mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        steps = [s for s in (self.mngr.latest_step(), self.last_mngr.latest_step())
                 if s is not None]
        return max(steps) if steps else None

    def restore(self, abstract_state: TrainState, step: Optional[int] = None) -> Optional[TrainState]:
        """Restore `step` (or the newest state across heartbeat+milestones —
        the reference prefers model_last.pt, which is always newest)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            return None
        mngr = (self.last_mngr if self.last_mngr.latest_step() == step
                and step not in self.mngr.all_steps() else self.mngr)
        restored = mngr.restore(
            step, args=ocp.args.StandardRestore(state_to_pytree(abstract_state))
        )
        return pytree_to_state(restored, abstract_state)

    def close(self):
        self.mngr.wait_until_finished()
        self.last_mngr.wait_until_finished()
        self.mngr.close()
        self.last_mngr.close()


def state_to_pytree(state: TrainState) -> dict:
    return {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "ema_params": state.ema_params,
    }


def pytree_to_state(tree: dict, like: TrainState) -> TrainState:
    return TrainState(
        step=tree["step"],
        params=tree["params"],
        opt_state=jax.tree.unflatten(
            jax.tree.structure(like.opt_state), jax.tree.leaves(tree["opt_state"])
        ),
        ema_params=tree["ema_params"],
    )


def load_params(ckpt_dir: str, use_ema: bool = True, step: Optional[int] = None) -> dict:
    """Load just the (EMA) model params from an orbax checkpoint dir.

    Considers both the milestone root and the `last/` heartbeat subdir,
    preferring whichever holds the newest step (reference prefers
    model_last.pt, always the newest; utils_infer.py:190-232)."""
    root = os.path.abspath(ckpt_dir)
    mngr = ocp.CheckpointManager(root)
    best, best_step = mngr, mngr.latest_step()
    last_dir = os.path.join(root, "last")
    if step is None and os.path.isdir(last_dir):
        last = ocp.CheckpointManager(last_dir)
        ls = last.latest_step()
        if ls is not None and (best_step is None or ls > best_step):
            best, best_step = last, ls
    step = step if step is not None else best_step
    assert step is not None, f"no checkpoints under {ckpt_dir}"
    restored = best.restore(step)
    tree = restored if isinstance(restored, dict) else restored.item
    return tree["ema_params" if use_ema else "params"]


# ---------------------------------------------------------------------------
# Reference-format export (inference-only safetensors, EMA weights)
# ---------------------------------------------------------------------------

def _to_reference_keys(params: dict, prefix: str = "") -> dict:
    """f5tts_tpu DiT pytree -> reference state-dict key schema (inverse of
    compat.torch_import.convert_f5tts_state_dict)."""
    sd: dict[str, np.ndarray] = {}
    t = "transformer"

    def lin(p, name):
        sd[f"{name}.weight"] = np.asarray(p["w"]).T
        if "b" in p:
            sd[f"{name}.bias"] = np.asarray(p["b"])

    def conv(p, name):
        sd[f"{name}.weight"] = np.transpose(np.asarray(p["w"]), (2, 1, 0))
        sd[f"{name}.bias"] = np.asarray(p["b"])

    lin(params["time_embed"]["mlp1"], f"{t}.time_embed.time_mlp.0")
    lin(params["time_embed"]["mlp2"], f"{t}.time_embed.time_mlp.2")
    sd[f"{t}.text_embed.text_embed.weight"] = np.asarray(params["text_embed"]["embed"]["w"])
    for i, blk in enumerate(params["text_embed"].get("blocks", [])):
        p = f"{t}.text_embed.text_blocks.{i}"
        conv(blk["dwconv"], f"{p}.dwconv")
        sd[f"{p}.norm.weight"] = np.asarray(blk["norm_w"])
        sd[f"{p}.norm.bias"] = np.asarray(blk["norm_b"])
        lin(blk["pw1"], f"{p}.pwconv1")
        sd[f"{p}.grn.gamma"] = np.asarray(blk["grn"]["gamma"]).reshape(1, 1, -1)
        sd[f"{p}.grn.beta"] = np.asarray(blk["grn"]["beta"]).reshape(1, 1, -1)
        lin(blk["pw2"], f"{p}.pwconv2")
    lin(params["input_embed"]["proj"], f"{t}.input_embed.proj")
    conv(params["input_embed"]["conv_pos"]["conv1"], f"{t}.input_embed.conv_pos_embed.conv1d.0")
    conv(params["input_embed"]["conv_pos"]["conv2"], f"{t}.input_embed.conv_pos_embed.conv1d.2")

    blocks = params["blocks"]
    depth = jax.tree.leaves(blocks)[0].shape[0]
    for i in range(depth):
        b = f"{t}.transformer_blocks.{i}"
        blk = jax.tree.map(lambda a: a[i], blocks)
        lin(blk["attn_norm"]["linear"], f"{b}.attn_norm.linear")
        lin(blk["attn"]["to_q"], f"{b}.attn.to_q")
        lin(blk["attn"]["to_k"], f"{b}.attn.to_k")
        lin(blk["attn"]["to_v"], f"{b}.attn.to_v")
        lin(blk["attn"]["to_out"], f"{b}.attn.to_out.0")
        if "q_norm" in blk["attn"]:
            sd[f"{b}.attn.q_norm.weight"] = np.asarray(blk["attn"]["q_norm"]["w"])
            sd[f"{b}.attn.k_norm.weight"] = np.asarray(blk["attn"]["k_norm"]["w"])
        lin(blk["ff"]["in"], f"{b}.ff.ff.0.0")
        lin(blk["ff"]["out"], f"{b}.ff.ff.2")

    lin(params["norm_out"]["linear"], f"{t}.norm_out.linear")
    lin(params["proj_out"], f"{t}.proj_out")
    if "long_skip" in params:
        sd[f"{t}.long_skip_connection.weight"] = np.asarray(params["long_skip"]["w"]).T
    return {prefix + k: v for k, v in sd.items()}


def save_safetensors_ema(params: dict, path: str) -> None:
    """Write EMA weights in the reference's pruned-safetensors format
    (finetune_gradio.py prune_checkpoint equivalent: EMA-only, key-prefixed)."""
    from safetensors.numpy import save_file

    sd = _to_reference_keys(params, prefix="ema_model.")
    sd = {k: v.astype(np.float32) for k, v in sd.items()}
    save_file(sd, path)

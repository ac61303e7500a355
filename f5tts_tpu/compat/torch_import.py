"""Import reference PyTorch checkpoints into f5tts_tpu parameter pytrees.

Covers the reference checkpoint formats (src/f5_tts/infer/utils_infer.py:190-232):
- `.pt` dicts with `ema_model_state_dict` (keys prefixed "ema_model.") or
  `model_state_dict`
- `.safetensors` EMA-only exports
- legacy key variants handled by the reference's back-compat patches

and the public charactr/vocos-mel-24khz `pytorch_model.bin` layout.

Conventions converted:
- torch Linear weight (out, in) -> ours (in, out)
- torch Conv1d weight (out, in/groups, k) -> ours (k, in/groups, out)
- GRN gamma/beta (1, 1, d) -> (d,)

All inputs are dicts of numpy arrays (or anything np.asarray accepts);
torch is only needed if you load the file with `load_torch_checkpoint`.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np
import jax.numpy as jnp

from f5tts_tpu.config import ModelArch


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _lin(sd: Mapping, name: str, bias: bool = True) -> dict:
    p = {"w": jnp.asarray(_np(sd[f"{name}.weight"]).T)}
    if bias and f"{name}.bias" in sd:
        p["b"] = jnp.asarray(_np(sd[f"{name}.bias"]))
    return p


def _conv(sd: Mapping, name: str) -> dict:
    return {
        "w": jnp.asarray(np.transpose(_np(sd[f"{name}.weight"]), (2, 1, 0))),
        "b": jnp.asarray(_np(sd[f"{name}.bias"])),
    }


def _convnext_v2(sd: Mapping, prefix: str) -> dict:
    return {
        "dwconv": _conv(sd, f"{prefix}.dwconv"),
        "norm_w": jnp.asarray(_np(sd[f"{prefix}.norm.weight"])),
        "norm_b": jnp.asarray(_np(sd[f"{prefix}.norm.bias"])),
        "pw1": _lin(sd, f"{prefix}.pwconv1"),
        "grn": {
            "gamma": jnp.asarray(_np(sd[f"{prefix}.grn.gamma"]).reshape(-1)),
            "beta": jnp.asarray(_np(sd[f"{prefix}.grn.beta"]).reshape(-1)),
        },
        "pw2": _lin(sd, f"{prefix}.pwconv2"),
    }


def extract_ema_state_dict(checkpoint: Mapping) -> dict:
    """Reference utils_infer.py:209-227: EMA checkpoints store keys as
    "ema_model.<name>" plus bookkeeping ("initted", "step")."""
    if "ema_model_state_dict" in checkpoint:
        sd = checkpoint["ema_model_state_dict"]
        return {
            k.removeprefix("ema_model."): v
            for k, v in sd.items()
            if k not in ("initted", "step", "ema_model.initted", "ema_model.step")
        }
    if "model_state_dict" in checkpoint:
        return dict(checkpoint["model_state_dict"])
    # raw state dict (e.g. safetensors EMA export)
    return {
        k.removeprefix("ema_model."): v
        for k, v in checkpoint.items()
        if k not in ("initted", "step")
    }


def load_torch_checkpoint(path: str) -> dict:
    """Load .pt / .safetensors into a flat numpy state dict."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    return extract_ema_state_dict(ckpt)


def convert_f5tts_state_dict(sd: Mapping, arch: ModelArch) -> dict:
    """Reference CFM/DiT state dict -> f5tts_tpu DiT param pytree.

    Expects keys "transformer.<...>" (the CFM wrapper's transformer submodule;
    mel_spec buffers are ignored).
    """
    t = "transformer"
    params: dict = {
        "time_embed": {
            "mlp1": _lin(sd, f"{t}.time_embed.time_mlp.0"),
            "mlp2": _lin(sd, f"{t}.time_embed.time_mlp.2"),
        },
        "text_embed": {
            "embed": {"w": jnp.asarray(_np(sd[f"{t}.text_embed.text_embed.weight"]))},
        },
        "input_embed": {
            "proj": _lin(sd, f"{t}.input_embed.proj"),
            "conv_pos": {
                "conv1": _conv(sd, f"{t}.input_embed.conv_pos_embed.conv1d.0"),
                "conv2": _conv(sd, f"{t}.input_embed.conv_pos_embed.conv1d.2"),
            },
        },
        "norm_out": {"linear": _lin(sd, f"{t}.norm_out.linear")},
        "proj_out": _lin(sd, f"{t}.proj_out"),
    }

    if arch.conv_layers > 0:
        params["text_embed"]["blocks"] = [
            _convnext_v2(sd, f"{t}.text_embed.text_blocks.{i}")
            for i in range(arch.conv_layers)
        ]

    blocks = []
    for i in range(arch.depth):
        b = f"{t}.transformer_blocks.{i}"
        blk = {
            "attn_norm": {"linear": _lin(sd, f"{b}.attn_norm.linear")},
            "attn": {
                "to_q": _lin(sd, f"{b}.attn.to_q"),
                "to_k": _lin(sd, f"{b}.attn.to_k"),
                "to_v": _lin(sd, f"{b}.attn.to_v"),
                "to_out": _lin(sd, f"{b}.attn.to_out.0"),
            },
            "ff": {
                "in": _lin(sd, f"{b}.ff.ff.0.0"),
                "out": _lin(sd, f"{b}.ff.ff.2"),
            },
        }
        if f"{b}.attn.q_norm.weight" in sd:
            blk["attn"]["q_norm"] = {"w": jnp.asarray(_np(sd[f"{b}.attn.q_norm.weight"]))}
            blk["attn"]["k_norm"] = {"w": jnp.asarray(_np(sd[f"{b}.attn.k_norm.weight"]))}
        blocks.append(blk)

    import jax

    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    if f"{t}.long_skip_connection.weight" in sd:
        params["long_skip"] = _lin(sd, f"{t}.long_skip_connection", bias=False)
    return params


def convert_unett_state_dict(sd: Mapping, arch: ModelArch) -> dict:
    """Reference CFM/UNetT (E2-TTS) state dict -> f5tts_tpu UNetT param pytree.

    Reference layout (src/f5_tts/model/backbones/unett.py:149-186): layers is
    a ModuleList of ModuleList([skip_proj(0), attn_norm(1), attn(2),
    ff_norm(3), ff(4)]); skip_proj exists only for the later half when
    skip_connect_type == "concat"; norm_out is an RMSNorm.
    """
    t = "transformer"
    params: dict = {
        "time_embed": {
            "mlp1": _lin(sd, f"{t}.time_embed.time_mlp.0"),
            "mlp2": _lin(sd, f"{t}.time_embed.time_mlp.2"),
        },
        "text_embed": {
            "embed": {"w": jnp.asarray(_np(sd[f"{t}.text_embed.text_embed.weight"]))},
        },
        "input_embed": {
            "proj": _lin(sd, f"{t}.input_embed.proj"),
            "conv_pos": {
                "conv1": _conv(sd, f"{t}.input_embed.conv_pos_embed.conv1d.0"),
                "conv2": _conv(sd, f"{t}.input_embed.conv_pos_embed.conv1d.2"),
            },
        },
        "norm_out": {"w": jnp.asarray(_np(sd[f"{t}.norm_out.weight"]))},
        "proj_out": _lin(sd, f"{t}.proj_out"),
    }
    if arch.conv_layers > 0:
        params["text_embed"]["blocks"] = [
            _convnext_v2(sd, f"{t}.text_embed.text_blocks.{i}")
            for i in range(arch.conv_layers)
        ]

    def block(i: int, later_half: bool) -> dict:
        b = f"{t}.layers.{i}"
        blk = {
            "attn_norm": {"w": jnp.asarray(_np(sd[f"{b}.1.weight"]))},
            "attn": {
                "to_q": _lin(sd, f"{b}.2.to_q"),
                "to_k": _lin(sd, f"{b}.2.to_k"),
                "to_v": _lin(sd, f"{b}.2.to_v"),
                "to_out": _lin(sd, f"{b}.2.to_out.0"),
            },
            "ff_norm": {"w": jnp.asarray(_np(sd[f"{b}.3.weight"]))},
            "ff": {
                "in": _lin(sd, f"{b}.4.ff.0.0"),
                "out": _lin(sd, f"{b}.4.ff.2"),
            },
        }
        if f"{b}.2.q_norm.weight" in sd:
            blk["attn"]["q_norm"] = {"w": jnp.asarray(_np(sd[f"{b}.2.q_norm.weight"]))}
            blk["attn"]["k_norm"] = {"w": jnp.asarray(_np(sd[f"{b}.2.k_norm.weight"]))}
        if later_half and arch.skip_connect_type == "concat":
            blk["skip_proj"] = _lin(sd, f"{b}.0", bias=False)
        return blk

    import jax

    half = arch.depth // 2
    first = [block(i, False) for i in range(half)]
    second = [block(half + i, True) for i in range(half)]
    params["first_half"] = jax.tree.map(lambda *xs: jnp.stack(xs), *first)
    params["second_half"] = jax.tree.map(lambda *xs: jnp.stack(xs), *second)
    return params


def convert_backbone_state_dict(sd: Mapping, arch: ModelArch,
                                backbone: str = "DiT") -> dict:
    """Dispatch a reference checkpoint to the right backbone converter."""
    if backbone == "DiT":
        return convert_f5tts_state_dict(sd, arch)
    if backbone == "UNetT":
        return convert_unett_state_dict(sd, arch)
    raise NotImplementedError(
        f"no torch-checkpoint converter for backbone {backbone!r} "
        "(the reference publishes DiT (F5-TTS) and UNetT (E2-TTS) checkpoints only)")


# keys a reference checkpoint carries that the converted model never uses:
# mel_spec STFT buffers, the x_transformers rotary frequency parameter (we
# precompute rope tables), EMA bookkeeping scalars
_IGNORED_CKPT_KEYS = ("mel_spec.", "rotary_embed.freqs", "freqs_cis",
                      "initted", "step")


class _TrackedStateDict(Mapping):
    """Read-through wrapper recording which checkpoint keys the converter
    consumed — the parity gate fails on unconsumed weight tensors."""

    def __init__(self, sd: Mapping):
        self._sd = sd
        self.consumed: set = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return self._sd[k]

    def __contains__(self, k):
        return k in self._sd

    def __iter__(self):
        return iter(self._sd)

    def __len__(self):
        return len(self._sd)


def convert_backbone_state_dict_audited(
    sd: Mapping, arch: ModelArch, backbone: str = "DiT",
) -> tuple[dict, list[str]]:
    """Convert + account: returns (params, unconsumed weight keys).

    Every tensor the reference checkpoint schema carries
    (utils_infer.py:190-232, convert_checkpoint.py schema) must either be
    consumed by the converter or match a known-ignorable pattern; anything
    else means the converter is silently dropping weights."""
    tracked = _TrackedStateDict(sd)
    params = convert_backbone_state_dict(tracked, arch, backbone)
    unconsumed = [
        k for k in sd
        if k not in tracked.consumed
        and not any(pat in k for pat in _IGNORED_CKPT_KEYS)
    ]
    return params, unconsumed


def convert_vocos_state_dict(sd: Mapping, num_layers: int = 8) -> dict:
    """charactr/vocos-mel-24khz state dict -> f5tts_tpu Vocos param pytree."""
    import jax

    blocks = []
    for i in range(num_layers):
        p = f"backbone.convnext.{i}"
        blocks.append({
            "dwconv": _conv(sd, f"{p}.dwconv"),
            "norm_w": jnp.asarray(_np(sd[f"{p}.norm.weight"])),
            "norm_b": jnp.asarray(_np(sd[f"{p}.norm.bias"])),
            "pw1": _lin(sd, f"{p}.pwconv1"),
            "pw2": _lin(sd, f"{p}.pwconv2"),
            "gamma": jnp.asarray(_np(sd[f"{p}.gamma"]).reshape(-1)),
        })
    return {
        "embed": _conv(sd, "backbone.embed"),
        "in_norm_w": jnp.asarray(_np(sd["backbone.norm.weight"])),
        "in_norm_b": jnp.asarray(_np(sd["backbone.norm.bias"])),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "final_norm_w": jnp.asarray(_np(sd["backbone.final_layer_norm.weight"])),
        "final_norm_b": jnp.asarray(_np(sd["backbone.final_layer_norm.bias"])),
        "head": _lin(sd, "head.out"),
    }

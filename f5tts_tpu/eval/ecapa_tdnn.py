"""ECAPA-TDNN speaker-verification model (torch) for SIM evaluation.

The reference vendors a third-party ECAPA-TDNN + WavLM-large frontend
(src/f5_tts/eval/ecapa_tdnn.py, used by utils_eval.py:380-426) driven by the
UniSpeech `wavlm_large_finetune.pth` checkpoint. This is an independent
implementation of the same published architecture (Desplanques et al. 2020,
ECAPA-TDNN; Chen et al. 2022, WavLM speaker verification recipe) whose
forward graph matches the checkpoint exactly:

- frontend: WavLM-large hidden states (25 layers incl. the embedding output),
  softmax-weighted sum, per-utterance input normalization (the fairseq
  normalize=True convention for large models)
- conv->RELU->BN ordering throughout (the UniSpeech vendored code applies
  BatchNorm AFTER the ReLU — getting this wrong silently corrupts loaded
  BN statistics)
- 1D conv k5 + 3 SE-Res2Blocks (dilations 2,3,4, scale 8, Linear-based SE)
  + MFA concat of the three block outputs
- attentive statistics pooling WITHOUT global context (tanh attention,
  no ReLU/BN in the attention branch) -> BatchNorm -> 256-dim embedding

`load_reference_checkpoint` maps the UniSpeech state dict (including the
fine-tuned fairseq-format WavLM weights under `feature_extract.model.*`)
onto this module + a transformers WavLMModel, with strict accounting: it
hard-errors unless >=99% of checkpoint tensors are consumed, so SIM can
never silently score with random weights. Because the checkpoint carries the
full fine-tuned WavLM, no network/hub access is needed.

Heavy deps (torch + transformers) are runtime requirements of the eval
harness only; scoring is cosine similarity at 16 kHz.
"""

from __future__ import annotations

import re

import torch
import torch.nn as nn
import torch.nn.functional as F


class _ConvReluBn(nn.Module):
    """conv -> ReLU -> BatchNorm (checkpoint ordering: BN normalizes the
    post-ReLU activations; its running stats are only valid in this order)."""

    def __init__(self, c_in: int, c_out: int, kernel: int = 1, padding: int = 0,
                 dilation: int = 1):
        super().__init__()
        self.conv = nn.Conv1d(c_in, c_out, kernel, padding=padding, dilation=dilation)
        self.bn = nn.BatchNorm1d(c_out)

    def forward(self, x):
        return self.bn(F.relu(self.conv(x)))


class _Res2Dilated(nn.Module):
    """Res2Net-style dilated conv over `scale` channel chunks.

    Chunk 0 feeds branch 0; each later branch consumes its chunk PLUS the
    previous branch's post-BN output; the last chunk passes through unconvolved.
    Branch order is conv -> ReLU -> BN."""

    def __init__(self, channels: int, kernel: int, dilation: int, scale: int = 8):
        super().__init__()
        assert channels % scale == 0
        self.scale = scale
        width = channels // scale
        pad = dilation * (kernel - 1) // 2
        self.convs = nn.ModuleList([
            nn.Conv1d(width, width, kernel, padding=pad, dilation=dilation)
            for _ in range(scale - 1)
        ])
        self.bns = nn.ModuleList([nn.BatchNorm1d(width) for _ in range(scale - 1)])

    def forward(self, x):
        chunks = torch.chunk(x, self.scale, dim=1)
        outs = []
        sp = None
        for i, (conv, bn) in enumerate(zip(self.convs, self.bns)):
            sp = chunks[i] if sp is None else sp + chunks[i]
            sp = bn(F.relu(conv(sp)))
            outs.append(sp)
        outs.append(chunks[-1])
        return torch.cat(outs, dim=1)


class _SEScale(nn.Module):
    """Squeeze-excitation with Linear layers over the time-mean (the
    checkpoint's SE_Connect uses nn.Linear, not 1x1 convs)."""

    def __init__(self, channels: int, bottleneck: int = 128):
        super().__init__()
        self.fc1 = nn.Linear(channels, bottleneck)
        self.fc2 = nn.Linear(bottleneck, channels)

    def forward(self, x):
        s = torch.sigmoid(self.fc2(F.relu(self.fc1(x.mean(dim=2)))))
        return x * s.unsqueeze(2)


class SERes2Block(nn.Module):
    def __init__(self, channels: int, kernel: int, dilation: int, scale: int = 8,
                 se_bottleneck: int = 128):
        super().__init__()
        self.pre = _ConvReluBn(channels, channels, 1)
        self.res2 = _Res2Dilated(channels, kernel, dilation, scale)
        self.post = _ConvReluBn(channels, channels, 1)
        self.se = _SEScale(channels, se_bottleneck)

    def forward(self, x):
        return x + self.se(self.post(self.res2(self.pre(x))))


class AttentiveStatsPooling(nn.Module):
    """Attentive weighted mean/std pooling, no global context, no ReLU/BN in
    the attention branch (matches AttentiveStatsPool(global_context_att=False))."""

    def __init__(self, channels: int, att_dim: int = 128):
        super().__init__()
        self.att_in = nn.Conv1d(channels, att_dim, 1)
        self.att_out = nn.Conv1d(att_dim, channels, 1)

    def forward(self, x):
        alpha = torch.softmax(self.att_out(torch.tanh(self.att_in(x))), dim=2)
        mean = (alpha * x).sum(dim=2)
        var = (alpha * x * x).sum(dim=2) - mean * mean
        std = torch.sqrt(var.clamp(min=1e-9))
        return torch.cat([mean, std], dim=1)


class ECAPA_TDNN(nn.Module):
    def __init__(self, feat_dim: int = 1024, channels: int = 512,
                 emb_dim: int = 256, feat_type: str = "wavlm_large",
                 num_feature_layers: int = 25):
        super().__init__()
        self.feat_type = feat_type
        self.feature_weight = nn.Parameter(torch.zeros(num_feature_layers))
        self.instance_norm = nn.InstanceNorm1d(feat_dim)
        self._wavlm = None

        cat = channels * 3
        self.layer1 = _ConvReluBn(feat_dim, channels, 5, padding=2)
        self.layer2 = SERes2Block(channels, 3, dilation=2)
        self.layer3 = SERes2Block(channels, 3, dilation=3)
        self.layer4 = SERes2Block(channels, 3, dilation=4)
        self.mfa = nn.Conv1d(cat, cat, 1)
        self.pool = AttentiveStatsPooling(cat)
        self.pool_bn = nn.BatchNorm1d(cat * 2)
        self.fc = nn.Linear(cat * 2, emb_dim)

    def ensure_frontend(self, from_pretrained: bool = True):
        """Materialize the WavLM frontend. With from_pretrained=False, builds
        a randomly-initialized wavlm-large skeleton (the reference checkpoint
        then supplies ALL weights — no hub access needed)."""
        if self._wavlm is not None:
            return self._wavlm
        from transformers import WavLMConfig, WavLMModel

        if from_pretrained:
            try:
                self._wavlm = WavLMModel.from_pretrained("microsoft/wavlm-large")
            except Exception:
                from_pretrained = False
        if not from_pretrained:
            cfg = WavLMConfig(
                hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
                intermediate_size=4096, feat_extract_norm="layer",
                do_stable_layer_norm=True, output_hidden_states=True,
            )
            self._wavlm = WavLMModel(cfg)
        self._wavlm.eval()
        return self._wavlm

    def _features(self, wav: torch.Tensor) -> torch.Tensor:
        """wav [b, n] @16 kHz -> [b, feat_dim, t] via WavLM weighted layers."""
        self.ensure_frontend()
        # fairseq normalize=True for large models: per-utterance zero-mean
        # unit-variance (the HF processor's do_normalize equivalent)
        wav = (wav - wav.mean(dim=-1, keepdim=True)) / torch.sqrt(
            wav.var(dim=-1, keepdim=True, unbiased=False) + 1e-7)
        with torch.no_grad():
            out = self._wavlm(wav, output_hidden_states=True)
        states = torch.stack(out.hidden_states, dim=0)  # [L, b, t, d]
        w = torch.softmax(self.feature_weight, dim=0)[:, None, None, None]
        feat = (states * w).sum(dim=0)
        return feat.transpose(1, 2) + 1e-6

    def forward(self, wav: torch.Tensor) -> torch.Tensor:
        x = self._features(wav)
        x = self.instance_norm(x)
        x1 = self.layer1(x)
        x2 = self.layer2(x1)
        x3 = self.layer3(x2)
        x4 = self.layer4(x3)
        x = torch.cat([x2, x3, x4], dim=1)
        x = F.relu(self.mfa(x))
        x = self.pool_bn(self.pool(x))
        return self.fc(x)


def ECAPA_TDNN_SMALL(feat_dim: int = 1024, feat_type: str = "wavlm_large") -> ECAPA_TDNN:
    """Constructor-name parity with the reference harness."""
    return ECAPA_TDNN(feat_dim=feat_dim, channels=512, emb_dim=256, feat_type=feat_type)


# ---------------------------------------------------------------------------
# Checkpoint key mapping (UniSpeech wavlm_large_finetune.pth -> this module)
# ---------------------------------------------------------------------------

# ECAPA head: reference module path -> this module's path. layerN blocks and
# their submodules are handled by _HEAD_RULES regex rewrites.
_HEAD_RULES = [
    (r"^feature_weight$", "feature_weight"),
    (r"^layer1\.conv\.(.*)$", r"layer1.conv.\1"),
    (r"^layer1\.bn\.(.*)$", r"layer1.bn.\1"),
    (r"^layer([234])\.Conv1dReluBn1\.(conv|bn)\.(.*)$", r"layer\1.pre.\2.\3"),
    (r"^layer([234])\.Res2Conv1dReluBn\.(convs|bns)\.(\d+)\.(.*)$", r"layer\1.res2.\2.\3.\4"),
    (r"^layer([234])\.Conv1dReluBn2\.(conv|bn)\.(.*)$", r"layer\1.post.\2.\3"),
    (r"^layer([234])\.SE_Connect\.linear1\.(.*)$", r"layer\1.se.fc1.\2"),
    (r"^layer([234])\.SE_Connect\.linear2\.(.*)$", r"layer\1.se.fc2.\2"),
    (r"^conv\.(.*)$", r"mfa.\1"),
    (r"^pooling\.linear1\.(.*)$", r"pool.att_in.\1"),
    (r"^pooling\.linear2\.(.*)$", r"pool.att_out.\1"),
    (r"^bn\.(.*)$", r"pool_bn.\1"),
    (r"^linear\.(.*)$", r"fc.\1"),
]

# WavLM frontend: fairseq (s3prl `feature_extract.model.*`) -> transformers
# WavLMModel. Mirrors the official fairseq->HF conversion mapping.
_WAVLM_RULES = [
    (r"^post_extract_proj\.(.*)$", r"feature_projection.projection.\1"),
    (r"^layer_norm\.(.*)$", r"feature_projection.layer_norm.\1"),
    (r"^feature_extractor\.conv_layers\.(\d+)\.0\.(.*)$",
     r"feature_extractor.conv_layers.\1.conv.\2"),
    (r"^feature_extractor\.conv_layers\.(\d+)\.2\.1\.(.*)$",
     r"feature_extractor.conv_layers.\1.layer_norm.\2"),
    (r"^feature_extractor\.conv_layers\.(\d+)\.2\.(.*)$",
     r"feature_extractor.conv_layers.\1.layer_norm.\2"),
    (r"^encoder\.pos_conv\.0\.(.*)$", r"encoder.pos_conv_embed.conv.\1"),
    (r"^encoder\.layer_norm\.(.*)$", r"encoder.layer_norm.\1"),
    (r"^encoder\.layers\.(\d+)\.self_attn\.relative_attention_bias\.(.*)$",
     r"encoder.layers.\1.attention.rel_attn_embed.\2"),
    (r"^encoder\.layers\.(\d+)\.self_attn\.grep_linear\.(.*)$",
     r"encoder.layers.\1.attention.gru_rel_pos_linear.\2"),
    (r"^encoder\.layers\.(\d+)\.self_attn\.grep_a$",
     r"encoder.layers.\1.attention.gru_rel_pos_const"),
    (r"^encoder\.layers\.(\d+)\.self_attn\.([kqv]_proj|out_proj)\.(.*)$",
     r"encoder.layers.\1.attention.\2.\3"),
    (r"^encoder\.layers\.(\d+)\.self_attn_layer_norm\.(.*)$",
     r"encoder.layers.\1.layer_norm.\2"),
    (r"^encoder\.layers\.(\d+)\.fc1\.(.*)$",
     r"encoder.layers.\1.feed_forward.intermediate_dense.\2"),
    (r"^encoder\.layers\.(\d+)\.fc2\.(.*)$",
     r"encoder.layers.\1.feed_forward.output_dense.\2"),
    (r"^encoder\.layers\.(\d+)\.final_layer_norm\.(.*)$",
     r"encoder.layers.\1.final_layer_norm.\2"),
    (r"^mask_emb$", "masked_spec_embed"),
]

# pretraining-only tensors the speaker model never uses — intentionally dropped
_WAVLM_DROP = re.compile(
    r"^(label_embs_concat|final_proj\.|project_q\.|quantizer\.|target_glu\.)")


def _apply_rules(key: str, rules) -> str | None:
    for pat, repl in rules:
        if re.match(pat, key):
            return re.sub(pat, repl, key)
    return None


def convert_reference_state_dict(state: dict) -> tuple[dict, dict, list, list]:
    """Split + rename the UniSpeech checkpoint into (head_sd, wavlm_sd,
    dropped_keys, unmapped_keys)."""
    head, wavlm, dropped, unmapped = {}, {}, [], []
    for key, tensor in state.items():
        if key.startswith("feature_extract."):
            sub = key[len("feature_extract."):]
            if sub.startswith("model."):
                sub = sub[len("model."):]
            if _WAVLM_DROP.match(sub):
                dropped.append(key)
                continue
            new = _apply_rules(sub, _WAVLM_RULES)
            if new is None:
                unmapped.append(key)
            else:
                wavlm[new] = tensor
        else:
            new = _apply_rules(key, _HEAD_RULES)
            if new is None:
                unmapped.append(key)
            else:
                head[new] = tensor
    return head, wavlm, dropped, unmapped


def _adapt_weight_norm_keys(sd: dict, target_keys: set) -> dict:
    """pos_conv weight_g/weight_v vs torch>=2.1 parametrizations naming."""
    out = dict(sd)
    for old, new_suffix in (("weight_g", "parametrizations.weight.original0"),
                            ("weight_v", "parametrizations.weight.original1")):
        key = f"encoder.pos_conv_embed.conv.{old}"
        alt = f"encoder.pos_conv_embed.conv.{new_suffix}"
        if key in out and key not in target_keys and alt in target_keys:
            out[alt] = out.pop(key)
    return out


def load_reference_checkpoint(model: ECAPA_TDNN, ckpt_path: str,
                              min_mapped_frac: float = 0.99) -> dict:
    """Load `wavlm_large_finetune.pth` with strict accounting.

    Hard-errors unless >= min_mapped_frac of the checkpoint's (non-dropped)
    tensors land in a module parameter/buffer — SIM must never silently run
    on random weights (the reference's own strict=False load only works
    because its vendored module names match; ours are mapped explicitly)."""
    state = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    state = state.get("model", state)
    head, wavlm, dropped, unmapped = convert_reference_state_dict(state)

    wavlm_model = model.ensure_frontend(from_pretrained=False)
    wavlm = _adapt_weight_norm_keys(wavlm, set(wavlm_model.state_dict().keys()))

    missing_h, unexpected_h = model.load_state_dict(head, strict=False)
    missing_w, unexpected_w = wavlm_model.load_state_dict(wavlm, strict=False)

    total = len(state) - len(dropped)
    consumed = (len(head) - len([k for k in unexpected_h])
                + len(wavlm) - len([k for k in unexpected_w]))
    frac = consumed / max(total, 1)
    stats = {
        "total": total, "consumed": consumed, "frac": frac,
        "dropped": dropped, "unmapped": unmapped,
        "unexpected": list(unexpected_h) + list(unexpected_w),
        "missing": [k for k in missing_h if not k.startswith("_wavlm.")]
                   + list(missing_w),
    }
    if frac < min_mapped_frac:
        raise RuntimeError(
            f"SIM checkpoint mapping consumed only {consumed}/{total} tensors "
            f"({frac:.1%}); refusing to score with unmapped weights. "
            f"unmapped={unmapped[:8]} unexpected={stats['unexpected'][:8]}")
    return stats

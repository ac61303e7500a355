"""ECAPA-TDNN speaker-verification model (torch) for SIM evaluation.

The reference vendors a third-party ECAPA-TDNN + WavLM-large frontend
(src/f5_tts/eval/ecapa_tdnn.py, used by utils_eval.py:380-426) driven by the
UniSpeech `wavlm_large_finetune.pth` checkpoint. This is an independent
implementation of the same published architecture (Desplanques et al. 2020,
ECAPA-TDNN; Chen et al. 2022, WavLM speaker verification recipe):

- frontend: WavLM-large hidden states (via transformers) combined with
  learned layer weights
- 1D conv + 3 SE-Res2Blocks (dilations 2,3,4, scale 8) + MFA concat
- attentive statistics pooling (context-aware) -> 256-dim embedding

Heavy deps (torch + transformers WavLM weights) are runtime requirements of
the eval harness only; scoring is cosine similarity at 16 kHz.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class SERes2Block(nn.Module):
    def __init__(self, channels: int, kernel_size: int, dilation: int, scale: int = 8):
        super().__init__()
        self.scale = scale
        width = channels // scale
        self.conv1 = nn.Conv1d(channels, channels, 1)
        self.bn1 = nn.BatchNorm1d(channels)
        pad = dilation * (kernel_size - 1) // 2
        self.convs = nn.ModuleList([
            nn.Conv1d(width, width, kernel_size, padding=pad, dilation=dilation)
            for _ in range(scale - 1)
        ])
        self.bns = nn.ModuleList([nn.BatchNorm1d(width) for _ in range(scale - 1)])
        self.conv3 = nn.Conv1d(channels, channels, 1)
        self.bn3 = nn.BatchNorm1d(channels)
        # squeeze-excitation
        self.se_fc1 = nn.Conv1d(channels, channels // 8, 1)
        self.se_fc2 = nn.Conv1d(channels // 8, channels, 1)

    def forward(self, x):
        residual = x
        out = F.relu(self.bn1(self.conv1(x)))
        chunks = torch.chunk(out, self.scale, dim=1)
        outs = [chunks[0]]
        prev = None
        for i, (conv, bn) in enumerate(zip(self.convs, self.bns)):
            inp = chunks[i + 1] if prev is None else chunks[i + 1] + prev
            prev = F.relu(bn(conv(inp)))
            outs.append(prev)
        out = torch.cat(outs, dim=1)
        out = F.relu(self.bn3(self.conv3(out)))
        s = out.mean(dim=2, keepdim=True)
        s = torch.sigmoid(self.se_fc2(F.relu(self.se_fc1(s))))
        return residual + out * s


class AttentiveStatsPooling(nn.Module):
    def __init__(self, channels: int, att_dim: int = 128):
        super().__init__()
        self.att = nn.Sequential(
            nn.Conv1d(channels * 3, att_dim, 1), nn.ReLU(),
            nn.BatchNorm1d(att_dim), nn.Tanh(),
            nn.Conv1d(att_dim, channels, 1),
        )

    def forward(self, x):
        t = x.shape[2]
        mean = x.mean(dim=2, keepdim=True).expand(-1, -1, t)
        std = x.std(dim=2, keepdim=True).expand(-1, -1, t)
        ctx = torch.cat([x, mean, std], dim=1)
        w = torch.softmax(self.att(ctx), dim=2)
        mu = (x * w).sum(dim=2)
        sg = torch.sqrt(torch.clamp((x * x * w).sum(dim=2) - mu * mu, min=1e-4))
        return torch.cat([mu, sg], dim=1)


class ECAPA_TDNN(nn.Module):
    def __init__(self, feat_dim: int = 1024, channels: int = 512,
                 emb_dim: int = 256, feat_type: str = "wavlm_large",
                 num_feature_layers: int = 25):
        super().__init__()
        self.feat_type = feat_type
        self.feature_weight = nn.Parameter(torch.zeros(num_feature_layers))
        self.instance_norm = nn.InstanceNorm1d(feat_dim)
        self._wavlm = None

        self.conv1 = nn.Conv1d(feat_dim, channels, 5, padding=2)
        self.bn1 = nn.BatchNorm1d(channels)
        self.layer1 = SERes2Block(channels, 3, dilation=2)
        self.layer2 = SERes2Block(channels, 3, dilation=3)
        self.layer3 = SERes2Block(channels, 3, dilation=4)
        self.mfa = nn.Conv1d(channels * 3, channels * 3, 1)
        self.pool = AttentiveStatsPooling(channels * 3)
        self.pool_bn = nn.BatchNorm1d(channels * 6)
        self.fc = nn.Linear(channels * 6, emb_dim)

    def _features(self, wav: torch.Tensor) -> torch.Tensor:
        """wav [b, n] @16 kHz -> [b, feat_dim, t] via WavLM weighted layers."""
        if self._wavlm is None:
            from transformers import WavLMModel

            self._wavlm = WavLMModel.from_pretrained("microsoft/wavlm-large")
            self._wavlm.eval()
        with torch.no_grad():
            out = self._wavlm(wav, output_hidden_states=True)
        states = torch.stack(out.hidden_states, dim=0)  # [L, b, t, d]
        w = torch.softmax(self.feature_weight, dim=0)[:, None, None, None]
        feat = (states * w).sum(dim=0)
        return feat.transpose(1, 2)

    def forward(self, wav: torch.Tensor) -> torch.Tensor:
        x = self._features(wav)
        x = self.instance_norm(x)
        x = F.relu(self.bn1(self.conv1(x)))
        x1 = self.layer1(x)
        x2 = self.layer2(x1)
        x3 = self.layer3(x2)
        x = torch.cat([x1, x2, x3], dim=1)
        x = F.relu(self.mfa(x))
        x = self.pool_bn(self.pool(x))
        return self.fc(x)


def ECAPA_TDNN_SMALL(feat_dim: int = 1024, feat_type: str = "wavlm_large") -> ECAPA_TDNN:
    """Constructor-name parity with the reference harness."""
    return ECAPA_TDNN(feat_dim=feat_dim, channels=512, emb_dim=256, feat_type=feat_type)

"""Config schema for f5tts_tpu.

Dataclass equivalents of the reference Hydra YAML schema
(reference: src/f5_tts/configs/*.yaml — model/arch/mel_spec/datasets/optim/ckpts
blocks), plus TPU-specific knobs (compute dtype, mesh shape, compile buckets).

YAML files with the reference layout load directly via `load_model_config`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional

import yaml


@dataclass(frozen=True)
class MelConfig:
    """Mel front-end parameters (reference: configs/F5TTS_v1_Base.yaml mel_spec block).

    The invariant across the whole system: 100-channel mel at 24 kHz,
    hop 256 / win 1024 / n_fft 1024 → 1 frame = 256 samples ≈ 10.67 ms.
    """

    target_sample_rate: int = 24_000
    n_mel_channels: int = 100
    hop_length: int = 256
    win_length: int = 1024
    n_fft: int = 1024
    mel_spec_type: str = "vocos"  # "vocos" | "bigvgan"

    def frames_for_samples(self, num_samples: int) -> int:
        # vocos variant uses center=True STFT: n_frames = 1 + num_samples // hop
        if self.mel_spec_type == "vocos":
            return num_samples // self.hop_length + 1
        return num_samples // self.hop_length


@dataclass(frozen=True)
class ModelArch:
    """Backbone architecture (reference: configs/*.yaml model.arch)."""

    dim: int = 1024
    depth: int = 22
    heads: int = 16
    dim_head: int = 64
    ff_mult: int = 2
    mel_dim: int = 100
    text_num_embeds: int = 256  # vocab size (without the +1 filler)
    text_dim: Optional[int] = 512
    text_mask_padding: bool = True
    text_embedding_average_upsampling: bool = False
    qk_norm: Optional[str] = None  # None | "rms_norm"
    conv_layers: int = 4
    conv_mult: int = 2
    pe_attn_head: Optional[int] = None  # partial RoPE: apply to first N heads only
    attn_backend: str = "pallas"  # "pallas" | "xla" (reference: torch | flash_attn)
    attn_mask_enabled: bool = False
    long_skip_connection: bool = False
    checkpoint_activations: bool = False
    # remat policy when checkpoint_activations is on: "nothing" rematerializes
    # everything (min memory); "attn_out" saves ONLY the attention outputs —
    # the flat Pallas backward recomputes its own softmax, so skipping the
    # fwd-megakernel replay is free memory-wise and the fastest measured
    # v5e config at per-chip batch <=28 (BENCH_HISTORY r4: 285 vs 302
    # ms/step at b=16); "dots" saves matmul outputs; "attn" saves
    # qkv+attn_out (measured slower — 2.1 GB extra pressure)
    remat_policy: str = "nothing"  # "nothing" | "attn_out" | "dots" | "attn"
    # UNetT only:
    skip_connect_type: str = "concat"  # "add" | "concat" | "none"
    # MMDiT only:
    context_dim: Optional[int] = None

    @property
    def inner_dim(self) -> int:
        return self.heads * self.dim_head


@dataclass(frozen=True)
class CFMConfig:
    """CFM wrapper hyperparameters (reference: model/cfm.py:34-77)."""

    audio_drop_prob: float = 0.3
    cond_drop_prob: float = 0.2
    frac_lengths_mask: tuple = (0.7, 1.0)
    sigma: float = 0.0
    ode_method: str = "euler"  # "euler" | "midpoint"


@dataclass(frozen=True)
class SamplingConfig:
    """Defaults for CFM.sample (reference: infer/utils_infer.py:52-65)."""

    nfe_steps: int = 32
    cfg_strength: float = 2.0
    sway_sampling_coef: Optional[float] = -1.0
    use_epss: bool = True
    max_duration: int = 4096  # frames; compile-time cap (reference clamps at 65536)
    target_rms: float = 0.1
    cross_fade_duration: float = 0.15
    speed: float = 1.0


@dataclass(frozen=True)
class MeshConfig:
    """TPU mesh layout. data axis: DP/CFG-pair sharding; model axis: TP."""

    data: int = 1
    model: int = 1


@dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference: configs/*.yaml optim + datasets + ckpts)."""

    dataset_name: str = "Emilia_ZH_EN"
    dataset_type: str = "CustomDataset"  # | "CustomDatasetPath" | "HFDataset"
    audio_type: str = "raw"  # "raw" (wav->mel on the fly) | "mel" (mel.arrow)
    batch_size_per_device: int = 38_400  # frames per device per update
    batch_size_type: str = "frame"  # "frame" | "sample"
    max_samples: int = 64
    num_workers: int = 4

    epochs: int = 11
    learning_rate: float = 7.5e-5
    num_warmup_updates: int = 20_000
    grad_accumulation_steps: int = 1
    max_grad_norm: float = 1.0

    ema_decay: float = 0.999
    ema_update_after_step: int = 100
    ema_update_every: int = 10

    save_per_updates: int = 50_000
    keep_last_n_checkpoints: int = -1
    last_per_updates: int = 5_000
    save_dir: str = "ckpts"
    logger: Optional[str] = "tensorboard"  # "wandb" | "tensorboard" | None
    log_samples: bool = False


@dataclass(frozen=True)
class ModelConfig:
    name: str = "F5TTS_v1_Base"
    backbone: str = "DiT"  # "DiT" | "UNetT" | "MMDiT"
    tokenizer: str = "pinyin"  # "pinyin" | "char" | "byte" | "custom"
    tokenizer_path: Optional[str] = None
    arch: ModelArch = field(default_factory=ModelArch)
    mel_spec: MelConfig = field(default_factory=MelConfig)
    cfm: CFMConfig = field(default_factory=CFMConfig)
    sampling: SamplingConfig = field(default_factory=SamplingConfig)
    compute_dtype: str = "bfloat16"  # dtype for matmul-heavy compute; params stay f32


def _filter_kwargs(cls, d: dict) -> dict:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in d.items() if k in names}


def model_config_from_dict(cfg: dict) -> ModelConfig:
    """Build a ModelConfig from a dict with the reference YAML layout."""
    model = cfg.get("model", cfg)
    arch_d = dict(model.get("arch", {}))
    mel_d = dict(model.get("mel_spec", {}))
    arch = ModelArch(**_filter_kwargs(ModelArch, arch_d))
    mel = MelConfig(**_filter_kwargs(MelConfig, mel_d))
    return ModelConfig(
        name=model.get("name", "custom"),
        backbone=model.get("backbone", "DiT"),
        tokenizer=model.get("tokenizer", "pinyin"),
        tokenizer_path=model.get("tokenizer_path"),
        arch=arch,
        mel_spec=mel,
    )


def load_model_config(path: str) -> ModelConfig:
    with open(path, "r", encoding="utf-8") as f:
        cfg = yaml.safe_load(f)
    return model_config_from_dict(cfg)


def train_config_from_dict(cfg: dict) -> TrainConfig:
    datasets = cfg.get("datasets", {})
    optim = cfg.get("optim", {})
    ckpts = cfg.get("ckpts", {})
    return TrainConfig(
        dataset_name=datasets.get("name", "Emilia_ZH_EN"),
        dataset_type=datasets.get("dataset_type", "CustomDataset"),
        audio_type=datasets.get("audio_type", "raw"),
        batch_size_per_device=datasets.get("batch_size_per_gpu", 38_400),
        batch_size_type=datasets.get("batch_size_type", "frame"),
        max_samples=datasets.get("max_samples", 64),
        num_workers=datasets.get("num_workers", 4),
        epochs=optim.get("epochs", 11),
        learning_rate=optim.get("learning_rate", 7.5e-5),
        num_warmup_updates=optim.get("num_warmup_updates", 20_000),
        grad_accumulation_steps=optim.get("grad_accumulation_steps", 1),
        max_grad_norm=optim.get("max_grad_norm", 1.0),
        save_per_updates=ckpts.get("save_per_updates", 50_000),
        keep_last_n_checkpoints=ckpts.get("keep_last_n_checkpoints", -1),
        last_per_updates=ckpts.get("last_per_updates", 5_000),
        save_dir=ckpts.get("save_dir", "ckpts"),
        logger=ckpts.get("logger", "tensorboard"),
        log_samples=ckpts.get("log_samples", False),
    )


# ---------------------------------------------------------------------------
# Built-in model presets (values from reference configs/*.yaml)
# ---------------------------------------------------------------------------

def _preset(name: str, backbone: str, **arch_kw: Any) -> ModelConfig:
    return ModelConfig(name=name, backbone=backbone, arch=ModelArch(**arch_kw))


PRESETS: dict[str, ModelConfig] = {
    # F5TTS_v1_Base.yaml: dim 1024, depth 22, heads 16, ff_mult 2, text_dim 512,
    # conv_layers 4, text_mask_padding True, pe_attn_head None
    "F5TTS_v1_Base": _preset(
        "F5TTS_v1_Base", "DiT",
        dim=1024, depth=22, heads=16, ff_mult=2, text_dim=512,
        text_mask_padding=True, conv_layers=4, pe_attn_head=None,
    ),
    # F5TTS_Base.yaml: same dims but mask_padding False, pe_attn_head 1
    "F5TTS_Base": _preset(
        "F5TTS_Base", "DiT",
        dim=1024, depth=22, heads=16, ff_mult=2, text_dim=512,
        text_mask_padding=False, conv_layers=4, pe_attn_head=1,
    ),
    "F5TTS_v1_Small": _preset(
        "F5TTS_v1_Small", "DiT",
        dim=768, depth=18, heads=12, ff_mult=2, text_dim=512,
        text_mask_padding=True, conv_layers=4, pe_attn_head=None,
    ),
    "F5TTS_Small": _preset(
        "F5TTS_Small", "DiT",
        dim=768, depth=18, heads=12, ff_mult=2, text_dim=512,
        text_mask_padding=False, conv_layers=4, pe_attn_head=1,
    ),
    # E2TTS_Base.yaml: UNetT dim 1024, depth 24, heads 16, ff_mult 4
    "E2TTS_Base": _preset(
        "E2TTS_Base", "UNetT",
        dim=1024, depth=24, heads=16, ff_mult=4, text_dim=None,
        text_mask_padding=False, conv_layers=0,
    ),
    "E2TTS_Small": _preset(
        "E2TTS_Small", "UNetT",
        dim=768, depth=20, heads=12, ff_mult=4, text_dim=None,
        text_mask_padding=False, conv_layers=0,
    ),
    # Experimental SD3-style backbone: no published checkpoint or YAML in the
    # reference; dims follow its class defaults (src/f5_tts/model/backbones/
    # mmdit.py MMDiT.__init__ defaults + the DiT-Base sizing convention).
    # Used by benchmarks and the train/infer plumbing for backbone parity.
    "MMDiT_Base": _preset(
        "MMDiT_Base", "MMDiT",
        dim=1024, depth=22, heads=16, ff_mult=2, text_dim=None,
        text_mask_padding=True, conv_layers=0,
    ),
}


def get_preset(name: str, **overrides: Any) -> ModelConfig:
    cfg = PRESETS[name]
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    return cfg

"""High-level Python API, mirroring the reference `F5TTS` class
(src/f5_tts/api.py:23-164).

Usage:
    from f5tts_tpu.infer.api import F5TTS
    tts = F5TTS(model="F5TTS_v1_Base", ckpt_file=..., vocab_file=...)
    wav, sr, mel = tts.infer(ref_file="ref.wav", ref_text="...", gen_text="...")
    tts.export_wav(wav, "out.wav")

Checkpoints: reference .pt/.safetensors via f5tts_tpu.compat, or native orbax
checkpoints saved by the trainer. With no ckpt_file, the model name resolves
through the auto-download table (infer/download.py: $F5TTS_CKPT_DIR ->
HF cache -> hub) or raises with instructions — pass ckpt_file="random" for an
explicitly-uninitialized smoke-test model.
"""

from __future__ import annotations

import dataclasses
from importlib.resources import files
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from f5tts_tpu.config import PRESETS, ModelConfig, load_model_config
from f5tts_tpu.infer import audio_io
from f5tts_tpu.infer.pipeline import InferencePipeline
from f5tts_tpu.models import dit
from f5tts_tpu.text.vocab import load_vocab
from f5tts_tpu.utils import make_time_grid  # noqa: F401  (re-export convenience)
from f5tts_tpu.vocoder.vocos import Vocos, VocosConfig, init_vocos


class F5TTS:
    def __init__(
        self,
        model: str = "F5TTS_v1_Base",
        ckpt_file: str = "",
        vocab_file: str = "",
        vocoder_ckpt: str = "",
        ode_method: str = "euler",
        use_ema: bool = True,
        dtype=None,
        backend: Optional[str] = None,
        seed: Optional[int] = None,
    ):
        self.seed = seed
        on_tpu = jax.default_backend() == "tpu"
        dtype = dtype or (jnp.bfloat16 if on_tpu else jnp.float32)
        backend = backend or ("pallas" if on_tpu else "xla")

        if model in PRESETS:
            cfg: ModelConfig = PRESETS[model]
        else:
            cfg = load_model_config(model)  # path to a reference-layout YAML

        # vocab
        if vocab_file:
            vocab = load_vocab(vocab_file)
        else:
            bundled = files("f5tts_tpu").joinpath("data/vocab_emilia_pinyin.txt")
            vocab = load_vocab(str(bundled))
        arch = dataclasses.replace(cfg.arch, text_num_embeds=len(vocab))

        # model params — dispatch on the preset's backbone (DiT for F5-TTS,
        # UNetT for E2-TTS, MMDiT) instead of assuming DiT
        from f5tts_tpu.models.cfm import BACKBONES

        bd = BACKBONES[cfg.backbone]
        statics = bd.statics_cls(arch)
        if not ckpt_file:
            # resolve-or-explain (reference api.py:65-81): named models map to
            # their published SWivid checkpoints; never silently random-init
            from f5tts_tpu.infer.download import resolve_checkpoint

            ckpt_file = resolve_checkpoint(model, cfg.mel_spec.mel_spec_type)
        if ckpt_file == "random":  # explicit smoke-test opt-in
            params = bd.init(jax.random.PRNGKey(0), arch)
        else:
            params = self._load_ckpt(ckpt_file, arch, use_ema, cfg.backbone)

        # vocoder
        voc_cfg = VocosConfig()
        if vocoder_ckpt:
            from f5tts_tpu.compat import convert_vocos_state_dict, load_torch_checkpoint

            voc_params = convert_vocos_state_dict(load_torch_checkpoint(vocoder_ckpt))
        else:
            voc_params = init_vocos(jax.random.PRNGKey(1), voc_cfg)
        vocoder = Vocos(voc_params, voc_cfg)

        sampling = dataclasses.replace(cfg.sampling)
        self.config = dataclasses.replace(cfg, arch=arch)
        self.mel_cfg = cfg.mel_spec
        self.ode_method = ode_method
        self.pipeline = InferencePipeline(
            params=params, statics=statics, vocoder=vocoder.decode,
            vocab_char_map=vocab, mel_cfg=cfg.mel_spec, sampling=sampling,
            tokenizer=cfg.tokenizer, dtype=dtype, backend=backend,
            backbone=bd,
        )

    @staticmethod
    def _load_ckpt(path: str, arch, use_ema: bool, backbone: str = "DiT"):
        if path.endswith((".pt", ".pth", ".bin", ".safetensors")):
            from f5tts_tpu.compat import convert_backbone_state_dict, load_torch_checkpoint

            sd = load_torch_checkpoint(path)
            return convert_backbone_state_dict(sd, arch, backbone)
        from f5tts_tpu.train.checkpoint import load_params

        return load_params(path, use_ema=use_ema)

    def infer(
        self,
        ref_file: str,
        ref_text: str,
        gen_text: str,
        show_info=print,
        file_wave: Optional[str] = None,
        file_spec: Optional[str] = None,
        seed: Optional[int] = None,
        **kw,
    ):
        seed = seed if seed is not None else (self.seed if self.seed is not None else 0)
        wav, sr = audio_io.read_wav(ref_file)
        wave, out_sr, mel = self.pipeline.infer(wav, sr, ref_text, gen_text, seed=seed, **kw)
        if file_wave:
            self.export_wav(wave, file_wave)
        if file_spec:
            self.export_spectrogram(mel, file_spec)
        return wave, out_sr, mel

    def export_wav(self, wav: np.ndarray, file_wave: str) -> None:
        audio_io.write_wav(file_wave, wav, self.mel_cfg.target_sample_rate)

    def export_spectrogram(self, mel: np.ndarray, file_spec: str) -> None:
        from f5tts_tpu.infer.viz import save_spectrogram

        save_spectrogram(mel, file_spec)

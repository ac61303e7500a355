"""Reference-shaped one-call inference API.

Mirrors the function surface of the reference's `f5_tts/infer/utils_infer.py`
(chunk_text:73, load_vocoder:106, initialize_asr_pipeline:153, transcribe:174,
load_checkpoint:190, load_model:238, remove_silence_edges:279,
preprocess_ref_audio_text:298, infer_process:384, infer_batch_process:440,
remove_silence_for_generated_wav:599, save_spectrogram:614) so a reference
user can switch imports and keep their calling code. Everything here is a
thin adapter over the TPU-native pieces (`InferencePipeline`, `Vocos`,
`compat.torch_import`); the compute path is unchanged.

Audio rides as (np.ndarray float32, sample_rate) instead of torch tensors.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from importlib.resources import files
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from f5tts_tpu.config import PRESETS, ModelConfig, load_model_config
from f5tts_tpu.infer import audio_io
from f5tts_tpu.infer.asr import initialize_asr_pipeline, preprocess_ref_audio_text, transcribe  # noqa: F401
from f5tts_tpu.infer.pipeline import InferencePipeline, chunk_text, max_chars_for_ref  # noqa: F401
from f5tts_tpu.infer.viz import save_spectrogram  # noqa: F401
from f5tts_tpu.models import dit
from f5tts_tpu.text.vocab import load_vocab
from f5tts_tpu.vocoder.vocos import Vocos, VocosConfig, init_vocos

# reference defaults (utils_infer.py:40-57)
target_sample_rate = 24000
hop_length = 256
target_rms = 0.1
cross_fade_duration = 0.15
ode_method = "euler"
nfe_step = 32
cfg_strength = 2.0
sway_sampling_coef = -1.0
speed = 1.0
fix_duration = None

remove_silence_edges = audio_io.remove_silence_edges


def load_vocoder(vocoder_name: str = "vocos", is_local: bool = False,
                 local_path: str = "", device=None, hf_cache_dir=None) -> Callable:
    """Returns a mel [b, d, t] -> wave [b, n] decode callable (reference :106).

    Without a local checkpoint the vocoder is randomly initialized (no public
    weights ship in this image); pass `local_path` to a torch Vocos/BigVGAN
    checkpoint to load real weights through the compat converter.
    """
    if vocoder_name == "vocos":
        cfg = VocosConfig()
        if is_local and local_path:
            from f5tts_tpu.compat import convert_vocos_state_dict, load_torch_checkpoint

            params = convert_vocos_state_dict(load_torch_checkpoint(local_path))
        else:
            params = init_vocos(jax.random.PRNGKey(1), cfg)
        return Vocos(params, cfg).decode
    if vocoder_name == "bigvgan":
        from f5tts_tpu.vocoder.bigvgan import BigVGAN, BigVGANConfig, init_bigvgan

        cfg = BigVGANConfig()
        if is_local and local_path:
            from f5tts_tpu.compat import load_torch_checkpoint
            from f5tts_tpu.vocoder.bigvgan import convert_bigvgan_state_dict

            params = convert_bigvgan_state_dict(load_torch_checkpoint(local_path), cfg)
        else:
            params = init_bigvgan(jax.random.PRNGKey(1), cfg)
        return BigVGAN(params, cfg).decode
    raise ValueError(f"unknown vocoder {vocoder_name!r}")


def load_checkpoint(arch, ckpt_path: str, device=None, dtype=None, use_ema: bool = True,
                    backbone: str = "DiT"):
    """Load reference .pt/.safetensors or native orbax params (reference :190)."""
    if ckpt_path.endswith((".pt", ".pth", ".bin", ".safetensors")):
        from f5tts_tpu.compat import convert_backbone_state_dict, load_torch_checkpoint

        params = convert_backbone_state_dict(load_torch_checkpoint(ckpt_path), arch,
                                             backbone)
    else:
        from f5tts_tpu.train.checkpoint import load_params

        params = load_params(ckpt_path, use_ema=use_ema)
    if dtype is not None:
        from f5tts_tpu.models.modules import tree_cast

        params = tree_cast(params, dtype)
    return params


@dataclass
class LoadedModel:
    """What `load_model` returns; `infer_process` consumes it (the reference's
    `model_obj`). Carries everything needed to build a pipeline lazily once a
    vocoder is known."""
    params: dict
    config: ModelConfig
    vocab: dict
    dtype: object
    backend: str
    _pipelines: dict = field(default_factory=dict)

    def pipeline(self, vocoder: Callable) -> InferencePipeline:
        key = id(vocoder)
        if key not in self._pipelines:
            from f5tts_tpu.models.cfm import BACKBONES

            bd = BACKBONES[self.config.backbone]
            self._pipelines[key] = InferencePipeline(
                params=self.params, statics=bd.statics_cls(self.config.arch),
                vocoder=vocoder, vocab_char_map=self.vocab,
                mel_cfg=self.config.mel_spec, sampling=self.config.sampling,
                tokenizer=self.config.tokenizer, dtype=self.dtype,
                backend=self.backend, backbone=bd,
            )
        return self._pipelines[key]


def load_model(model: str = "F5TTS_v1_Base", ckpt_path: str = "",
               mel_spec_type: str = "vocos", vocab_file: str = "",
               ode_method: str = "euler", use_ema: bool = True,
               device=None, dtype=None, backend: Optional[str] = None) -> LoadedModel:
    """Reference :238. `model` is a preset name or a reference-layout YAML path."""
    on_tpu = jax.default_backend() == "tpu"
    dtype = dtype or (jnp.bfloat16 if on_tpu else jnp.float32)
    backend = backend or ("pallas" if on_tpu else "xla")
    cfg = PRESETS[model] if model in PRESETS else load_model_config(model)
    if not vocab_file:
        vocab_file = str(files("f5tts_tpu").joinpath("data/vocab_emilia_pinyin.txt"))
    vocab = load_vocab(vocab_file)
    arch = dataclasses.replace(cfg.arch, text_num_embeds=len(vocab))
    from f5tts_tpu.models.cfm import BACKBONES

    bd = BACKBONES[cfg.backbone]
    if ckpt_path:
        params = load_checkpoint(arch, ckpt_path, dtype=dtype, use_ema=use_ema,
                                 backbone=cfg.backbone)
    else:
        params = bd.init(jax.random.PRNGKey(0), arch)
    return LoadedModel(params=params, config=dataclasses.replace(cfg, arch=arch),
                       vocab=vocab, dtype=dtype, backend=backend)


def infer_process(
    ref_audio, ref_text: str, gen_text: str, model_obj: LoadedModel,
    vocoder: Callable, mel_spec_type: str = "vocos", show_info=print,
    progress=None, target_rms: float = target_rms,
    cross_fade_duration: float = cross_fade_duration, nfe_step: int = nfe_step,
    cfg_strength: float = cfg_strength,
    sway_sampling_coef: float = sway_sampling_coef, speed: float = speed,
    fix_duration: Optional[float] = fix_duration, device=None, seed: int = 0,
):
    """One-call TTS (reference :384): chunk text by the ref speech rate,
    generate each chunk, cross-fade. Returns (wave, sample_rate, mel [d, t]).

    `ref_audio` is a wav path or an (np.ndarray, sr) pair."""
    if isinstance(ref_audio, str):
        wav, sr = audio_io.read_wav(ref_audio)
    else:
        wav, sr = ref_audio
        wav = np.asarray(wav, np.float32)
    pipe = model_obj.pipeline(vocoder)
    show_info(f"Generating audio for {len(gen_text)} chars...")
    return pipe.infer(
        wav, sr, ref_text, gen_text, seed=seed, speed=speed,
        fix_duration=fix_duration, nfe_step=nfe_step, cfg_strength=cfg_strength,
        sway_sampling_coef=sway_sampling_coef,
        cross_fade_duration=cross_fade_duration, target_rms=target_rms,
    )


def infer_batch_process(
    ref_audio, ref_text: str, gen_text_batches: list[str],
    model_obj: LoadedModel, vocoder: Callable, streaming: bool = False,
    chunk_size: int = 2048, seed: int = 0, **kw,
):
    """Reference :440. Non-streaming: returns (wave, sr, mel). Streaming:
    yields (wave_chunk, sr) per fixed-size chunk."""
    wav, sr = (audio_io.read_wav(ref_audio) if isinstance(ref_audio, str)
               else (np.asarray(ref_audio[0], np.float32), ref_audio[1]))
    pipe = model_obj.pipeline(vocoder)
    # pop before branching: streamed chunks are yielded as-is (no cross-fade,
    # reference :528-537) and infer_stream does not take the kwarg
    xf = kw.pop("cross_fade_duration", cross_fade_duration)
    if streaming:
        return pipe.infer_stream(wav, sr, ref_text, gen_text_batches,
                                 chunk_size=chunk_size, seed=seed, **kw)
    ref = audio_io.resample(wav, sr, pipe.sr)
    waves, mels = [], []
    for chunk in gen_text_batches:
        w, m = pipe.generate_chunk(ref, ref_text, chunk, seed=seed, **kw)
        waves.append(w)
        mels.append(m)
    from f5tts_tpu.infer.pipeline import cross_fade

    final = cross_fade(waves, pipe.sr, xf)
    return final, pipe.sr, np.concatenate(mels, axis=1)


def remove_silence_for_generated_wav(filename: str) -> None:
    """Reference :599: strip long internal silences from a generated wav."""
    wav, sr = audio_io.read_wav(filename)
    segs = audio_io.split_on_silence(
        wav, sr, min_silence_len_ms=1000, silence_thresh_db=-50.0,
        keep_silence_ms=500)
    out = np.concatenate(segs) if segs else wav[:0]
    audio_io.write_wav(filename, out, sr)

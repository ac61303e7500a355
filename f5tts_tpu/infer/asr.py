"""ASR transcription + full reference-audio preprocessing.

Rebuild of reference src/f5_tts/infer/utils_infer.py:150-184 (lazy
whisper-large-v3-turbo pipeline) and :298-378 (`preprocess_ref_audio_text`:
md5-keyed caching, two-stage silence clipping to <=12 s, edge trim + 50 ms
tail pad, auto-transcription when no ref text, terminal-punctuation fixup).

The whisper model requires network/weights; transcription is gated with a
clear error when unavailable. Everything else is offline.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Optional

import numpy as np

from f5tts_tpu.infer import audio_io

_asr_pipe = None
_ref_audio_cache: dict = {}
_ref_text_cache: dict = {}


def initialize_asr_pipeline(model: str = "openai/whisper-large-v3-turbo",
                            device: str = "cpu"):
    global _asr_pipe
    if _asr_pipe is not None:
        return _asr_pipe
    try:
        from transformers import pipeline

        _asr_pipe = pipeline("automatic-speech-recognition", model=model,
                             device=device)
    except Exception as e:
        raise RuntimeError(
            f"ASR unavailable ({type(e).__name__}: {e}); pass ref_text explicitly "
            "or install/download the whisper model"
        ) from e
    return _asr_pipe


def transcribe(wav: np.ndarray, sr: int, language: Optional[str] = None) -> str:
    pipe = initialize_asr_pipeline()
    kwargs = {"task": "transcribe"}
    if language:
        kwargs["language"] = language
    out = pipe({"array": wav.astype(np.float32), "sampling_rate": sr},
               generate_kwargs=kwargs, return_timestamps=False)
    return out["text"].strip()


def preprocess_ref_audio_text(
    ref_audio_path: str,
    ref_text: str,
    show_info: Callable = print,
    language: Optional[str] = None,
) -> tuple[np.ndarray, int, str]:
    """Returns (clipped wav, sr, ref_text) — reference utils_infer.py:298-378."""
    with open(ref_audio_path, "rb") as f:
        audio_hash = hashlib.md5(f.read()).hexdigest()

    if audio_hash in _ref_audio_cache:
        show_info("Using cached preprocessed reference audio...")
        wav, sr = _ref_audio_cache[audio_hash]
    else:
        wav, sr = audio_io.read_wav(ref_audio_path)
        wav = audio_io.clip_ref_audio(wav, sr)  # two-stage silence clip <=12 s
        _ref_audio_cache[audio_hash] = (wav, sr)

    if not ref_text.strip():
        if audio_hash in _ref_text_cache:
            show_info("Using cached reference text...")
            ref_text = _ref_text_cache[audio_hash]
        else:
            show_info("No reference text provided, transcribing reference audio...")
            ref_text = transcribe(wav, sr, language)
            _ref_text_cache[audio_hash] = ref_text
    else:
        show_info("Using custom reference text...")

    # ensure terminal punctuation (reference :369-374)
    if not ref_text.endswith(". ") and not ref_text.endswith("。"):
        ref_text = ref_text + " " if ref_text.endswith(".") else ref_text + ". "

    return wav, sr, ref_text

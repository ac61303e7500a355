"""Checkpoint name -> (HF repo, step, format) resolution table + resolver.

Mirrors the reference's auto-download logic (src/f5_tts/api.py:65-81: a
`cached_path("hf://SWivid/...")` pull keyed on model name, with overrides
for the older F5TTS_Base / bigvgan / E2TTS_Base checkpoints) and the vocoder
repos of utils_infer.load_vocoder (src/f5_tts/infer/utils_infer.py:90-132).

Resolution order:
1. $F5TTS_CKPT_DIR/<model>/model_<step>.<ext> (explicit local mirror)
2. the local huggingface cache (works offline once populated)
3. hf_hub_download over the network
Failure raises a RuntimeError that names the exact repo/file to fetch —
the API must resolve-or-explain, never silently random-initialize.
"""

from __future__ import annotations

import os
from typing import Optional


def checkpoint_spec(model: str, mel_spec_type: str = "vocos") -> tuple[str, str]:
    """-> (hf repo_id, filename inside the repo)."""
    repo_name, ckpt_step, ckpt_type = "F5-TTS", 1_250_000, "safetensors"
    if model == "F5TTS_Base":
        if mel_spec_type == "vocos":
            ckpt_step = 1_200_000
        elif mel_spec_type == "bigvgan":
            model = "F5TTS_Base_bigvgan"
            ckpt_type = "pt"
    elif model == "E2TTS_Base":
        repo_name = "E2-TTS"
        ckpt_step = 1_200_000
    return f"SWivid/{repo_name}", f"{model}/model_{ckpt_step}.{ckpt_type}"


VOCODER_REPOS = {
    "vocos": "charactr/vocos-mel-24khz",
    "bigvgan": "nvidia/bigvgan_v2_24khz_100band_256x",
}


def resolve_checkpoint(
    model: str,
    mel_spec_type: str = "vocos",
    cache_dir: Optional[str] = None,
    allow_network: bool = True,
) -> str:
    """Resolve a model name to a local checkpoint path (download if needed)."""
    repo_id, filename = checkpoint_spec(model, mel_spec_type)

    local_dir = os.environ.get("F5TTS_CKPT_DIR")
    if local_dir:
        cand = os.path.join(local_dir, filename)
        if os.path.exists(cand):
            return cand
        # also accept a flat layout: $F5TTS_CKPT_DIR/<basename>
        cand = os.path.join(local_dir, os.path.basename(filename))
        if os.path.exists(cand):
            return cand

    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:
        raise RuntimeError(
            f"no local checkpoint for {model} and huggingface_hub is "
            f"unavailable — place {filename} under $F5TTS_CKPT_DIR or pass "
            f"ckpt_file= explicitly") from e

    try:  # offline-first: a populated HF cache needs no network
        return hf_hub_download(repo_id, filename, cache_dir=cache_dir,
                               local_files_only=True)
    except Exception:
        pass
    if allow_network:
        try:
            return hf_hub_download(repo_id, filename, cache_dir=cache_dir)
        except Exception as e:
            raise RuntimeError(
                f"could not download hf://{repo_id}/{filename} — no network? "
                f"Pre-fetch it into the HF cache, set $F5TTS_CKPT_DIR to a "
                f"directory containing {filename}, or pass ckpt_file=. "
                f"(Use ckpt_file='random' for an uninitialized smoke-test "
                f"model.)") from e
    raise RuntimeError(
        f"checkpoint for {model} not found locally (hf://{repo_id}/{filename}); "
        f"set $F5TTS_CKPT_DIR or pass ckpt_file=")


def resolve_vocoder(mel_spec_type: str = "vocos",
                    cache_dir: Optional[str] = None,
                    allow_network: bool = True) -> str:
    """Resolve the vocoder weights file for a mel type."""
    repo_id = VOCODER_REPOS[mel_spec_type]
    filename = ("pytorch_model.bin" if mel_spec_type == "vocos"
                else "bigvgan_generator.pt")
    local_dir = os.environ.get("F5TTS_VOCODER_DIR")
    if local_dir:
        cand = os.path.join(local_dir, filename)
        if os.path.exists(cand):
            return cand
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:
        raise RuntimeError(
            f"no local vocoder and huggingface_hub unavailable — set "
            f"$F5TTS_VOCODER_DIR or pass vocoder_ckpt=") from e
    try:
        return hf_hub_download(repo_id, filename, cache_dir=cache_dir,
                               local_files_only=True)
    except Exception:
        pass
    if allow_network:
        try:
            return hf_hub_download(repo_id, filename, cache_dir=cache_dir)
        except Exception as e:
            raise RuntimeError(
                f"could not download hf://{repo_id}/{filename}; set "
                f"$F5TTS_VOCODER_DIR or pass vocoder_ckpt=") from e
    raise RuntimeError(f"vocoder weights not found locally (hf://{repo_id})")

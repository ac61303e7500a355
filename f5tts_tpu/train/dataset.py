"""Training data pipeline: datasets, frame-budget batching, collation.

Rebuild of reference src/f5_tts/model/dataset.py:

- CustomDataset (:58-166): rows of {audio_path|mel, text, duration}; wav ->
  mel on the fly; duration filter 0.3-30 s with skip-to-next on bad rows;
  `get_frame_len` from duration.json drives the batch sampler.
- DynamicBatchSampler (:170-241): sort all indices by frame length, greedily
  pack batches up to `frames_threshold` frames and `max_samples` sequences,
  drop oversized samples, per-epoch seeded shuffle of batch order,
  drop_last for even sharding across data-parallel replicas.
- collate (:313-334): pad mels to the batch max; here additionally rounded up
  to a compile bucket so the jitted train step compiles once per bucket.

Host-side mel extraction is pure numpy (np.fft.rfft + the same filterbank as
the device path) so loader workers never touch the TPU.
"""

from __future__ import annotations

import json
import os
import random
from dataclasses import dataclass
from typing import Iterator, Optional, Sequence

import numpy as np

from f5tts_tpu.config import MelConfig
from f5tts_tpu.ops.mel import mel_filterbank
from f5tts_tpu.utils import round_up


# ---------------------------------------------------------------------------
# numpy mel (host-side, matches the device vocos/bigvgan paths)
# ---------------------------------------------------------------------------

class NumpyMel:
    def __init__(self, cfg: MelConfig):
        self.cfg = cfg
        n = np.arange(cfg.win_length)
        self.window = (0.5 - 0.5 * np.cos(2 * np.pi * n / cfg.win_length)).astype(np.float64)
        if cfg.mel_spec_type == "vocos":
            self.fb = mel_filterbank(cfg.target_sample_rate, cfg.n_fft,
                                     cfg.n_mel_channels, mel_scale="htk", norm=None)
        else:
            self.fb = mel_filterbank(cfg.target_sample_rate, cfg.n_fft,
                                     cfg.n_mel_channels, mel_scale="slaney", norm="slaney")

    def __call__(self, wav: np.ndarray) -> np.ndarray:
        """[l] -> [t, n_mels] log-mel (sequence-major)."""
        c = self.cfg
        if c.mel_spec_type == "vocos":
            pad = c.n_fft // 2
            x = np.pad(wav, (pad, pad), mode="reflect")
        else:
            pad = (c.n_fft - c.hop_length) // 2
            x = np.pad(wav, (pad, pad), mode="reflect")
        n_frames = (len(x) - c.n_fft) // c.hop_length + 1
        idx = np.arange(c.n_fft)[None, :] + c.hop_length * np.arange(n_frames)[:, None]
        frames = x[idx] * self.window[None, :]
        spec = np.fft.rfft(frames, axis=-1)
        if c.mel_spec_type == "vocos":
            mag = np.abs(spec)
        else:
            mag = np.sqrt(spec.real**2 + spec.imag**2 + 1e-9)
        mel = mag.astype(np.float32) @ self.fb.T  # [t, n_mels]
        return np.log(np.clip(mel, 1e-5, None)).astype(np.float32)


# ---------------------------------------------------------------------------
# Datasets
# ---------------------------------------------------------------------------

@dataclass
class Sample:
    mel: np.ndarray        # [t, n_mels]
    text: object           # raw string, or pre-tokenized pinyin token list


class CustomDataset:
    """Arrow-backed dataset (reference dataset.py:58-166)."""

    def __init__(
        self,
        data,                      # hf datasets Dataset or list of dicts
        durations: Optional[Sequence[float]] = None,
        mel_cfg: MelConfig = MelConfig(),
        preprocessed_mel: bool = False,
        audio_root: str = "",
    ):
        self.data = data
        self.durations = durations
        self.mel_cfg = mel_cfg
        self.preprocessed_mel = preprocessed_mel
        self.audio_root = audio_root
        self.mel = NumpyMel(mel_cfg)

    def __len__(self) -> int:
        return len(self.data)

    def get_frame_len(self, index: int) -> float:
        cfg = self.mel_cfg
        if self.durations is not None:
            return self.durations[index] * cfg.target_sample_rate / cfg.hop_length
        row = self.data[index]
        duration = row.get("duration") if hasattr(row, "get") else row["duration"]
        if duration is None:
            raise KeyError(
                f"row {index} has no 'duration' and no duration.json was "
                "loaded — frame-budget batching needs one of the two "
                "(regenerate the dataset with the prep scripts, which always "
                "write duration.json)")
        return duration * cfg.target_sample_rate / cfg.hop_length

    def _resolve_index(self, index: int) -> int:
        """Bad-duration rows are skipped forward (ref :129-140); text and
        audio accessors must agree on the replacement row."""
        if self.preprocessed_mel:
            return index
        while True:
            duration = self.data[index].get("duration")
            if duration is None or 0.3 <= duration <= 30.0:
                return index
            index = (index + 1) % len(self.data)

    def get_text(self, index: int) -> str:
        """Cheap text-only accessor (no audio IO) — used by the multi-host
        input path so every process can tokenize the full global batch."""
        return self.data[self._resolve_index(index)]["text"]

    def __getitem__(self, index: int) -> Sample:
        cfg = self.mel_cfg
        row = self.data[self._resolve_index(index)]
        if self.preprocessed_mel:
            mel = np.asarray(row["mel_spec"], np.float32)
            if mel.shape[0] == cfg.n_mel_channels:
                mel = mel.T
            return Sample(mel=mel, text=row["text"])
        from f5tts_tpu.infer import audio_io

        path = os.path.join(self.audio_root, row["audio_path"])
        wav, sr = audio_io.read_wav(path)
        wav = audio_io.resample(wav, sr, cfg.target_sample_rate)
        return Sample(mel=self.mel(wav), text=row["text"])


class HFDataset:
    """Streaming-style wrapper over a huggingface dataset with an `audio`
    column ({"array", "sampling_rate"}) and a `text` column — mel computed
    on the fly (reference dataset.py:17-56). Resampling goes through
    audio_io.resample (stateless polyphase; the reference caches torchaudio
    Resample modules per rate — ours needs no per-rate state)."""

    def __init__(self, data, mel_cfg: MelConfig = MelConfig()):
        self.data = data
        self.mel_cfg = mel_cfg
        self.mel = NumpyMel(mel_cfg)

    def __len__(self) -> int:
        return len(self.data)

    def get_frame_len(self, index: int) -> float:
        cfg = self.mel_cfg
        row = self.data[index]
        audio = row["audio"]
        return (len(audio["array"]) / audio["sampling_rate"]
                * cfg.target_sample_rate / cfg.hop_length)

    def _resolve_index(self, index: int) -> int:
        while True:
            audio = self.data[index]["audio"]
            duration = len(audio["array"]) / audio["sampling_rate"]
            if 0.3 <= duration <= 30.0:  # ref dataset.py:57-58
                return index
            index = (index + 1) % len(self.data)

    def get_text(self, index: int) -> str:
        return self.data[self._resolve_index(index)]["text"]

    def __getitem__(self, index: int) -> Sample:
        cfg = self.mel_cfg
        row = self.data[self._resolve_index(index)]
        audio = row["audio"]
        wav = np.asarray(audio["array"], np.float32)
        if wav.ndim > 1:
            wav = wav.mean(axis=0)
        from f5tts_tpu.infer import audio_io

        wav = audio_io.resample(wav, audio["sampling_rate"], cfg.target_sample_rate)
        return Sample(mel=self.mel(wav), text=row["text"])


def _load_arrow_dir(d: str, audio_type: str = "raw"):
    """data dir -> (hf dataset, durations|None, preprocessed_mel)."""
    import datasets as hf_datasets

    if audio_type == "mel":
        data = hf_datasets.Dataset.from_file(os.path.join(d, "mel.arrow"))
        preprocessed = True
    elif os.path.isdir(os.path.join(d, "raw")):
        data = hf_datasets.load_from_disk(os.path.join(d, "raw"))
        preprocessed = False
    else:
        data = hf_datasets.Dataset.from_file(os.path.join(d, "raw.arrow"))
        preprocessed = False
    durations = None
    dur_path = os.path.join(d, "duration.json")
    if os.path.exists(dur_path):
        with open(dur_path) as f:
            durations = json.load(f)["duration"]
    return data, durations, preprocessed


def load_dataset(
    dataset_name: str,
    tokenizer: str = "pinyin",
    mel_cfg: MelConfig = MelConfig(),
    data_root: Optional[str] = None,
    dataset_type: str = "CustomDataset",
    audio_type: str = "raw",
) -> "CustomDataset | HFDataset":
    """Resolve a training dataset (reference dataset.py:247-307).

    - "CustomDataset": data/<name>_<tokenizer>/{raw[.arrow]|mel.arrow,
      duration.json} under `data_root` (or $F5TTS_DATA_ROOT)
    - "CustomDatasetPath": `dataset_name` IS the directory (no tokenizer
      suffix), same layout
    - "HFDataset": `dataset_name` = "<repo>_<split>" pulled via
      datasets.load_dataset (network-gated; pass a local cache via
      $HF_DATASETS_CACHE for offline use)
    """
    if dataset_type == "CustomDataset":
        root = data_root or os.environ.get("F5TTS_DATA_ROOT", "data")
        d = os.path.join(root, f"{dataset_name}_{tokenizer}")
        data, durations, preprocessed = _load_arrow_dir(d, audio_type)
        return CustomDataset(data, durations=durations, mel_cfg=mel_cfg,
                             preprocessed_mel=preprocessed)
    if dataset_type == "CustomDatasetPath":
        data, durations, preprocessed = _load_arrow_dir(dataset_name, audio_type)
        return CustomDataset(data, durations=durations, mel_cfg=mel_cfg,
                             preprocessed_mel=preprocessed)
    if dataset_type == "HFDataset":
        import datasets as hf_datasets

        pre, post = dataset_name.rsplit("_", 1)
        try:
            data = hf_datasets.load_dataset(f"{pre}/{pre}", split=f"train.{post}")
        except Exception as e:  # network-gated (zero-egress environments)
            raise RuntimeError(
                f"HFDataset '{pre}/{pre}' (split train.{post}) could not be "
                "loaded — hub access or a populated $HF_DATASETS_CACHE is "
                "required") from e
        return HFDataset(data, mel_cfg=mel_cfg)
    raise ValueError(f"unknown dataset_type {dataset_type!r}")


# ---------------------------------------------------------------------------
# Frame-budget batch sampler
# ---------------------------------------------------------------------------

class DynamicBatchSampler:
    """Reference dataset.py:170-241."""

    def __init__(
        self,
        frame_lens: Sequence[float],
        frames_threshold: int,
        max_samples: int = 0,
        random_seed: Optional[int] = None,
        drop_residual: bool = False,  # reference default (dataset.py:180): KEEP the residual batch — it holds the longest samples after the ascending sort
    ):
        self.frames_threshold = frames_threshold
        self.max_samples = max_samples
        self.random_seed = random_seed
        self.epoch = 0

        indices = sorted(range(len(frame_lens)), key=lambda i: frame_lens[i])
        batches: list[list[int]] = []
        batch: list[int] = []
        batch_frames = 0.0
        for idx in indices:
            fl = frame_lens[idx]
            if fl > frames_threshold:
                continue  # oversized sample dropped (ref :199-213)
            if (batch_frames + fl <= frames_threshold
                    and (max_samples == 0 or len(batch) < max_samples)):
                batch.append(idx)
                batch_frames += fl
            else:
                if batch:
                    batches.append(batch)
                batch = [idx]
                batch_frames = fl
        if batch and not drop_residual:
            batches.append(batch)
        self.batches = batches

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        return len(self.batches)

    def __iter__(self) -> Iterator[list[int]]:
        order = list(range(len(self.batches)))
        if self.random_seed is not None:
            rng = random.Random(self.random_seed + self.epoch)
            rng.shuffle(order)
        for i in order:
            yield self.batches[i]


# ---------------------------------------------------------------------------
# Collation
# ---------------------------------------------------------------------------

def collate(
    samples: list[Sample],
    bucket_frames: int = 64,
    max_frames: Optional[int] = None,
    pad_to: Optional[int] = None,
) -> dict:
    """Pad to batch max rounded up to `bucket_frames` (compile-bucket
    discipline); returns numpy arrays + raw text list. `pad_to` forces an
    exact width — the multi-host path uses it so every process pads its
    local shard to the same globally-agreed width."""
    lens = np.asarray([s.mel.shape[0] for s in samples], np.int32)
    if pad_to is not None:
        width = pad_to
    else:
        width = int(lens.max())
        width = round_up(width, bucket_frames)
        if max_frames is not None:
            width = min(width, max_frames)
    d = samples[0].mel.shape[1]
    mel = np.zeros((len(samples), width, d), np.float32)
    for i, s in enumerate(samples):
        t = min(s.mel.shape[0], width)
        mel[i, :t] = s.mel[:t]
    return {
        "mel": mel,
        "mel_lengths": np.minimum(lens, width),
        "text": [s.text for s in samples],
        "text_lengths": np.asarray([len(s.text) for s in samples], np.int32),
    }

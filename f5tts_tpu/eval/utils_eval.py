"""Evaluation utilities: testset metainfo, bucketed prompt batching, WER.

Rebuild of reference src/f5_tts/eval/utils_eval.py:

- metainfo loaders for the Seed-TTS testset ("utt|prompt_text|prompt_wav|
  gt_text[|gt_wav]") and LibriSpeech-PC cross-sentence .lst (tab-separated
  ref/gen utterance pairs) (:18-54)
- `get_inference_prompt` (:72-205): per-utterance duration estimate from
  byte ratio, 200 duration buckets over [3 s, 40 s], frame-budget batch
  accumulation per bucket, padded ref-mel batches
- WER text normalization (:306-374): punctuation strip, lowercase, zh
  char-split — with a built-in word-level edit distance so WER is computable
  without jiwer; ASR backends (faster-whisper en / funasr zh) are gated on
  availability.
"""

from __future__ import annotations

import math
import os
import random
import string
from typing import Optional

import numpy as np

from f5tts_tpu.config import MelConfig
from f5tts_tpu.infer import audio_io
from f5tts_tpu.text.pinyin import convert_char_to_pinyin
from f5tts_tpu.train.dataset import NumpyMel


def get_seedtts_testset_metainfo(metalst: str) -> list[tuple]:
    metainfo = []
    with open(metalst, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split("|")
            if len(parts) == 5:
                utt, prompt_text, prompt_wav, gt_text, gt_wav = parts
            elif len(parts) == 4:
                utt, prompt_text, prompt_wav, gt_text = parts
                gt_wav = os.path.join(os.path.dirname(metalst), "wavs", utt + ".wav")
            else:
                continue
            if not os.path.isabs(prompt_wav):
                prompt_wav = os.path.join(os.path.dirname(metalst), prompt_wav)
            metainfo.append((utt, prompt_text, prompt_wav, gt_text, gt_wav))
    return metainfo


def get_librispeech_test_clean_metainfo(metalst: str, librispeech_path: str) -> list[tuple]:
    metainfo = []
    with open(metalst, encoding="utf-8") as f:
        for line in f:
            ref_utt, _ref_dur, ref_txt, gen_utt, _gen_dur, gen_txt = line.strip().split("\t")
            ref_spk, ref_chap, _ = ref_utt.split("-")
            ref_wav = os.path.join(librispeech_path, ref_spk, ref_chap, ref_utt + ".flac")
            gen_spk, gen_chap, _ = gen_utt.split("-")
            gen_wav = os.path.join(librispeech_path, gen_spk, gen_chap, gen_utt + ".flac")
            metainfo.append((gen_utt, ref_txt, ref_wav, " " + gen_txt, gen_wav))
    return metainfo


def get_inference_prompt(
    metainfo: list[tuple],
    speed: float = 1.0,
    tokenizer: str = "pinyin",
    mel_cfg: MelConfig = MelConfig(),
    target_rms: float = 0.1,
    use_truth_duration: bool = False,
    infer_batch_size: int = 1,          # utterances per batch (1 = per-utt)
    num_buckets: int = 200,
    min_secs: float = 3.0,
    max_secs: float = 40.0,
    seed: int = 666,
) -> list[dict]:
    """Bucket prompts by estimated total duration, accumulate fixed-size
    batches per bucket, shuffle batch order with a fixed seed (:72-205)."""
    sr, hop = mel_cfg.target_sample_rate, mel_cfg.hop_length
    min_tokens = int(min_secs * sr) // hop
    max_tokens = int(max_secs * sr) // hop
    tokens_per_bucket = (max_tokens - min_tokens) / num_buckets

    mel_fn = NumpyMel(mel_cfg)
    buckets: list[dict] = [
        {"utts": [], "ref_rms": [], "ref_mels": [], "ref_mel_lens": [],
         "total_mel_lens": [], "texts": []}
        for _ in range(num_buckets)
    ]
    batches: list[dict] = []

    def flush(bk):
        if not bk["utts"]:
            return
        max_len = max(m.shape[0] for m in bk["ref_mels"])
        mels = np.zeros((len(bk["ref_mels"]), max_len, mel_cfg.n_mel_channels), np.float32)
        for i, mm in enumerate(bk["ref_mels"]):
            mels[i, : mm.shape[0]] = mm
        batches.append({
            "utts": list(bk["utts"]),
            "ref_rms": np.asarray(bk["ref_rms"], np.float32),
            "ref_mels": mels,
            "ref_mel_lens": np.asarray(bk["ref_mel_lens"], np.int32),
            "total_mel_lens": np.asarray(bk["total_mel_lens"], np.int32),
            "texts": list(bk["texts"]),
        })
        for v in bk.values():
            v.clear()

    for utt, prompt_text, prompt_wav, gt_text, gt_wav in metainfo:
        wav, sr_in = audio_io.read_wav(prompt_wav)
        ref_rms = audio_io.rms(wav)
        if 0 < ref_rms < target_rms:
            wav = wav * (target_rms / ref_rms)
        wav = audio_io.resample(wav, sr_in, sr)

        if len(prompt_text[-1].encode("utf-8")) == 1:
            prompt_text = prompt_text + " "
        text = prompt_text + gt_text
        if tokenizer == "pinyin":
            text_tokens = convert_char_to_pinyin([text])[0]
        else:
            text_tokens = list(text)

        ref_mel = mel_fn(wav)
        ref_mel_len = ref_mel.shape[0]

        if use_truth_duration:
            gt_wav_data, gt_sr = audio_io.read_wav(gt_wav)
            total_mel_len = ref_mel_len + int(len(gt_wav_data) / gt_sr * sr / hop / speed)
        else:
            ref_bytes = len(prompt_text.encode("utf-8"))
            gen_bytes = len(gt_text.encode("utf-8"))
            total_mel_len = ref_mel_len + int(ref_mel_len / max(ref_bytes, 1) * gen_bytes / speed)

        bucket = max(0, min(num_buckets - 1,
                            int((total_mel_len - min_tokens) / max(tokens_per_bucket, 1e-9))))
        bk = buckets[bucket]
        bk["utts"].append(utt)
        bk["ref_rms"].append(ref_rms)
        bk["ref_mels"].append(ref_mel)
        bk["ref_mel_lens"].append(ref_mel_len)
        bk["total_mel_lens"].append(total_mel_len)
        bk["texts"].append(text_tokens)
        if len(bk["utts"]) >= infer_batch_size:
            flush(bk)

    for bk in buckets:
        flush(bk)

    rng = random.Random(seed)
    rng.shuffle(batches)
    return batches


# ---------------------------------------------------------------------------
# WER
# ---------------------------------------------------------------------------

# zhon.hanzi.punctuation (the CJK/fullwidth set the reference unions with
# string.punctuation, utils_eval.py:324-326) — carried as data so the
# normalization matches without the zhon dependency
_ZH_PUNCT = (
    "＂＃＄％＆＇（）＊＋，－／：；＜＝＞＠［＼］＾＿｀｛｜｝～｟｠｢｣､　"
    "、〃〈〉《》「」『』【】〔〕〖〗〘〙〚〛〜〝〞〟〰〾〿–—‘’‛“”„‟…‧﹏﹑﹔"
    "·！？｡。"
)
_PUNCT = _ZH_PUNCT + string.punctuation


def normalize_for_wer(text: str, lang: str = "en") -> list[str]:
    """Reference :306-374 normalization, token for token:

    - every punctuation char (zhon.hanzi + string.punctuation) replaced with
      the EMPTY string — so "don't" scores as one token "dont" and
      "state-of-the-art" as "stateoftheart" (NOT split on the hyphen);
    - one literal "  " -> " " pass (the residual whitespace collapse happens
      in jiwer's wer_default RemoveMultipleSpaces/Strip, here via .split());
    - zh: every character space-joined (per-char scoring), case PRESERVED —
      the reference lowercases only the en branch, so Latin text embedded in
      zh is scored case-sensitively;
    - en: lowercased.

    Returns the token list jiwer's process_words would align.
    """
    for ch in _PUNCT:
        text = text.replace(ch, "")
    text = text.replace("  ", " ")
    if lang == "zh":
        text = " ".join(text)
    elif lang == "en":
        text = text.lower()
    return text.split()


def _edit_distance(ref: list[str], hyp: list[str]) -> int:
    dp = list(range(len(hyp) + 1))
    for i in range(1, len(ref) + 1):
        prev = dp[0]
        dp[0] = i
        for j in range(1, len(hyp) + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                        prev + (0 if ref[i - 1] == hyp[j - 1] else 1))
            prev = cur
    return dp[-1]


def compute_wer(truth: str, hypothesis: str, lang: str = "en") -> float:
    ref = normalize_for_wer(truth, lang)
    hyp = normalize_for_wer(hypothesis, lang)
    if not ref:
        return 0.0 if not hyp else 1.0
    return _edit_distance(ref, hyp) / len(ref)


def run_asr_wer(lang: str, wav_truth_pairs: list[tuple], device: str = "cpu",
                asr_fn=None) -> list[dict]:
    """Transcribe generated wavs and score WER. Backends follow the reference
    protocol: zh -> funasr paraformer, en -> faster-whisper large-v3
    (:306-374); both are optional heavy deps. `asr_fn` (path -> transcript)
    overrides the backend — used by the offline CPU smoke test to exercise
    the scoring loop over pipeline-generated toy wavs without whisper."""
    asr = asr_fn
    if asr is not None:
        pass
    elif lang == "zh":
        try:
            from funasr import AutoModel
        except ImportError as e:
            raise RuntimeError("funasr is required for zh WER (reference protocol)") from e
        model = AutoModel(model="paraformer-zh", disable_update=True)

        def asr(path):
            return model.generate(input=path)[0]["text"]
    elif lang == "en":
        try:
            from faster_whisper import WhisperModel
        except ImportError as e:
            raise RuntimeError("faster-whisper is required for en WER (reference protocol)") from e
        model = WhisperModel("large-v3", device=device, compute_type="float16")

        def asr(path):
            segments, _ = model.transcribe(path, beam_size=5, language="en")
            return " ".join(s.text for s in segments)
    else:
        raise ValueError(lang)

    results = []
    for wav_path, truth in wav_truth_pairs:
        hypo = asr(wav_path)
        results.append({"wav": wav_path, "truth": truth, "hypo": hypo,
                        "wer": compute_wer(truth, hypo, lang)})
    return results


def _asr_wer_worker(args):
    lang, chunk, device = args
    return run_asr_wer(lang, chunk, device)


def run_asr_wer_pooled(lang: str, wav_truth_pairs: list[tuple],
                       n_procs: int | None = None,
                       device: str = "cpu") -> list[dict]:
    """ASR scoring fanned out over a worker pool (one ASR model per process),
    mirroring the reference's per-GPU multiprocessing pool
    (eval_librispeech_test_clean.py:77-87, utils_eval.py:232-241). On a TPU
    host the ASR backends are CPU torch models, so the pool is sized to the
    host cores instead of a GPU count."""
    import multiprocessing as mp

    n = n_procs or max(1, min((os.cpu_count() or 2) - 1, 8))
    if n <= 1 or len(wav_truth_pairs) < 2:
        return run_asr_wer(lang, wav_truth_pairs, device)
    chunks = [wav_truth_pairs[i::n] for i in range(n)]
    chunks = [c for c in chunks if c]
    ctx = mp.get_context("spawn")
    with ctx.Pool(len(chunks)) as pool:
        parts = pool.map(_asr_wer_worker,
                         [(lang, c, device) for c in chunks])
    return [r for part in parts for r in part]


def run_sim(wav_pairs: list[tuple], ckpt_path: str, device: str = "cpu") -> list[dict]:
    """Speaker similarity via WavLM-large ECAPA-TDNN cosine at 16 kHz
    (reference :380-426). Requires the wavlm finetuned checkpoint."""
    try:
        import torch

        from f5tts_tpu.eval.ecapa_tdnn import ECAPA_TDNN_SMALL
    except ImportError as e:
        raise RuntimeError("torch + ecapa model required for SIM") from e

    from f5tts_tpu.eval.ecapa_tdnn import load_reference_checkpoint

    model = ECAPA_TDNN_SMALL(feat_dim=1024, feat_type="wavlm_large")
    # strict key-mapped load (incl. the fine-tuned WavLM weights the ckpt
    # carries): hard-errors if <99% of checkpoint tensors are consumed, so
    # SIM can never silently score with random weights
    load_reference_checkpoint(model, ckpt_path)
    model = model.to(device).eval()

    results = []
    with torch.no_grad():
        for gen_path, gt_path in wav_pairs:
            emb = []
            for p in (gen_path, gt_path):
                wav, sr = audio_io.read_wav(p)
                wav = audio_io.resample(wav, sr, 16000)
                e = model(torch.from_numpy(wav)[None].to(device))
                emb.append(torch.nn.functional.normalize(e, dim=-1))
            sim = float((emb[0] * emb[1]).sum())
            results.append({"gen": gen_path, "gt": gt_path, "sim": sim})
    return results

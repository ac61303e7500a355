"""Speech editing: regenerate selected spans of an utterance with new text.

Rebuild of reference src/f5_tts/infer/speech_edit.py:140-236. Workflow:
1. extract the original mel
2. splice a frame-level `mel_cond`: original frames for kept regions, zero
   frames (of the requested fixed duration) for each edited span
3. build `edit_mask`: True = keep frame, False = regenerate
4. CFM.sample with `edit_mask` — the sampler conditions on kept frames only
   and re-imposes them on the output; edited spans are synthesized from the
   target text

Char-level span timings come from an external forced aligner in the
reference (ctc-forced-aligner, speech_edit.py:66-72); here either
caller-provided seconds (`edit_speech`) or the in-framework CTC forced
aligner (`edit_speech_by_text` -> infer/align.py: unit-tested CTC
segmentation DP + weights-gated wav2vec2 leg).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from f5tts_tpu.infer import audio_io
from f5tts_tpu.infer.pipeline import InferencePipeline
from f5tts_tpu.models import cfm
from f5tts_tpu.utils import duration_bucket, make_time_grid


def build_edit_cond(
    original_mel: np.ndarray,          # [t, d]
    parts_to_edit: Sequence[tuple],    # [(start_s, end_s), ...]
    fix_durations: Optional[Sequence[float]] = None,  # per-span target secs
    sample_rate: int = 24000,
    hop: int = 256,
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (mel_cond [t', d], edit_mask [t'] bool) — reference :157-194."""
    d = original_mel.shape[1]
    fix = list(fix_durations) if fix_durations is not None else None
    mel_cond = np.zeros((0, d), np.float32)
    edit_mask = np.zeros((0,), bool)
    offset = 0
    for start_s, end_s in parts_to_edit:
        part_dur_s = (end_s - start_s) if fix is None else fix.pop(0)
        start_f = round(start_s * sample_rate / hop)
        end_f = round(end_s * sample_rate / hop)
        part_f = round(part_dur_s * sample_rate / hop)
        keep_f = start_f - offset
        mel_cond = np.concatenate(
            [mel_cond, original_mel[offset:start_f], np.zeros((part_f, d), np.float32)])
        edit_mask = np.concatenate(
            [edit_mask, np.ones(keep_f, bool), np.zeros(part_f, bool)])
        offset = end_f
    mel_cond = np.concatenate([mel_cond, original_mel[offset:]])
    edit_mask = np.concatenate(
        [edit_mask, np.ones(mel_cond.shape[0] - edit_mask.shape[0], bool)])
    return mel_cond, edit_mask


def edit_speech(
    pipeline: InferencePipeline,
    wav: np.ndarray,
    sr: int,
    target_text: str,
    parts_to_edit: Sequence[tuple],
    fix_durations: Optional[Sequence[float]] = None,
    seed: int = 0,
    nfe_step: Optional[int] = None,
    cfg_strength: Optional[float] = None,
    sway_sampling_coef="default",
) -> tuple[np.ndarray, int]:
    """Edit spans of `wav` to speak `target_text`; returns (wave, sr)."""
    s = pipeline.sampling
    nfe = nfe_step or s.nfe_steps
    cfg_v = s.cfg_strength if cfg_strength is None else cfg_strength
    sway = s.sway_sampling_coef if sway_sampling_coef == "default" else sway_sampling_coef

    wav = audio_io.resample(wav, sr, pipeline.sr)
    rms_v = audio_io.rms(wav)
    if 0 < rms_v < s.target_rms:
        wav = wav * (s.target_rms / rms_v)

    original_mel = np.asarray(pipeline.mel.frames_to_mel_bnd(jnp.asarray(wav[None])))[0]
    mel_cond, edit_mask = build_edit_cond(
        original_mel, parts_to_edit, fix_durations, pipeline.sr, pipeline.hop)

    total = mel_cond.shape[0]
    n_bucket = duration_bucket(total, pipeline.bucket_size, s.max_duration,
                               pipeline.backbone.seq_extra_tokens)
    cond = np.zeros((1, n_bucket, mel_cond.shape[1]), np.float32)
    cond[0, :total] = mel_cond
    emask = np.zeros((1, n_bucket), bool)
    emask[0, :total] = edit_mask

    text_ids = pipeline.tokenize([target_text])
    t_grid = make_time_grid(nfe, sway_sampling_coef=sway, use_epss=s.use_epss)

    out = cfm.cfm_sample(
        pipeline.params, pipeline.statics,
        jnp.asarray(cond), jnp.asarray(text_ids),
        jnp.asarray([total], jnp.int32), jnp.asarray([total], jnp.int32),
        t_grid, key=jax.random.PRNGKey(seed), cfg_strength=cfg_v,
        dtype=pipeline.dtype, backend=pipeline.backend,
        edit_mask=jnp.asarray(emask),
    )
    gen_mel = jnp.transpose(out[:, :total, :], (0, 2, 1))
    wave = np.asarray(pipeline.vocoder(gen_mel))[0]
    if 0 < rms_v < s.target_rms:
        wave = wave * (rms_v / s.target_rms)
    return wave.astype(np.float32), pipeline.sr


def edit_speech_by_text(
    pipeline: InferencePipeline,
    wav: np.ndarray,
    sr: int,
    original_text: str,
    target_text: str,
    edits: Sequence,
    fix_durations: Optional[Sequence[float]] = None,
    char_spans=None,
    **kwargs,
) -> tuple[np.ndarray, int]:
    """Speech editing from TEXT spans instead of caller-provided seconds.

    `edits` entries are substrings of `original_text` (resolved left to
    right) or (char_start, char_end) index pairs; the CTC forced aligner
    (infer/align.py — the in-framework equivalent of the reference's
    documented ctc-forced-aligner workflow, reference
    src/f5_tts/infer/speech_edit.py:66-72) maps them to audio seconds, then
    the span-based `edit_speech` runs as before. `char_spans` injects a
    precomputed alignment (tests; cached alignments); otherwise the
    weights-gated `align_text` runs and raises a clear RuntimeError when
    the acoustic model is unavailable.
    """
    from f5tts_tpu.infer.align import align_text, spans_for_edits

    if char_spans is None:
        char_spans = align_text(wav, sr, original_text)
    parts = spans_for_edits(char_spans, edits, text=original_text)
    return edit_speech(pipeline, wav, sr, target_text, parts,
                       fix_durations=fix_durations, **kwargs)


def main(argv=None):
    """CLI mirroring the reference's speech_edit.py script usage."""
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--model", default="F5TTS_v1_Base")
    p.add_argument("--ckpt_file", default="")
    p.add_argument("--vocab_file", default="")
    p.add_argument("--audio", required=True, help="audio to edit")
    p.add_argument("--target_text", required=True)
    p.add_argument("--parts", nargs="+", required=True,
                   help="edit spans as start:end seconds, e.g. 1.42:2.44 4.04:4.9")
    p.add_argument("--fix_durations", nargs="*", type=float, default=None,
                   help="per-span replacement durations (seconds)")
    p.add_argument("--nfe_step", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output", default="tests/speech_edit_out.wav")
    args = p.parse_args(argv)

    from f5tts_tpu.infer.api import F5TTS

    tts = F5TTS(model=args.model, ckpt_file=args.ckpt_file, vocab_file=args.vocab_file)
    wav, sr = audio_io.read_wav(args.audio)
    parts = [tuple(map(float, s.split(":"))) for s in args.parts]
    out, out_sr = edit_speech(tts.pipeline, wav, sr, args.target_text, parts,
                              fix_durations=args.fix_durations,
                              seed=args.seed, nfe_step=args.nfe_step)
    import os

    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    audio_io.write_wav(args.output, out, out_sr)
    print(args.output)


if __name__ == "__main__":
    main()

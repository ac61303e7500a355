"""Seed-TTS testset evaluator (WER / speaker-SIM) — CLI entry.

Counterpart of reference src/f5_tts/eval/eval_seedtts_testset.py: score the
wavs produced by `eval_infer_batch` against the Seed-TTS meta.lst, writing
`_{task}_results.jsonl` + a mean summary into the gen-wav dir. ASR backends
follow the reference protocol (zh: funasr paraformer, en: faster-whisper
large-v3); SIM needs the WavLM-large ECAPA finetuned checkpoint.
"""

from __future__ import annotations

import argparse

from f5tts_tpu.eval.eval_runner import build_seedtts_test_set, score_test_set


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-e", "--eval_task", default="wer", choices=["wer", "sim"])
    ap.add_argument("-l", "--lang", default="en", choices=["zh", "en"])
    ap.add_argument("-g", "--gen_wav_dir", required=True)
    ap.add_argument("-m", "--metalst", required=True,
                    help="path to the Seed-TTS testset meta.lst")
    ap.add_argument("-n", "--workers", type=int, default=1,
                    help="scoring processes (reference: one per GPU)")
    ap.add_argument("--device", default="cpu")
    ap.add_argument("--sim_ckpt", default="",
                    help="WavLM-large ECAPA finetuned checkpoint (.pth) for SIM")
    args = ap.parse_args(argv)

    triples = build_seedtts_test_set(args.metalst, args.gen_wav_dir)
    score_test_set(
        args.eval_task, triples, args.gen_wav_dir, lang=args.lang,
        workers=args.workers, device=args.device, sim_ckpt=args.sim_ckpt,
    )


if __name__ == "__main__":
    main()

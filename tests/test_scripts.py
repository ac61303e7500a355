"""Utility scripts: epoch math, params counting, gradio module syntax."""

import ast

import jax

from f5tts_tpu.scripts.count_max_epoch import analytic, precise
from f5tts_tpu.scripts.count_params_gflops import analyze


def test_count_max_epoch_reference_numbers():
    """Reference scripts/count_max_epoch.py:8-31: Emilia 95281.87 h at
    307200 frames/update -> ~11 epochs in 1.2M updates."""
    r = analytic(total_hours=95_281.87, frames_per_update=307_200,
                 total_updates=1_200_000)
    assert abs(r["audio_minutes_per_update"] - 54.6) < 0.1
    assert 10.0 < r["max_epochs"] < 12.5
    assert 95_000 < r["updates_per_epoch"] < 115_000


def test_count_max_epoch_precise():
    frame_lens = [100.0] * 100
    r = precise(frame_lens, frames_threshold=1000, max_samples=0,
                total_updates=100)
    # 10 full batches of 10x100 frames; the residual batch is KEPT
    # (drop_residual=False, reference dataset.py:180) -> 10 updates/epoch
    assert r["updates_per_epoch"] == 10
    assert abs(r["max_epochs"] - 100 / 10) < 1e-9


def test_count_params_small():
    r = analyze("F5TTS_v1_Small", secs=2.0, vocab=100)
    assert 100e6 < r["params"] < 200e6


def test_gradio_modules_parse():
    for path in ["f5tts_tpu/infer/infer_gradio.py", "f5tts_tpu/train/finetune_gradio.py"]:
        ast.parse(open(path).read())

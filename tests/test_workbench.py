"""Finetune-workbench pure functions: slicer, transcribe, metadata, calc."""

import json
import os

import numpy as np
import pytest

from f5tts_tpu.infer import audio_io
from f5tts_tpu.train import workbench as wb

SR = 24_000


def _burst_wav(bursts, sil, sr=SR, amp=0.3, seed=0):
    """Alternate noise bursts and silences: [(burst_s, sil_s), ...]."""
    rng = np.random.default_rng(seed)
    parts = []
    for b, s in zip(bursts, sil):
        parts.append(rng.standard_normal(int(b * sr)).astype(np.float32) * amp)
        parts.append(np.zeros(int(s * sr), np.float32))
    return np.concatenate(parts)


def test_slicer_splits_on_silence():
    wav = _burst_wav([3.0, 3.0], [1.5, 0.5])
    slicer = wb.Slicer(SR, min_length=2000, min_interval=300, hop_size=20,
                       max_sil_kept=500)
    chunks = slicer.slice(wav)
    assert len(chunks) >= 2
    # every chunk is mostly speech (silence removed at the cut points)
    for chunk, start, end in chunks:
        assert end > start
        assert np.abs(chunk).mean() > 0.01
    # all retained audio comes from the original positions
    total = sum(len(c) for c, _, _ in chunks)
    assert total <= len(wav)


def test_slicer_short_input_passthrough():
    wav = _burst_wav([0.5], [0.1])
    slicer = wb.Slicer(SR, min_length=2000, min_interval=300, hop_size=20,
                       max_sil_kept=500)
    chunks = slicer.slice(wav)
    assert len(chunks) == 1
    np.testing.assert_array_equal(chunks[0][0], wav)


def test_normalize_chunk_bounds():
    loud = np.array([0.0, 2.0, -2.0], np.float32)
    out = wb.normalize_chunk(loud)
    assert np.abs(out).max() <= 1.0
    quiet = np.array([0.0, 0.1, -0.1], np.float32)
    out_q = wb.normalize_chunk(quiet)
    assert np.abs(out_q).max() > 0.1  # boosted toward the 0.5 blend target


def _make_project(tmp_path, n_wavs=2, seconds=2.0):
    proj = tmp_path / "proj"
    (proj / "dataset").mkdir(parents=True)
    for i in range(n_wavs):
        wav = _burst_wav([seconds], [0.05], seed=i)
        audio_io.write_wav(str(proj / "dataset" / f"in_{i}.wav"), wav, SR)
    return str(proj)


def test_transcribe_directory_with_injected_asr(tmp_path):
    proj = _make_project(tmp_path)
    calls = []

    def fake_asr(path, language=None):
        calls.append(path)
        return "hello there"

    stats = wb.transcribe_directory(proj, transcribe_fn=fake_asr)
    assert stats["segments"] == len(calls) and stats["segments"] >= 2
    meta = open(stats["metadata"], encoding="utf-8-sig").read().strip().split("\n")
    assert all("|hello there" in line for line in meta)
    assert all(os.path.exists(os.path.join(stats["wavs_dir"], line.split("|")[0] + ".wav"))
               for line in meta)


def test_create_metadata_filters_and_writes(tmp_path):
    proj = tmp_path / "p2"
    wavs = proj / "wavs"
    wavs.mkdir(parents=True)
    audio_io.write_wav(str(wavs / "good_a.wav"), _burst_wav([2.0], [0.0]), SR)
    audio_io.write_wav(str(wavs / "good_b.wav"), _burst_wav([3.0], [0.0]), SR)
    audio_io.write_wav(str(wavs / "short.wav"), _burst_wav([0.4], [0.0]), SR)
    with open(proj / "metadata.csv", "w", encoding="utf-8-sig") as f:
        f.write("good_a|hello world\n")
        f.write("good_b|general kenobi\n")
        f.write("short|too short audio\n")
        f.write("good_a|ab\n")          # text too short
        f.write("missing|where is it\n")
        f.write("malformed line\n")

    res = wb.create_metadata(str(proj), ch_tokenizer=False)
    assert res.samples == 2
    assert {e[1] for e in res.errors} == {"duration < 1 sec",
                                          "very short text length 3",
                                          "error path"}
    durs = json.load(open(proj / "duration.json"))["duration"]
    assert len(durs) == 2
    import datasets

    ds = datasets.Dataset.from_file(res.arrow_path)
    assert len(ds) == 2 and isinstance(ds[0]["text"], list)
    assert os.path.exists(proj / "vocab.txt") and res.vocab_size > 2000

    # char-tokenizer path builds the vocab from the data
    res2 = wb.create_metadata(str(proj), ch_tokenizer=True)
    assert res2.vocab_size == len(set(res2.new_vocab.split("\n")))
    assert res2.new_vocab


def test_calculate_train(tmp_path):
    proj = tmp_path / "p3"
    proj.mkdir()
    json.dump({"duration": [4.0] * 30}, open(proj / "duration.json", "w"))
    out = wb.calculate_train(str(proj), hbm_gb=16.0, num_chips=1)
    assert out["batch_size_per_chip"] >= 4.0 * SR / 256
    assert out["epochs"] > 0
    assert out["max_samples"] == int(30 * 0.25)
    assert out["learning_rate"] == 1e-5
    out2 = wb.calculate_train(str(proj), batch_size_type="sample",
                              finetune=False, hbm_gb=16.0)
    assert out2["batch_size_per_chip"] == int(200 / 4.0)
    assert out2["learning_rate"] == 7.5e-5


def test_vocab_check_and_extend(tmp_path):
    proj = tmp_path / "p4"
    proj.mkdir()
    base = tmp_path / "base_vocab.txt"
    base.write_text("a\nb\nc\n d\n", encoding="utf-8")
    with open(proj / "metadata.csv", "w", encoding="utf-8-sig") as f:
        f.write("x|abc\n")
        f.write("y|abz\n")
    info, missing = wb.vocab_check(str(proj), tokenizer_type="char",
                                   pretrained_vocab=str(base))
    assert "z" in missing and "a" not in missing

    res = wb.vocab_extend(str(proj), missing, base_vocab=str(base))
    assert res["added"] == len(missing)
    new_vocab = open(res["vocab_path"], encoding="utf-8").read().split("\n")
    assert "z" in new_vocab


def test_expand_reference_checkpoint_embeddings(tmp_path):
    torch = pytest.importorskip("torch")
    sd = {"ema_model.transformer.text_embed.text_embed.weight": torch.randn(10, 4),
          "ema_model.transformer.other.weight": torch.randn(3, 3)}
    ckpt = tmp_path / "model.pt"
    torch.save({"ema_model_state_dict": sd}, ckpt)
    out = tmp_path / "model_new.pt"
    new_size = wb.expand_reference_checkpoint_embeddings(str(ckpt), str(out), 5)
    assert new_size == 15
    re = torch.load(out, weights_only=True)["ema_model_state_dict"]
    grown = re["ema_model.transformer.text_embed.text_embed.weight"]
    assert grown.shape == (15, 4)
    np.testing.assert_array_equal(
        grown[:10].numpy(),
        sd["ema_model.transformer.text_embed.text_embed.weight"].numpy())

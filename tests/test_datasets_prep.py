"""Dataset preparation scripts -> arrow artifacts -> load_dataset roundtrip."""

import json
import os

import numpy as np

from f5tts_tpu.config import MelConfig
from f5tts_tpu.infer import audio_io
from f5tts_tpu.train.dataset import load_dataset
from f5tts_tpu.train.datasets.common import repetition_found, write_dataset
from f5tts_tpu.train.datasets.prepare_csv_wavs import prepare as prepare_csv
from f5tts_tpu.train.datasets.prepare_ljspeech import prepare as prepare_lj


def test_repetition_found():
    assert repetition_found("ababababababababababababab")
    assert not repetition_found("a normal sentence without repeats")


def _make_corpus(tmp_path, n=3):
    sr = 24000
    rng = np.random.default_rng(0)
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir(parents=True)
    lines = []
    for i in range(n):
        path = wav_dir / f"utt{i}.wav"
        audio_io.write_wav(str(path), (rng.standard_normal(sr) * 0.1).astype(np.float32), sr)
        lines.append(f"wavs/utt{i}.wav|sample text number {i}")
    (tmp_path / "metadata.csv").write_text("audio_file|text\n" + "\n".join(lines))
    return tmp_path


def test_prepare_csv_wavs_and_load(tmp_path):
    corpus = _make_corpus(tmp_path / "in")
    out = tmp_path / "data" / "mini_pinyin"
    stats = prepare_csv(str(corpus), str(out), use_pretrained_vocab=True, workers=2)
    assert stats["samples"] == 3
    assert os.path.exists(out / "raw.arrow")
    assert os.path.exists(out / "duration.json")
    assert os.path.exists(out / "vocab.txt")
    with open(out / "vocab.txt", encoding="utf-8") as f:
        assert f.readline() == " \n"  # space idx 0

    ds = load_dataset("mini", "pinyin", MelConfig(), data_root=str(tmp_path / "data"))
    assert len(ds) == 3
    assert ds.get_frame_len(0) > 0
    sample = ds[0]
    assert sample.mel.shape[1] == 100
    # prep stores the PRE-TOKENIZED pinyin list (reference
    # prepare_emilia.py:139-141) — joined it must reproduce the text
    assert isinstance(sample.text, list)
    assert "sample" in "".join(sample.text)


def test_prepare_ljspeech_format(tmp_path):
    sr = 24000
    rng = np.random.default_rng(0)
    lj = tmp_path / "LJSpeech"
    (lj / "wavs").mkdir(parents=True)
    rows = []
    for i in range(2):
        audio_io.write_wav(str(lj / "wavs" / f"LJ00{i}.wav"),
                           (rng.standard_normal(sr) * 0.1).astype(np.float32), sr)
        rows.append(f"LJ00{i}|Raw text {i}|Normalized text {i}")
    (lj / "metadata.csv").write_text("\n".join(rows))
    out = tmp_path / "data" / "LJSpeech_char"
    stats = prepare_lj(str(lj), str(out), workers=2)
    assert stats["samples"] == 2
    with open(out / "duration.json") as f:
        assert len(json.load(f)["duration"]) == 2


def test_zh_tokens_roundtrip_train_vs_inference(tmp_path):
    """Train-time token ids of a prepped ZH sample must equal inference-time
    tokenization of the raw text (the prep scripts store PRE-TOKENIZED pinyin
    lists; re-running G2P on a joined string would shred 'ni3' into
    per-ASCII-char ids)."""
    from f5tts_tpu.text.pinyin import convert_char_to_pinyin
    from f5tts_tpu.text.vocab import list_str_to_idx, load_vocab

    vocab = load_vocab("f5tts_tpu/data/vocab_emilia_pinyin.txt")
    raw = "你好世界 hello"
    stored = convert_char_to_pinyin([raw])[0]       # what prep scripts store
    assert isinstance(stored, list) and any(len(t) > 1 for t in stored)

    # inference path: tokenizes the raw string directly
    infer_ids = list_str_to_idx(convert_char_to_pinyin([raw]), vocab)

    # train path: Trainer.tokenize on the stored value
    class T:  # minimal stand-in carrying tokenize's attributes
        tokenizer = "pinyin"
        vocab_char_map = vocab

    from f5tts_tpu.train.trainer import Trainer

    train_ids = Trainer.tokenize(T(), [stored])
    np.testing.assert_array_equal(train_ids, infer_ids)


def test_prepare_csv_wavs_skips_missing_audio(tmp_path):
    """Rows with missing/unreadable audio are skipped with a count, not
    fatal (reference prepare_csv_wavs process_audio_file :77-90)."""
    corpus = _make_corpus(tmp_path / "in")
    meta = corpus / "metadata.csv"
    meta.write_text(meta.read_text() + "\nwavs/missing.wav|ghost row\n")
    out = tmp_path / "data" / "mini2_pinyin"
    stats = prepare_csv(str(corpus), str(out), use_pretrained_vocab=True,
                        workers=2)
    assert stats["samples"] == 3
    assert stats["skipped"] == 1


def test_prepare_csv_wavs_own_vocab(tmp_path):
    """--no-pretrained-vocab builds the vocab from THIS corpus (pretrain
    workflow): small, space at idx 0, covers the corpus tokens."""
    corpus = _make_corpus(tmp_path / "in")
    out = tmp_path / "data" / "mini3_pinyin"
    prepare_csv(str(corpus), str(out), use_pretrained_vocab=False, workers=2)
    with open(out / "vocab.txt", encoding="utf-8") as f:
        vocab = [line[:-1] for line in f]
    assert vocab[0] == " "
    assert len(vocab) < 40  # corpus-derived, not the 2545-token Emilia vocab
    for ch in "sample":
        assert ch in vocab

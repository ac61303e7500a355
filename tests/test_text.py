"""Tokenizer, vocab, pinyin conversion, and text chunking."""

import numpy as np

from f5tts_tpu.infer.pipeline import chunk_text, cross_fade, estimate_duration_frames, max_chars_for_ref
from f5tts_tpu.text.pinyin import convert_char_to_pinyin, is_chinese
from f5tts_tpu.text.vocab import list_str_to_idx, list_str_to_tensor, load_vocab


VOCAB_PATH = "f5tts_tpu/data/vocab_emilia_pinyin.txt"


def test_load_vocab_space_idx0():
    vocab = load_vocab(VOCAB_PATH)
    assert vocab[" "] == 0
    assert len(vocab) == 2545


def test_list_str_to_idx_padding():
    vocab = load_vocab(VOCAB_PATH)
    out = list_str_to_idx(["ab", "a"], vocab)
    assert out.shape == (2, 2)
    assert out[1, 1] == -1
    assert out[0, 0] == vocab["a"]
    # unknown char -> 0
    out2 = list_str_to_idx([["☃"]], vocab)  # snowman not in vocab
    assert out2[0, 0] == 0


def test_list_str_to_tensor_bytes():
    out = list_str_to_tensor(["hi", "a"])
    np.testing.assert_array_equal(out[0], [104, 105])
    assert out[1, 1] == -1


def test_convert_char_to_pinyin_english():
    out = convert_char_to_pinyin(["hello world"])
    assert out[0] == list("hello") + [" "] + list("world") or "hello" in "".join(out[0])
    # ascii chars are separate tokens
    assert all(len(t) == 1 or t == " " or not t.isascii() for t in out[0])


def test_convert_char_to_pinyin_chinese_passthrough_or_g2p():
    # with jieba + no pinyin dict, chars pass through; with pypinyin they map
    # to TONE3 syllables. Both are one-token-per-char with a leading space.
    out = convert_char_to_pinyin(["你好"])[0]
    assert out[0] == " "
    assert len([t for t in out if t != " "]) == 2


def test_is_chinese():
    assert is_chinese("你")
    assert not is_chinese("a")


def test_chunk_text_byte_budget():
    text = "One sentence. Two sentence. Three sentence. Four sentence."
    chunks = chunk_text(text, max_chars=30)
    assert len(chunks) >= 2
    assert all(len(c.encode("utf-8")) <= 32 for c in chunks)
    # no text lost
    joined = " ".join(chunks).replace("  ", " ")
    for word in ["One", "Two", "Three", "Four"]:
        assert word in joined


def test_duration_estimate():
    # reference formula: ref_frames + ref_frames/ref_bytes * gen_bytes / speed
    d = estimate_duration_frames(100, "abcdefghij", "abcdefghijabcdefghij", speed=1.0)
    assert d == 100 + int(100 / 10 * 20)
    # short gen text (<10 bytes) -> speed forced to 0.3
    d2 = estimate_duration_frames(100, "abcdefghij", "ab", speed=1.0)
    assert d2 == 100 + int(100 / 10 * 2 / 0.3)
    # fix_duration overrides
    assert estimate_duration_frames(100, "a", "b", fix_duration_secs=2.0) == int(2.0 * 24000 / 256)


def test_max_chars_formula():
    assert max_chars_for_ref("x" * 40, 8.0, 1.0) == int(40 / 8.0 * 14)


def test_cross_fade():
    sr = 100
    a = np.ones(100, np.float32)
    b = np.ones(100, np.float32) * 3
    out = cross_fade([a, b], sr, duration=0.5)
    assert len(out) == 150
    np.testing.assert_allclose(out[:50], 1.0)
    np.testing.assert_allclose(out[100:], 3.0)
    # monotone ramp across the overlap
    assert out[70] > out[60]


def test_cross_fade_empty_and_single():
    assert len(cross_fade([], 100)) == 0
    a = np.ones(10, np.float32)
    np.testing.assert_array_equal(cross_fade([a], 100), a)

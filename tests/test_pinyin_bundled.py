"""Bundled pinyin G2P backend (no pypinyin): dict coverage, sandhi, vocab
validity.

Reference behavior: convert_char_to_pinyin (utils.py:148-185) =
jieba-segment -> lazy_pinyin(TONE3, tone_sandhi=True) per segment. The
bundled backend mirrors it with a 3000-char table + 535-word heteronym
table + rule-based 不/一/third-tone sandhi.
"""

import os

import pytest

from f5tts_tpu.text import pinyin as P


@pytest.fixture(autouse=True)
def force_bundled(monkeypatch):
    # pypinyin is absent in this image; pin that assumption so the tests
    # exercise the bundled backend even if it appears later
    monkeypatch.setattr(P, "_pypinyin", lambda: None)
    yield


def convert(text):
    return P.convert_char_to_pinyin([text])[0]


def test_basic_tone3():
    assert "".join(convert("我们是朋友")) == " wo3 men shi4 peng2 you3"


def test_third_tone_sandhi():
    assert "".join(convert("你好")) == " ni2 hao3"


def test_bu_sandhi():
    out = "".join(convert("不是不好"))
    assert "bu2 shi4" in out  # 不 + tone4 -> bu2
    assert "bu4 hao3" in out  # 不 + tone3 stays bu4


def test_yi_sandhi():
    assert "yi2 ge4" in "".join(convert("一个人"))      # before tone 4
    assert "yi4 qi3" in "".join(convert("一起去"))      # before tone 3
    assert "di4 yi1" in "".join(convert("第一名"))      # ordinal keeps yi1


def test_heteronym_words():
    assert "yin2 hang2" in "".join(convert("在银行上班"))
    assert "chong2 qing4" in "".join(convert("重庆火锅"))
    assert "yin1 yue4" in "".join(convert("听音乐"))
    assert "zhang3 da4" in "".join(convert("孩子长大了"))


def test_neutral_suffix_words():
    out = "".join(convert("桌子上有石头"))
    assert "zhuo1 zi" in out and "shi2 tou" in out


def test_compound_segment_longest_match():
    # segments not in the word table decompose by longest match first
    assert "chu2 li3" in "".join(convert("处理结果"))


def test_all_readings_in_vocab():
    vocab_path = os.path.join(os.path.dirname(P.__file__), "..", "data",
                              "vocab_emilia_pinyin.txt")
    vocab = set(open(vocab_path, encoding="utf-8").read().split("\n"))
    text = ("今天天气很好我们一起去公园散步然后在银行旁边的音乐厅听了一场"
            "音乐会重庆的孩子们都喜欢吃火锅不过天气太热了")
    for tok in convert(text):
        if tok != " ":
            assert tok in vocab, tok


def test_bundled_tables_are_vocab_valid():
    P._ensure_dict()
    vocab_path = os.path.join(os.path.dirname(P.__file__), "..", "data",
                              "vocab_emilia_pinyin.txt")
    vocab = set(open(vocab_path, encoding="utf-8").read().split("\n"))
    assert len(P._pinyin_dict) >= 3000
    assert len(P._pinyin_words) >= 500
    for r in P._pinyin_dict.values():
        assert r in vocab, r
    for w, rs in P._pinyin_words.items():
        assert len(rs) == len(w)
        for r in rs:
            assert r in vocab, (w, r)


def test_user_dict_overlays_bundled(tmp_path):
    p = tmp_path / "user.tsv"
    p.write_text("我\tWO3X\n", encoding="utf-8")
    try:
        P.set_pinyin_dict(str(p))
        assert P._pinyin_dict["我"] == "WO3X"
        assert P._pinyin_dict["你"] == "ni3"  # bundled entries survive
    finally:
        P._pinyin_dict = None
        P._ensure_dict()

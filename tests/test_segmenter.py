"""Native C++ segmenter vs python jieba."""

import pytest

jieba = pytest.importorskip("jieba")


def test_native_segmenter_matches_jieba():
    """Default behavior matches jieba's default (HMM enabled) cut."""
    from f5tts_tpu.native.segmenter import cut

    jieba.setLogLevel(60)
    for text in ["我来到北京清华大学", "这是一个分词测试", "对万人敬仰的太乙真人"]:
        ours = cut(text)
        theirs = list(jieba.cut(text, HMM=True))
        assert ours == theirs, (text, ours, theirs)


def test_native_segmenter_ascii_runs():
    from f5tts_tpu.native.segmenter import cut

    assert cut("hello world") == ["hello", " ", "world"]
    assert cut("abc123 3.14") == ["abc123", " ", "3.14"]
    assert cut("") == []


def test_pinyin_uses_some_segmenter():
    from f5tts_tpu.text.pinyin import convert_char_to_pinyin

    out = convert_char_to_pinyin(["hello 世界"])[0]
    assert "h" in out and " " in out


def test_native_segmenter_matches_jieba_hmm():
    """OOV runs go through the BMES viterbi (jieba finalseg semantics)."""
    from f5tts_tpu.native.segmenter import cut

    jieba.setLogLevel(60)
    for text in ["他来到了网易杭研大厦",         # 杭研 is OOV -> HMM merge
                 "小明硕士毕业于中国科学院计算所",
                 "这是一个伸手不见五指的黑夜"]:
        assert cut(text) == list(jieba.cut(text, HMM=True)), text

"""Chinese G2P: char -> pinyin token conversion with word segmentation.

Behavioral parity with reference convert_char_to_pinyin
(src/f5_tts/model/utils.py:148-185):

- custom punctuation translation (; -> , and CJK quote normalization)
- word segmentation (reference: rjieba, a Rust extension; here: the native
  C++ segmenter in f5tts_tpu/native/segmenter when built, else python jieba,
  else a per-character fallback)
- three branches per segment: pure-ASCII (spaces between words), pure-CJK
  (pinyin per char, space before each), mixed (char-wise)
- pinyin style TONE3 with tone sandhi (reference: pypinyin lazy_pinyin)

G2P backends (in priority order):
1. pypinyin (if installed) — exact reference behavior
2. a user-supplied TSV dictionary (char<TAB>pinyin_tone3), e.g. derived from
   Unihan kMandarin; set via `set_pinyin_dict(path)` or F5TTS_PINYIN_DICT
3. none — Chinese characters pass through unchanged (still valid tokens if
   the vocab contains them; pinyin vocab coverage then requires 1 or 2)
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Iterable, Optional

_CUSTOM_TRANS = str.maketrans({";": ",", "“": '"', "”": '"', "‘": "'", "’": "'"})

_pinyin_dict: Optional[dict[str, str]] = None


def is_chinese(c: str) -> bool:
    # reference utils.py:154-157: common chinese character range
    return "㄀" <= c <= "鿿"


def set_pinyin_dict(path: str) -> None:
    """Load a char<TAB>pinyin(TONE3) dictionary for the fallback G2P backend."""
    global _pinyin_dict
    d: dict[str, str] = {}
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= 2 and parts[0]:
                d[parts[0]] = parts[1]
    _pinyin_dict = d


@lru_cache(maxsize=1)
def _pypinyin():
    try:
        from pypinyin import Style, lazy_pinyin  # noqa: F401

        return lazy_pinyin, Style
    except ImportError:
        return None


def _ensure_dict():
    global _pinyin_dict
    if _pinyin_dict is None:
        path = os.environ.get("F5TTS_PINYIN_DICT")
        if path and os.path.exists(path):
            set_pinyin_dict(path)


def g2p(segment: str) -> list[str]:
    """Chinese string -> list of TONE3 pinyin syllables (one per char)."""
    pp = _pypinyin()
    if pp is not None:
        lazy_pinyin, Style = pp
        return lazy_pinyin(segment, style=Style.TONE3, tone_sandhi=True)
    _ensure_dict()
    if _pinyin_dict is not None:
        return [_pinyin_dict.get(c, c) for c in segment]
    return list(segment)  # passthrough: no G2P backend available


@lru_cache(maxsize=1)
def _segmenter():
    """Native C++ segmenter if built, else python jieba, else char-split."""
    try:
        from f5tts_tpu.native.segmenter import cut as native_cut

        return native_cut
    except Exception:
        pass
    try:
        import jieba

        jieba.setLogLevel(60)
        return lambda s: list(jieba.cut(s))
    except ImportError:
        return lambda s: list(s)


def segment(text: str) -> Iterable[str]:
    return _segmenter()(text)


def convert_char_to_pinyin(text_list: list[str], polyphone: bool = True) -> list[list[str]]:
    """Reference utils.py:148-185 semantics; returns per-text token lists."""
    final: list[list[str]] = []
    for text in text_list:
        char_list: list[str] = []
        text = text.translate(_CUSTOM_TRANS)
        for seg in segment(text):
            seg_byte_len = len(bytes(seg, "utf-8"))
            if seg_byte_len == len(seg):  # pure ascii
                if char_list and seg_byte_len > 1 and char_list[-1] not in " :'\"":
                    char_list.append(" ")
                char_list.extend(seg)
            elif polyphone and seg_byte_len == 3 * len(seg):  # pure CJK
                seg_pinyin = g2p(seg)
                for i, c in enumerate(seg):
                    if is_chinese(c):
                        char_list.append(" ")
                    char_list.append(seg_pinyin[i])
            else:  # mixed
                for c in seg:
                    if ord(c) < 256:
                        char_list.extend(c)
                    elif is_chinese(c):
                        char_list.append(" ")
                        char_list.extend(g2p(c))
                    else:
                        char_list.append(c)
        final.append(char_list)
    return final

"""ctypes bindings for the native C++ segmenter.

Builds lazily with g++ on first import (cached as libsegmenter.so next to
this file). The dictionary defaults to python-jieba's bundled dict.txt when
present, or F5TTS_SEGMENTER_DICT. Raises ImportError when unusable so
text.pinyin falls back to python jieba.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libsegmenter.so")
_SRC = os.path.join(_HERE, "segmenter.cc")

_BUF_CAP = 1 << 20


def build(force: bool = False) -> str:
    if force or not os.path.exists(_SO) or (
            os.path.exists(_SRC) and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True,
        )
    return _SO


def _find_dict() -> str:
    path = os.environ.get("F5TTS_SEGMENTER_DICT")
    if path and os.path.exists(path):
        return path
    try:
        import jieba

        cand = os.path.join(os.path.dirname(jieba.__file__), "dict.txt")
        if os.path.exists(cand):
            return cand
    except ImportError:
        pass
    raise ImportError("no segmenter dictionary found (set F5TTS_SEGMENTER_DICT)")


def _export_hmm(path: str) -> bool:
    """Dump jieba's finalseg BMES tables (start/transition/emission log
    probs — data files of the installed package) to the TSV the C++ side
    loads. Returns False when jieba isn't available."""
    try:
        from jieba.finalseg import prob_emit, prob_start, prob_trans
    except ImportError:
        return False
    with open(path, "w", encoding="utf-8") as f:
        for s, p in prob_start.P.items():
            f.write(f"S {s} {p!r}\n")
        for a, row in prob_trans.P.items():
            for b_, p in row.items():
                f.write(f"T {a} {b_} {p!r}\n")
        for s, row in prob_emit.P.items():
            for ch, p in row.items():
                if ch.strip():
                    f.write(f"E {s} {ch} {p!r}\n")
    return True


_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    try:
        so = build()
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        raise ImportError(f"failed to build native segmenter: {e}") from e
    lib = ctypes.CDLL(so)
    lib.seg_load_dict.argtypes = [ctypes.c_char_p]
    lib.seg_load_dict.restype = ctypes.c_int
    lib.seg_load_hmm.argtypes = [ctypes.c_char_p]
    lib.seg_load_hmm.restype = ctypes.c_int
    lib.seg_cut.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
    lib.seg_cut.restype = ctypes.c_int
    n = lib.seg_load_dict(_find_dict().encode())
    if n <= 0:
        raise ImportError("native segmenter failed to load dictionary")
    hmm_path = os.path.join(_HERE, "hmm_model.tsv")
    if not os.path.exists(hmm_path):
        _export_hmm(hmm_path)
    if os.path.exists(hmm_path):
        lib.seg_load_hmm(hmm_path.encode())  # optional: OOV viterbi
    _lib = lib
    return lib


def cut(text: str) -> list[str]:
    lib = _load()
    buf = ctypes.create_string_buffer(_BUF_CAP)
    n = lib.seg_cut(text.encode("utf-8"), buf, _BUF_CAP)
    if n < 0:
        raise RuntimeError("segmenter error (buffer overflow or no dict)")
    if n == 0:
        return []
    return buf.value.decode("utf-8").split("\x01")

"""Vocab loading and text -> id tokenization.

Behavioral parity with reference src/f5_tts/model/utils.py:
- load_vocab / get_tokenizer (:112-142): one token per line, index = line
  number, space must be index 0 (0 doubles as the unknown-char fallback).
- list_str_to_idx (:99-106): per-char (or per-pinyin-token) lookup with
  unknown -> 0, batch padded with -1.
- list_str_to_tensor (:92-95): ByT5-style raw UTF-8 byte fallback.

Outputs are numpy int32 arrays (host-side preprocessing; device code takes
the padded id matrix).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def load_vocab(path: str) -> dict[str, int]:
    vocab: dict[str, int] = {}
    with open(path, "r", encoding="utf-8") as f:
        for i, line in enumerate(f):
            vocab[line[:-1]] = i  # strip only the trailing newline; " " stays " "
    return vocab


def get_tokenizer(dataset_or_path: str, tokenizer: str = "pinyin",
                  data_root: Optional[str] = None):
    """Returns (vocab_char_map | None, vocab_size).

    - "pinyin"/"char": loads data/<name>_<tokenizer>/vocab.txt under data_root
    - "byte": utf-8 bytes, vocab 256
    - "custom": dataset_or_path is a direct path to vocab.txt
    """
    if tokenizer in ("pinyin", "char"):
        root = data_root or os.environ.get("F5TTS_DATA_ROOT", "data")
        path = os.path.join(root, f"{dataset_or_path}_{tokenizer}", "vocab.txt")
        vocab = load_vocab(path)
        assert vocab.get(" ") == 0, "space must be idx 0 in vocab.txt (0 = unknown)"
        return vocab, len(vocab)
    if tokenizer == "byte":
        return None, 256
    if tokenizer == "custom":
        vocab = load_vocab(dataset_or_path)
        return vocab, len(vocab)
    raise ValueError(f"unknown tokenizer: {tokenizer}")


def list_str_to_idx(
    texts: Sequence[str] | Sequence[list[str]],
    vocab_char_map: dict[str, int],
    padding_value: int = -1,
    pad_to: Optional[int] = None,
) -> np.ndarray:
    """[b] list of char-lists (or strings) -> [b, nt] int32, -1 padded.

    `pad_to` additionally right-pads to a fixed width (compile-bucket shapes).
    """
    rows = [[vocab_char_map.get(c, 0) for c in t] for t in texts]
    width = max((len(r) for r in rows), default=0)
    if pad_to is not None:
        width = max(width, pad_to)
    out = np.full((len(rows), width), padding_value, dtype=np.int32)
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
    return out


def list_str_to_tensor(texts: Sequence[str], padding_value: int = -1,
                       pad_to: Optional[int] = None) -> np.ndarray:
    """UTF-8 byte tokenization (ByT5 style)."""
    rows = [list(bytes(t, "utf-8")) for t in texts]
    width = max((len(r) for r in rows), default=0)
    if pad_to is not None:
        width = max(width, pad_to)
    out = np.full((len(rows), width), padding_value, dtype=np.int32)
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
    return out

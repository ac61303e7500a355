"""CTC forced alignment (infer/align.py): the segmentation DP on synthetic
logits, char-span mapping, and the speech-edit text-span wiring.

The acoustic (wav2vec2) leg is weights-gated and not executable in this
image; everything below drives the pure DP/span core the gated leg feeds.
"""

import itertools

import numpy as np
import pytest

from f5tts_tpu.infer.align import (CharSpan, align_with_logits,
                                   ctc_viterbi_align, spans_for_edits)


def _peaked_logits(frame_labels, vocab_size, hot=8.0):
    """Log-probs strongly peaked on the given per-frame labels."""
    T = len(frame_labels)
    lp = np.full((T, vocab_size), -hot, np.float32)
    for t, lab in enumerate(frame_labels):
        lp[t, lab] = 0.0
    return lp


def test_viterbi_recovers_planted_path():
    # frames: b b 1 1 b 2 b 3 3 b  (b = blank 0)
    frames = [0, 0, 1, 1, 0, 2, 0, 3, 3, 0]
    lp = _peaked_logits(frames, vocab_size=5)
    spans = ctc_viterbi_align(lp, [1, 2, 3])
    assert spans == [(2, 4), (5, 6), (7, 9)]


def test_viterbi_repeated_token_requires_blank():
    # tokens (1, 1): the CTC collapse rule forces a blank between them, so
    # a frame sequence 1 1 1 1 must split around the best blank frame
    frames = [1, 1, 0, 1, 1]
    lp = _peaked_logits(frames, vocab_size=3)
    spans = ctc_viterbi_align(lp, [1, 1])
    assert spans == [(0, 2), (3, 5)]
    # and with no blank frame at all the path still must insert one
    lp2 = _peaked_logits([1, 1, 1], vocab_size=3)
    s2 = ctc_viterbi_align(lp2, [1, 1])
    assert s2[0][1] <= s2[1][0]  # non-overlapping, ordered
    assert s2[0][0] == 0 and s2[1][1] == 3


def test_viterbi_spans_monotonic_on_random_logits():
    rng = np.random.default_rng(0)
    lp = np.log(rng.dirichlet(np.ones(6), size=40)).astype(np.float32)
    tokens = [3, 1, 1, 5, 2]
    spans = ctc_viterbi_align(lp, tokens)
    assert len(spans) == len(tokens)
    prev_end = 0
    for f0, f1 in spans:
        assert 0 <= f0 < f1 <= 40
        assert f0 >= prev_end
        prev_end = f1


def _brute_force_best(lp, tokens, blank=0):
    """Enumerate ALL frame label sequences, keep those collapsing to
    `tokens`, return the max path log-prob. Tiny shapes only."""
    T, V = lp.shape
    best = -np.inf
    for path in itertools.product(range(V), repeat=T):
        collapsed = [k for k, _ in itertools.groupby(path) if k != blank]
        if collapsed != list(tokens):
            continue
        score = sum(lp[t, path[t]] for t in range(T))
        best = max(best, score)
    return best


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_viterbi_matches_brute_force(seed):
    """The DP's chosen path must be THE best valid CTC path (checked by
    exhaustive enumeration at tiny T/V/L)."""
    rng = np.random.default_rng(seed)
    T, V = 6, 3
    lp = np.log(rng.dirichlet(np.ones(V), size=T)).astype(np.float32)
    tokens = [1, 2]
    spans = ctc_viterbi_align(lp, tokens)
    # reconstruct the DP path score from the spans: frames inside a span
    # emit the token, frames outside emit blank... the spans alone don't
    # pin blank-vs-stay inside a span, so recompute by running the DP's
    # implied label per frame: token i on [f0, f1), blank elsewhere.
    labels = np.zeros(T, np.int64)
    for tok, (f0, f1) in zip(tokens, spans):
        labels[f0:f1] = tok
    dp_score = sum(lp[t, labels[t]] for t in range(T))
    bf = _brute_force_best(lp, tokens)
    np.testing.assert_allclose(dp_score, bf, rtol=1e-6)


def test_viterbi_raises_when_too_few_frames():
    lp = _peaked_logits([1, 2], vocab_size=4)
    with pytest.raises(ValueError):
        ctc_viterbi_align(lp, [1, 2, 3])


def test_align_with_logits_char_spans():
    vocab = {"a": 1, "b": 2, "c": 3}
    #        a  a  b     b  c  (space and "!" not in vocab)
    frames = [1, 1, 0, 2, 0, 2, 3, 0]
    lp = _peaked_logits(frames, vocab_size=4)
    spans = align_with_logits(lp, "ab bc!", vocab, frame_sec=0.5)
    assert [c.char for c in spans] == list("ab bc!")
    assert spans[0].start_s == 0.0 and spans[0].end_s == 1.0       # 'a' [0,2)
    assert spans[2].start_s is None                                 # space
    assert spans[5].start_s is None                                 # '!'
    assert spans[4].start_s == 3.0 and spans[4].end_s == 3.5        # 'c' [6,7)


def test_spans_for_edits_substring_and_ranges():
    spans = [
        CharSpan("h", 0.0, 0.2), CharSpan("i", 0.2, 0.4),
        CharSpan(" ", None, None),
        CharSpan("y", 0.5, 0.7), CharSpan("o", 0.7, 0.9),
    ]
    # substring lookup bridges the unaligned space via neighbours in range
    out = spans_for_edits(spans, ["i yo"])
    assert out == [(0.2, 0.9)]
    # explicit char range
    out2 = spans_for_edits(spans, [(0, 2)])
    assert out2 == [(0.0, 0.4)]
    # duplicate substring resolves left-to-right
    spans2 = spans + [CharSpan("h", 1.0, 1.1), CharSpan("i", 1.1, 1.3)]
    out3 = spans_for_edits(spans2, ["hi", "hi"])
    assert out3 == [(0.0, 0.4), (1.0, 1.3)]
    with pytest.raises(ValueError):
        spans_for_edits(spans, [(2, 3)])  # only the unaligned space inside


def test_edit_speech_by_text_wiring():
    """edit_speech_by_text maps text edits -> seconds -> edit_speech."""
    from tests.test_infer_extras import _pipeline
    from f5tts_tpu.infer.speech_edit import edit_speech_by_text

    pipe = _pipeline()
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(24000) * 0.05).astype(np.float32)
    text = "hello there"
    char_spans = [CharSpan(c, 0.08 * i, 0.08 * (i + 1))
                  for i, c in enumerate(text)]
    out, sr = edit_speech_by_text(
        pipe, wav, 24000, text, "hello world", ["there"],
        fix_durations=[0.3], char_spans=char_spans, nfe_step=2)
    assert sr == 24000 and np.isfinite(out).all() and len(out) > 10000


def test_align_text_gated_without_weights():
    """No network/weights in this image: the acoustic leg must raise a
    clear RuntimeError, never silently mis-align."""
    from f5tts_tpu.infer.align import load_alignment_model

    with pytest.raises(RuntimeError, match="unavailable"):
        load_alignment_model("definitely/not-a-model")

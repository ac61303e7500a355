"""Multi-speech-type engine tests (reference infer_gradio.py:349-689 parity)."""

import json

import numpy as np
import pytest

from f5tts_tpu.infer.multistyle import (MultistyleResult, SpeechSegment,
                                        SpeechType, collect_speech_types,
                                        parse_speechtypes_text,
                                        synthesize_multistyle)


# ---------------------------------------------------------------- parsing

def test_parse_simple_tags():
    segs = parse_speechtypes_text(
        "{Regular} Hello there. {Angry} Darn you! {Whisper} bye")
    assert [(s.name, s.text) for s in segs] == [
        ("Regular", "Hello there."), ("Angry", "Darn you!"), ("Whisper", "bye")]
    assert all(s.seed == -1 and s.speed == 1.0 for s in segs)


def test_parse_untagged_prefix_defaults_to_regular():
    segs = parse_speechtypes_text("plain lead-in {Sad} after")
    assert segs[0] == SpeechSegment("Regular", -1, 1.0, "plain lead-in")
    assert segs[1].name == "Sad"


def test_parse_sticky_type_across_lines():
    segs = parse_speechtypes_text("{Shouting} one\ntwo {Calm} three")
    # "one\ntwo" is a single inter-tag chunk -> one segment
    assert [(s.name, s.text) for s in segs] == [
        ("Shouting", "one\ntwo"), ("Calm", "three")]


def test_parse_json_tag_with_seed_and_speed():
    segs = parse_speechtypes_text(
        '{"name": "Speaker1_Happy", "seed": 7, "speed": 1.5} hi '
        '{"name": "Speaker2", "seed": -1, "speed": 1} yo')
    assert segs[0] == SpeechSegment("Speaker1_Happy", 7, 1.5, "hi")
    assert segs[1] == SpeechSegment("Speaker2", -1, 1.0, "yo")


def test_parse_json_tag_missing_keys_get_defaults():
    segs = parse_speechtypes_text('{"name": "X"} hello')
    assert segs[0] == SpeechSegment("X", -1, 1.0, "hello")


def test_parse_malformed_json_falls_back_to_literal_name():
    # not valid JSON -> treated as a simple {Name} tag (reference behavior)
    segs = parse_speechtypes_text("{not json: here} text")
    assert segs[0].name == "not json: here"


def test_parse_adjacent_tags_and_empty_chunks():
    segs = parse_speechtypes_text("{A}{B} only b")
    assert [(s.name, s.text) for s in segs] == [("B", "only b")]
    assert parse_speechtypes_text("   ") == []


# ---------------------------------------------------------------- collect

def test_collect_speech_types_placeholders_keep_row_alignment():
    types = collect_speech_types(
        ["Regular", "", "Angry"], ["a.wav", "b.wav", ""], ["ra", "rb", "rc"])
    keys = list(types)
    assert keys == ["Regular", "@1@", "@2@"]
    assert types["Regular"] == SpeechType("a.wav", "ra")
    assert types["@2@"].audio == ""


# ---------------------------------------------------------------- synth

def _fake_infer(calls, sr=24000):
    def infer_fn(audio, ref_text, text, seed, speed):
        calls.append(dict(audio=audio, ref_text=ref_text, text=text,
                          seed=seed, speed=speed))
        # transcription kicks in when ref_text empty
        out_ref = ref_text or f"transcribed:{audio}"
        return sr, np.full(4, float(len(calls)), np.float32), out_ref, seed
    return infer_fn


def test_synthesize_concatenates_and_records_metadata():
    calls = []
    types = collect_speech_types(
        ["Regular", "Angry"], ["r.wav", "a.wav"], ["ref r", ""])
    res = synthesize_multistyle(
        "{Regular} one {Angry} two", types, _fake_infer(calls),
        rng=np.random.default_rng(0))
    assert res.sample_rate == 24000
    assert res.wave is not None and res.wave.shape == (8,)
    np.testing.assert_array_equal(res.wave[:4], 1.0)
    np.testing.assert_array_equal(res.wave[4:], 2.0)
    lines = [json.loads(l.split("} ", 1)[0] + "}")
             for l in res.metadata.strip().splitlines()]
    assert [l["name"] for l in lines] == ["Regular", "Angry"]
    assert calls[0]["audio"] == "r.wav" and calls[1]["audio"] == "a.wav"
    assert not res.warnings


def test_synthesize_unknown_type_falls_back_to_default_with_warning():
    calls = []
    types = collect_speech_types(["Regular"], ["r.wav"], ["ref"])
    res = synthesize_multistyle(
        "{Ghost} boo", types, _fake_infer(calls), rng=np.random.default_rng(0))
    assert res.wave is not None
    assert calls[0]["audio"] == "r.wav"
    assert any("Ghost" in w for w in res.warnings)


def test_synthesize_missing_default_audio_aborts_with_ref_texts():
    types = collect_speech_types(["", "Angry"], ["", "a.wav"], ["", "ra"])
    res = synthesize_multistyle(
        "untagged needs Regular", types, _fake_infer([]))
    assert res.wave is None
    assert res.ref_texts == ["", "ra"]
    assert any("reference audio" in w for w in res.warnings)


def test_synthesize_seed_minus_one_draws_random_fixed_seed_passthrough():
    calls = []
    types = collect_speech_types(["Regular"], ["r.wav"], ["ref"])
    synthesize_multistyle(
        '{"name": "Regular", "seed": 42, "speed": 2.0} a {Regular} b',
        types, _fake_infer(calls), rng=np.random.default_rng(5))
    assert calls[0]["seed"] == 42 and calls[0]["speed"] == 2.0
    assert calls[1]["seed"] != -1  # randomized
    # determinism under an injected rng
    calls2 = []
    types2 = collect_speech_types(["Regular"], ["r.wav"], ["ref"])
    synthesize_multistyle(
        '{"name": "Regular", "seed": 42, "speed": 2.0} a {Regular} b',
        types2, _fake_infer(calls2), rng=np.random.default_rng(5))
    assert calls2[1]["seed"] == calls[1]["seed"]


def test_synthesize_caches_transcribed_ref_text_per_type():
    calls = []
    types = collect_speech_types(["Regular"], ["r.wav"], [""])
    res = synthesize_multistyle(
        "{Regular} a {Regular} b", types, _fake_infer(calls))
    # second segment reuses the transcription written back by the first
    assert calls[0]["ref_text"] == ""
    assert calls[1]["ref_text"] == "transcribed:r.wav"
    assert res.ref_texts == ["transcribed:r.wav"]


def test_synthesize_empty_text_warns_no_audio():
    types = collect_speech_types(["Regular"], ["r.wav"], ["ref"])
    res = synthesize_multistyle("", types, _fake_infer([]))
    assert res.wave is None
    assert any("No audio" in w for w in res.warnings)

"""Voice-chat engine (infer/voice_chat.py) with stubbed ASR/chat/TTS."""

import numpy as np

from f5tts_tpu.infer.voice_chat import DEFAULT_SYSTEM_PROMPT, VoiceChatEngine


def _engine():
    calls = {"tts": [], "chat": [], "asr": []}

    def tts(ref_wav, ref_sr, ref_text, gen_text):
        calls["tts"].append(gen_text)
        return np.zeros(2400, np.float32), 24000

    def chat(messages):
        calls["chat"].append(messages)
        return f"reply#{len(calls['chat'])}"

    def asr(wav, sr):
        calls["asr"].append((len(wav), sr))
        return "transcribed words"

    return VoiceChatEngine(tts=tts, chat=chat, asr=asr), calls


def test_text_turn_threads_history_and_speaks_reply():
    eng, calls = _engine()
    ref = np.zeros(24000, np.float32)
    reply, wav, sr = eng.respond_to_text("hello", ref, 24000, "a ref.")
    assert reply == "reply#1" and sr == 24000 and len(wav) == 2400
    assert calls["tts"] == ["reply#1"]
    # system prompt leads, history empty on first turn
    msgs = calls["chat"][0]
    assert msgs[0] == {"role": "system", "content": DEFAULT_SYSTEM_PROMPT}
    assert msgs[-1] == {"role": "user", "content": "hello"}
    # second turn carries the first exchange
    eng.respond_to_text("again", ref, 24000, "a ref.")
    msgs2 = calls["chat"][1]
    assert {"role": "assistant", "content": "reply#1"} in msgs2
    assert len(eng.history) == 4


def test_audio_turn_transcribes_then_responds():
    eng, calls = _engine()
    ref = np.zeros(24000, np.float32)
    transcript, reply, wav, sr = eng.respond_to_audio(
        np.zeros(16000, np.float32), 16000, ref, 24000, "a ref.")
    assert transcript == "transcribed words"
    assert calls["asr"] == [(16000, 16000)]
    assert calls["chat"][0][-1]["content"] == "transcribed words"
    assert reply == "reply#1"


def test_reset_clears_history():
    eng, _ = _engine()
    ref = np.zeros(24000, np.float32)
    eng.respond_to_text("hello", ref, 24000, "r.")
    eng.reset()
    assert eng.history == []

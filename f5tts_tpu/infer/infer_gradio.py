"""Gradio web UI for zero-shot TTS.

Rebuild of reference src/f5_tts/infer/infer_gradio.py: Basic-TTS tab
(ref audio + ref text + gen text -> audio, with advanced settings), and a
Multi-Speech-Type tab driving the reference's `{Type}` / JSON tag syntax
(parsing + synthesis loop live in infer/multistyle.py, UI-independent and
CPU-tested). The reference's Voice-Chat tab (Qwen2.5-3B) is provided behind
the same optional gating.

gradio is an optional dependency; importing this module without it raises a
clear error. Launch:
    python -m f5tts_tpu.infer.infer_gradio --model F5TTS_v1_Base --ckpt_file ...
"""

from __future__ import annotations

import argparse
from functools import lru_cache

try:
    import gradio as gr
except ImportError as e:  # pragma: no cover - optional dep
    raise ImportError(
        "gradio is required for the web UI: pip install gradio"
    ) from e

import numpy as np

from f5tts_tpu.infer import audio_io, multistyle
from f5tts_tpu.infer.api import F5TTS


def build_app(tts: F5TTS) -> "gr.Blocks":
    @lru_cache(maxsize=8)
    def _load_ref(path: str):
        wav, sr = audio_io.read_wav(path)
        return audio_io.clip_ref_audio(wav, sr), sr

    def basic_tts(ref_audio, ref_text, gen_text, remove_silence,
                  cross_fade_duration, nfe_step, speed, seed):
        # empty ref text -> transcribe (the UI label promises it; reference
        # infer_gradio routes through preprocess_ref_audio_text). Without
        # this, a 2-byte ". " ref text blows up the byte-ratio duration
        # estimate into ~44 s hallucinated chunks.
        from f5tts_tpu.infer.asr import preprocess_ref_audio_text

        wav, sr, ref_text = preprocess_ref_audio_text(ref_audio, ref_text or "")
        out, out_sr, _ = tts.pipeline.infer(
            wav, sr, ref_text,
            seed=int(seed) if seed else 0,
            nfe_step=int(nfe_step), speed=speed,
            cross_fade_duration=cross_fade_duration,
        )
        if remove_silence:
            out = audio_io.remove_silence_edges(out, out_sr)
        return (out_sr, out)

    MAX_TYPES = 10  # reference allows 100; the engine itself is unbounded

    def _multistyle_infer(audio_path, ref_text, text, seed, speed):
        # adapter: path + cached transcription -> pipeline (engine contract)
        from f5tts_tpu.infer.asr import preprocess_ref_audio_text

        wav, sr, ref_text = preprocess_ref_audio_text(audio_path, ref_text or "")
        out, out_sr, _ = tts.pipeline.infer(
            wav, sr, ref_text, text, seed=int(seed), speed=float(speed),
            cross_fade_duration=0.0)
        return out_sr, out, ref_text, int(seed)

    def multi_tts(gen_text, remove_silence, *rows):
        # rows: names, audios, ref_texts as three parallel MAX_TYPES slices
        names = list(rows[:MAX_TYPES])
        audios = list(rows[MAX_TYPES : 2 * MAX_TYPES])
        ref_texts = list(rows[2 * MAX_TYPES : 3 * MAX_TYPES])
        types = multistyle.collect_speech_types(names, audios, ref_texts)
        res = multistyle.synthesize_multistyle(gen_text, types, _multistyle_infer)
        for w in res.warnings:
            gr.Warning(w)
        if res.wave is None:
            return [None] + res.ref_texts + [res.metadata]
        wave = res.wave
        if remove_silence:
            wave = audio_io.remove_silence_edges(wave, res.sample_rate)
        return [(res.sample_rate, wave)] + res.ref_texts + [res.metadata]

    with gr.Blocks(title="f5tts-tpu") as app:
        gr.Markdown("# f5tts-tpu — TPU-native F5-TTS")
        with gr.Tab("Basic TTS"):
            ref_audio = gr.Audio(label="Reference audio", type="filepath")
            ref_text = gr.Textbox(label="Reference text (empty = transcribe)")
            gen_text = gr.Textbox(label="Text to generate", lines=4)
            with gr.Accordion("Advanced", open=False):
                remove_silence = gr.Checkbox(label="Remove silences", value=False)
                cross_fade = gr.Slider(0.0, 1.0, value=0.15, label="Cross-fade (s)")
                nfe = gr.Slider(4, 64, value=32, step=2, label="NFE steps")
                speed = gr.Slider(0.3, 2.0, value=1.0, label="Speed")
                seed = gr.Number(value=0, label="Seed")
            btn = gr.Button("Synthesize", variant="primary")
            out_audio = gr.Audio(label="Output")
            btn.click(basic_tts,
                      [ref_audio, ref_text, gen_text, remove_silence,
                       cross_fade, nfe, speed, seed],
                      out_audio)

        with gr.Tab("Multi-Speech-Type"):
            # reference infer_gradio.py:383-737: {Type} / JSON-tagged script,
            # dynamic speech-type rows, per-type transcription write-back,
            # inference metadata transcript. Logic lives in infer/multistyle.py.
            gr.Markdown(
                "Script with `{TypeName}` tags (or "
                '`{"name": ..., "seed": ..., "speed": ...}` for per-segment '
                "control). The current type is sticky until the next tag; "
                "untagged text uses Regular.")
            names, audios, refs, groups = [], [], [], []
            for i in range(MAX_TYPES):
                with gr.Row(visible=(i == 0)) as row:
                    n = gr.Textbox(value="Regular" if i == 0 else "",
                                   label="Speech type name",
                                   interactive=(i != 0))
                    a = gr.Audio(type="filepath", label="Reference audio")
                    t = gr.Textbox(label="Reference text (empty = transcribe)")
                names.append(n); audios.append(a); refs.append(t); groups.append(row)
            count = gr.State(1)
            with gr.Row():
                add_btn = gr.Button("Add speech type")
                del_btn = gr.Button("Remove last speech type")

            def _set_rows(k):
                k = max(1, min(MAX_TYPES, k))
                return [k] + [gr.update(visible=i < k) for i in range(MAX_TYPES)]

            add_btn.click(lambda k: _set_rows(k + 1), count, [count, *groups])
            del_btn.click(lambda k: _set_rows(k - 1), count, [count, *groups])

            gen_multi = gr.Textbox(label="Tagged script", lines=8)
            remove_sil2 = gr.Checkbox(label="Remove silences", value=False)
            btn2 = gr.Button("Synthesize", variant="primary")
            out2 = gr.Audio(label="Output")
            meta2 = gr.Textbox(label="Inference metadata", lines=4)
            btn2.click(multi_tts, [gen_multi, remove_sil2, *names, *audios, *refs],
                       [out2, *refs, meta2])

        with gr.Tab("Voice Chat"):
            # reference infer_gradio.py:739-1000: chat LLM answers (typed or
            # spoken via ASR), the answer is spoken in the reference voice
            from f5tts_tpu.infer.voice_chat import (
                DEFAULT_CHAT_MODELS, DEFAULT_SYSTEM_PROMPT, VoiceChatEngine)

            gr.Markdown("Chat with an LLM; replies are spoken in your reference voice. "
                        "Requires the chat model weights (network).")
            chat_model_name = gr.Dropdown(choices=DEFAULT_CHAT_MODELS,
                                          value=DEFAULT_CHAT_MODELS[0],
                                          allow_custom_value=True,
                                          label="Chat model")
            chat_ref_audio = gr.Audio(label="Your voice (reference)", type="filepath")
            chat_ref_text = gr.Textbox(label="Reference text")
            system_prompt = gr.Textbox(label="System prompt",
                                       value=DEFAULT_SYSTEM_PROMPT, lines=2)
            chatbot = gr.Chatbot(type="messages")
            chat_in = gr.Textbox(label="Message (or record below)")
            chat_mic = gr.Audio(sources=["microphone"], type="numpy",
                                label="Spoken message")
            chat_audio = gr.Audio(label="Spoken reply")
            clear_btn = gr.Button("Clear conversation")

            def _tts_call(ref_wav, ref_sr, ref_text, gen_text):
                wav, sr, _ = tts.pipeline.infer(ref_wav, ref_sr, ref_text or "", gen_text)
                return wav, sr

            engine = VoiceChatEngine(tts=_tts_call)

            def chat_reply(history, message, mic, ref_audio_path, ref_text,
                           sys_prompt, model_name):
                if engine.chat_model_name != model_name:
                    engine.chat_model_name, engine.chat = model_name, None
                engine.system_prompt = sys_prompt
                engine.history = list(history)
                ref_wav, ref_sr = _load_ref(ref_audio_path)
                if message:
                    _, wav, sr = engine.respond_to_text(message, ref_wav, ref_sr, ref_text)
                elif mic is not None:
                    mic_sr, mic_wav = mic
                    mic_wav = np.asarray(mic_wav, np.float32)
                    if mic_wav.dtype.kind == "f" and np.abs(mic_wav).max() > 1.5:
                        mic_wav = mic_wav / 32768.0
                    _, _, wav, sr = engine.respond_to_audio(
                        mic_wav, mic_sr, ref_wav, ref_sr, ref_text)
                else:
                    return history, "", None
                return engine.history, "", (sr, wav)

            chat_in.submit(chat_reply,
                           [chatbot, chat_in, chat_mic, chat_ref_audio,
                            chat_ref_text, system_prompt, chat_model_name],
                           [chatbot, chat_in, chat_audio])
            chat_mic.stop_recording(
                chat_reply,
                [chatbot, chat_in, chat_mic, chat_ref_audio,
                 chat_ref_text, system_prompt, chat_model_name],
                [chatbot, chat_in, chat_audio])
            clear_btn.click(lambda: ([], "", None), None,
                            [chatbot, chat_in, chat_audio])

    return app


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="F5TTS_v1_Base")
    p.add_argument("--ckpt_file", default="")
    p.add_argument("--vocab_file", default="")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--share", action="store_true")
    args = p.parse_args(argv)
    tts = F5TTS(model=args.model, ckpt_file=args.ckpt_file, vocab_file=args.vocab_file)
    app = build_app(tts)
    app.launch(server_port=args.port, share=args.share)


if __name__ == "__main__":
    main()

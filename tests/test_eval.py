"""Eval harness: metainfo parsing, bucketing, WER computation, batch generation."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from f5tts_tpu.config import MelConfig, ModelArch
from f5tts_tpu.eval.eval_infer_batch import generate_batches
from f5tts_tpu.eval.utils_eval import (
    compute_wer,
    get_inference_prompt,
    get_librispeech_test_clean_metainfo,
    get_seedtts_testset_metainfo,
    normalize_for_wer,
)
from f5tts_tpu.infer import audio_io
from f5tts_tpu.models import dit
from f5tts_tpu.text.vocab import load_vocab
from f5tts_tpu.vocoder.vocos import Vocos, VocosConfig, init_vocos


def test_wer_exact_match():
    assert compute_wer("Hello, world!", "hello world") == 0.0


def test_wer_substitution_and_insertion():
    assert compute_wer("the cat sat", "the dog sat") == 1 / 3
    assert compute_wer("a b", "a b c") == 0.5
    assert compute_wer("a b c d", "a b") == 0.5


def test_wer_chinese_char_level():
    assert compute_wer("你好世界", "你好地界", lang="zh") == 0.25
    assert normalize_for_wer("你好，世界。", "zh") == list("你好世界")


def test_seedtts_metainfo(tmp_path):
    meta = tmp_path / "meta.lst"
    meta.write_text("utt1|prompt text|p1.wav|target text|gt1.wav\n"
                    "utt2|pt|p2.wav|tt\n")
    info = get_seedtts_testset_metainfo(str(meta))
    assert len(info) == 2
    assert info[0][0] == "utt1"
    assert info[0][2] == str(tmp_path / "p1.wav")   # made absolute
    assert info[1][4].endswith("wavs/utt2.wav")     # inferred gt path


def test_librispeech_metainfo():
    path = "/root/reference/data/librispeech_pc_test_clean_cross_sentence.lst"
    info = get_librispeech_test_clean_metainfo(path, "/ls")
    assert len(info) > 1000
    utt, ref_txt, ref_wav, gen_txt, gen_wav = info[0]
    assert ref_wav.startswith("/ls/") and ref_wav.endswith(".flac")
    assert gen_txt.startswith(" ")


def test_get_inference_prompt_bucketing(tmp_path):
    sr = 24000
    rng = np.random.default_rng(0)
    metainfo = []
    for i, secs in enumerate([1.0, 1.1, 3.0]):
        p = tmp_path / f"p{i}.wav"
        audio_io.write_wav(str(p), (rng.standard_normal(int(sr * secs)) * 0.1).astype(np.float32), sr)
        metainfo.append((f"utt{i}", "prompt text here.", str(p), "target text", ""))
    batches = get_inference_prompt(metainfo, infer_batch_size=2, num_buckets=10,
                                   min_secs=0.5, max_secs=10)
    utts = [u for b in batches for u in b["utts"]]
    assert sorted(utts) == ["utt0", "utt1", "utt2"]
    for b in batches:
        assert b["ref_mels"].shape[0] == len(b["utts"])
        assert b["ref_mels"].shape[2] == 100
        assert (b["total_mel_lens"] >= b["ref_mel_lens"]).all()


def test_eval_runner_seedtts_wer(tmp_path, monkeypatch):
    from f5tts_tpu.eval import eval_runner, utils_eval

    meta = tmp_path / "meta.lst"
    meta.write_text("utt1|prompt one|p1.wav|target one|gt1.wav\n"
                    "utt2|prompt two|p2.wav|target two|gt2.wav\n")
    gen_dir = tmp_path / "gen"
    gen_dir.mkdir()
    (gen_dir / "utt1.wav").write_bytes(b"")  # only utt1 was generated

    triples = eval_runner.build_seedtts_test_set(str(meta), str(gen_dir))
    assert len(triples) == 1
    assert triples[0][0].endswith("utt1.wav")
    assert triples[0][2] == "target one"

    def fake_wer(lang, pairs, device="cpu"):
        return [{"wav": w, "truth": t, "hypo": t, "wer": 0.25} for w, t in pairs]

    monkeypatch.setattr(utils_eval, "run_asr_wer", fake_wer)
    mean = eval_runner.score_test_set("wer", triples, str(gen_dir), lang="en")
    assert mean == 0.25
    result = (gen_dir / "_wer_results.jsonl").read_text()
    assert "WER: 0.25" in result and "utt1.wav" in result


def test_eval_runner_librispeech_pairs(tmp_path, monkeypatch):
    from f5tts_tpu.eval import eval_runner, utils_eval

    meta = tmp_path / "cross.lst"
    meta.write_text("1089-134686-0000\t3.0\tREF TEXT\t1188-133604-0001\t5.0\tGEN TEXT\n")
    gen_dir = tmp_path / "gen"
    gen_dir.mkdir()
    (gen_dir / "1188-133604-0001.wav").write_bytes(b"")

    triples = eval_runner.build_librispeech_test_set(str(meta), str(gen_dir), "/ls")
    assert triples == [(str(gen_dir / "1188-133604-0001.wav"),
                        "/ls/1089/134686/1089-134686-0000.flac", "GEN TEXT")]

    def fake_sim(pairs, ckpt, device="cpu"):
        return [{"gen": g, "gt": r, "sim": 0.8} for g, r in pairs]

    monkeypatch.setattr(utils_eval, "run_sim", fake_sim)
    mean = eval_runner.score_test_set("sim", triples, str(gen_dir))
    assert mean == 0.8
    assert (gen_dir / "_sim_results.jsonl").exists()


def test_generate_batches_end_to_end(tmp_path):
    arch = ModelArch(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, mel_dim=100,
                     text_num_embeds=2545, text_dim=16, conv_layers=1)
    params = dit.init_dit(jax.random.PRNGKey(0), arch)
    statics = dit.DiTStatics(arch)
    voc_cfg = VocosConfig(input_channels=100, dim=32, intermediate_dim=64, num_layers=1)
    voc = Vocos(init_vocos(jax.random.PRNGKey(1), voc_cfg), voc_cfg)
    vocab = load_vocab("f5tts_tpu/data/vocab_emilia_pinyin.txt")

    batches = [{
        "utts": ["a", "b"],
        "ref_rms": np.asarray([0.05, 0.2], np.float32),
        "ref_mels": np.random.default_rng(0).standard_normal((2, 50, 100)).astype(np.float32),
        "ref_mel_lens": np.asarray([50, 40], np.int32),
        "total_mel_lens": np.asarray([100, 90], np.int32),
        "texts": [list("hello there"), list("goodbye now")],
    }]
    out_dir = str(tmp_path / "wavs")
    stats = generate_batches(params, statics, voc.decode, vocab, batches, out_dir,
                             nfe_step=2, dtype=jnp.float32, backend="xla",
                             bucket_size=128, max_duration=512)
    assert stats["utterances"] == 2
    assert os.path.exists(os.path.join(out_dir, "a.wav"))
    assert os.path.exists(os.path.join(out_dir, "b.wav"))
    assert stats["rtf"] > 0

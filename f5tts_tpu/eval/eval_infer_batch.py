"""Batched test-set inference for evaluation.

Rebuild of reference src/f5_tts/eval/eval_infer_batch.py: generate wavs for a
whole testset with duration-bucketed batches and fixed seeds, saving
per-utterance wavs for the WER/SIM/UTMOS scorers.

Parallelism: the reference shards the prompt list across GPUs with
Accelerate (`split_between_processes`, :181); here the list is sharded across
jax processes (`jax.process_index/count`) — single-host runs see the whole
list. Shapes are padded to compile buckets so the jitted sampler reuses a
small number of compilations across the 200 duration buckets.

Usage:
    python -m f5tts_tpu.eval.eval_infer_batch -s 0 -n F5TTS_v1_Base \
        -t seedtts_test_zh --metalst path/to/meta.lst -o results/
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from f5tts_tpu.config import PRESETS, MelConfig
from f5tts_tpu.eval.utils_eval import (
    get_inference_prompt,
    get_librispeech_test_clean_metainfo,
    get_seedtts_testset_metainfo,
)
from f5tts_tpu.infer import audio_io
from f5tts_tpu.models import cfm
from f5tts_tpu.text.vocab import list_str_to_idx
from f5tts_tpu.utils import duration_bucket, make_time_grid


def generate_batches(
    pipeline_params: dict,
    statics,
    vocoder,
    vocab_char_map: dict,
    prompt_batches: list[dict],
    out_dir: str,
    nfe_step: int = 32,
    cfg_strength: float = 2.0,
    sway_sampling_coef: float = -1.0,
    seed: int = 0,
    target_rms: float = 0.1,
    mel_cfg: MelConfig = MelConfig(),
    dtype=jnp.bfloat16,
    backend: str = "pallas",
    bucket_size: int = 256,
    max_duration: int = 4096,
    backbone=None,
) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    t_grid = make_time_grid(nfe_step, sway_sampling_coef=sway_sampling_coef)
    t_start = time.time()
    n_utts = 0
    audio_secs = 0.0

    for batch in prompt_batches:
        ref_mels = batch["ref_mels"]                      # [b, t, d]
        total_lens = batch["total_mel_lens"]
        b = ref_mels.shape[0]
        n_bucket = duration_bucket(int(total_lens.max()), bucket_size, max_duration,
                                   getattr(backbone, "seq_extra_tokens", 0) if backbone else 0)
        cond = np.zeros((b, n_bucket, mel_cfg.n_mel_channels), np.float32)
        t_avail = min(ref_mels.shape[1], n_bucket)
        cond[:, :t_avail] = ref_mels[:, :t_avail]

        text_ids = list_str_to_idx(batch["texts"], vocab_char_map)

        out = cfm.cfm_sample(
            pipeline_params, statics, jnp.asarray(cond), jnp.asarray(text_ids),
            jnp.asarray(batch["ref_mel_lens"]),
            jnp.asarray(np.minimum(total_lens, n_bucket), np.int32),
            t_grid, key=jax.random.PRNGKey(seed), cfg_strength=cfg_strength,
            dtype=dtype, backend=backend, backbone=backbone,
        )
        out = np.asarray(out)

        for i, utt in enumerate(batch["utts"]):
            ref_len = int(batch["ref_mel_lens"][i])
            tot_len = min(int(total_lens[i]), n_bucket)
            gen_mel = out[i : i + 1, ref_len:tot_len, :]
            wav = np.asarray(vocoder(jnp.transpose(jnp.asarray(gen_mel), (0, 2, 1))))[0]
            rms_v = float(batch["ref_rms"][i])
            if 0 < rms_v < target_rms:
                wav = wav * (rms_v / target_rms)
            audio_io.write_wav(os.path.join(out_dir, f"{utt}.wav"), wav,
                               mel_cfg.target_sample_rate)
            n_utts += 1
            audio_secs += len(wav) / mel_cfg.target_sample_rate

    wall = time.time() - t_start
    return {"utterances": n_utts, "audio_seconds": audio_secs,
            "wall_seconds": wall, "rtf": wall / max(audio_secs, 1e-9)}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-s", "--seed", type=int, default=0)
    p.add_argument("-n", "--expname", default="F5TTS_v1_Base")
    p.add_argument("-c", "--ckptstep", type=int, default=1250000)
    p.add_argument("--ckpt_file", default="")
    p.add_argument("--vocab_file", default="")
    p.add_argument("-nfe", "--nfestep", type=int, default=32)
    p.add_argument("-o", "--odemethod", default="euler")
    p.add_argument("-ss", "--swaysampling", type=float, default=-1.0)
    p.add_argument("-t", "--testset", required=True,
                   choices=["seedtts_test_zh", "seedtts_test_en", "ls_pc_test_clean"])
    p.add_argument("--metalst", required=True)
    p.add_argument("--librispeech_path", default="")
    p.add_argument("--output_dir", default="results")
    p.add_argument("--batch_frames", type=int, default=1)
    args = p.parse_args(argv)

    if args.testset == "ls_pc_test_clean":
        metainfo = get_librispeech_test_clean_metainfo(args.metalst, args.librispeech_path)
    else:
        metainfo = get_seedtts_testset_metainfo(args.metalst)

    # shard prompt list across processes (reference: split_between_processes)
    pidx, pcount = jax.process_index(), jax.process_count()
    metainfo = metainfo[pidx::pcount]

    from f5tts_tpu.infer.api import F5TTS

    tts = F5TTS(model=args.expname, ckpt_file=args.ckpt_file,
                vocab_file=args.vocab_file, seed=args.seed)
    prompts = get_inference_prompt(metainfo, tokenizer=tts.config.tokenizer,
                                   infer_batch_size=args.batch_frames)
    out_dir = os.path.join(
        args.output_dir,
        f"{args.expname}_{args.ckptstep}", args.testset,
        f"seed{args.seed}_{args.odemethod}_nfe{args.nfestep}",
    )
    stats = generate_batches(
        tts.pipeline.params, tts.pipeline.statics, tts.pipeline.vocoder,
        tts.pipeline.vocab_char_map, prompts, out_dir,
        nfe_step=args.nfestep, sway_sampling_coef=args.swaysampling,
        seed=args.seed, dtype=tts.pipeline.dtype, backend=tts.pipeline.backend,
    )
    print(stats)


if __name__ == "__main__":
    main()

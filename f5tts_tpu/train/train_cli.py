"""Training entry point: YAML config (reference Hydra layout) + overrides.

Rebuild of reference src/f5_tts/train/train.py:14-77 without the Hydra
dependency: the same `configs/*.yaml` schema is parsed with pyyaml, and
`key.path=value` overrides are accepted on the command line (the reference's
`++` override style, reference train/README.md:50-54).

Usage:
    python -m f5tts_tpu.train.train_cli --config f5tts_tpu/configs/F5TTS_v1_Base.yaml \
        optim.epochs=1 datasets.name=LJSpeech
"""

from __future__ import annotations

import argparse
import dataclasses

import jax
import jax.numpy as jnp
import yaml


def apply_overrides(cfg: dict, overrides: list[str]) -> dict:
    for ov in overrides:
        ov = ov.lstrip("+")
        key, _, value = ov.partition("=")
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = yaml.safe_load(value)
    return cfg


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", "-c", required=True, help="model YAML (reference layout)")
    p.add_argument("--max_updates", type=int, default=None)
    p.add_argument("--data_root", default=None)
    p.add_argument("--mesh_data", type=int, default=None, help="DP axis size")
    p.add_argument("--mesh_model", type=int, default=1, help="TP axis size")
    p.add_argument("--zero1", action="store_true",
                   help="shard AdamW moments + EMA over the data axis "
                        "(ZeRO-1; fits full-size MMDiT_Base training)")
    p.add_argument("--bf16_state", action="store_true",
                   help="store AdamW moments + EMA in bf16 (halves the f32 "
                        "optimizer state; update math stays f32 — fits "
                        "full-size MMDiT_Base training on ONE chip)")
    p.add_argument("overrides", nargs="*", help="key.path=value overrides")
    args = p.parse_args(argv)

    with open(args.config, encoding="utf-8") as f:
        raw = yaml.safe_load(f)
    raw = apply_overrides(raw, args.overrides)

    from f5tts_tpu.config import model_config_from_dict, train_config_from_dict
    from f5tts_tpu.models.cfm import BACKBONES
    from f5tts_tpu.parallel.mesh import dit_param_specs, make_mesh, shard_params
    from f5tts_tpu.text.vocab import get_tokenizer
    from f5tts_tpu.train.dataset import load_dataset
    from f5tts_tpu.train.trainer import Trainer

    mcfg = model_config_from_dict(raw)
    tcfg = train_config_from_dict(raw)

    tokenizer = mcfg.tokenizer
    tok_target = mcfg.tokenizer_path if tokenizer == "custom" else tcfg.dataset_name
    vocab_char_map, vocab_size = get_tokenizer(tok_target, tokenizer,
                                               data_root=args.data_root)

    arch = dataclasses.replace(mcfg.arch, text_num_embeds=vocab_size)
    backbone = BACKBONES[mcfg.backbone]
    params = backbone.init(jax.random.PRNGKey(0), arch)
    statics = backbone.statics_cls(arch)

    mesh = None
    if len(jax.devices()) > 1:
        mesh = make_mesh(data=args.mesh_data, model=args.mesh_model)
        params = shard_params(params, mesh, dit_param_specs(params)
                              if mcfg.backbone == "DiT" else None)

    dataset = load_dataset(tcfg.dataset_name, tokenizer, mcfg.mel_spec,
                           data_root=args.data_root,
                           dataset_type=tcfg.dataset_type,
                           audio_type=tcfg.audio_type)

    # reference epoch math: updates/epoch from the sampler, total for the lr ramp
    trainer = Trainer(
        params, statics, tcfg, backbone=backbone,
        vocab_char_map=vocab_char_map, tokenizer=tokenizer, mesh=mesh,
        dtype=jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32,
        backend="pallas",  # O(n) flash attention fwd+bwd on TPU (XLA fallback off-TPU)
        zero1=args.zero1,
        bf16_state=args.bf16_state,
    )
    metrics = trainer.train(dataset, resumable_with_seed=666,
                            max_updates=args.max_updates)
    print("done:", metrics)


if __name__ == "__main__":
    main()

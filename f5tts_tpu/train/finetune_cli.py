"""Finetuning CLI: start from a pretrained checkpoint, optionally with LoRA.

Rebuild of reference src/f5_tts/train/finetune_cli.py: per-exp-name arch
dicts, pretrained checkpoint staging into the run dir, tokenizer/vocab
handling — plus the style-LoRA mode (adapter-only finetuning), which the
reference lacks (see SURVEY.md §2.6 note).

Also covers the reference finetune workbench's vocab-extension path
(`expand_model_embeddings`, finetune_gradio.py:974): when the dataset vocab
adds tokens beyond the pretrained vocab, the text embedding table is grown
and new rows are initialized to zero.

Usage:
    python -m f5tts_tpu.train.finetune_cli --exp_name F5TTS_v1_Base \
        --pretrain ckpt.safetensors --dataset_name my_dataset --finetune_mode lora
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import jax
import jax.numpy as jnp


def expand_text_embedding(params: dict, new_vocab_size: int) -> dict:
    """Grow the text embedding to new_vocab_size (+1 filler); new rows zero
    (reference finetune_gradio.py:974 expand_model_embeddings)."""
    emb = params["text_embed"]["embed"]["w"]
    old = emb.shape[0]
    need = new_vocab_size + 1
    if need <= old:
        return params
    grown = jnp.concatenate([emb, jnp.zeros((need - old, emb.shape[1]), emb.dtype)], 0)
    params = dict(params)
    params["text_embed"] = dict(params["text_embed"])
    params["text_embed"]["embed"] = {"w": grown}
    return params


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--exp_name", default="F5TTS_v1_Base",
                   choices=["F5TTS_v1_Base", "F5TTS_Base", "F5TTS_v1_Small",
                            "F5TTS_Small", "E2TTS_Base", "E2TTS_Small"])
    p.add_argument("--pretrain", default="", help=".pt/.safetensors or orbax dir")
    p.add_argument("--dataset_name", required=True)
    p.add_argument("--tokenizer", default="pinyin", choices=["pinyin", "char", "byte", "custom"])
    p.add_argument("--tokenizer_path", default=None)
    p.add_argument("--data_root", default=None)
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--batch_size_per_gpu", type=int, default=3200)
    p.add_argument("--max_samples", type=int, default=64)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--num_warmup_updates", type=int, default=300)
    p.add_argument("--save_per_updates", type=int, default=10000)
    p.add_argument("--last_per_updates", type=int, default=5000)
    p.add_argument("--keep_last_n_checkpoints", type=int, default=-1)
    p.add_argument("--grad_accumulation_steps", type=int, default=1)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--max_updates", type=int, default=None)
    p.add_argument("--finetune_mode", default="full", choices=["full", "lora"])
    p.add_argument("--lora", action="store_true",
                   help="shorthand for --finetune_mode lora")
    p.add_argument("--lora_rank", type=int, default=8)
    p.add_argument("--lora_alpha", type=float, default=16.0)
    p.add_argument("--save_dir", default=None)
    p.add_argument("--logger", default="tensorboard")
    args = p.parse_args(argv)
    if args.lora:
        args.finetune_mode = "lora"

    from f5tts_tpu.config import PRESETS, TrainConfig
    from f5tts_tpu.models.cfm import BACKBONES
    from f5tts_tpu.text.vocab import get_tokenizer
    from f5tts_tpu.train.dataset import load_dataset
    from f5tts_tpu.train.trainer import Trainer

    mcfg = PRESETS[args.exp_name]
    tok_target = args.tokenizer_path if args.tokenizer == "custom" else args.dataset_name
    vocab_char_map, vocab_size = get_tokenizer(tok_target, args.tokenizer,
                                               data_root=args.data_root)
    arch = dataclasses.replace(mcfg.arch, text_num_embeds=vocab_size)
    backbone = BACKBONES[mcfg.backbone]
    statics = backbone.statics_cls(arch)

    if args.pretrain:
        if args.pretrain.endswith((".pt", ".pth", ".safetensors", ".bin")):
            from f5tts_tpu.compat import convert_f5tts_state_dict, load_torch_checkpoint

            sd = load_torch_checkpoint(args.pretrain)
            pretrained_vocab = sd["transformer.text_embed.text_embed.weight"].shape[0] - 1
            load_arch = dataclasses.replace(arch, text_num_embeds=pretrained_vocab)
            params = convert_f5tts_state_dict(sd, load_arch)
            params = expand_text_embedding(params, vocab_size)
        else:
            from f5tts_tpu.train.checkpoint import load_params

            params = load_params(args.pretrain, use_ema=True)
    else:
        params = backbone.init(jax.random.PRNGKey(0), arch)

    save_dir = args.save_dir or f"ckpts/{args.exp_name}_{args.dataset_name}"
    tcfg = TrainConfig(
        dataset_name=args.dataset_name,
        batch_size_per_device=args.batch_size_per_gpu,
        max_samples=args.max_samples,
        epochs=args.epochs,
        learning_rate=args.learning_rate,
        num_warmup_updates=args.num_warmup_updates,
        grad_accumulation_steps=args.grad_accumulation_steps,
        max_grad_norm=args.max_grad_norm,
        save_per_updates=args.save_per_updates,
        keep_last_n_checkpoints=args.keep_last_n_checkpoints,
        last_per_updates=args.last_per_updates,
        save_dir=save_dir,
        logger=args.logger,
    )
    dataset = load_dataset(args.dataset_name, args.tokenizer, mcfg.mel_spec,
                           data_root=args.data_root)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    if args.finetune_mode == "lora":
        import optax

        from f5tts_tpu.train.checkpoint import CheckpointManager
        from f5tts_tpu.train.dataset import DynamicBatchSampler, collate
        from f5tts_tpu.train.lora import LoRAConfig, init_lora, make_lora_train_step

        lcfg = LoRAConfig(rank=args.lora_rank, alpha=args.lora_alpha)
        lora = init_lora(jax.random.PRNGKey(1), params, lcfg)
        tx = optax.chain(optax.clip_by_global_norm(args.max_grad_norm),
                         optax.adamw(args.learning_rate))
        opt_state = tx.init(lora)
        step = jax.jit(make_lora_train_step(params, statics, tx, lcfg,
                                            dtype=dtype, backend="pallas"))

        frame_lens = [dataset.get_frame_len(i) for i in range(len(dataset))]
        sampler = DynamicBatchSampler(frame_lens, args.batch_size_per_gpu,
                                      args.max_samples, random_seed=666)
        from f5tts_tpu.text.pinyin import convert_char_to_pinyin
        from f5tts_tpu.text.vocab import list_str_to_idx, list_str_to_tensor

        key = jax.random.PRNGKey(666)
        update = 0
        os.makedirs(save_dir, exist_ok=True)
        for epoch in range(args.epochs):
            sampler.set_epoch(epoch)
            for batch_idx in sampler:
                batch = collate([dataset[i] for i in batch_idx])
                if args.tokenizer == "pinyin":
                    ids = list_str_to_idx(convert_char_to_pinyin(batch["text"]), vocab_char_map)
                elif args.tokenizer in ("char", "custom"):
                    ids = list_str_to_idx(batch["text"], vocab_char_map)
                else:
                    ids = list_str_to_tensor(batch["text"])
                key, sub = jax.random.split(key)
                lora, opt_state, metrics = step(
                    lora, opt_state, sub, jnp.asarray(batch["mel"]),
                    jnp.asarray(ids), jnp.asarray(batch["mel_lengths"]))
                update += 1
                if update % 10 == 0:
                    print(f"update {update} loss {float(metrics['loss']):.4f}")
                if update % args.save_per_updates == 0 or (
                        args.max_updates and update >= args.max_updates):
                    import pickle

                    with open(os.path.join(save_dir, f"lora_{update}.pkl"), "wb") as f:
                        pickle.dump(jax.tree.map(lambda a: jax.device_get(a), lora), f)
                if args.max_updates and update >= args.max_updates:
                    print("done (lora):", update)
                    return
        print("done (lora):", update)
        return

    trainer = Trainer(params, statics, tcfg, backbone=backbone,
                      vocab_char_map=vocab_char_map, tokenizer=args.tokenizer,
                      dtype=dtype, backend="pallas", logger=args.logger)
    metrics = trainer.train(dataset, resumable_with_seed=666, max_updates=args.max_updates)
    print("done:", metrics)


if __name__ == "__main__":
    main()

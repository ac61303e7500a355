"""SIM checkpoint key-map: reference-shaped state dict -> strict mapped load.

Synthesizes a UniSpeech `wavlm_large_finetune.pth`-shaped state dict (the
vendored ECAPA head naming per /root/reference/src/f5_tts/eval/ecapa_tdnn.py
plus fairseq-format WavLM keys under `feature_extract.model.*`) and asserts
`load_reference_checkpoint` consumes 100% of it, loads real values, and
hard-errors when keys go unmapped.
"""

import re

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from f5tts_tpu.eval.ecapa_tdnn import (  # noqa: E402
    ECAPA_TDNN,
    convert_reference_state_dict,
    load_reference_checkpoint,
)

# inverse of the converter's head rules: this module's names -> checkpoint names
_HEAD_INV = [
    (r"^layer([234])\.pre\.(conv|bn)\.(.*)$", r"layer\1.Conv1dReluBn1.\2.\3"),
    (r"^layer([234])\.res2\.(convs|bns)\.(\d+)\.(.*)$", r"layer\1.Res2Conv1dReluBn.\2.\3.\4"),
    (r"^layer([234])\.post\.(conv|bn)\.(.*)$", r"layer\1.Conv1dReluBn2.\2.\3"),
    (r"^layer([234])\.se\.fc1\.(.*)$", r"layer\1.SE_Connect.linear1.\2"),
    (r"^layer([234])\.se\.fc2\.(.*)$", r"layer\1.SE_Connect.linear2.\2"),
    (r"^mfa\.(.*)$", r"conv.\1"),
    (r"^pool\.att_in\.(.*)$", r"pooling.linear1.\1"),
    (r"^pool\.att_out\.(.*)$", r"pooling.linear2.\1"),
    (r"^pool_bn\.(.*)$", r"bn.\1"),
    (r"^fc\.(.*)$", r"linear.\1"),
]

# inverse WavLM rules: transformers names -> fairseq names
_WAVLM_INV = [
    (r"^feature_projection\.projection\.(.*)$", r"post_extract_proj.\1"),
    (r"^feature_projection\.layer_norm\.(.*)$", r"layer_norm.\1"),
    (r"^feature_extractor\.conv_layers\.(\d+)\.conv\.(.*)$",
     r"feature_extractor.conv_layers.\1.0.\2"),
    (r"^feature_extractor\.conv_layers\.(\d+)\.layer_norm\.(.*)$",
     r"feature_extractor.conv_layers.\1.2.1.\2"),
    (r"^encoder\.pos_conv_embed\.conv\.parametrizations\.weight\.original0$",
     "encoder.pos_conv.0.weight_g"),
    (r"^encoder\.pos_conv_embed\.conv\.parametrizations\.weight\.original1$",
     "encoder.pos_conv.0.weight_v"),
    (r"^encoder\.pos_conv_embed\.conv\.weight_g$", "encoder.pos_conv.0.weight_g"),
    (r"^encoder\.pos_conv_embed\.conv\.weight_v$", "encoder.pos_conv.0.weight_v"),
    (r"^encoder\.pos_conv_embed\.conv\.bias$", "encoder.pos_conv.0.bias"),
    (r"^encoder\.layers\.(\d+)\.attention\.rel_attn_embed\.(.*)$",
     r"encoder.layers.\1.self_attn.relative_attention_bias.\2"),
    (r"^encoder\.layers\.(\d+)\.attention\.gru_rel_pos_linear\.(.*)$",
     r"encoder.layers.\1.self_attn.grep_linear.\2"),
    (r"^encoder\.layers\.(\d+)\.attention\.gru_rel_pos_const$",
     r"encoder.layers.\1.self_attn.grep_a"),
    (r"^encoder\.layers\.(\d+)\.attention\.([kqv]_proj|out_proj)\.(.*)$",
     r"encoder.layers.\1.self_attn.\2.\3"),
    (r"^encoder\.layers\.(\d+)\.layer_norm\.(.*)$",
     r"encoder.layers.\1.self_attn_layer_norm.\2"),
    (r"^encoder\.layers\.(\d+)\.feed_forward\.intermediate_dense\.(.*)$",
     r"encoder.layers.\1.fc1.\2"),
    (r"^encoder\.layers\.(\d+)\.feed_forward\.output_dense\.(.*)$",
     r"encoder.layers.\1.fc2.\2"),
    (r"^encoder\.layers\.(\d+)\.final_layer_norm\.(.*)$",
     r"encoder.layers.\1.final_layer_norm.\2"),
    (r"^encoder\.layer_norm\.(.*)$", r"encoder.layer_norm.\1"),
    (r"^masked_spec_embed$", "mask_emb"),
]


def _inv(key, rules, default_identity=True):
    for pat, repl in rules:
        if re.match(pat, key):
            return re.sub(pat, repl, key)
    return key if default_identity else None


def _tiny_model():
    model = ECAPA_TDNN(feat_dim=16, channels=16, emb_dim=8,
                       num_feature_layers=3)
    from transformers import WavLMConfig, WavLMModel

    cfg = WavLMConfig(
        hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=24, conv_dim=(8, 8), conv_kernel=(3, 3),
        conv_stride=(2, 2), feat_extract_norm="layer",
        do_stable_layer_norm=True, num_buckets=8, max_bucket_distance=16,
        num_conv_pos_embeddings=4, num_conv_pos_embedding_groups=2,
    )
    model._wavlm = WavLMModel(cfg)
    return model


def _reference_shaped_sd(model):
    sd = {}
    for k, v in model.state_dict().items():
        t = torch.randn_like(v) if v.is_floating_point() else v.clone()
        if k.startswith("_wavlm."):
            sd["feature_extract.model." + _inv(k[len("_wavlm."):], _WAVLM_INV)] = t
        else:
            sd[_inv(k, _HEAD_INV)] = t
    # pretraining-only tensors the loader must drop without complaint
    sd["feature_extract.model.label_embs_concat"] = torch.randn(4, 8)
    sd["feature_extract.model.final_proj.weight"] = torch.randn(8, 16)
    return sd


def test_round_trip_full_consumption(tmp_path):
    model = _tiny_model()
    sd = _reference_shaped_sd(model)
    path = tmp_path / "wavlm_finetune.pth"
    torch.save({"model": sd}, path)

    stats = load_reference_checkpoint(model, str(path))
    assert stats["frac"] == 1.0, (stats["unmapped"], stats["unexpected"])
    assert not stats["unmapped"] and not stats["unexpected"]
    assert len(stats["dropped"]) == 2

    # values actually landed: spot-check a head tensor and a WavLM tensor
    np.testing.assert_array_equal(
        model.fc.weight.detach().numpy(), sd["linear.weight"].numpy())
    np.testing.assert_array_equal(
        model.layer2.se.fc1.weight.detach().numpy(),
        sd["layer2.SE_Connect.linear1.weight"].numpy())
    got = model._wavlm.state_dict()["encoder.layers.1.attention.k_proj.weight"]
    np.testing.assert_array_equal(
        got.numpy(),
        sd["feature_extract.model.encoder.layers.1.self_attn.k_proj.weight"].numpy())


def test_refuses_unmapped_checkpoint(tmp_path):
    model = _tiny_model()
    sd = _reference_shaped_sd(model)
    # corrupt half the head keys so they can't map
    bad = {(k + ".bogus" if not k.startswith("feature_extract.") else k): v
           for k, v in sd.items()}
    path = tmp_path / "bad.pth"
    torch.save({"model": bad}, path)
    with pytest.raises(RuntimeError, match="refusing to score"):
        load_reference_checkpoint(_tiny_model(), str(path))


def test_convert_splits_and_renames():
    model = _tiny_model()
    sd = _reference_shaped_sd(model)
    head, wavlm, dropped, unmapped = convert_reference_state_dict(sd)
    assert not unmapped
    assert "fc.weight" in head and "pool_bn.running_mean" in head
    assert any(k.startswith("encoder.layers.0.attention.rel_attn_embed")
               for k in wavlm)
    assert len(dropped) == 2

"""Offline UTMOS loader: strict digestion + forward sanity (VERDICT r2 #7)."""

import numpy as np
import pytest
import torch

from f5tts_tpu.eval.utmos22 import UTMOS22Strong, load_checkpoint, load_predictor


@pytest.fixture(scope="module")
def saved_ckpt(tmp_path_factory):
    torch.manual_seed(0)
    model = UTMOS22Strong()
    with torch.no_grad():
        for p in model.parameters():
            p.normal_(0, 0.02)
    path = tmp_path_factory.mktemp("utmos") / "utmos22.pt"
    torch.save(model.state_dict(), str(path))
    return str(path), model


def test_loader_consumes_everything(saved_ckpt):
    path, ref = saved_ckpt
    model = UTMOS22Strong()
    stats = load_checkpoint(model, path)
    assert stats["consumed"] == stats["total"]
    for (k, a), (_, b) in zip(sorted(model.state_dict().items()),
                              sorted(ref.state_dict().items())):
        torch.testing.assert_close(a, b)


def test_loader_refuses_schema_drift(saved_ckpt):
    path, _ = saved_ckpt
    sd = torch.load(path, weights_only=True)
    for i in range(8):  # >1% junk keys -> must refuse
        sd[f"unknown_module.layer{i}.weight"] = torch.zeros(4, 4)
    drift = path + ".drift"
    torch.save(sd, drift)
    with pytest.raises(RuntimeError, match="consumed only"):
        load_checkpoint(UTMOS22Strong(), drift)


def test_loader_refuses_missing_params(saved_ckpt):
    path, _ = saved_ckpt
    sd = torch.load(path, weights_only=True)
    sd = {k: v for k, v in sd.items() if not k.startswith("blstm")}
    part = path + ".partial"
    torch.save(sd, part)
    with pytest.raises(RuntimeError, match="unfilled"):
        load_checkpoint(UTMOS22Strong(), part)


def test_loader_folds_weight_norm(saved_ckpt):
    path, ref = saved_ckpt
    sd = torch.load(path, weights_only=True)
    key = "wav2vec2.encoder.pos_conv_embed.conv.weight"
    w = sd.pop(key)
    g = w.norm(dim=(0, 1), keepdim=True)
    sd[key + "_g"] = g
    sd[key + "_v"] = w
    wn = path + ".wn"
    torch.save(sd, wn)
    model = UTMOS22Strong()
    load_checkpoint(model, wn)
    torch.testing.assert_close(
        model.wav2vec2.encoder.pos_conv_embed.conv.weight, w, atol=1e-5,
        rtol=1e-5)


def test_forward_score_shape_and_range(saved_ckpt):
    path, _ = saved_ckpt
    model = load_predictor(path)
    wave = torch.from_numpy(
        np.sin(2 * np.pi * 220 * np.arange(16000) / 16000).astype(np.float32)
    )[None]
    score = model(wave, 16000)
    assert score.shape == (1,)
    assert torch.isfinite(score).all()
    # resampling path (24 kHz input)
    wave24 = torch.from_numpy(
        np.sin(2 * np.pi * 220 * np.arange(24000) / 24000).astype(np.float32)
    )[None]
    score24 = model(wave24, 24000)
    assert torch.isfinite(score24).all()
    # same audio content at both rates -> nearly identical score
    torch.testing.assert_close(score, score24, atol=0.2, rtol=0.2)


def test_loader_accepts_hub_embedding_tables(saved_ckpt):
    """The SpeechMOS hub module stores domain/judge embeddings as full
    nn.Embedding tables; the loader must select row 0 (domain 'main') and
    row 288 (mean listener) instead of shape-mismatching (ADVICE r3)."""
    path, ref = saved_ckpt
    sd = torch.load(path, weights_only=True)
    torch.manual_seed(7)
    dom_table = torch.randn(2, 128)
    judge_table = torch.randn(3000, 128)
    sd["domain_emb.weight"] = dom_table
    sd["judge_emb.weight"] = judge_table
    del sd["domain_emb"], sd["judge_emb"]
    hub = path + ".hub"
    torch.save(sd, hub)
    model = UTMOS22Strong()
    stats = load_checkpoint(model, hub)
    assert stats["consumed"] == stats["total"]
    torch.testing.assert_close(model.domain_emb.data, dom_table[0])
    torch.testing.assert_close(model.judge_emb.data, judge_table[288])


def test_loader_full_hub_spelling_round_trip(saved_ckpt):
    """VERDICT r4 #6: a state dict in the GENUINE hub spelling — `model.`
    wrapper prefix, `ssl_model.` SSL tree, `.self_attn.` / `.fc1.` / `.fc2.`
    layer names, torchaudio's `.transformer.layers.`, fairseq's
    `post_extract_proj`, weight-normed pos-conv, and [K,128] domain/judge
    tables — must be fully consumed with every value landing."""
    path, ref = saved_ckpt
    sd = torch.load(path, weights_only=True)
    hub = {}
    for k, v in sd.items():
        if k == "domain_emb":
            hub["model.domain_emb.weight"] = torch.stack([v, torch.zeros_like(v)])
            continue
        if k == "judge_emb":
            table = torch.zeros(289, 128)
            table[288] = v
            hub["model.judge_emb.weight"] = table
            continue
        if k.startswith("wav2vec2."):
            k = "ssl_model." + k[len("wav2vec2."):]
            k = k.replace(".encoder.layers.", ".encoder.transformer.layers.")
            k = k.replace(".attention.", ".self_attn.")
            k = k.replace(".feed_forward.intermediate_dense.", ".fc1.")
            k = k.replace(".feed_forward.output_dense.", ".fc2.")
            k = k.replace(".encoder.feature_projection.projection.",
                          ".post_extract_proj.")
            if k.endswith("pos_conv_embed.conv.weight"):
                g = v.norm(dim=(0, 1), keepdim=True)
                hub["model." + k + "_g"] = g
                hub["model." + k + "_v"] = v.clone()
                continue
        hub["model." + k] = v
    hubp = path + ".hubfull"
    torch.save(hub, hubp)
    model = UTMOS22Strong()
    stats = load_checkpoint(model, hubp)
    assert stats["consumed"] == stats["total"]
    for (k, a), (_, b) in zip(sorted(model.state_dict().items()),
                              sorted(ref.state_dict().items())):
        torch.testing.assert_close(a, b, atol=1e-5, rtol=1e-5, msg=k)


def test_loader_refuses_short_judge_table(saved_ckpt):
    path, _ = saved_ckpt
    sd = torch.load(path, weights_only=True)
    sd["judge_emb.weight"] = torch.randn(10, 128)
    del sd["judge_emb"]
    short = path + ".short"
    torch.save(sd, short)
    with pytest.raises(RuntimeError, match="mean-listener"):
        load_checkpoint(UTMOS22Strong(), short)

"""BigVGAN vocoder: conv-transpose semantics vs torch, generator shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from f5tts_tpu.vocoder.bigvgan import (
    BigVGAN,
    BigVGANConfig,
    _convtranspose1d_ncw,
    _grouped_conv_transpose,
    convert_bigvgan_state_dict,
    downsample1d_2x,
    init_bigvgan,
    kaiser_sinc_filter1d,
    snakebeta,
    upsample1d_2x,
)

SMALL = BigVGANConfig(
    num_mels=8,
    upsample_rates=(4, 2),
    upsample_kernel_sizes=(8, 4),
    upsample_initial_channel=16,
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 2),),
)


def test_convtranspose_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 10)).astype(np.float32)
    w = rng.standard_normal((3, 5, 8)).astype(np.float32)  # [in, out, k]
    b = rng.standard_normal(5).astype(np.float32)
    stride, k = 4, 8
    ours = np.asarray(_convtranspose1d_ncw(
        {"w": jnp.asarray(w), "b": jnp.asarray(b)}, jnp.asarray(x), stride, k))
    theirs = F.conv_transpose1d(torch.from_numpy(x), torch.from_numpy(w),
                                torch.from_numpy(b), stride=stride,
                                padding=(k - stride) // 2).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_grouped_conv_transpose_matches_torch():
    rng = np.random.default_rng(1)
    c = 4
    x = rng.standard_normal((1, c, 12)).astype(np.float32)
    k = rng.standard_normal((c, 1, 12)).astype(np.float32)
    ours = np.asarray(_grouped_conv_transpose(jnp.asarray(x), jnp.asarray(k), 2))
    theirs = F.conv_transpose1d(torch.from_numpy(x), torch.from_numpy(k),
                                stride=2, groups=c).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_upsample_downsample_roundtrip_preserves_band():
    """A smooth (low-frequency) signal should survive up->down nearly intact."""
    t = np.linspace(0, 4 * np.pi, 256).astype(np.float32)
    x = np.sin(t)[None, None, :]
    up = jnp.asarray(kaiser_sinc_filter1d(0.25, 0.3, 12))
    down = jnp.asarray(kaiser_sinc_filter1d(0.25, 0.3, 12))
    y = upsample1d_2x(jnp.asarray(x), up)
    assert y.shape == (1, 1, 512)
    z = np.asarray(downsample1d_2x(y, down))
    assert z.shape == (1, 1, 256)
    np.testing.assert_allclose(z[0, 0, 20:-20], x[0, 0, 20:-20], atol=5e-2)


def test_snakebeta_formula():
    x = jnp.asarray(np.linspace(-2, 2, 32, dtype=np.float32)[None, None, :])
    x = jnp.broadcast_to(x, (1, 3, 32))
    alpha = jnp.asarray([0.0, 1.0, -1.0])
    beta = jnp.asarray([0.0, 0.0, 0.0])
    y = np.asarray(snakebeta(x, alpha, beta, logscale=True))
    xn = np.asarray(x)
    expected = xn + (1.0 / (1.0 + 1e-9)) * np.sin(np.exp(np.asarray(alpha))[None, :, None] * xn) ** 2
    np.testing.assert_allclose(y, expected, atol=1e-5)


def test_bigvgan_generator_shapes():
    params = init_bigvgan(jax.random.PRNGKey(0), SMALL)
    voc = BigVGAN(params, SMALL)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 20)), jnp.float32)
    wav = voc.decode(mel)
    assert wav.shape == (2, 20 * 4 * 2)
    assert np.isfinite(np.asarray(wav)).all()
    assert np.abs(np.asarray(wav)).max() <= 1.0  # final clamp


def test_bigvgan_state_dict_conversion():
    params = init_bigvgan(jax.random.PRNGKey(0), SMALL)
    g = torch.Generator().manual_seed(0)

    sd = {}
    def add_conv(name, cin, cout, k, bias=True, weight_norm=True):
        if weight_norm:
            v = torch.randn(cout, cin, k, generator=g)
            sd[f"{name}.weight_g"] = torch.ones(cout, 1, 1)
            sd[f"{name}.weight_v"] = v
        else:
            sd[f"{name}.weight"] = torch.randn(cout, cin, k, generator=g)
        if bias:
            sd[f"{name}.bias"] = torch.randn(cout, generator=g)

    def add_convtranspose(name, cin, cout, k):
        # torch ConvTranspose1d weight layout: [in, out, k]
        v = torch.randn(cin, cout, k, generator=g)
        sd[f"{name}.weight_g"] = torch.ones(cin, 1, 1)
        sd[f"{name}.weight_v"] = v
        sd[f"{name}.bias"] = torch.randn(cout, generator=g)

    add_conv("conv_pre", 8, 16, 7)
    add_convtranspose("ups.0.0", 16, 8, 8)
    add_convtranspose("ups.1.0", 8, 4, 4)
    for m, c in [(0, 8), (1, 4)]:
        for i in range(2):
            add_conv(f"resblocks.{m}.convs1.{i}", c, c, 3)
            add_conv(f"resblocks.{m}.convs2.{i}", c, c, 3)
            for a in range(2 * i, 2 * i + 2):
                sd[f"resblocks.{m}.activations.{a}.act.alpha"] = torch.randn(c, generator=g)
                sd[f"resblocks.{m}.activations.{a}.act.beta"] = torch.randn(c, generator=g)
    sd["activation_post.act.alpha"] = torch.randn(4, generator=g)
    sd["activation_post.act.beta"] = torch.randn(4, generator=g)
    add_conv("conv_post", 4, 1, 7, bias=False)

    converted = convert_bigvgan_state_dict(sd, SMALL)
    # shapes line up with init (transposed-conv weights use torch [in,out,k])
    ref_shapes = jax.tree.map(lambda a: a.shape, params)
    # ups in our init are stored [out, in, k] for regular conv but torch
    # transposed conv is [in, out, k]; decode handles torch layout, so compare
    # against the converted tree's own consistency by running a forward:
    voc = BigVGAN(converted, SMALL)
    mel = jnp.zeros((1, 8, 10))
    wav = voc.decode(mel)
    assert wav.shape == (1, 80)
    assert np.isfinite(np.asarray(wav)).all()

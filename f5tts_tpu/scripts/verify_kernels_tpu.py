"""Real-chip kernel numerics check (verify step 3): megakernel fwd+VJP and
flash bwd vs XLA oracle at production shapes with ragged lengths."""
import jax
import jax.numpy as jnp
import numpy as np

from f5tts_tpu.ops.attention import (
    flash_attention, fused_qkv_rope_attention, mha_reference,
    masked_flash_attention, mha_reference_masked)
from f5tts_tpu.ops.rope import (apply_rotary_flat, rope_flat_tables,
                                rope_freqs_interleaved)

b, h, n, d = 2, 16, 1024, 64
hd = h * d
rng = np.random.default_rng(0)
qkv = jnp.asarray(rng.standard_normal((b, n, 3 * hd)) * 0.5, jnp.float32)
ct = jnp.asarray(rng.standard_normal((b, n, hd)), jnp.float32)
ang = rope_freqs_interleaved(d, n)
cos, sin = rope_flat_tables(ang, n, h, None, dtype=jnp.float32)
lens = jnp.asarray([777, 1024], jnp.int32)
rowmask = (jnp.arange(n)[None, :] < lens[:, None])[:, :, None]


def oracle(x):
    q, k, v = jnp.split(x, 3, axis=-1)
    qr = apply_rotary_flat(q, ang, h)
    kr = apply_rotary_flat(k, ang, h)
    sh = lambda t: t.reshape(b, n, h, d).transpose(0, 2, 1, 3)
    o = mha_reference(sh(qr), sh(kr), sh(v), lens)
    return o.transpose(0, 2, 1, 3).reshape(b, n, hd)


def loss_k(x):
    o = fused_qkv_rope_attention(x, cos, sin, lens, h)
    return jnp.sum(jnp.where(rowmask, o * ct, 0.0))


def loss_o(x):
    return jnp.sum(jnp.where(rowmask, oracle(x) * ct, 0.0))


ok = jax.jit(lambda x: fused_qkv_rope_attention(x, cos, sin, lens, h))(qkv)
oo = oracle(qkv)
fwd_d = float(jnp.max(jnp.abs(jnp.where(rowmask, ok - oo, 0.0))))
gk = jax.jit(jax.grad(loss_k))(qkv)
go = jax.jit(jax.grad(loss_o))(qkv)
rel = float(jnp.linalg.norm(gk - go) / jnp.linalg.norm(go))
print(f"megakernel fwd max|d| (live rows) = {fwd_d:.3e}")
print(f"megakernel grad rel-l2 vs oracle  = {rel:.3e}")
assert fwd_d < 3e-2 and rel < 3e-3

# flash bwd (head layout) bf16-dot check vs oracle at f32 inputs
q = jnp.asarray(rng.standard_normal((b, h, n, d)) * 0.5, jnp.float32)
k = jnp.asarray(rng.standard_normal((b, h, n, d)) * 0.5, jnp.float32)
v = jnp.asarray(rng.standard_normal((b, h, n, d)) * 0.5, jnp.float32)
ct4 = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
rm4 = (jnp.arange(n)[None, :] < lens[:, None])[:, None, :, None]


def lf(fn):
    def go_(q_, k_, v_):
        o = fn(q_, k_, v_, lens)
        return jnp.sum(jnp.where(rm4, o * ct4, 0.0))
    return go_


gq1, gk1, gv1 = jax.jit(jax.grad(lf(flash_attention), argnums=(0, 1, 2)))(q, k, v)
gq2, gk2, gv2 = jax.jit(jax.grad(lf(mha_reference), argnums=(0, 1, 2)))(q, k, v)
for name, a, o in (("dq", gq1, gq2), ("dk", gk1, gk2), ("dv", gv1, gv2)):
    r = float(jnp.linalg.norm(a - o) / jnp.linalg.norm(o))
    print(f"flash bwd {name} rel-l2 = {r:.3e}")
    assert r < 5e-3, name

# masked flash (MMDiT joint) with a mid-sequence hole
km = np.ones((b, n), bool)
km[0, 500:700] = False
km[1, 900:] = False
km = jnp.asarray(km)
om = jax.jit(lambda a, b_, c: masked_flash_attention(a, b_, c, km))(q, k, v)
orf = mha_reference_masked(q, k, v, km)
md = float(jnp.max(jnp.abs(om - orf)))
print(f"masked flash fwd max|d| = {md:.3e}")
assert md < 3e-2

# long-n flat megakernel at production width, bf16, ragged lengths — both
# the default single-pass kernel and the >4096-guard KV-streaming variant
# (FLAT_SINGLE_PASS_MAX_N lowered), incl. an n % 1024 != 0 tail-block shape
from f5tts_tpu.ops import attention as _att

for _cap, _vn in ((4096, "single"), (2048, "stream")):
  _att.FLAT_SINGLE_PASS_MAX_N = _cap
  for n_l, lens_l in ((3072, (2816, 3072)), (2816, (2700, 2816))):
    qkv_l = jnp.asarray(rng.standard_normal((2, n_l, 3 * hd)) * 0.5, jnp.bfloat16)
    ang_l = rope_freqs_interleaved(d, n_l)
    cos_l, sin_l = rope_flat_tables(ang_l, n_l, h, None)
    lens_j = jnp.asarray(lens_l, jnp.int32)
    rm = (jnp.arange(n_l)[None, :] < lens_j[:, None])[:, :, None]

    def oracle_l(x):
        qq, kk, vv = jnp.split(x, 3, axis=-1)
        qr = apply_rotary_flat(qq, ang_l, h)
        kr = apply_rotary_flat(kk, ang_l, h)
        sh2 = lambda t: t.reshape(2, n_l, h, d).transpose(0, 2, 1, 3)
        o = mha_reference(sh2(qr), sh2(kr), sh2(vv), lens_j)
        return o.transpose(0, 2, 1, 3).reshape(2, n_l, hd)

    o_l = jax.jit(lambda x: fused_qkv_rope_attention(x, cos_l, sin_l, lens_j, h))(qkv_l)
    d_l = jnp.where(rm, o_l.astype(jnp.float32)
                    - jax.jit(oracle_l)(qkv_l).astype(jnp.float32), 0.0)
    md_l = float(jnp.max(jnp.abs(d_l)))
    print(f"long-n megakernel [{_vn}] n={n_l} max|d| (live rows) = {md_l:.3e}")
    assert md_l < 3e-2

_att.FLAT_SINGLE_PASS_MAX_N = 4096
print("ALL KERNEL NUMERICS OK on", jax.devices()[0])

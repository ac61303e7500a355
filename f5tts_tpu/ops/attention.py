"""Attention ops: XLA reference + Pallas TPU flash-attention.

This is the DiT hot kernel. The reference uses torch SDPA or the flash-attn
CUDA extension with varlen unpadding (reference: src/f5_tts/model/modules.py:
446-448, 511-543). TPU-native replacement:

- `mha_reference`: plain jnp attention with f32 softmax — used for tests,
  for the backward pass, and as the fallback backend.
- `flash_attention`: Pallas kernel, non-causal, online-softmax tiling with
  per-sequence valid-length masking (replaces flash_attn_varlen unpad/pad
  round-trip — padded positions are masked in-kernel instead).

Layout: q/k/v are [b, h, n, d]; `lengths` is [b] (valid key/query count).
Softmax scale 1/sqrt(d) matches torch SDPA's default.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LSE_LANES = 8  # trailing lane axis for per-row stats (TPU block-tiling rule)


def mha_reference(
    q: jax.Array, k: jax.Array, v: jax.Array, lengths: jax.Array | None = None
) -> jax.Array:
    """[b,h,n,d] x3 -> [b,h,n,d]; f32 softmax; key positions >= lengths masked."""
    b, h, n, d = q.shape
    scale = 1.0 / math.sqrt(d)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if lengths is not None:
        kmask = jnp.arange(n)[None, :] < lengths[:, None]  # [b, n]
        scores = jnp.where(kmask[:, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
    return out


# ---------------------------------------------------------------------------
# Pallas flash attention (non-causal, varlen via in-kernel length masking)
# ---------------------------------------------------------------------------

def _flash_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, lse_ref=None, *,
                  block_k: int, sm_scale: float):
    """One (batch, head, q-block) program: online softmax over k blocks.

    Refs: len_ref SMEM [b] (scalar-prefetch); q_ref [1,1,bq,d];
    k_ref/v_ref [1,1,n,d]; o_ref [1,1,bq,d]; optional lse_ref [1,1,bq]
    (log-sum-exp of scaled scores per query row, saved for the backward).
    """
    bi = pl.program_id(0)
    qi = pl.program_id(2)
    valid_len = len_ref[bi]

    n, d = k_ref.shape[2], k_ref.shape[3]
    bq = q_ref.shape[2]

    # Padded-tail skipping: sequences are padded up to compile buckets, so a
    # large fraction of blocks can be dead. Fully-padded q blocks write zeros
    # and do no compute; the k loop stops at the last live k block.
    q_live = qi * bq < valid_len
    num_kb_live = pl.cdiv(valid_len, block_k)

    @pl.when(jnp.logical_not(q_live))
    def _():
        o_ref[0, 0, :, :] = jnp.zeros((bq, d), o_ref.dtype)
        if lse_ref is not None:
            lse_ref[0, 0, :, :] = jnp.full(lse_ref.shape[2:], NEG_INF, lse_ref.dtype)

    @pl.when(q_live)
    def _():
        # keep matmul inputs in their native dtype (bf16 on the inference
        # path) so the MXU runs at full rate; accumulate in f32 via
        # preferred_element_type. Only softmax statistics live in f32.
        q = q_ref[0, 0, :, :] * jnp.asarray(sm_scale, q_ref.dtype)

        m0 = jnp.full((bq, 1), NEG_INF, dtype=jnp.float32)
        l0 = jnp.zeros((bq, 1), dtype=jnp.float32)
        acc0 = jnp.zeros((bq, d), dtype=jnp.float32)

        def body(kb, carry):
            m_prev, l_prev, acc = carry
            k_blk = k_ref[0, 0, pl.ds(kb * block_k, block_k), :]
            v_blk = v_ref[0, 0, pl.ds(kb * block_k, block_k), :]
            s = jax.lax.dot_general(
                q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # [bq, block_k] f32
            # NOTE: a lax.cond specialization (skip masking for fully-valid
            # blocks) blows up Mosaic compile time inside the fori_loop —
            # keep the unconditional mask. It is ONE [1, block_k] bias row
            # broadcast-added into the scores: a [bq, block_k] iota+cmp+select
            # costs 3 full VPU passes, the row add costs 1 (-14% kernel time).
            col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
            s = s + jnp.where(col < valid_len, 0.0, NEG_INF)

            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc

        m, l, acc = jax.lax.fori_loop(0, num_kb_live, body, (m0, l0, acc0))
        l_safe = jnp.where(l == 0.0, 1.0, l)  # padded query rows within a live block
        o_ref[0, 0, :, :] = (acc / l_safe).astype(o_ref.dtype)
        if lse_ref is not None:
            lse = jnp.where(l > 0.0, m + jnp.log(l_safe), NEG_INF)  # [bq, 1]
            lse_ref[0, 0, :, :] = jnp.broadcast_to(
                lse, lse_ref.shape[2:]).astype(lse_ref.dtype)


def _flash_kernel_single(len_ref, q_ref, k_ref, v_ref, o_ref, lse_ref=None, *,
                         sm_scale: float):
    """Single-KV-pass variant for moderate n (scores fit VMEM): one big
    s = qK^T dot, one softmax pass, one pV dot — fewer VPU passes and larger
    GEMMs than the online-softmax loop. Used when n <= 2048."""
    bi = pl.program_id(0)
    qi = pl.program_id(2)
    valid_len = len_ref[bi]

    n, d = k_ref.shape[2], k_ref.shape[3]
    bq = q_ref.shape[2]
    q_live = qi * bq < valid_len

    @pl.when(jnp.logical_not(q_live))
    def _():
        o_ref[0, 0, :, :] = jnp.zeros((bq, d), o_ref.dtype)
        if lse_ref is not None:
            lse_ref[0, 0, :, :] = jnp.full(lse_ref.shape[2:], NEG_INF, lse_ref.dtype)

    @pl.when(q_live)
    def _():
        q = q_ref[0, 0, :, :] * jnp.asarray(sm_scale, q_ref.dtype)
        k = k_ref[0, 0, :, :]
        v = v_ref[0, 0, :, :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [bq, n]
        # varlen mask as ONE [1, n] bias row broadcast-added into the scores
        # (a [bq, n] iota+cmp+select is 3 full VPU passes; measured -14%
        # kernel time at b=2 h=16 n=1024 d=64 — scripts/attn_kernel_ab.py)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        s = s + jnp.where(col < valid_len, 0.0, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        l_safe = jnp.where(l == 0.0, 1.0, l)
        acc = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[0, 0, :, :] = (acc / l_safe).astype(o_ref.dtype)
        if lse_ref is not None:
            lse = jnp.where(l > 0.0, m + jnp.log(l_safe), NEG_INF)
            lse_ref[0, 0, :, :] = jnp.broadcast_to(
                lse, lse_ref.shape[2:]).astype(lse_ref.dtype)


# scores (bq x n f32) + kv must fit VMEM alongside q/o
SINGLE_PASS_MAX_N = 2048
# flat megakernel ceiling: past FLAT_SINGLE_PASS_MAX_N the streaming variant
# (online softmax over KV blocks, same flat layout + in-kernel RoPE) takes
# over; 4096 = the sampler's max_duration cap (config.py), at which the
# resident k/v/krot/cos/sin blocks total ~45 MB of VMEM
FLAT_ATTN_MAX_N = 4096
# flat kernel's own single-pass bound (separate from the head-split kernels'
# cap). Measured on chip (scripts/fused_attn_longn_ab.py, b=2 dim=1024 h=16
# bf16, per attn layer incl. projections): single-pass beats the KV-streaming
# online-softmax variant by ~11% at every n in {2816, 3072, 4096} (1359 vs
# 1523 us at 2816; 2504 vs 2785 at 4096) and the decomposed head-split path
# by ~2x. Bound at 3072, NOT 4096: standalone the single-pass kernel compiles
# at 4096, but inside the fused sampler graph its scoped-vmem stack hits
# 100.6M vs a ~90M effective limit ("kernel-vmem-stack-oom") — the streaming
# variant covers (3072, 4096] at ~11% more attention time.
FLAT_SINGLE_PASS_MAX_N = 3072


def _pick_block(n: int, candidates=(512, 256, 128)) -> int:
    for c in candidates:
        if n % c == 0:
            return c
    return n


def _flash_forward(q: jax.Array, k: jax.Array, v: jax.Array, lengths: jax.Array,
                   return_lse: bool = False):
    b, h, n, d = q.shape
    block_q = _pick_block(n, (256, 128))  # 256 measured fastest on v5e
    block_k = _pick_block(n, (512, 256, 128))
    sm_scale = 1.0 / math.sqrt(d)

    grid = (b, h, n // block_q)
    if n <= SINGLE_PASS_MAX_N:
        kernel = functools.partial(_flash_kernel_single, sm_scale=sm_scale)
    else:
        kernel = functools.partial(_flash_kernel, block_k=block_k, sm_scale=sm_scale)
    if not return_lse:
        kernel = functools.partial(kernel, lse_ref=None)

    # LSE rides as [b, h, n, LSE_LANES]: TPU block tiling requires the last
    # two block dims be (8k, 128k) or equal to the array dims; a trailing
    # lane axis of 8 satisfies that at 8x storage (4 MB at b=8 n=1024).
    out_shape = jax.ShapeDtypeStruct(q.shape, q.dtype)
    out_spec = pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, lens: (bi, hi, qi, 0))
    if return_lse:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((b, h, n, LSE_LANES), jnp.float32))
        out_spec = (out_spec,
                    pl.BlockSpec((1, 1, block_q, LSE_LANES),
                                 lambda bi, hi, qi, lens: (bi, hi, qi, 0)))

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # lengths, indexed per-batch inside the kernel
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, lens: (bi, hi, qi, 0)),
                pl.BlockSpec((1, 1, n, d), lambda bi, hi, qi, lens: (bi, hi, 0, 0)),
                pl.BlockSpec((1, 1, n, d), lambda bi, hi, qi, lens: (bi, hi, 0, 0)),
            ],
            out_specs=out_spec,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * d,
            bytes_accessed=4 * b * h * n * d * q.dtype.itemsize,
            transcendentals=b * h * n * n,
        ),
        interpret=jax.default_backend() != "tpu",  # CPU tests run interpreted
    )(lengths.astype(jnp.int32), q, k, v)


# ---------------------------------------------------------------------------
# Pallas backward kernels (O(n) memory; standard two-pass flash backward)
# ---------------------------------------------------------------------------

def _flash_bwd_dq_kernel(len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dq_ref, *, block_k: int, sm_scale: float):
    """dQ for one q block: dQ = scale * sum_kb [p o (dp - delta)] @ K_kb."""
    bi = pl.program_id(0)
    qi = pl.program_id(2)
    valid_len = len_ref[bi]

    n, d = k_ref.shape[2], k_ref.shape[3]
    bq = q_ref.shape[2]
    q_live = qi * bq < valid_len

    @pl.when(jnp.logical_not(q_live))
    def _():
        dq_ref[0, 0, :, :] = jnp.zeros((bq, d), dq_ref.dtype)

    @pl.when(q_live)
    def _():
        q = q_ref[0, 0, :, :]
        # keep every MXU operand in its native (bf16) dtype with f32
        # accumulation via preferred_element_type: f32xf32 dots run the MXU
        # at ~1/4 rate (same lesson as the forward kernel). Only softmax
        # statistics and the ds intermediate live in f32.
        do = do_ref[0, 0, :, :]
        lse = lse_ref[0, 0, :, 0:1].astype(jnp.float32)
        delta = delta_ref[0, 0, :, 0:1].astype(jnp.float32)

        num_kb_live = pl.cdiv(valid_len, block_k)

        # NOTE: padded q rows inside a live block are NOT masked — the forward
        # computes them as softmax over live keys (same as the XLA reference),
        # so the exact VJP propagates their cotangents too. Only fully-dead q
        # blocks (forward output constant zero) drop gradients.
        def body(kb, acc):
            k_blk = k_ref[0, 0, pl.ds(kb * block_k, block_k), :]
            v_blk = v_ref[0, 0, pl.ds(kb * block_k, block_k), :]
            s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * sm_scale
            col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
            p = jnp.where(col < valid_len, jnp.exp(s - lse), 0.0)
            dp = jax.lax.dot_general(do, v_blk,
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = p * (dp - delta)
            return acc + jax.lax.dot_general(
                ds.astype(k_blk.dtype), k_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        acc = jax.lax.fori_loop(0, num_kb_live, body, jnp.zeros((bq, d), jnp.float32))
        dq_ref[0, 0, :, :] = (acc * sm_scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, *, block_q: int, sm_scale: float):
    """dK/dV for one k block: loop over q blocks."""
    bi = pl.program_id(0)
    ki = pl.program_id(2)
    valid_len = len_ref[bi]

    n, d = q_ref.shape[2], q_ref.shape[3]
    bk = k_ref.shape[2]
    k_live = ki * bk < valid_len

    @pl.when(jnp.logical_not(k_live))
    def _():
        dk_ref[0, 0, :, :] = jnp.zeros((bk, d), dk_ref.dtype)
        dv_ref[0, 0, :, :] = jnp.zeros((bk, d), dv_ref.dtype)

    @pl.when(k_live)
    def _():
        k_blk = k_ref[0, 0, :, :]
        col = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)

        num_qb_live = pl.cdiv(valid_len, block_q)

        # dV and dK fused: recompute p once per q block. All MXU operands stay
        # in their native (bf16) dtype — f32 inputs quarter MXU throughput;
        # accumulation is f32 via preferred_element_type. Casting p/ds to bf16
        # for the dV/dK dots is the standard flash-backward practice.
        def body2(qb, carry):
            dk_acc, dv_acc = carry
            q_blk = q_ref[0, 0, pl.ds(qb * block_q, block_q), :]
            do = do_ref[0, 0, pl.ds(qb * block_q, block_q), :]
            lse = lse_ref[0, 0, pl.ds(qb * block_q, block_q), 0:1].astype(jnp.float32)
            delta = delta_ref[0, 0, pl.ds(qb * block_q, block_q), 0:1].astype(jnp.float32)
            # padded q rows in a live block carry real softmax weights (see
            # _flash_bwd_dq_kernel note); only dead q blocks are skipped.
            s = jax.lax.dot_general(q_blk, k_blk, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * sm_scale
            p = jnp.where(col < valid_len, jnp.exp(s - lse), 0.0)
            dv_acc = dv_acc + jax.lax.dot_general(
                p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            v_blk = v_ref[0, 0, :, :]
            dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)  # [bq, bk]
            ds = p * (dp - delta)
            dk_acc = dk_acc + jax.lax.dot_general(
                ds.astype(q_blk.dtype), q_blk, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return dk_acc, dv_acc

        dk0 = jnp.zeros((bk, d), jnp.float32)
        dv0 = jnp.zeros((bk, d), jnp.float32)
        dk, dv = jax.lax.fori_loop(0, num_qb_live, body2, (dk0, dv0))
        dk_ref[0, 0, :, :] = (dk * sm_scale).astype(dk_ref.dtype)
        dv_ref[0, 0, :, :] = dv.astype(dv_ref.dtype)


def _flash_bwd_fused_kernel(len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                            delta_ref, dq_ref, dk_ref, dv_ref, *,
                            sm_scale: float):
    """dQ+dK+dV in ONE kernel: grid (b, h, n//bk), kb sequential.

    The split dq/dkv kernels each recompute the score matrix and dp — 7 n²
    dots total; computing s/p/dp once per (q, k-block) pair needs only 5.
    dq accumulates into a revisited f32 output block (constant index over the
    sequential kb axis); q/do/lse/delta ride whole-sequence (n=1024 bf16 q is
    128 KB of VMEM). Row-liveness comes from the saved lse (finite only where
    the forward computed real softmax rows), so padded q rows inside live
    blocks keep their cotangents exactly like the split kernels."""
    bi = pl.program_id(0)
    kb = pl.program_id(2)
    valid_len = len_ref[bi]

    n, d = q_ref.shape[2], q_ref.shape[3]
    bk = k_ref.shape[2]

    @pl.when(kb == 0)
    def _():
        dq_ref[0, 0, :, :] = jnp.zeros((n, d), dq_ref.dtype)

    k_live = kb * bk < valid_len

    @pl.when(jnp.logical_not(k_live))
    def _():
        dk_ref[0, 0, :, :] = jnp.zeros((bk, d), dk_ref.dtype)
        dv_ref[0, 0, :, :] = jnp.zeros((bk, d), dv_ref.dtype)

    @pl.when(k_live)
    def _():
        q = q_ref[0, 0, :, :]
        do = do_ref[0, 0, :, :]
        k_blk = k_ref[0, 0, :, :]
        v_blk = v_ref[0, 0, :, :]
        lse = lse_ref[0, 0, :, 0:1].astype(jnp.float32)
        delta = delta_ref[0, 0, :, 0:1].astype(jnp.float32)

        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        col = kb * bk + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
        row_live = lse > NEG_INF / 2  # [n, 1]
        p = jnp.where(jnp.logical_and(row_live, col < valid_len),
                      jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        ds_lo = ds.astype(k_blk.dtype)

        dv_ref[0, 0, :, :] = jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        dk_ref[0, 0, :, :] = (jax.lax.dot_general(
            ds_lo, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale).astype(dk_ref.dtype)
        dq_ref[0, 0, :, :] += (jax.lax.dot_general(
            ds_lo, k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale).astype(dq_ref.dtype)


def _flash_backward_fused(q, k, v, lengths, o, lse, do):
    b, h, n, d = q.shape
    block_k = _pick_block(n, (256, 128))
    sm_scale = 1.0 / math.sqrt(d)
    interpret = jax.default_backend() != "tpu"

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta[..., None], (*delta.shape, LSE_LANES))
    lens32 = lengths.astype(jnp.int32)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_fused_kernel, sm_scale=sm_scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, n // block_k),
            in_specs=[
                pl.BlockSpec((1, 1, n, d), lambda bi, hi, ki, lens: (bi, hi, 0, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, lens: (bi, hi, ki, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, lens: (bi, hi, ki, 0)),
                pl.BlockSpec((1, 1, n, d), lambda bi, hi, ki, lens: (bi, hi, 0, 0)),
                pl.BlockSpec((1, 1, n, LSE_LANES), lambda bi, hi, ki, lens: (bi, hi, 0, 0)),
                pl.BlockSpec((1, 1, n, LSE_LANES), lambda bi, hi, ki, lens: (bi, hi, 0, 0)),
            ],
            out_specs=(
                # dq: one revisited f32 block per (b, h), accumulated over kb
                pl.BlockSpec((1, 1, n, d), lambda bi, hi, ki, lens: (bi, hi, 0, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, lens: (bi, hi, ki, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, lens: (bi, hi, ki, 0)),
            ),
        ),
        out_shape=(jax.ShapeDtypeStruct(q.shape, jnp.float32),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # whole-sequence q/do/lse/delta blocks + the revisited f32 dq
            # block overflow the 16 MB scoped default past n=2048 (long-clip
            # training: the reference trains 0.3-30 s samples)
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lens32, q, k, v, do, lse, delta)
    return dq.astype(q.dtype), dk, dv


def _flash_backward(q, k, v, lengths, o, lse, do):
    b, h, n, d = q.shape
    if n % _pick_block(n, (256, 128)) == 0:
        return _flash_backward_fused(q, k, v, lengths, o, lse, do)
    block_q = _pick_block(n, (256, 128))
    block_k = _pick_block(n, (256, 128))
    sm_scale = 1.0 / math.sqrt(d)
    interpret = jax.default_backend() != "tpu"

    # delta = rowsum(dO * O) (f32), broadcast over the trailing lane axis
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)  # [b,h,n]
    delta = jnp.broadcast_to(delta[..., None], (*delta.shape, LSE_LANES))

    lens32 = lengths.astype(jnp.int32)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, block_k=block_k, sm_scale=sm_scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, n // block_q),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, lens: (bi, hi, qi, 0)),
                pl.BlockSpec((1, 1, n, d), lambda bi, hi, qi, lens: (bi, hi, 0, 0)),
                pl.BlockSpec((1, 1, n, d), lambda bi, hi, qi, lens: (bi, hi, 0, 0)),
                pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, lens: (bi, hi, qi, 0)),
                pl.BlockSpec((1, 1, block_q, LSE_LANES), lambda bi, hi, qi, lens: (bi, hi, qi, 0)),
                pl.BlockSpec((1, 1, block_q, LSE_LANES), lambda bi, hi, qi, lens: (bi, hi, qi, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, lens: (bi, hi, qi, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lens32, q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, block_q=block_q, sm_scale=sm_scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, n // block_k),
            in_specs=[
                pl.BlockSpec((1, 1, n, d), lambda bi, hi, ki, lens: (bi, hi, 0, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, lens: (bi, hi, ki, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, lens: (bi, hi, ki, 0)),
                pl.BlockSpec((1, 1, n, d), lambda bi, hi, ki, lens: (bi, hi, 0, 0)),
                pl.BlockSpec((1, 1, n, LSE_LANES), lambda bi, hi, ki, lens: (bi, hi, 0, 0)),
                pl.BlockSpec((1, 1, n, LSE_LANES), lambda bi, hi, ki, lens: (bi, hi, 0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, lens: (bi, hi, ki, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, lens: (bi, hi, ki, 0)),
            ),
        ),
        out_shape=(jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lens32, q, k, v, do, lse, delta)

    return dq, dk, dv


@jax.custom_vjp
def flash_attention(q, k, v, lengths):
    return _flash_forward(q, k, v, lengths)


def _flash_fwd(q, k, v, lengths):
    o, lse = _flash_forward(q, k, v, lengths, return_lse=True)
    return o, (q, k, v, lengths, o, lse)


def _flash_bwd(res, g):
    # Pallas two-pass flash backward: O(n) memory, p recomputed from the saved
    # per-row log-sum-exp.
    q, k, v, lengths, o, lse = res
    dq, dk, dv = _flash_backward(q, k, v, lengths, o, lse, g)
    return dq, dk, dv, None


flash_attention.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# Fused QKV+RoPE attention megakernel (inference forward only)
#
# Consumes the fused QKV projection output [b, n, 3*h*d] DIRECTLY in its flat
# layout: RoPE is applied in VMEM (k roped once per batch into scratch), heads
# are processed as 128-lane pairs so every slice is tile-aligned, and the
# output is written flat [b, n, h*d], ready for the to_out projection. This
# replaces four separate HBM passes per attention (rope on q, rope on k, the
# [b,n,h,d]->[b,h,n,d] head-split transposes, and the QKV lane split) that
# together cost ~14% of sampler step time in device traces.
#
# The paired-head trick: with d=64, a [bq,64]x[64,n] score dot runs the MXU at
# 50% (half-depth contraction). Packing two heads side by side into 128 lanes
# and zeroing the other head's lanes in q gives the SAME cycle count (the
# zeros occupy the otherwise-wasted half) but keeps all slices 128-aligned,
# which Mosaic requires to avoid realignment copies.
# ---------------------------------------------------------------------------

def _fused_qkv_attn_kernel(len_ref, q_ref, k_ref, v_ref, cos_ref, sin_ref,
                           o_ref, krot_ref, qrot_ref, *,
                           heads: int, sm_scale: float):
    """One (batch, q-block) program; single KV pass per head (n <= 2048).

    Refs: q_ref [1,bq,hd]; k_ref/v_ref [1,n,hd] (lane-sliced views of the
    fused [b,n,3hd] projection output); cos_ref/sin_ref [n,hd] flat tables
    (rope_flat_tables); o_ref [1,bq,hd]; krot_ref VMEM scratch [n,hd] holding
    roped k, computed once per batch (qi is the inner, sequential grid dim).
    """
    qi = pl.program_id(1)
    valid_len = len_ref[pl.program_id(0)]
    n, hd = k_ref.shape[1], k_ref.shape[2]
    bq = q_ref.shape[1]
    d = hd // heads
    lane_hd = jax.lax.broadcasted_iota(jnp.int32, (1, hd), 1)

    def rope(xf, cs, sn):
        # out[2i] = x[2i]c - x[2i+1]s; out[2i+1] = x[2i+1]c + x[2i]s.
        # Lane rolls + parity select; wrap-around lanes land only on
        # positions the select discards (same trick as apply_rotary_flat).
        # pltpu.roll requires shift >= 0: roll by -1 == roll by hd-1.
        rot = jnp.where(lane_hd % 2 == 0,
                        -pltpu.roll(xf, hd - 1, 1),
                        pltpu.roll(xf, 1, 1))
        return xf * cs + rot * sn

    @pl.when(qi == 0)
    def _():
        # rope k into scratch in row chunks; fori_loop (not Python unroll) so
        # Mosaic reuses one chunk's worth of f32 temporaries on its stack.
        # Fixed 128-row chunks: n is always a 128-multiple, while bq may
        # overhang n when the last q block is tail-padded (odd multiples).
        def chunk(c, _):
            rows = pl.ds(c * 128, 128)
            kf = k_ref[0, rows, :].astype(jnp.float32)
            cs = cos_ref[rows, :].astype(jnp.float32)
            sn = sin_ref[rows, :].astype(jnp.float32)
            krot_ref[rows, :] = rope(kf, cs, sn).astype(krot_ref.dtype)
            return 0
        jax.lax.fori_loop(0, n // 128, chunk, 0)

    q_live = qi * bq < valid_len

    @pl.when(jnp.logical_not(q_live))
    def _():
        o_ref[0, :, :] = jnp.zeros((bq, hd), o_ref.dtype)

    @pl.when(q_live)
    def _():
        rows = pl.ds(qi * bq, bq)
        qf = q_ref[0, :, :].astype(jnp.float32)
        cs = cos_ref[rows, :].astype(jnp.float32)
        sn = sin_ref[rows, :].astype(jnp.float32)
        qrot_ref[:, :] = (rope(qf, cs, sn) * sm_scale).astype(qrot_ref.dtype)

        coln = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        bias = jnp.where(coln < valid_len, 0.0, NEG_INF)  # [1, n] f32
        pair = max(d, 128)
        lane_p = jax.lax.broadcasted_iota(jnp.int32, (1, pair), 1)

        # fori_loop (not Python unroll) over head pairs: one pair's worth of
        # score temporaries on the Mosaic stack instead of heads/2 of them
        # (unrolled, the kernel allocates ~23MB of stack and OOMs VMEM)
        def pair_body(hp, _):
            lanes = pl.ds(hp * pair, pair)
            qp = qrot_ref[:, lanes]
            kp = krot_ref[:, lanes]
            vp = v_ref[0, :, lanes]
            halves = [qp] if pair == d else [
                jnp.where(lane_p < d, qp, 0).astype(qp.dtype),
                jnp.where(lane_p >= d, qp, 0).astype(qp.dtype),
            ]
            pvs = []
            for qh in halves:
                s = jax.lax.dot_general(qh, kp, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                s = s + bias
                mx = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - mx)
                l = jnp.sum(p, axis=-1, keepdims=True)
                pv = jax.lax.dot_general(p.astype(vp.dtype), vp,
                                         (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                pvs.append(pv / jnp.where(l == 0.0, 1.0, l))
            op = pvs[0] if pair == d else jnp.where(lane_p < d, pvs[0], pvs[1])
            o_ref[0, :, lanes] = op.astype(o_ref.dtype)
            return 0

        jax.lax.fori_loop(0, hd // pair, pair_body, 0)


def _fused_qkv_attn_kernel_stream(len_ref, q_ref, k_ref, v_ref, cos_ref,
                                  sin_ref, o_ref, krot_ref, qrot_ref, *,
                                  heads: int, sm_scale: float, block_k: int):
    """Online-softmax variant of _fused_qkv_attn_kernel for long sequences
    (SINGLE_PASS_MAX_N < n <= FLAT_ATTN_MAX_N — the reference serves
    3000-frame profiles, reference runtime/triton_trtllm/patch/f5tts/
    model.py:109, which used to fall off the megakernel entirely).

    Same flat layout, same once-per-batch roped-k scratch, same paired-head
    128-lane dots as the single-pass kernel; the only change is per
    head-pair: instead of one [bq, n] f32 score matrix, the (VMEM-resident)
    roped keys/values are walked in `block_k`-column chunks with the
    standard online-softmax carries (m, l, acc), so the f32 temporaries
    stay [bq, block_k]. The k loop stops after the last LIVE key block, so
    bucket padding (e.g. 2816 live of a 3072 bucket) costs no compute.
    """
    qi = pl.program_id(1)
    valid_len = len_ref[pl.program_id(0)]
    n, hd = k_ref.shape[1], k_ref.shape[2]
    bq = q_ref.shape[1]
    d = hd // heads
    lane_hd = jax.lax.broadcasted_iota(jnp.int32, (1, hd), 1)

    def rope(xf, cs, sn):
        rot = jnp.where(lane_hd % 2 == 0,
                        -pltpu.roll(xf, hd - 1, 1),
                        pltpu.roll(xf, 1, 1))
        return xf * cs + rot * sn

    @pl.when(qi == 0)
    def _():
        # fixed 128-row chunks (not bq): bq may overhang n when the last q
        # block is tail-padded (odd 128-multiples, e.g. 2688)
        def chunk(c, _):
            rows = pl.ds(c * 128, 128)
            kf = k_ref[0, rows, :].astype(jnp.float32)
            cs = cos_ref[rows, :].astype(jnp.float32)
            sn = sin_ref[rows, :].astype(jnp.float32)
            krot_ref[rows, :] = rope(kf, cs, sn).astype(krot_ref.dtype)
            return 0
        jax.lax.fori_loop(0, n // 128, chunk, 0)

    q_live = qi * bq < valid_len

    @pl.when(jnp.logical_not(q_live))
    def _():
        o_ref[0, :, :] = jnp.zeros((bq, hd), o_ref.dtype)

    @pl.when(q_live)
    def _():
        rows = pl.ds(qi * bq, bq)
        qf = q_ref[0, :, :].astype(jnp.float32)
        cs = cos_ref[rows, :].astype(jnp.float32)
        sn = sin_ref[rows, :].astype(jnp.float32)
        qrot_ref[:, :] = (rope(qf, cs, sn) * sm_scale).astype(qrot_ref.dtype)

        # FULL block_k-wide blocks, plus one STATIC-width tail block covering
        # n % block_k (a 128-multiple). This keeps block_k at 1024 for every
        # n instead of shrinking it to gcd(n, 1024) — at n=2816 a 256-wide
        # block_k measured ~35% slower end-to-end than 1024-wide. The full
        # loop stops after the last LIVE block; the tail runs whenever it
        # exists (its dead columns are bias-masked; since valid_len >= 1 and
        # n > block_k, full block 0 always ran, so the online max is finite
        # and masked columns contribute exp(NEG_INF - m) == 0).
        num_kb = n // block_k
        tail_w = n % block_k
        num_kb_live = jnp.minimum(pl.cdiv(valid_len, block_k), num_kb)
        pair = max(d, 128)
        lane_p = jax.lax.broadcasted_iota(jnp.int32, (1, pair), 1)

        def pair_body(hp, _):
            lanes = pl.ds(hp * pair, pair)
            qp = qrot_ref[:, lanes]
            halves = [qp] if pair == d else [
                jnp.where(lane_p < d, qp, 0).astype(qp.dtype),
                jnp.where(lane_p >= d, qp, 0).astype(qp.dtype),
            ]
            pvs = []
            for qh in halves:
                def online_step(k_off, width, carry):
                    m_prev, l_prev, acc = carry
                    kcols = pl.ds(k_off, width)
                    kp = krot_ref[kcols, lanes]
                    vp = v_ref[0, kcols, lanes]
                    s = jax.lax.dot_general(
                        qh, kp, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # [bq, width]
                    col = k_off + jax.lax.broadcasted_iota(
                        jnp.int32, (1, width), 1)
                    s = s + jnp.where(col < valid_len, 0.0, NEG_INF)
                    m_cur = jnp.max(s, axis=-1, keepdims=True)
                    m_new = jnp.maximum(m_prev, m_cur)
                    alpha = jnp.exp(m_prev - m_new)
                    p = jnp.exp(s - m_new)
                    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
                    acc = acc * alpha + jax.lax.dot_general(
                        p.astype(vp.dtype), vp, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    return m_new, l_new, acc

                m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
                l0 = jnp.zeros((bq, 1), jnp.float32)
                acc0 = jnp.zeros((bq, pair), jnp.float32)
                carry = jax.lax.fori_loop(
                    0, num_kb_live,
                    lambda kb, c: online_step(kb * block_k, block_k, c),
                    (m0, l0, acc0))
                if tail_w:
                    carry = online_step(num_kb * block_k, tail_w, carry)
                m, l, acc = carry
                pvs.append(acc / jnp.where(l == 0.0, 1.0, l))
            op = pvs[0] if pair == d else jnp.where(lane_p < d, pvs[0], pvs[1])
            o_ref[0, :, lanes] = op.astype(o_ref.dtype)
            return 0

        jax.lax.fori_loop(0, hd // pair, pair_body, 0)


def _fused_qkv_rope_attention_impl(
    qkv: jax.Array,       # [b, n, 3*h*d] fused projection output (flat)
    cos: jax.Array,       # [n, h*d] flat rope table (rope_flat_tables)
    sin: jax.Array,       # [n, h*d]
    lengths: jax.Array,   # [b] int32
    heads: int,
) -> jax.Array:
    """Flat-layout attention with in-kernel RoPE; returns [b, n, h*d].

    Requires n % 128 == 0, (h*d) % 128 == 0, d in {64,128},
    n <= FLAT_ATTN_MAX_N. n <= SINGLE_PASS_MAX_N runs the single-KV-pass
    kernel (scores fit VMEM); longer sequences the streaming variant.
    """
    b, n, hd3 = qkv.shape
    hd = hd3 // 3
    d = hd // heads
    bq = _pick_block(n, (512, 256, 128))
    if bq == 128 and n > 256:
        # odd 128-multiples (640, 1152, ...): a 128-row q block halves MXU
        # block efficiency (measured ~2/3 of the row saving lost at n=640).
        # Run bq=256 with a TAIL-PADDED final q block instead: Pallas pads
        # the out-of-range q/o rows (stores there are dropped; each q row's
        # output depends only on itself, so padding cannot contaminate live
        # rows). Only the cos/sin tables need explicit padding — the kernel
        # dynamic-slices them at q-block offsets that may overhang n.
        bq = 256
    if n > FLAT_SINGLE_PASS_MAX_N:
        # streaming band (3072, 4096]: the resident k/v/cos/sin/krot blocks
        # alone approach the platform's ~90 MB scoped-vmem ceiling inside
        # the fused sampler graph; 128-row q blocks halve the stack
        # temporaries to fit
        bq = 128
    sm_scale = 1.0 / math.sqrt(d)
    n_pad = -(-n // bq) * bq
    if n_pad != n:
        cos = jnp.pad(cos, ((0, n_pad - n), (0, 0)))
        sin = jnp.pad(sin, ((0, n_pad - n), (0, 0)))
    grid = (b, n_pad // bq)

    if n <= FLAT_SINGLE_PASS_MAX_N:
        kernel = functools.partial(_fused_qkv_attn_kernel, heads=heads,
                                   sm_scale=sm_scale)
    else:
        # block_k fixed (full blocks + a static n % block_k tail block inside
        # the kernel) — shrinking it to gcd(n, 1024) instead measured ~35%
        # slower e2e at n=2816 (256-wide dots pay per-iteration VPU overheads
        # 4x as often). At the 4096 cap the resident k/v/krot/cos/sin blocks
        # leave only ~2 MB of scoped stack under the platform's ~90 MB
        # ceiling, so the temporaries drop to 512-wide there.
        kernel = functools.partial(
            _fused_qkv_attn_kernel_stream, heads=heads, sm_scale=sm_scale,
            block_k=1024 if n <= 3072 else 512)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, hd), lambda bi, qi, lens: (bi, qi, 0)),
                pl.BlockSpec((1, n, hd), lambda bi, qi, lens: (bi, 0, 1)),
                pl.BlockSpec((1, n, hd), lambda bi, qi, lens: (bi, 0, 2)),
                pl.BlockSpec((n_pad, hd), lambda bi, qi, lens: (0, 0)),
                pl.BlockSpec((n_pad, hd), lambda bi, qi, lens: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, hd), lambda bi, qi, lens: (bi, qi, 0)),
            scratch_shapes=[pltpu.VMEM((n, hd), qkv.dtype),
                            pltpu.VMEM((bq, hd), qkv.dtype)],
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, hd), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # full-sequence k/v/cos/sin blocks + roped-k scratch overflow the
            # default 16MB scoped-vmem budget by a few hundred KB
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * n * n * max(d, 128),
            bytes_accessed=(4 * b * n * hd + 2 * n * hd) * qkv.dtype.itemsize,
            transcendentals=b * heads * n * n,
        ),
        interpret=jax.default_backend() != "tpu",
    )(lengths.astype(jnp.int32), qkv, qkv, qkv, cos, sin)


# ---------------------------------------------------------------------------
# Flat-layout fused backward: dQKV straight from (qkv, do) with in-kernel
# RoPE and in-kernel softmax recomputation.
#
# The first training backward for the megakernel re-roped q/k in XLA, split
# heads ([b,n,h*d] -> [b,h,n,d] transposes), re-ran the flash forward for the
# log-sum-exp, ran the flash backward, merged heads back, un-roped dq/dk and
# concatenated — device traces showed ~24 ms/step of pure layout copies
# around the head-split custom calls plus an entire redundant attention
# forward. This kernel consumes the SAME flat residuals the forward kept
# (qkv, rope tables, lengths) plus the flat cotangent, recomputes softmax
# statistics per head in VMEM (single KV pass, so saving lse buys nothing),
# and writes the flat [b, n, 3hd] dQKV that feeds the to_qkv matmul VJP
# directly — zero HBM layout traffic end to end.
#
# Per (batch, head-pair) program, per head: s = scale*(q_rot k_rot^T);
# p = softmax(s) over live keys; dp = do v^T; delta = rowsum(p*dp);
# ds = p*(dp - delta); dv = p^T do; dq_rot = scale*(ds k_rot);
# dk_rot = scale*(ds^T q_rot); dq/dk = inverse-rope(dq_rot/dk_rot)
# (rope with -sin; the rotation's transpose). Rows past valid_len need no
# masking: their incoming cotangent is exactly zero (self_attention masks
# the projection output), which zeroes ds/dv/dk contributions identically.
# ---------------------------------------------------------------------------

def _fused_qkv_bwd_kernel(len_ref, qkv_ref, do_ref, cos_ref, sin_ref,
                          dqkv_ref, *, heads: int, sm_scale: float):
    hp = pl.program_id(1)
    valid_len = len_ref[pl.program_id(0)]
    n, hd3 = qkv_ref.shape[1], qkv_ref.shape[2]
    hd = hd3 // 3
    d = hd // heads
    pair = max(d, 128)
    lane_p = jax.lax.broadcasted_iota(jnp.int32, (1, pair), 1)

    def rope(xf, cs, sn):
        rot = jnp.where(lane_p % 2 == 0,
                        -pltpu.roll(xf, pair - 1, 1),
                        pltpu.roll(xf, 1, 1))
        return xf * cs + rot * sn

    lanes_q = pl.ds(hp * pair, pair)
    lanes_k = pl.ds(hd + hp * pair, pair)
    lanes_v = pl.ds(2 * hd + hp * pair, pair)
    cs = cos_ref[:, pl.ds(hp * pair, pair)].astype(jnp.float32)
    sn = sin_ref[:, pl.ds(hp * pair, pair)].astype(jnp.float32)

    dt = qkv_ref.dtype
    qrot = rope(qkv_ref[0, :, lanes_q].astype(jnp.float32), cs, sn).astype(dt)
    krot = rope(qkv_ref[0, :, lanes_k].astype(jnp.float32), cs, sn).astype(dt)
    vp = qkv_ref[0, :, lanes_v]
    do_p = do_ref[0, :, pl.ds(hp * pair, pair)]

    coln = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    bias = jnp.where(coln < valid_len, 0.0, NEG_INF)  # [1, n] f32

    halves = ([(qrot, do_p)] if pair == d else [
        (jnp.where(lane_p < d, qrot, 0).astype(dt),
         jnp.where(lane_p < d, do_p, 0).astype(dt)),
        (jnp.where(lane_p >= d, qrot, 0).astype(dt),
         jnp.where(lane_p >= d, do_p, 0).astype(dt)),
    ])

    dq_acc = None
    dk_acc = None
    dv_acc = None
    for qh, doh in halves:
        s = jax.lax.dot_general(qh, krot, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * sm_scale + bias
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = p / jnp.where(l == 0.0, 1.0, l)          # normalized probs, f32
        dp = jax.lax.dot_general(doh, vp, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = (p * (dp - delta)).astype(dt)
        p_lo = p.astype(dt)
        # dv: zero-padded doh keeps the other head's lanes zero -> plain add
        dvh = jax.lax.dot_general(p_lo, doh, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        # dk via zero-padded qh likewise adds cleanly; dq needs a lane select
        dkh = jax.lax.dot_general(ds, qh, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dqh = jax.lax.dot_general(ds, krot, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dv_acc = dvh if dv_acc is None else dv_acc + dvh
        dk_acc = dkh if dk_acc is None else dk_acc + dkh
        dq_acc = dqh if dq_acc is None else jnp.where(lane_p < d, dq_acc, dqh)

    dq_rot = dq_acc * sm_scale
    dk_rot = dk_acc * sm_scale
    # inverse rotation = rope with -sin (the rotation matrix transpose)
    dq = rope(dq_rot, cs, -sn)
    dk = rope(dk_rot, cs, -sn)
    dqkv_ref[0, :, lanes_q] = dq.astype(dqkv_ref.dtype)
    dqkv_ref[0, :, lanes_k] = dk.astype(dqkv_ref.dtype)
    dqkv_ref[0, :, lanes_v] = dv_acc.astype(dqkv_ref.dtype)


# scores+dp per head must fit VMEM alongside the qkv/do/out blocks
FUSED_BWD_MAX_N = 1024
# q-block-looped long variant (below) takes over past FUSED_BWD_MAX_N
FUSED_BWD_LONG_MAX_N = 4096
# test hook: route the flat backward kernel in interpret mode off-TPU
FORCE_FLAT_BWD = False


def _fused_qkv_bwd_kernel_long(q_ref, k_ref, v_ref, do_ref, cos_ref, sin_ref,
                               bias_ref, dq_ref, dk_ref, dv_ref,
                               krot_s, qrot_s, dk_acc, dv_acc, *,
                               d: int, sm_scale: float, block_q: int):
    """Flat dQKV for LONG sequences (FUSED_BWD_MAX_N < n <= 4096): the
    whole-n kernel's recipe restructured as a loop over `block_q`-row q
    blocks so the f32 score/dp temporaries stay [block_q, n] instead of
    [n, n] (which overflows VMEM past ~1024 rows).

    Layout vs the whole-n kernel: q/k/v/do arrive as PER-HEAD-PAIR lane
    views of the flat arrays (BlockSpec lane blocks — the q view indexes
    lanes hp*pair, the k view hd + hp*pair, the v view 2hd + hp*pair of
    the same [b, n, 3hd] array), so each (batch, head-pair) program holds
    only its own ~3 MB of operands and writes disjoint dq/dk/dv lane
    blocks — no revisited whole-row output. The key mask arrives as an
    additive [1, n] bias row (prefix lengths and MMDiT's mid-sequence
    masks share this kernel). q/k are roped ONCE into scratch; dk/dv
    accumulate in f32 scratch across q blocks; dead q rows carry
    exactly-zero cotangents (callers mask the projection output), so no
    query-side masking is needed — the same invariant as the whole-n
    kernel."""
    n, pair = krot_s.shape
    two_halves = pair != d
    lane_p = jax.lax.broadcasted_iota(jnp.int32, (1, pair), 1)

    def rope(xf, cs, sn):
        rot = jnp.where(lane_p % 2 == 0,
                        -pltpu.roll(xf, pair - 1, 1),
                        pltpu.roll(xf, 1, 1))
        return xf * cs + rot * sn

    dt = q_ref.dtype

    def prep(c, _):
        rows = pl.ds(c * 128, 128)
        cs = cos_ref[rows, :].astype(jnp.float32)
        sn = sin_ref[rows, :].astype(jnp.float32)
        qrot_s[rows, :] = rope(q_ref[0, rows, :].astype(jnp.float32),
                               cs, sn).astype(dt)
        krot_s[rows, :] = rope(k_ref[0, rows, :].astype(jnp.float32),
                               cs, sn).astype(dt)
        dk_acc[rows, :] = jnp.zeros((128, pair), jnp.float32)
        dv_acc[rows, :] = jnp.zeros((128, pair), jnp.float32)
        return 0

    jax.lax.fori_loop(0, n // 128, prep, 0)

    bias = bias_ref[0, 0:1, :]  # [1, n] f32

    def qb_body(qb, _):
        rows = pl.ds(qb * block_q, block_q)
        cs = cos_ref[rows, :].astype(jnp.float32)
        sn = sin_ref[rows, :].astype(jnp.float32)
        do_full = do_ref[0, rows, :]
        q_full = qrot_s[rows, :]
        halves = ([(q_full, do_full)] if not two_halves else [
            (jnp.where(lane_p < d, q_full, 0).astype(dt),
             jnp.where(lane_p < d, do_full, 0).astype(dt)),
            (jnp.where(lane_p >= d, q_full, 0).astype(dt),
             jnp.where(lane_p >= d, do_full, 0).astype(dt)),
        ])
        krot = krot_s[:, :]
        vp = v_ref[0, :, :]
        dq_acc = None
        for qh, doh in halves:
            s = jax.lax.dot_general(qh, krot, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * sm_scale + bias                       # [bq, n]
            mx = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - mx)
            l = jnp.sum(p, axis=-1, keepdims=True)
            p = p / jnp.where(l == 0.0, 1.0, l)
            dp = jax.lax.dot_general(doh, vp, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            delta = jnp.sum(p * dp, axis=-1, keepdims=True)
            ds = (p * (dp - delta)).astype(dt)
            p_lo = p.astype(dt)
            # zero-padded doh/qh keep the other head's lanes zero, so the
            # two halves' dv/dk contributions ADD cleanly (same trick as
            # the whole-n kernel); dq needs the lane select
            dv_acc[:, :] += jax.lax.dot_general(
                p_lo, doh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dk_acc[:, :] += jax.lax.dot_general(
                ds, qh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dqh = jax.lax.dot_general(ds, krot, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            dq_acc = dqh if dq_acc is None else jnp.where(lane_p < d, dq_acc, dqh)
        dq = rope(dq_acc * sm_scale, cs, -sn)  # inverse rotation: -sin
        dq_ref[0, rows, :] = dq.astype(dq_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n // block_q, qb_body, 0)

    def writeback(c, _):
        rows = pl.ds(c * 128, 128)
        cs = cos_ref[rows, :].astype(jnp.float32)
        sn = sin_ref[rows, :].astype(jnp.float32)
        dk = rope(dk_acc[rows, :] * sm_scale, cs, -sn)
        dk_ref[0, rows, :] = dk.astype(dk_ref.dtype)
        dv_ref[0, rows, :] = dv_acc[rows, :].astype(dv_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n // 128, writeback, 0)


def _fused_qkv_bwd_pallas_long(qkv, cos, sin, bias, do, heads: int):
    """Driver for the long flat backward. q/k/v ride as lane-block VIEWS of
    the flat [b, n, 3hd] array (index maps offset by hd // pair per
    stream); dq/dk/dv come back as three [b, n, hd] outputs concatenated
    into the flat dQKV. `bias` is [b, 1, n] f32 (0 live / NEG_INF dead)."""
    b, n, hd3 = qkv.shape
    hd = hd3 // 3
    d = hd // heads
    pair = max(d, 128)
    npairs = hd // pair
    sm_scale = 1.0 / math.sqrt(d)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_fused_qkv_bwd_kernel_long, d=d, sm_scale=sm_scale,
                          block_q=128),
        grid=(b, npairs),
        in_specs=[
            pl.BlockSpec((1, n, pair), lambda bi, hp: (bi, 0, hp)),
            pl.BlockSpec((1, n, pair), lambda bi, hp: (bi, 0, npairs + hp)),
            pl.BlockSpec((1, n, pair), lambda bi, hp: (bi, 0, 2 * npairs + hp)),
            pl.BlockSpec((1, n, pair), lambda bi, hp: (bi, 0, hp)),
            pl.BlockSpec((n, pair), lambda bi, hp: (0, hp)),
            pl.BlockSpec((n, pair), lambda bi, hp: (0, hp)),
            pl.BlockSpec((1, 1, n), lambda bi, hp: (bi, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, n, pair), lambda bi, hp: (bi, 0, hp)),
            pl.BlockSpec((1, n, pair), lambda bi, hp: (bi, 0, hp)),
            pl.BlockSpec((1, n, pair), lambda bi, hp: (bi, 0, hp)),
        ),
        scratch_shapes=[pltpu.VMEM((n, pair), qkv.dtype),
                        pltpu.VMEM((n, pair), qkv.dtype),
                        pltpu.VMEM((n, pair), jnp.float32),
                        pltpu.VMEM((n, pair), jnp.float32)],
        out_shape=(jax.ShapeDtypeStruct((b, n, hd), qkv.dtype),
                   jax.ShapeDtypeStruct((b, n, hd), qkv.dtype),
                   jax.ShapeDtypeStruct((b, n, hd), qkv.dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * n * n * hd * (pair // d),
            bytes_accessed=2 * (4 * b * n * hd + 2 * n * hd) * qkv.dtype.itemsize,
            transcendentals=b * heads * n * n,
        ),
        interpret=jax.default_backend() != "tpu",
    )(qkv, qkv, qkv, do, cos, sin, bias)
    return jnp.concatenate([dq, dk, dv], axis=-1)


def _fused_qkv_bwd_pallas(qkv, cos, sin, lengths, do, heads: int):
    b, n, hd3 = qkv.shape
    hd = hd3 // 3
    d = hd // heads
    pair = max(d, 128)
    sm_scale = 1.0 / math.sqrt(d)
    return pl.pallas_call(
        functools.partial(_fused_qkv_bwd_kernel, heads=heads, sm_scale=sm_scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, hd // pair),
            in_specs=[
                pl.BlockSpec((1, n, hd3), lambda bi, hp, lens: (bi, 0, 0)),
                pl.BlockSpec((1, n, hd), lambda bi, hp, lens: (bi, 0, 0)),
                pl.BlockSpec((n, hd), lambda bi, hp, lens: (0, 0)),
                pl.BlockSpec((n, hd), lambda bi, hp, lens: (0, 0)),
            ],
            # one revisited [n, 3hd] block per batch row; each head-pair
            # program writes its disjoint q/k/v lane ranges
            out_specs=pl.BlockSpec((1, n, hd3), lambda bi, hp, lens: (bi, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * n * n * hd * (pair // d),
            bytes_accessed=2 * (4 * b * n * hd + 2 * n * hd) * qkv.dtype.itemsize,
            transcendentals=b * heads * n * n,
        ),
        interpret=jax.default_backend() != "tpu",
    )(lengths.astype(jnp.int32), qkv, do, cos, sin)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_qkv_rope_attention(qkv, cos, sin, lengths, heads: int):
    """Differentiable fused QKV+RoPE attention (see _fused_qkv_rope_attention_impl).

    The backward stays in the flat layout too (_fused_qkv_bwd_kernel): one
    Pallas kernel maps (qkv, do) -> dQKV with in-kernel rope/un-rope and
    in-kernel softmax recomputation. A head-split fallback (XLA rope +
    flash-backward kernels) covers shapes the flat kernel doesn't. This
    makes the inference megakernel usable as-is in the training step.
    """
    return _fused_qkv_rope_attention_impl(qkv, cos, sin, lengths, heads)


def _fused_qkv_fwd(qkv, cos, sin, lengths, heads):
    out = _fused_qkv_rope_attention_impl(qkv, cos, sin, lengths, heads)
    return out, (qkv, cos, sin, lengths)


def _fused_qkv_bwd(heads, res, g):
    from f5tts_tpu.ops.rope import apply_rotary_flat_tables

    qkv, cos, sin, lengths = res
    b, n, hd3 = qkv.shape
    hd = hd3 // 3
    d = hd // heads

    if ((jax.default_backend() == "tpu" or FORCE_FLAT_BWD) and n % 128 == 0
            and n <= FUSED_BWD_MAX_N and d in (64, 128) and hd % 128 == 0):
        dqkv = _fused_qkv_bwd_pallas(qkv, cos, sin, lengths, g, heads)
        return dqkv, None, None, None
    if ((jax.default_backend() == "tpu" or FORCE_FLAT_BWD) and n % 128 == 0
            and n <= FUSED_BWD_LONG_MAX_N and d in (64, 128) and hd % 128 == 0):
        # long-clip training: q-block-looped flat kernel; prefix lengths
        # become the additive bias row the kernel shares with the MMDiT path
        col = jnp.arange(n)[None, :]
        bias = jnp.where(col < lengths[:, None], 0.0, NEG_INF)
        bias = bias.astype(jnp.float32)[:, None, :]
        dqkv = _fused_qkv_bwd_pallas_long(qkv, cos, sin, bias, g, heads)
        return dqkv, None, None, None

    q, k, v = jnp.split(qkv, 3, axis=-1)
    qr = apply_rotary_flat_tables(q, cos, sin)
    kr = apply_rotary_flat_tables(k, cos, sin)

    def split_heads(t):
        return t.reshape(b, n, heads, d).transpose(0, 2, 1, 3)

    qh, kh, vh = split_heads(qr), split_heads(kr), split_heads(v)
    o, lse = _flash_forward(qh, kh, vh, lengths, return_lse=True)
    dqh, dkh, dvh = _flash_backward(qh, kh, vh, lengths, o, lse,
                                    split_heads(g))

    def merge_heads(t):
        return t.transpose(0, 2, 1, 3).reshape(b, n, hd)

    dqr, dkr, dv = merge_heads(dqh), merge_heads(dkh), merge_heads(dvh)
    dq = apply_rotary_flat_tables(dqr, cos, -sin)
    dk = apply_rotary_flat_tables(dkr, cos, -sin)
    dqkv = jnp.concatenate([dq, dk, dv], axis=-1)
    return dqkv, None, None, None


fused_qkv_rope_attention.defvjp(_fused_qkv_fwd, _fused_qkv_bwd)


# ---------------------------------------------------------------------------
# Bias-masked flat megakernel (MMDiT joint attention)
#
# Same flat-layout design as _fused_qkv_attn_kernel, but for the JOINT
# audio+text sequence: the dead keys (audio padding) sit in the MIDDLE of
# the sequence, so the mask arrives as an additive [b, n] bias row instead
# of prefix lengths, and there is no dead-block skipping (masked query rows
# are computed like the XLA reference and masked downstream). The rope
# tables are the per-stream tables concatenated on the sequence axis, so
# audio rows rotate with audio positions and text rows with text positions
# without any in-kernel branching.
# ---------------------------------------------------------------------------

def _fused_qkv_attn_bias_kernel(q_ref, k_ref, v_ref, cos_ref, sin_ref,
                                bias_ref, o_ref, krot_ref, qrot_ref, *,
                                heads: int, sm_scale: float):
    qi = pl.program_id(1)
    n, hd = k_ref.shape[1], k_ref.shape[2]
    bq = q_ref.shape[1]
    d = hd // heads
    lane_hd = jax.lax.broadcasted_iota(jnp.int32, (1, hd), 1)

    def rope(xf, cs, sn):
        rot = jnp.where(lane_hd % 2 == 0,
                        -pltpu.roll(xf, hd - 1, 1),
                        pltpu.roll(xf, 1, 1))
        return xf * cs + rot * sn

    @pl.when(qi == 0)
    def _():
        # fixed 128-row chunks (not bq): bq may overhang n when the last q
        # block is tail-padded at odd 128-multiples (e.g. the 1152-row
        # MMDiT joint sequence)
        def chunk(c, _):
            rows = pl.ds(c * 128, 128)
            kf = k_ref[0, rows, :].astype(jnp.float32)
            cs = cos_ref[rows, :].astype(jnp.float32)
            sn = sin_ref[rows, :].astype(jnp.float32)
            krot_ref[rows, :] = rope(kf, cs, sn).astype(krot_ref.dtype)
            return 0
        jax.lax.fori_loop(0, n // 128, chunk, 0)

    rows = pl.ds(qi * bq, bq)
    qf = q_ref[0, :, :].astype(jnp.float32)
    cs = cos_ref[rows, :].astype(jnp.float32)
    sn = sin_ref[rows, :].astype(jnp.float32)
    qrot_ref[:, :] = (rope(qf, cs, sn) * sm_scale).astype(qrot_ref.dtype)

    bias = bias_ref[0, 0:1, :]  # [1, n] f32
    pair = max(d, 128)
    lane_p = jax.lax.broadcasted_iota(jnp.int32, (1, pair), 1)

    def pair_body(hp, _):
        lanes = pl.ds(hp * pair, pair)
        qp = qrot_ref[:, lanes]
        kp = krot_ref[:, lanes]
        vp = v_ref[0, :, lanes]
        halves = [qp] if pair == d else [
            jnp.where(lane_p < d, qp, 0).astype(qp.dtype),
            jnp.where(lane_p >= d, qp, 0).astype(qp.dtype),
        ]
        pvs = []
        for qh in halves:
            s = jax.lax.dot_general(qh, kp, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s + bias
            mx = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - mx)
            l = jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(p.astype(vp.dtype), vp,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            pvs.append(pv / jnp.where(l == 0.0, 1.0, l))
        op = pvs[0] if pair == d else jnp.where(lane_p < d, pvs[0], pvs[1])
        o_ref[0, :, lanes] = op.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, hd // pair, pair_body, 0)


def _fused_qkv_attn_bias_kernel_stream(q_ref, k_ref, v_ref, cos_ref, sin_ref,
                                       bias_ref, o_ref, krot_ref, qrot_ref, *,
                                       heads: int, sm_scale: float,
                                       block_k: int):
    """Online-softmax variant of the bias megakernel for long joint
    sequences (n > FLAT_SINGLE_PASS_MAX_N): same structure as
    _fused_qkv_attn_kernel_stream, but the key mask arrives as the additive
    [1, n] bias row (dead keys mid-sequence) instead of prefix lengths, so
    there is no live-stop — every block runs with its bias slice. A fully
    masked block is self-healing: its (finite, NEG_INF-shifted) scores give
    large-but-finite p that the next live block's alpha = exp(m_old - m_new)
    rescale flushes to zero, and fully masked query rows are masked
    downstream (mmdit._joint_attention) exactly like the single-pass path.
    """
    qi = pl.program_id(1)
    n, hd = k_ref.shape[1], k_ref.shape[2]
    bq = q_ref.shape[1]
    d = hd // heads
    lane_hd = jax.lax.broadcasted_iota(jnp.int32, (1, hd), 1)

    def rope(xf, cs, sn):
        rot = jnp.where(lane_hd % 2 == 0,
                        -pltpu.roll(xf, hd - 1, 1),
                        pltpu.roll(xf, 1, 1))
        return xf * cs + rot * sn

    @pl.when(qi == 0)
    def _():
        def chunk(c, _):
            rows = pl.ds(c * 128, 128)
            kf = k_ref[0, rows, :].astype(jnp.float32)
            cs = cos_ref[rows, :].astype(jnp.float32)
            sn = sin_ref[rows, :].astype(jnp.float32)
            krot_ref[rows, :] = rope(kf, cs, sn).astype(krot_ref.dtype)
            return 0
        jax.lax.fori_loop(0, n // 128, chunk, 0)

    rows = pl.ds(qi * bq, bq)
    qf = q_ref[0, :, :].astype(jnp.float32)
    cs = cos_ref[rows, :].astype(jnp.float32)
    sn = sin_ref[rows, :].astype(jnp.float32)
    qrot_ref[:, :] = (rope(qf, cs, sn) * sm_scale).astype(qrot_ref.dtype)

    num_kb = n // block_k
    tail_w = n % block_k
    pair = max(d, 128)
    lane_p = jax.lax.broadcasted_iota(jnp.int32, (1, pair), 1)

    def pair_body(hp, _):
        lanes = pl.ds(hp * pair, pair)
        qp = qrot_ref[:, lanes]
        halves = [qp] if pair == d else [
            jnp.where(lane_p < d, qp, 0).astype(qp.dtype),
            jnp.where(lane_p >= d, qp, 0).astype(qp.dtype),
        ]
        pvs = []
        for qh in halves:
            def online_step(k_off, width, carry):
                m_prev, l_prev, acc = carry
                kcols = pl.ds(k_off, width)
                kp = krot_ref[kcols, lanes]
                vp = v_ref[0, kcols, lanes]
                s = jax.lax.dot_general(
                    qh, kp, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [bq, width]
                s = s + bias_ref[0, 0:1, kcols]
                m_cur = jnp.max(s, axis=-1, keepdims=True)
                m_new = jnp.maximum(m_prev, m_cur)
                alpha = jnp.exp(m_prev - m_new)
                p = jnp.exp(s - m_new)
                l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
                acc = acc * alpha + jax.lax.dot_general(
                    p.astype(vp.dtype), vp, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return m_new, l_new, acc

            m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
            l0 = jnp.zeros((bq, 1), jnp.float32)
            acc0 = jnp.zeros((bq, pair), jnp.float32)
            carry = jax.lax.fori_loop(
                0, num_kb,
                lambda kb, c: online_step(kb * block_k, block_k, c),
                (m0, l0, acc0))
            if tail_w:
                carry = online_step(num_kb * block_k, tail_w, carry)
            m, l, acc = carry
            pvs.append(acc / jnp.where(l == 0.0, 1.0, l))
        op = pvs[0] if pair == d else jnp.where(lane_p < d, pvs[0], pvs[1])
        o_ref[0, :, lanes] = op.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, hd // pair, pair_body, 0)


def _fused_qkv_bias_impl(qkv, cos, sin, kmask, heads: int):
    b, n, hd3 = qkv.shape
    hd = hd3 // 3
    d = hd // heads
    bq = _pick_block(n, (512, 256, 128))
    if bq == 128 and n > 256:
        # odd 128-multiples (MMDiT's 1152-row joint sequence): tail-padded
        # bq=256 q blocks — same recipe as _fused_qkv_rope_attention_impl;
        # padded q rows produce dropped stores, cos/sin padded so in-kernel
        # q-block slices stay in bounds
        bq = 256
    if n > FLAT_SINGLE_PASS_MAX_N:
        # streaming band (3072, 4096]: 128-row q blocks keep the kernel
        # under the platform's ~90 MB scoped-vmem ceiling (see the
        # prefix-length impl)
        bq = 128
    n_pad = -(-n // bq) * bq
    if n_pad != n:
        cos = jnp.pad(cos, ((0, n_pad - n), (0, 0)))
        sin = jnp.pad(sin, ((0, n_pad - n), (0, 0)))
    sm_scale = 1.0 / math.sqrt(d)
    bias = jnp.where(kmask, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]
    if n <= FLAT_SINGLE_PASS_MAX_N:
        kernel = functools.partial(_fused_qkv_attn_bias_kernel, heads=heads,
                                   sm_scale=sm_scale)
    else:
        kernel = functools.partial(_fused_qkv_attn_bias_kernel_stream,
                                   heads=heads, sm_scale=sm_scale,
                                   block_k=1024 if n <= 3072 else 512)
    return pl.pallas_call(
        kernel,
        grid=(b, n_pad // bq),
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda bi, qi: (bi, qi, 0)),
            pl.BlockSpec((1, n, hd), lambda bi, qi: (bi, 0, 1)),
            pl.BlockSpec((1, n, hd), lambda bi, qi: (bi, 0, 2)),
            pl.BlockSpec((n_pad, hd), lambda bi, qi: (0, 0)),
            pl.BlockSpec((n_pad, hd), lambda bi, qi: (0, 0)),
            pl.BlockSpec((1, 1, n), lambda bi, qi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, hd), lambda bi, qi: (bi, qi, 0)),
        scratch_shapes=[pltpu.VMEM((n, hd), qkv.dtype),
                        pltpu.VMEM((bq, hd), qkv.dtype)],
        out_shape=jax.ShapeDtypeStruct((b, n, hd), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * n * n * max(d, 128),
            bytes_accessed=(4 * b * n * hd + 2 * n * hd) * qkv.dtype.itemsize,
            transcendentals=b * heads * n * n,
        ),
        interpret=jax.default_backend() != "tpu",
    )(qkv, qkv, qkv, cos, sin, bias)


def _bias_decomposed_ref(qkv, cos, sin, kmask, heads: int):
    """XLA oracle for the bias megakernel: flat rope -> head split ->
    key-masked attention -> merge. Also the backward recipe."""
    from f5tts_tpu.ops.rope import apply_rotary_flat_tables

    b, n, hd3 = qkv.shape
    hd = hd3 // 3
    d = hd // heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    qr = apply_rotary_flat_tables(q, cos, sin)
    kr = apply_rotary_flat_tables(k, cos, sin)

    def sh(t):
        return t.reshape(b, n, heads, d).transpose(0, 2, 1, 3)

    o = mha_reference_masked(sh(qr), sh(kr), sh(v), kmask)
    return o.transpose(0, 2, 1, 3).reshape(b, n, hd)


# test hook: route the bias megakernel in interpret mode off-TPU
FORCE_BIAS_KERNEL = False


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_qkv_rope_attention_bias(qkv, cos, sin, kmask, heads: int):
    """Flat fused QKV+RoPE attention with an arbitrary [b, n] key mask.

    Pallas on TPU (n % 128 == 0, n <= FLAT_ATTN_MAX_N, d in {64, 128});
    single-KV-pass kernel up to FLAT_SINGLE_PASS_MAX_N, the KV-streaming
    online-softmax variant beyond (long joint sequences — a 30 s clone's
    joint row count exceeds 2048). XLA decomposition elsewhere. Backward is
    the flat Pallas dQKV kernel (_fused_bias_bwd_kernel — the DiT
    _fused_qkv_bwd_kernel recipe with the [1, n] additive key bias), falling
    back to the XLA decomposition's VJP off-TPU or for shapes past
    FUSED_BIAS_BWD_MAX_N, so MMDiT trains at flash memory instead of
    materializing O(n^2) joint scores."""
    b, n, hd3 = qkv.shape
    hd = hd3 // 3
    d = hd // heads
    if ((jax.default_backend() == "tpu" or FORCE_BIAS_KERNEL) and n % 128 == 0
            and n <= FLAT_ATTN_MAX_N and d in (64, 128) and hd % 128 == 0):
        return _fused_qkv_bias_impl(qkv, cos, sin, kmask, heads)
    return _bias_decomposed_ref(qkv, cos, sin, kmask, heads)


def _fused_bias_bwd_kernel(qkv_ref, do_ref, cos_ref, sin_ref, bias_ref,
                           dqkv_ref, *, heads: int, sm_scale: float):
    """Flat dQKV for the bias-masked megakernel: the `_fused_qkv_bwd_kernel`
    recipe (in-kernel rope/un-rope, in-kernel softmax recompute, paired-head
    zero-padded dots) with the arbitrary [1, n] additive key bias replacing
    the prefix-length mask. Dead-KEY columns carry p = 0, so their dk/dv
    contributions vanish; dead-QUERY rows receive an exactly-zero cotangent
    (mmdit._joint_attention masks the projected outputs), so no query-side
    masking is needed — same invariant as the prefix-length kernel."""
    hp = pl.program_id(1)
    n, hd3 = qkv_ref.shape[1], qkv_ref.shape[2]
    hd = hd3 // 3
    d = hd // heads
    pair = max(d, 128)
    lane_p = jax.lax.broadcasted_iota(jnp.int32, (1, pair), 1)

    def rope(xf, cs, sn):
        rot = jnp.where(lane_p % 2 == 0,
                        -pltpu.roll(xf, pair - 1, 1),
                        pltpu.roll(xf, 1, 1))
        return xf * cs + rot * sn

    lanes_q = pl.ds(hp * pair, pair)
    lanes_k = pl.ds(hd + hp * pair, pair)
    lanes_v = pl.ds(2 * hd + hp * pair, pair)
    cs = cos_ref[:, pl.ds(hp * pair, pair)].astype(jnp.float32)
    sn = sin_ref[:, pl.ds(hp * pair, pair)].astype(jnp.float32)

    dt = qkv_ref.dtype
    qrot = rope(qkv_ref[0, :, lanes_q].astype(jnp.float32), cs, sn).astype(dt)
    krot = rope(qkv_ref[0, :, lanes_k].astype(jnp.float32), cs, sn).astype(dt)
    vp = qkv_ref[0, :, lanes_v]
    do_p = do_ref[0, :, pl.ds(hp * pair, pair)]

    bias = bias_ref[0, 0:1, :]  # [1, n] f32

    halves = ([(qrot, do_p)] if pair == d else [
        (jnp.where(lane_p < d, qrot, 0).astype(dt),
         jnp.where(lane_p < d, do_p, 0).astype(dt)),
        (jnp.where(lane_p >= d, qrot, 0).astype(dt),
         jnp.where(lane_p >= d, do_p, 0).astype(dt)),
    ])

    dq_acc = None
    dk_acc = None
    dv_acc = None
    for qh, doh in halves:
        s = jax.lax.dot_general(qh, krot, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * sm_scale + bias
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = p / jnp.where(l == 0.0, 1.0, l)
        dp = jax.lax.dot_general(doh, vp, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = (p * (dp - delta)).astype(dt)
        p_lo = p.astype(dt)
        dvh = jax.lax.dot_general(p_lo, doh, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dkh = jax.lax.dot_general(ds, qh, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dqh = jax.lax.dot_general(ds, krot, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dv_acc = dvh if dv_acc is None else dv_acc + dvh
        dk_acc = dkh if dk_acc is None else dk_acc + dkh
        dq_acc = dqh if dq_acc is None else jnp.where(lane_p < d, dq_acc, dqh)

    dq = rope(dq_acc * sm_scale, cs, -sn)   # inverse rotation: -sin
    dk = rope(dk_acc * sm_scale, cs, -sn)
    dqkv_ref[0, :, lanes_q] = dq.astype(dqkv_ref.dtype)
    dqkv_ref[0, :, lanes_k] = dk.astype(dqkv_ref.dtype)
    dqkv_ref[0, :, lanes_v] = dv_acc.astype(dqkv_ref.dtype)


# joint audio+text sequences run slightly past the DiT cap (1024 + padded
# text); scores/dp f32 temporaries at n=1536 stay within the raised budget
FUSED_BIAS_BWD_MAX_N = 1536


def _fused_bias_bwd_pallas(qkv, cos, sin, kmask, do, heads: int):
    b, n, hd3 = qkv.shape
    hd = hd3 // 3
    d = hd // heads
    pair = max(d, 128)
    sm_scale = 1.0 / math.sqrt(d)
    bias = jnp.where(kmask, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]
    return pl.pallas_call(
        functools.partial(_fused_bias_bwd_kernel, heads=heads,
                          sm_scale=sm_scale),
        grid=(b, hd // pair),
        in_specs=[
            pl.BlockSpec((1, n, hd3), lambda bi, hp: (bi, 0, 0)),
            pl.BlockSpec((1, n, hd), lambda bi, hp: (bi, 0, 0)),
            pl.BlockSpec((n, hd), lambda bi, hp: (0, 0)),
            pl.BlockSpec((n, hd), lambda bi, hp: (0, 0)),
            pl.BlockSpec((1, 1, n), lambda bi, hp: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, hd3), lambda bi, hp: (bi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * n * n * hd * (pair // d),
            bytes_accessed=2 * (4 * b * n * hd + 2 * n * hd) * qkv.dtype.itemsize,
            transcendentals=b * heads * n * n,
        ),
        interpret=jax.default_backend() != "tpu",
    )(qkv, do, cos, sin, bias)


def _fused_bias_fwd(qkv, cos, sin, kmask, heads):
    return fused_qkv_rope_attention_bias(qkv, cos, sin, kmask, heads), \
        (qkv, cos, sin, kmask)


def _fused_bias_bwd(heads, res, g):
    qkv, cos, sin, kmask = res
    b, n, hd3 = qkv.shape
    hd = hd3 // 3
    d = hd // heads
    if ((jax.default_backend() == "tpu" or FORCE_FLAT_BWD) and n % 128 == 0
            and n <= FUSED_BIAS_BWD_MAX_N and d in (64, 128) and hd % 128 == 0):
        dqkv = _fused_bias_bwd_pallas(qkv, cos, sin, kmask, g, heads)
        return dqkv, None, None, None
    if ((jax.default_backend() == "tpu" or FORCE_FLAT_BWD) and n % 128 == 0
            and n <= FUSED_BWD_LONG_MAX_N and d in (64, 128) and hd % 128 == 0):
        # long joint sequences: same q-block-looped flat kernel; the
        # arbitrary key mask is already an additive bias row
        bias = jnp.where(kmask, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]
        dqkv = _fused_qkv_bwd_pallas_long(qkv, cos, sin, bias, g, heads)
        return dqkv, None, None, None
    _, vjp = jax.vjp(
        lambda x: _bias_decomposed_ref(x, cos, sin, kmask, heads), qkv)
    (dqkv,) = vjp(g)
    return dqkv, None, None, None


fused_qkv_rope_attention_bias.defvjp(_fused_bias_fwd, _fused_bias_bwd)


# ---------------------------------------------------------------------------
# Masked flash attention (arbitrary key mask, e.g. MMDiT joint attention
# where the dead keys are audio padding in the MIDDLE of the joint sequence,
# not a suffix — prefix `lengths` can't express it)
# ---------------------------------------------------------------------------

def _flash_kernel_bias(q_ref, k_ref, v_ref, bias_ref, o_ref, *, sm_scale: float):
    """Single-KV-pass attention with a per-batch [1, n] additive key bias
    (0 = live, NEG_INF = masked). Same structure as _flash_kernel_single."""
    n, d = k_ref.shape[2], k_ref.shape[3]
    bq = q_ref.shape[2]
    q = q_ref[0, 0, :, :] * jnp.asarray(sm_scale, q_ref.dtype)
    k = k_ref[0, 0, :, :]
    v = v_ref[0, 0, :, :]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [bq, n]
    s = s + bias_ref[0, :, :]
    mx = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - mx)
    l = jnp.sum(p, axis=-1, keepdims=True)
    l_safe = jnp.where(l == 0.0, 1.0, l)
    acc = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0, 0, :, :] = (acc / l_safe).astype(o_ref.dtype)


def _masked_flash_forward(q, k, v, kmask):
    b, h, n, d = q.shape
    block_q = _pick_block(n, (256, 128))
    sm_scale = 1.0 / math.sqrt(d)
    bias = jnp.where(kmask, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]  # [b,1,n]
    return pl.pallas_call(
        functools.partial(_flash_kernel_bias, sm_scale=sm_scale),
        grid=(b, h, n // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, n, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, n, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, n), lambda bi, hi, qi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
        interpret=jax.default_backend() != "tpu",
    )(q, k, v, bias)


def mha_reference_masked(q, k, v, kmask):
    """[b,h,n,d] attention with an arbitrary [b, n] key mask (XLA)."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    scores = jnp.where(kmask[:, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


@jax.custom_vjp
def masked_flash_attention(q, k, v, kmask):
    """Key-masked attention: Pallas single-pass kernel on TPU (n % 128 == 0,
    n <= FLAT_ATTN_MAX_N — per-head k/v/score VMEM stays small through 4096),
    XLA reference elsewhere. The backward runs the XLA reference VJP (same
    recipe as ops/adaln_norm.py) — the forward is the hot path (MMDiT
    sampler); training numerics match the XLA path exactly."""
    b, h, n, d = q.shape
    if (jax.default_backend() == "tpu" and n % 128 == 0
            and n <= FLAT_ATTN_MAX_N and d in (64, 128)):
        return _masked_flash_forward(q, k, v, kmask)
    return mha_reference_masked(q, k, v, kmask)


def _masked_fwd(q, k, v, kmask):
    return masked_flash_attention(q, k, v, kmask), (q, k, v, kmask)


def _masked_bwd(res, g):
    q, k, v, kmask = res
    _, vjp = jax.vjp(lambda a, b_, c: mha_reference_masked(a, b_, c, kmask), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


masked_flash_attention.defvjp(_masked_fwd, _masked_bwd)


def flash_attention_sharded(q, k, v, lengths, mesh=None,
                            dp_axis: str = "data", tp_axis: str = "model"):
    """Flash attention under shard_map: batch on dp_axis, heads on tp_axis.

    The TP head sharding mirrors the reference's TRT-LLM ColumnLinear head
    split (reference: runtime/triton_trtllm/patch/f5tts/modules.py:147-185);
    attention itself needs no collectives — each device runs the Pallas
    kernel on its local heads, and the RowLinear psum happens in the
    projection that follows. Requires b % dp == 0 and h % tp == 0.
    """
    from jax.sharding import PartitionSpec as P, get_abstract_mesh

    if mesh is None:
        mesh = get_abstract_mesh()
    sizes = dict(mesh.shape)
    dp = dp_axis if sizes.get(dp_axis, 1) > 1 else None
    tp = tp_axis if sizes.get(tp_axis, 1) > 1 else None
    spec = P(dp, tp, None, None)
    fn = jax.shard_map(flash_attention, mesh=mesh,
                       in_specs=(spec, spec, spec, P(dp)),
                       out_specs=spec, check_vma=False)
    return fn(q, k, v, lengths)


def _ambient_mesh_or_none():
    from jax.sharding import get_abstract_mesh

    mesh = get_abstract_mesh()
    if mesh is None or mesh.empty or mesh.size <= 1:
        return None
    return mesh


def attention(
    q: jax.Array, k: jax.Array, v: jax.Array,
    lengths: jax.Array | None = None,
    backend: str = "pallas",
) -> jax.Array:
    """Dispatch on backend. Pallas path needs 128-aligned n (pad upstream).

    When tracing under an ambient multi-device mesh (jax.set_mesh), the
    Pallas kernel is wrapped in shard_map (GSPMD cannot partition an opaque
    pallas_call): batch rides the "data" axis, heads the "model" axis. Falls
    back to the XLA path if the shapes don't divide the mesh.
    """
    b, h, n, d = q.shape
    if backend == "pallas" and jax.default_backend() == "tpu" and n % 128 == 0:
        if lengths is None:
            lengths = jnp.full((b,), n, dtype=jnp.int32)
        mesh = _ambient_mesh_or_none()
        if mesh is not None:
            sizes = dict(mesh.shape)
            dp, tp = sizes.get("data", 1), sizes.get("model", 1)
            if b % dp == 0 and h % tp == 0:
                return flash_attention_sharded(q, k, v, lengths, mesh)
            return mha_reference(q, k, v, lengths)
        return flash_attention(q, k, v, lengths)
    return mha_reference(q, k, v, lengths)

"""Fused flash-style decoder attention for TPU.

The PETR decoder's cross-attention (900 queries x 30k image tokens at
1600x800, 8 heads of d=32) is the head's hot op. The XLA path materializes
the (B, 8, Q, K) f32 logit tensor in HBM (~864 MB/layer at 1600x800) for
the softmax round trip — ~21 ms/frame over 6 layers (round-2 profile).
This kernel streams K/V blocks through VMEM with an online softmax, so
logits never leave the chip: per layer only Q once and K/V once are read.

Math parity target: ops/attention.mha's core (reference torch
nn.MultiheadAttention semantics, petr_transformer.py:194-337) with
attn_mask=None, no dropout, no weight return — exactly the eval-time
decoder configuration (DN masks exist only in training). The caller keeps
the q/k/v/out projections in XLA (dense 256x256 matmuls; XLA is optimal
there) and hands this kernel the projected tensors.

Precision: logits and the running (m, l) statistics are f32; the softmax
weights are cast to the value dtype before the AV matmul (mirroring the
XLA path's weights.astype(v.dtype)); the accumulator is f32 and the final
division by l happens once at the end (deferred normalization — equal up
to fp rounding to the XLA path's normalize-then-multiply).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# Test hook: ops.attention.mha routes `fused=True` through this kernel only
# on non-CPU backends (interpret mode is orders slower than XLA and the CPU
# suite would crawl); kernel-parity tests flip this to exercise the fused
# path in interpret mode anyway.
FORCE_FUSED_ON_CPU = False


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
                  num_heads: int, block_k: int, kv_len: int):
    """One (batch, kv-block) grid step. q_ref: (1, Qp, C) — same block every
    step (resident); k_ref/v_ref: (1, block_k, C); o_ref: (1, Qp, C) written
    on the last kv block. Scratch: acc (Qp, C) f32, m/l (H, Qp, 128) f32
    (running max / normalizer, lane-broadcast)."""
    j = pl.program_id(1)
    nb = pl.num_programs(1)
    qp, c = q_ref.shape[1], q_ref.shape[2]
    d = c // num_heads

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    # column validity: the last kv block OVERRUNS the unpadded (B, K, C)
    # array when K % block_k != 0 (Pallas drops the OOB stores; OOB loads
    # are unspecified). Garbage k columns are neutralized by the NEG_INF
    # mask on s below; garbage v rows must be zeroed explicitly — exp()
    # of a masked logit is exactly 0.0, but 0 * NaN-garbage would still
    # poison the p @ v accumulation.
    pad_any = kv_len % block_k != 0

    q = q_ref[0]                                     # (Qp, C), pre-scaled
    k = k_ref[0]                                     # (bk, C)
    v = v_ref[0]
    if pad_any:
        vrow = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0) + j * block_k
        v = jnp.where(vrow >= kv_len, jnp.zeros_like(v), v)
    acc = acc_ref[...]                               # (Qp, C) f32
    new_acc, new_l = [], []
    for h in range(num_heads):
        qh = q[:, h * d:(h + 1) * d]
        kh = k[:, h * d:(h + 1) * d]
        vh = v[:, h * d:(h + 1) * d]
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if pad_any:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
            s = jnp.where(col >= kv_len, jnp.float32(NEG_INF), s)

        m_prev = m_ref[h][:, :1]                     # (Qp, 1)
        l_prev = l_ref[h][:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)              # (Qp, 1)
        p = jnp.exp(s - m_new)                       # (Qp, bk) f32
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(p.astype(vh.dtype), vh,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        new_acc.append(alpha * acc[:, h * d:(h + 1) * d] + pv)
        new_l.append(jnp.broadcast_to(l_new, (qp, d)))
        m_ref[h] = jnp.broadcast_to(m_new, (qp, 128))
        l_ref[h] = jnp.broadcast_to(l_new, (qp, 128))
    acc = jnp.concatenate(new_acc, axis=-1)
    acc_ref[...] = acc

    @pl.when(j == nb - 1)
    def _():
        l_full = jnp.concatenate(new_l, axis=-1)      # (Qp, C)
        o_ref[0] = (acc / l_full).astype(o_ref.dtype)


def _pick_block_k(kv: int) -> int:
    if kv >= 4096:
        return 1024
    if kv >= 1024:
        return 512
    return _round_up(kv, 128)


def flash_attention_core(q, k, v, num_heads: int, block_k: int = 0,
                         interpret=None):
    """softmax(split_heads(q) @ split_heads(k)^T) @ split_heads(v), merged.

    q: (B, Q, C) ALREADY scaled by d^-0.5 (callers multiply before, matching
    ops/attention.mha's q*scale ordering); k/v: (B, K, C). No mask support —
    training DN masks take the XLA path. Returns (B, Q, C) in v.dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, nq, c = q.shape
    kv = k.shape[1]
    assert c % num_heads == 0
    # q-row padding: sublane multiple only (block dim == array dim is exempt
    # from tighter Mosaic tiling rules; measured equal-or-better than the
    # earlier 128-multiple rounding, which cost 14% dead rows at Q=900)
    sub = 16 if q.dtype == jnp.bfloat16 else 8
    qp = _round_up(nq, sub)
    if not block_k:
        block_k = _pick_block_k(kv)
    kvp = _round_up(kv, block_k)
    if qp > nq:
        q = jnp.pad(q, ((0, 0), (0, qp - nq), (0, 0)))
    # k/v are NOT padded: the last kv block overruns the array and the
    # kernel masks/zeroes the overrun (the pads cost ~0.45 ms/frame across
    # the 6 decoder layers at 1600x800 — 12 x 15.7 MB HBM rewrites)

    grid = (b, kvp // block_k)
    kernel = functools.partial(_flash_kernel, num_heads=num_heads,
                               block_k=block_k, kv_len=kv)
    d = c // num_heads
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, qp, c), lambda bb, j: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, c), lambda bb, j: (bb, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, c), lambda bb, j: (bb, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, qp, c), lambda bb, j: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, qp, c), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((qp, c), jnp.float32),
            pltpu.VMEM((num_heads, qp, 128), jnp.float32),
            pltpu.VMEM((num_heads, qp, 128), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=b * num_heads * 4 * qp * kvp * d,
            bytes_accessed=(b * (qp + 2 * kvp) * c * q.dtype.itemsize
                            + b * qp * c * v.dtype.itemsize),
            transcendentals=b * num_heads * qp * kvp,
        ),
    )(q, k, v)
    return out[:, :nq]


def _xla_core(q, k, v, num_heads: int):
    """Exact XLA restatement of the attention core this kernel replaces
    (ops/attention.mha minus projections/mask/dropout); used as the VJP
    backward reference so training gradients are the XLA path's."""
    b, nq, c = q.shape
    d = c // num_heads
    sh = lambda t: t.reshape(b, -1, num_heads, d).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", sh(q), sh(k),
                        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, sh(v))
    return o.transpose(0, 2, 1, 3).reshape(b, nq, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, num_heads: int):
    """Differentiable wrapper: Pallas forward, exact XLA backward (the same
    remat-with-a-faster-primal pattern as ops/pallas/vit_block.py)."""
    return flash_attention_core(q, k, v, num_heads)


def _fwd(q, k, v, num_heads):
    return flash_attention_core(q, k, v, num_heads), (q, k, v)


def _bwd(num_heads, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b_, c_: _xla_core(a, b_, c_, num_heads),
                     q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)

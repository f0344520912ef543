"""Whole-decoder-layer megakernel for the PETR head (eval path).

One pallas_call runs a full PETRTemporalDecoderLayer (reference
petr_transformer.py:520-760): temporal self-attention (query ⊕ propagated
memory keys), post-norm, streamed flash cross-attention over the image
tokens, post-norm, FFN, post-norm. The round-3 profile showed the head
program spending ~2.4 ms/frame in ~1200 sub-40 µs XLA ops on (1, 900, 256)
tensors — per-op dispatch overhead, not math. Fusing each layer into one
kernel removes that dust and keeps every intermediate in VMEM.

Structure: grid = (B, num_kv_blocks). Step j==0 additionally computes the
self-attention + norm0 and the scaled cross-query (stored in VMEM scratch);
every step accumulates one K/V block of online-softmax cross attention
(k/v are PROJECTED IN-KERNEL from the raw image memory + position
embedding, so the per-layer K/V projections never round-trip HBM); the
last step finishes the normalization, output projection, norm1, FFN and
norm2, and writes the layer output.

Math parity: ops/attention.mha (torch nn.MultiheadAttention semantics)
with attn_mask=None / no dropout / no weights — exactly the eval decoder
configuration — composed as in models/petr_transformer.decoder_layer_forward.
The d**-0.5 scale is folded into the q projections outside the kernel.
Training keeps the XLA path (the train step threads fused_ok=False on axon).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LN_EPS = 1e-5

# Test hook (see ops/pallas/cross_attn.py): route the fused layer even on
# CPU backends (interpret mode) for parity tests.
FORCE_FUSED_ON_CPU = False


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _ln(x, scale, bias, eps=LN_EPS):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


_W_NAMES = ("swq", "sbq", "swk", "sbk", "swv", "sbv", "swo", "sbo",
            "cwq", "cbq", "cwk", "cbk", "cwv", "cbv", "cwo", "cbo",
            "l0s", "l0b", "l1s", "l1b", "l2s", "l2b",
            "w1", "b1", "w2", "b2")


def _flatten_layer_params(p, dtype, num_heads):
    """Decoder-layer pytree -> flat tuple in _W_NAMES order; q projections
    pre-scaled by d**-0.5 (biases too)."""
    f32 = jnp.float32
    c = p["self_attn"]["q_proj"]["w"].shape[1]
    scale = jnp.float32((c // num_heads) ** -0.5)

    def lin(q, scaled=False):
        w, b = q["w"], q["b"]
        if scaled:
            w, b = w * scale, b * scale
        return w.astype(dtype), b.astype(f32)

    sa, ca, ffn = p["self_attn"], p["cross_attn"], p["ffn"]
    out = (lin(sa["q_proj"], True) + lin(sa["k_proj"]) + lin(sa["v_proj"])
           + lin(sa["out_proj"])
           + lin(ca["q_proj"], True) + lin(ca["k_proj"]) + lin(ca["v_proj"])
           + lin(ca["out_proj"]))
    out = out + (p["norm0"]["scale"].astype(f32), p["norm0"]["bias"].astype(f32),
                 p["norm1"]["scale"].astype(f32), p["norm1"]["bias"].astype(f32),
                 p["norm2"]["scale"].astype(f32), p["norm2"]["bias"].astype(f32))
    out = out + lin(ffn["fc0"]) + lin(ffn["fc1"])
    return out


def _mha_full(q_in, k_in, v_in, num_heads, valid_cols):
    """Dense MHA core on (Qp, C) x (Kp, C); key columns >= their segment
    validity are masked. valid_cols: (Kp,)-shaped bool iota expression
    built by the caller (static). Returns (Qp, C) f32."""
    qp, c = q_in.shape
    kp = k_in.shape[0]
    d = c // num_heads
    outs = []
    for h in range(num_heads):
        qh = q_in[:, h * d:(h + 1) * d]
        kh = k_in[:, h * d:(h + 1) * d]
        vh = v_in[:, h * d:(h + 1) * d]
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = jnp.where(valid_cols, s, jnp.float32(NEG_INF))
        m = jnp.max(s, axis=-1, keepdims=True)
        p32 = jnp.exp(s - m)
        l = jnp.sum(p32, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(p32.astype(q_in.dtype), vh,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        outs.append(pv / l)
    return jnp.concatenate(outs, axis=-1)


def _layer_kernel(q_ref, qpos_ref, tmem_ref, tpos_ref, mem_ref, kpos_ref,
                  *rest, num_heads, nq, n_tmem, block_k, kv_len):
    w = dict(zip(_W_NAMES, rest[:len(_W_NAMES)]))
    o_ref = rest[len(_W_NAMES)]
    q1_ref, qc_ref, acc_ref, m_ref, l_ref = rest[len(_W_NAMES) + 1:]

    j = pl.program_id(1)
    nb = pl.num_programs(1)
    qp, c = q_ref.shape[1], q_ref.shape[2]
    mp = tmem_ref.shape[1]
    d = c // num_heads
    dt = q_ref.dtype

    def dot_b(x, wn, bn):
        y = jnp.dot(x, w[wn][:], preferred_element_type=jnp.float32)
        return (y + w[bn][:].astype(jnp.float32)).astype(dt)

    @pl.when(j == 0)
    def _():
        x = q_ref[0]
        xp = qpos_ref[0]
        tk_x = jnp.concatenate([x, tmem_ref[0]], axis=0)          # (qp+mp, C)
        tk_in = tk_x + jnp.concatenate([xp, tpos_ref[0]], axis=0)
        qs = dot_b(x + xp, "swq", "sbq")
        ks = dot_b(tk_in, "swk", "sbk")
        vs = dot_b(tk_x, "swv", "sbv")
        col = jax.lax.broadcasted_iota(jnp.int32, (1, qp + mp), 1)
        valid = (col < nq) | ((col >= qp) & (col < qp + n_tmem))
        att = _mha_full(qs, ks, vs, num_heads, valid).astype(dt)
        out_s = dot_b(att, "swo", "sbo")
        q1 = _ln(x + out_s, w["l0s"][:], w["l0b"][:])
        q1_ref[...] = q1
        qc_ref[...] = dot_b(q1 + xp, "cwq", "cbq")
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    # one K/V block of online-softmax cross attention, k/v projected here
    kx = mem_ref[0]
    kblk = dot_b(kx + kpos_ref[0], "cwk", "cbk")
    vblk = dot_b(kx, "cwv", "cbv")
    qc = qc_ref[...]
    acc = acc_ref[...]
    pad_any = kv_len % block_k != 0
    new_acc, new_l = [], []
    for h in range(num_heads):
        qh = qc[:, h * d:(h + 1) * d]
        kh = kblk[:, h * d:(h + 1) * d]
        vh = vblk[:, h * d:(h + 1) * d]
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if pad_any:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
            s = jnp.where(col >= kv_len, jnp.float32(NEG_INF), s)
        m_prev = m_ref[h][:, :1]
        l_prev = l_ref[h][:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(p.astype(vh.dtype), vh,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        new_acc.append(alpha * acc[:, h * d:(h + 1) * d] + pv)
        new_l.append(jnp.broadcast_to(l_new, (qp, d)))
        m_ref[h] = jnp.broadcast_to(m_new, (qp, 128))
        l_ref[h] = jnp.broadcast_to(l_new, (qp, 128))
    acc_ref[...] = jnp.concatenate(new_acc, axis=-1)

    @pl.when(j == nb - 1)
    def _():
        l_full = jnp.concatenate(new_l, axis=-1)                  # (qp, C)
        o = (jnp.concatenate(new_acc, axis=-1) / l_full).astype(dt)
        out_c = dot_b(o, "cwo", "cbo")
        q2 = _ln(q1_ref[...] + out_c, w["l1s"][:], w["l1b"][:])
        h1 = jnp.dot(q2, w["w1"][:], preferred_element_type=jnp.float32)
        h1 = jax.nn.relu(h1 + w["b1"][:].astype(jnp.float32)).astype(dt)
        h2 = dot_b(h1, "w2", "b2")
        o_ref[0] = _ln(q2 + h2, w["l2s"][:], w["l2b"][:])


def _pick_block_k(kv: int) -> int:
    if kv >= 4096:
        return 1024
    if kv >= 1024:
        return 512
    return _round_up(kv, 128)


def fused_decoder_layer(p, query, key_img, value_img, query_pos, key_pos,
                        temp_memory, temp_pos, num_heads: int,
                        interpret=None):
    """One full decoder layer as one kernel.

    query/query_pos: (B, Q, C); key_img==value_img: (B, K, C) image tokens
    (the caller passes the same tensor for both, as decoder_forward does);
    key_pos: (B, K, C); temp_memory/temp_pos: (B, M, C). Returns (B, Q, C).
    """
    del value_img  # == key_img in the decoder (memory); projected in-kernel
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, nq, c = query.shape
    kv = key_img.shape[1]
    m = temp_memory.shape[1]
    sub = 16 if query.dtype == jnp.bfloat16 else 8
    qp = _round_up(nq, sub)
    mp = _round_up(m, sub)
    if qp > nq:
        query = jnp.pad(query, ((0, 0), (0, qp - nq), (0, 0)))
        query_pos = jnp.pad(query_pos, ((0, 0), (0, qp - nq), (0, 0)))
    if mp > m:
        temp_memory = jnp.pad(temp_memory, ((0, 0), (0, mp - m), (0, 0)))
        temp_pos = jnp.pad(temp_pos, ((0, 0), (0, mp - m), (0, 0)))
    block_k = _pick_block_k(kv)
    kvp = _round_up(kv, block_k)
    if kvp > kv:
        key_img = jnp.pad(key_img, ((0, 0), (0, kvp - kv), (0, 0)))
        key_pos = jnp.pad(key_pos, ((0, 0), (0, kvp - kv), (0, 0)))

    weights = _flatten_layer_params(p, query.dtype, num_heads)
    grid = (b, kvp // block_k)
    kernel = functools.partial(_layer_kernel, num_heads=num_heads, nq=nq,
                               n_tmem=m, block_k=block_k, kv_len=kv)
    resident = lambda bb, j: (bb, 0, 0)
    blocked = lambda bb, j: (bb, j, 0)
    d = c // num_heads
    hidden = p["ffn"]["fc0"]["w"].shape[1]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, qp, c), resident, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qp, c), resident, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, c), resident, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, c), resident, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, c), blocked, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, c), blocked, memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in _W_NAMES],
        out_specs=pl.BlockSpec((1, qp, c), resident, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, qp, c), query.dtype),
        scratch_shapes=[
            pltpu.VMEM((qp, c), query.dtype),            # q1
            pltpu.VMEM((qp, c), query.dtype),            # scaled cross q
            pltpu.VMEM((qp, c), jnp.float32),            # acc
            pltpu.VMEM((num_heads, qp, 128), jnp.float32),
            pltpu.VMEM((num_heads, qp, 128), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=b * (4 * num_heads * qp * kvp * d + 4 * kvp * c * c
                       + 4 * num_heads * qp * (qp + mp) * d
                       + 8 * qp * c * c + 4 * qp * c * hidden),
            bytes_accessed=b * (2 * qp + 2 * mp + 2 * kvp + qp) * c * 2,
            transcendentals=b * num_heads * qp * (kvp + qp + mp),
        ),
    )(query, query_pos, temp_memory, temp_pos, key_img, key_pos, *weights)
    return out[:, :nq]

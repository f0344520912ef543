"""Attention ops — clean XLA reference implementations.

The Pallas-fused variants live in toc3d_tpu.ops.pallas; these XLA paths are
the correctness baseline and the fallback on CPU test meshes.

Behavior parity targets:
  EVA Attention (separate q/k/v proj, q&v-only bias, RoPE)
      -> reference eva_vit.py:54-119, toc3d_eva_vit.py:480-517
  PETR decoder MHA (torch nn.MultiheadAttention semantics)
      -> reference petr_transformer.py:194-337
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..layers import init_linear, linear
from .rope import apply_rope, apply_rope_select


# ---------------------------------------------------------------------------
# EVA ViT attention
# ---------------------------------------------------------------------------

def init_eva_attention(key, dim, num_heads):
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "q_proj": init_linear(kq, dim, dim, bias=True, init="trunc_normal"),
        "k_proj": init_linear(kk, dim, dim, bias=False, init="trunc_normal"),
        "v_proj": init_linear(kv, dim, dim, bias=True, init="trunc_normal"),
        "proj": init_linear(ko, dim, dim, bias=True, init="trunc_normal"),
    }


def _split_heads(x, num_heads):
    b, n, d = x.shape
    return x.reshape(b, n, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def _sdpa(q, k, v, scale, out_dtype):
    """softmax(q·kᵀ·scale)·v with f32 logits. Keep exactly this formulation
    (see the NOTE in eva_attention)."""
    attn = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                      preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1).astype(out_dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


def _sdpa_chunked(q, k, v, scale, out_dtype, chunk: int):
    """Bounded-memory attention for training: lax.map over window-batch
    chunks with a rematted body, so the (B, H, N, N) f32 probs never exist
    whole — forward saves nothing past the inputs, backward recomputes one
    chunk's probs at a time. At 1600x800 the unscanned train step's probs
    are 672 MB/full-layer and 920 MB/global-layer; XLA overlaps block
    backwards, so those temps stack to a 19.6 GB OOM (TRAIN_r04.json
    oom_records). Chunking bounds every block's transient to
    chunk/B of that. Zero-padded tail windows produce uniform-softmax
    garbage rows that are sliced off (no NaN: all-zero logits are finite).
    """
    bq = q.shape[0]
    nc = -(-bq // chunk)
    pad = nc * chunk - bq
    if pad:
        padw = ((0, pad),) + ((0, 0),) * (q.ndim - 1)
        q, k, v = (jnp.pad(t, padw) for t in (q, k, v))
    qs, ks, vs = (t.reshape((nc, chunk) + t.shape[1:]) for t in (q, k, v))
    body = jax.checkpoint(
        lambda args: _sdpa(args[0], args[1], args[2], scale, out_dtype))
    out = jax.lax.map(body, (qs, ks, vs))
    out = out.reshape((nc * chunk,) + out.shape[2:])
    return out[:bq] if pad else out


def eva_attention(p, x, num_heads: int, rope_tables=None, select_idx=None,
                  attn_chunk: Optional[int] = None):
    """x: (B, N, C) or (B, H, W, C). rope_tables: (cos, sin) or None.

    select_idx: (B, N) flat positions for RoPE-with-selection; None applies
    RoPE at raster positions 0..N-1. This is the XLA correctness baseline;
    the production TPU path fuses whole blocks (ops/pallas/vit_block.py).
    attn_chunk: train-time bounded-memory mode — run the softmax(QKᵀ)V core
    as a rematted lax.map over chunks of `attn_chunk` windows (see
    _sdpa_chunked). Same math, same dtypes; only lifetime/scheduling differ.
    """
    reorganize = x.ndim == 4
    if reorganize:
        b, hh, ww, c = x.shape
        x = x.reshape(b, hh * ww, c)
    b, n, c = x.shape

    # NOTE: keep exactly this formulation — applying rope in (B, N, C)
    # layout and/or transpose-free 'bqhd,bkhd' einsums was tried and
    # REGRESSES badly (151 vs ~90 ms backbone at 800x320, TPU worker crash
    # at 1600x800): the explicit head-split transposes let XLA
    # pattern-match its fused-attention custom call.
    q = _split_heads(linear(p["q_proj"], x), num_heads)
    k = _split_heads(linear(p["k_proj"], x), num_heads)
    v = _split_heads(linear(p["v_proj"], x), num_heads)

    if rope_tables is not None:
        cos, sin = rope_tables
        if select_idx is not None:
            q = apply_rope_select(q, cos, sin, select_idx).astype(v.dtype)
            k = apply_rope_select(k, cos, sin, select_idx).astype(v.dtype)
        else:
            q = apply_rope(q, cos, sin).astype(v.dtype)
            k = apply_rope(k, cos, sin).astype(v.dtype)

    head_dim = c // num_heads
    scale = head_dim ** -0.5
    if attn_chunk and q.shape[0] > attn_chunk:
        out = _sdpa_chunked(q, k, v, scale, x.dtype, attn_chunk)
    else:
        out = _sdpa(q, k, v, scale, x.dtype)
    out = _merge_heads(out)
    out = linear(p["proj"], out)
    if reorganize:
        out = out.reshape(b, hh, ww, c)
    return out


# ---------------------------------------------------------------------------
# Standard MHA (torch nn.MultiheadAttention semantics) for the PETR decoder
# ---------------------------------------------------------------------------

def init_mha(key, embed_dim, num_heads):
    kq, kk, kv, ko = jax.random.split(key, 4)
    # torch packs qkv in in_proj_weight, xavier_uniform over the packed matrix.
    return {
        "q_proj": init_linear(kq, embed_dim, embed_dim, init="xavier_uniform"),
        "k_proj": init_linear(kk, embed_dim, embed_dim, init="xavier_uniform"),
        "v_proj": init_linear(kv, embed_dim, embed_dim, init="xavier_uniform"),
        "out_proj": init_linear(ko, embed_dim, embed_dim, init="torch"),
    }


def mha(p, query, key, value, num_heads: int,
        attn_mask: Optional[jnp.ndarray] = None, return_weights: bool = False,
        dropout_rate: float = 0.0, dropout_rng=None, fused: bool = False):
    """Batch-first multi-head attention.

    query: (B, Q, C); key/value: (B, K, C).
    attn_mask: bool (Q, K) or (B, Q, K), True = masked out (torch semantics);
    or additive float mask. dropout_rate/dropout_rng: attention-probability
    dropout (torch MHA attn_drop), applied only when an rng is given.
    Returns (out, attn_weights-mean-over-heads or None).

    fused: route the softmax(QK^T)V core through the Pallas flash kernel
    (ops/pallas/cross_attn.py) — logits stay in VMEM instead of the f32
    (B, H, Q, K) HBM round trip. Only taken when no mask / weights /
    dropout are requested (the eval decoder configuration); differentiable
    via the kernel's custom VJP. On CPU the kernel would run in interpret
    mode (many times slower than XLA and numerically identical anyway), so
    the fused route additionally requires a non-CPU backend unless
    ops.pallas.cross_attn.FORCE_FUSED_ON_CPU is set (kernel-parity tests).
    """
    b, nq, c = query.shape
    if fused and attn_mask is None and not return_weights \
            and (dropout_rng is None or dropout_rate <= 0.0):
        from .pallas import cross_attn as _ca
        fused = (jax.default_backend() != "cpu"
                 or _ca.FORCE_FUSED_ON_CPU)
    else:
        fused = False
    if fused:
        from .pallas.cross_attn import flash_attention
        scale = (c // num_heads) ** -0.5
        q = linear(p["q_proj"], query) * scale
        k = linear(p["k_proj"], key)
        v = linear(p["v_proj"], value)
        out = flash_attention(q.astype(v.dtype), k.astype(v.dtype), v,
                              num_heads)
        return linear(p["out_proj"], out), None
    q = _split_heads(linear(p["q_proj"], query), num_heads)
    k = _split_heads(linear(p["k_proj"], key), num_heads)
    v = _split_heads(linear(p["v_proj"], value), num_heads)

    scale = (c // num_heads) ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                        preferred_element_type=jnp.float32)
    if attn_mask is not None:
        if attn_mask.dtype == jnp.bool_:
            neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
            bias = jnp.where(attn_mask, neg, 0.0)
        else:
            bias = attn_mask.astype(jnp.float32)
        if bias.ndim == 2:
            bias = bias[None, None]
        elif bias.ndim == 3:
            bias = bias[:, None]
        logits = logits + bias
    weights = jax.nn.softmax(logits, axis=-1)
    if dropout_rng is not None and dropout_rate > 0.0:
        keep = 1.0 - dropout_rate
        mask = jax.random.bernoulli(dropout_rng, keep, weights.shape)
        weights = jnp.where(mask, weights / keep, 0.0)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v)
    out = linear(p["out_proj"], _merge_heads(out))
    if return_weights:
        return out, jnp.mean(weights, axis=1)  # torch returns head-mean
    return out, None

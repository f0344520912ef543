"""LEGACY fused window-attention Pallas kernel for TPU — superseded.

The blessed kernel family for the ViT backbone is the per-block megakernel
in ops/pallas/vit_block.py (LN/QKV/RoPE/attn/proj/SwiGLU fused, default-ON
in the presets). This per-attention kernel is kept only as a reference
implementation behind EVAViTConfig.use_pallas_attention (default False).

Design notes:
  * Inputs are (B, N, H, D) — a FREE bitcast view of the (B, N, C) QKV
    projection outputs, so no XLA-side head-split transposes/copies feed
    the kernel (those copies erased the win in earlier designs).
  * Grid is (B, H): one window x one head per step — small steps pipeline
    DMA/compute well; the (N, N) float32 logits never leave VMEM (the XLA
    path writes them to HBM twice per layer).
  * RoPE is applied in-kernel; rotate_half uses pltpu.roll + parity select
    (Mosaic rejects lane-splitting pair reshapes).
  * Token-compressed slow paths pass per-window gathered tables (B, N, D)
    and a static n_valid; padded logits columns are masked.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rotate_half_roll(x):
    """(N, D) pairwise rotation (a, b) -> (-b, a) via rolls + parity mask."""
    n, d = x.shape
    left = pltpu.roll(x, d - 1, 1)  # l[i] = x[i+1] (non-negative shift)
    right = pltpu.roll(x, 1, 1)     # r[i] = x[i-1]
    col = jax.lax.broadcasted_iota(jnp.int32, (n, d), 1)
    even = (col % 2) == 0
    return jnp.where(even, -left, right)


def _attn_kernel(q_ref, k_ref, v_ref, cos_ref, sin_ref, o_ref, *,
                 scale: float, n_valid: int, use_rope: bool):
    q = q_ref[0, 0]                  # (N, D)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    n = q.shape[0]

    if use_rope:
        # rope in f32: Mosaic's rotate (used by _rotate_half_roll) only
        # supports 32-bit data, and f32 also matches the XLA path's
        # precision for the table product
        cos = cos_ref[0].astype(jnp.float32)     # (N, D)
        sin = sin_ref[0].astype(jnp.float32)
        q32 = q.astype(jnp.float32)
        k32 = k.astype(jnp.float32)
        q = (q32 * cos + _rotate_half_roll(q32) * sin).astype(q.dtype)
        k = (k32 * cos + _rotate_half_roll(k32) * sin).astype(k.dtype)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)   # (N, N)
    s = s * scale
    if n_valid < n:
        col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        s = jnp.where(col >= n_valid, jnp.float32(-1e30), s)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / l).astype(v.dtype)
    o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)   # (N, D)
    o_ref[0, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "n_valid", "interpret"))
def fused_window_attention_nc(q, k, v, cos, sin, num_heads: int,
                              n_valid=None, interpret=False):
    """q, k, v: (B, N, C) with C = num_heads * head_dim.

    cos/sin: RoPE tables, (N, D) shared across windows or (B, N, D) gathered
    per window; None disables rope. Softmax columns >= n_valid are masked
    (rows >= n_valid are garbage the caller discards).
    Returns (B, N, C) in q's dtype.
    """
    b, n, c = q.shape
    h = num_heads
    d = c // h
    if n_valid is None:
        n_valid = n
    scale = d ** -0.5
    use_rope = cos is not None
    if not use_rope:
        cos = jnp.zeros((n, d), jnp.float32)
        sin = cos

    # (B, N, C) -> (B, H, N, D); the transpose is a real copy, but Mosaic's
    # tiling rules require the token axis in the second-to-last block dim
    # (block (1, 1, n, d) with d == array dim).
    q4 = jnp.swapaxes(q.reshape(b, n, h, d), 1, 2)
    k4 = jnp.swapaxes(k.reshape(b, n, h, d), 1, 2)
    v4 = jnp.swapaxes(v.reshape(b, n, h, d), 1, 2)

    kernel = functools.partial(_attn_kernel, scale=scale, n_valid=n_valid,
                               use_rope=use_rope)
    spec = pl.BlockSpec((1, 1, n, d), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    if cos.ndim == 3:   # per-window tables (token-compressed slow path)
        tab = pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    else:
        tab = pl.BlockSpec((1, n, d), lambda i, j: (0, 0, 0),
                           memory_space=pltpu.VMEM)
        cos = cos[None]
        sin = sin[None]
    out = pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=[spec, spec, spec, tab, tab],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * d,
            bytes_accessed=4 * b * n * c * q.dtype.itemsize,
            transcendentals=b * h * n * n,
        ),
    )(q4, k4, v4, cos, sin)
    return jnp.swapaxes(out, 1, 2).reshape(b, n, c)


def tile_rope_tables(cos, sin, num_heads: int, n: int, select_idx=None):
    """(N_table, D) per-position tables -> (N, D) sliced, or (B, N, D)
    gathered at per-window select_idx (token-compressed slow path)."""
    cos = jnp.asarray(cos)
    sin = jnp.asarray(sin)
    if select_idx is not None:
        return (jnp.take(cos, select_idx, axis=0),
                jnp.take(sin, select_idx, axis=0))
    return cos[:n], sin[:n]


def pad_tokens_to(x, multiple: int = 8):
    """Pad the token axis of (B, N, C) to a sublane multiple."""
    n = x.shape[1]
    pad = (-n) % multiple
    if pad == 0:
        return x, n
    return jnp.pad(x, ((0, 0), (0, pad), (0, 0))), n

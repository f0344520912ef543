"""2D vision rotary position embedding (EVA-02 style), with index-gathered
variant for token-compressed attention.

Behavior parity targets:
  VisionRotaryEmbeddingFast               -> reference eva_utils.py:325-379
  VisionRotaryEmbeddingFastWithSelection  -> reference eva_utils.py:382-403

Tables are precomputed host-side as constants; apply fns are jit-friendly.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def build_rope_table(dim: int, pt_seq_len: int = 16, ft_seq_len=None,
                     theta: float = 10000.0):
    """Build (N, 2*dim*2) cos/sin tables for a ft_seq_len x ft_seq_len grid.

    dim is the *half* head dim (per-axis rotary dim is dim, split across h/w).
    Returns (freqs_cos, freqs_sin) as float32 numpy arrays of shape
    (ft_h * ft_w, 2 * dim) where the last axis is [h-freqs(dim), w-freqs(dim)],
    each freq repeated twice to pair with rotate_half.
    """
    if ft_seq_len is None:
        ft_seq_len = pt_seq_len
    if isinstance(ft_seq_len, (tuple, list)):
        ft_h, ft_w = ft_seq_len
    else:
        ft_h = ft_w = ft_seq_len

    freqs = 1.0 / (theta ** (np.arange(0, dim, 2)[: dim // 2].astype(np.float64) / dim))

    t_h = np.arange(ft_h, dtype=np.float64) / ft_h * pt_seq_len
    t_w = np.arange(ft_w, dtype=np.float64) / ft_w * pt_seq_len
    fh = np.einsum("i,f->if", t_h, freqs)          # (ft_h, dim//2)
    fw = np.einsum("i,f->if", t_w, freqs)
    fh = np.repeat(fh, 2, axis=-1)                  # (ft_h, dim)
    fw = np.repeat(fw, 2, axis=-1)
    # broadcast-concat over the 2D grid: out[h, w] = [fh[h], fw[w]]
    grid = np.concatenate(
        [np.broadcast_to(fh[:, None, :], (ft_h, ft_w, fh.shape[-1])),
         np.broadcast_to(fw[None, :, :], (ft_h, ft_w, fw.shape[-1]))], axis=-1)
    grid = grid.reshape(ft_h * ft_w, -1)
    return (np.cos(grid).astype(np.float32), np.sin(grid).astype(np.float32))


def rotate_half(x):
    """Pairwise rotation: (..., 2k) viewed as pairs (a, b) -> (-b, a)."""
    x = x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    x1 = x[..., 0]
    x2 = x[..., 1]
    out = jnp.stack([-x2, x1], axis=-1)
    return out.reshape(*out.shape[:-2], -1)


def apply_rope(t, freqs_cos, freqs_sin):
    """t: (..., N, D); tables: (N_table, D) applied to leading N positions.

    Matches reference behavior where N <= N_table and positions are the flat
    raster order of the table grid (eva_utils.py:378-379).
    """
    n = t.shape[-2]
    cos = jnp.asarray(freqs_cos)[:n].astype(t.dtype)
    sin = jnp.asarray(freqs_sin)[:n].astype(t.dtype)
    return t * cos + rotate_half(t) * sin


def apply_rope_select(t, freqs_cos, freqs_sin, selected_idx):
    """Index-gathered RoPE for token-compressed slow paths.

    t: (B, H, N, D); selected_idx: (B, N) flat positions into the table
    (eva_utils.py:396-403). Indices == table length are the reference's
    representative-token convention (an arbitrary in-range slot, value
    slow_index.shape[-1]); callers guarantee idx < N_table.
    """
    cos = jnp.take(jnp.asarray(freqs_cos), selected_idx, axis=0)  # (B, N, D)
    sin = jnp.take(jnp.asarray(freqs_sin), selected_idx, axis=0)
    cos = cos[:, None].astype(t.dtype)
    sin = sin[:, None].astype(t.dtype)
    return t * cos + rotate_half(t) * sin

"""Decomposed relative position embeddings (MViTv2-style) for ViT
attention.

Parity target: reference eva_utils.py:136-226 (get_rel_pos with
log-spaced cubic interpolation, add_decomposed_rel_pos). Registered
capability of the EVA backbone (use_rel_pos flag); the shipped configs use
RoPE instead, so this is numerics-tested but off by default.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _log_interp_rel_pos(rel_pos: np.ndarray, dst_size: int) -> np.ndarray:
    """Log-spaced cubic resize of a (L, C) relative-position table
    (eva_utils.py:160-185, q=1.0903078)."""
    from scipy import interpolate

    src_size = rel_pos.shape[0]
    q = 1.0903078
    dis, cur = [], 1.0
    for i in range(src_size // 2):
        dis.append(cur)
        cur += q ** (i + 1)
    r_ids = [-x for x in reversed(dis)]
    x = r_ids + [0] + dis
    t = dst_size // 2.0
    dx = np.arange(-t, t + 0.1, 1.0)
    cols = []
    for i in range(rel_pos.shape[1]):
        f = interpolate.interp1d(x, rel_pos[:, i], kind="cubic",
                                 fill_value="extrapolate")
        cols.append(f(dx).reshape(-1, 1))
    return np.concatenate(cols, axis=-1).astype(np.float32)


def get_rel_pos(q_size: int, k_size: int, rel_pos,
                use_log_interpolation: bool = True):
    """(L, C) table -> (q_size, k_size, C) gathered embeddings
    (eva_utils.py:136-194)."""
    max_rel_dist = int(2 * max(q_size, k_size) - 1)
    rel_pos = np.asarray(rel_pos, np.float32)
    if rel_pos.shape[0] != max_rel_dist:
        assert use_log_interpolation, "linear resize path not needed"
        rel_pos = _log_interp_rel_pos(rel_pos, max_rel_dist)
    q_coords = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return jnp.asarray(rel_pos[rel.astype(np.int64)])


def add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w, q_size, k_size):
    """attn: (B, q_h*q_w, k_h*k_w); q: (B, q_h*q_w, C)
    (eva_utils.py:197-226)."""
    q_h, q_w = q_size
    k_h, k_w = k_size
    rh = get_rel_pos(q_h, k_h, rel_pos_h)
    rw = get_rel_pos(q_w, k_w, rel_pos_w)
    b = q.shape[0]
    r_q = q.reshape(b, q_h, q_w, -1)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, rh.astype(q.dtype))
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, rw.astype(q.dtype))
    attn = attn.reshape(b, q_h, q_w, k_h, k_w)
    attn = attn + rel_h[..., :, None] + rel_w[..., None, :]
    return attn.reshape(b, q_h * q_w, k_h * k_w)

"""Sine / NeRF positional encodings.

Behavior parity targets:
  pos2posemb3d / pos2posemb1d -> reference models/utils/positional_encoding.py:14-37
  nerf_positional_encoding    -> reference models/utils/positional_encoding.py:39-81
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def _sine_embed(x, num_pos_feats, temperature):
    """x: (..., ) scaled position -> (..., num_pos_feats) interleaved sin/cos."""
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos = x[..., None] / dim_t
    # stack(sin(even), cos(odd)) then flatten last two dims
    emb = jnp.stack([jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])], axis=-1)
    return emb.reshape(*emb.shape[:-2], -1)


def pos2posemb3d(pos, num_pos_feats=128, temperature=10000):
    """pos: (..., 3) in [0,1] -> (..., 3*num_pos_feats), ordered (y, x, z)."""
    pos = pos.astype(jnp.float32) * (2 * math.pi)
    pos_x = _sine_embed(pos[..., 0], num_pos_feats, temperature)
    pos_y = _sine_embed(pos[..., 1], num_pos_feats, temperature)
    pos_z = _sine_embed(pos[..., 2], num_pos_feats, temperature)
    return jnp.concatenate([pos_y, pos_x, pos_z], axis=-1)


def pos2posemb1d(pos, num_pos_feats=256, temperature=10000):
    """pos: (..., 1) -> (..., num_pos_feats)."""
    pos = pos.astype(jnp.float32) * (2 * math.pi)
    return _sine_embed(pos[..., 0], num_pos_feats, temperature)


def nerf_positional_encoding(x, num_encoding_functions=6, include_input=False):
    """x: (..., D) -> (..., D * 2 * num_fns [+ D]) with log-sampled frequencies."""
    x = x.astype(jnp.float32)
    enc = [x] if include_input else []
    freqs = 2.0 ** jnp.linspace(0.0, num_encoding_functions - 1,
                                num_encoding_functions, dtype=jnp.float32)
    for i in range(num_encoding_functions):
        enc.append(jnp.sin(x * freqs[i]))
        enc.append(jnp.cos(x * freqs[i]))
    return jnp.concatenate(enc, axis=-1) if len(enc) > 1 else enc[0]

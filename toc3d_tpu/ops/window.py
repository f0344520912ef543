"""Static-shape window partition / unpartition for ViT window attention.

Behavior parity: reference eva_utils.py:89-133 (pad to multiple, reshape,
transpose). All shapes are static — padding amounts derive from python ints.
"""
from __future__ import annotations

import jax.numpy as jnp


def pad_hw(h: int, w: int, window_size: int):
    ph = (window_size - h % window_size) % window_size
    pw = (window_size - w % window_size) % window_size
    return h + ph, w + pw


def window_partition(x, window_size: int, pad_value=0.0):
    """x: (B, H, W, C) -> (B*nWh*nWw, ws, ws, C), plus (Hp, Wp)."""
    b, h, w, c = x.shape
    hp, wp = pad_hw(h, w, window_size)
    if hp > h or wp > w:
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)),
                    constant_values=pad_value)
    x = x.reshape(b, hp // window_size, window_size, wp // window_size,
                  window_size, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, window_size, window_size, c), (hp, wp)


def window_unpartition(windows, window_size: int, padded_hw, hw):
    """windows: (B*nW, ws, ws, C) -> (B, H, W, C) with padding stripped."""
    hp, wp = padded_hw
    h, w = hw
    nwh, nww = hp // window_size, wp // window_size
    b = windows.shape[0] // (nwh * nww)
    x = windows.reshape(b, nwh, nww, window_size, window_size, -1)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, hp, wp, -1)
    if hp > h or wp > w:
        x = x[:, :h, :w]
    return x

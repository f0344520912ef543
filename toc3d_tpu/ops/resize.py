"""Bicubic resize matching torch.nn.functional.interpolate(mode='bicubic',
align_corners=False) — cubic convolution with A=-0.75 and edge replication.

Needed for exact parity with the reference's absolute-position-embedding
interpolation (eva_utils.py:229-258): jax.image.resize uses a different cubic
kernel (A=-0.5), which would shift every token's positional embedding.

Implemented as separable static weight matrices (host-built with numpy),
so the device op is two small matmuls — MXU-friendly.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_A = -0.75


def _cubic_kernel(t: np.ndarray) -> np.ndarray:
    at = np.abs(t)
    w = np.where(
        at <= 1.0,
        (_A + 2.0) * at**3 - (_A + 3.0) * at**2 + 1.0,
        np.where(at < 2.0, _A * at**3 - 5.0 * _A * at**2 + 8.0 * _A * at - 4.0 * _A, 0.0),
    )
    return w


def bicubic_weight_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) row-stochastic interpolation matrix (torch semantics)."""
    if n_in == n_out:
        return np.eye(n_in, dtype=np.float32)
    scale = n_in / n_out
    out = np.zeros((n_out, n_in), dtype=np.float64)
    for i in range(n_out):
        x = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(x))
        taps = np.arange(x0 - 1, x0 + 3)
        w = _cubic_kernel(x - taps.astype(np.float64))
        taps = np.clip(taps, 0, n_in - 1)
        for tap, wt in zip(taps, w):
            out[i, tap] += wt
    return out.astype(np.float32)


def resize_bicubic_2d(x, out_h: int, out_w: int):
    """x: (..., H, W) -> (..., out_h, out_w), torch-bicubic, static shapes."""
    h, w = x.shape[-2], x.shape[-1]
    wh = jnp.asarray(bicubic_weight_matrix(h, out_h))   # (out_h, h)
    ww = jnp.asarray(bicubic_weight_matrix(w, out_w))   # (out_w, w)
    dt = x.dtype
    y = jnp.einsum("oh,...hw->...ow", wh, x.astype(jnp.float32))
    y = jnp.einsum("pw,...ow->...op", ww, y)
    return y.astype(dt)


def resize_abs_pos(abs_pos, has_cls_token: bool, hw):
    """EVA abs-pos-embed resize (eva_utils.py:229-258).

    abs_pos: (1, num_pos, C) -> (1, H, W, C).
    """
    h, w = hw
    if has_cls_token:
        abs_pos = abs_pos[:, 1:]
    n = abs_pos.shape[1]
    size = int(round(float(np.sqrt(n))))
    assert size * size == n, (n, size)
    if size == h and size == w:
        return abs_pos.reshape(1, h, w, -1)
    grid = abs_pos.reshape(1, size, size, -1)
    grid = jnp.transpose(grid, (0, 3, 1, 2))          # (1, C, s, s)
    grid = resize_bicubic_2d(grid, h, w)
    return jnp.transpose(grid, (0, 2, 3, 1))          # (1, H, W, C)


def bilinear_weight_matrix(n_in: int, n_out: int, align_corners=False) -> np.ndarray:
    """(n_out, n_in) bilinear matrix matching torch F.interpolate."""
    if n_in == n_out:
        return np.eye(n_in, dtype=np.float32)
    out = np.zeros((n_out, n_in), dtype=np.float64)
    if align_corners and n_out > 1:
        xs = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    else:
        scale = n_in / n_out
        xs = np.clip((np.arange(n_out) + 0.5) * scale - 0.5, 0, None)
    for i, x in enumerate(xs):
        x0 = int(np.floor(x))
        x1 = min(x0 + 1, n_in - 1)
        f = x - x0
        out[i, x0] += 1 - f
        out[i, x1] += f
    return out.astype(np.float32)


def resize_bilinear_2d(x, out_h: int, out_w: int):
    """x: (..., H, W) -> (..., out_h, out_w), torch-bilinear (no align)."""
    h, w = x.shape[-2], x.shape[-1]
    wh = jnp.asarray(bilinear_weight_matrix(h, out_h))
    ww = jnp.asarray(bilinear_weight_matrix(w, out_w))
    dt = x.dtype
    y = jnp.einsum("oh,...hw->...ow", wh, x.astype(jnp.float32))
    y = jnp.einsum("pw,...ow->...op", ww, y)
    return y.astype(dt)

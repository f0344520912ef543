"""GridMask augmentation — device-side, jit-friendly.

Parity target: reference models/utils/grid_mask.py with the shipped
settings GridMask(True, True, rotate=1, offset=False, ratio=0.5, mode=1,
prob=0.7) (petr3d.py:61): one random grid per batch, shared across all
views/channels; mode=1 keeps the stripe union and zeroes the rest;
rotate=1 means r = randint(1) = 0, i.e. no rotation ever happens.

Deviation: stripes are generated with modular arithmetic instead of a
1.5x canvas + center crop, which differs only in a boundary sliver when
the 1.5x canvas is not a multiple of the grid period.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_mask(rng, x, ratio=0.5, prob=0.7):
    """x: (..., H, W, C) images. Returns masked images."""
    h, w = x.shape[-3], x.shape[-2]
    k_apply, k_d, k_sh, k_sw = jax.random.split(rng, 4)

    apply = jax.random.uniform(k_apply) <= prob
    d = jax.random.randint(k_d, (), 2, h)
    l = jnp.clip((d.astype(jnp.float32) * ratio + 0.5).astype(jnp.int32),
                 1, d - 1)
    st_h = jax.random.randint(k_sh, (), 0, d)
    st_w = jax.random.randint(k_sw, (), 0, d)

    off_h = (jnp.int32(1.5 * h) - h) // 2
    off_w = (jnp.int32(1.5 * w) - w) // 2
    ys = jnp.arange(h) + off_h
    xs = jnp.arange(w) + off_w
    stripe_y = ((ys - st_h) % d) < l
    stripe_x = ((xs - st_w) % d) < l
    keep = stripe_y[:, None] | stripe_x[None, :]      # mode=1: keep stripes
    keep = keep.astype(x.dtype)[..., None]            # (H, W, 1)
    masked = x * keep
    return jnp.where(apply, masked, x)

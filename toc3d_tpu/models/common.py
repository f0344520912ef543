"""Small shared blocks (reference models/backbones/common.py: MLPBlock,
FastMlp, LayerNorm2d — support code for SAM-style backbones)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..layers import init_linear, linear, init_layer_norm, layer_norm


def init_mlp_block(key, input_dim, hidden_dim, out_dim):
    k1, k2 = jax.random.split(key)
    return {"lin1": init_linear(k1, input_dim, hidden_dim),
            "lin2": init_linear(k2, hidden_dim, out_dim)}


def mlp_block(p, x):
    """Linear -> GELU -> Linear (common.py MLPBlock)."""
    return linear(p["lin2"], jax.nn.gelu(linear(p["lin1"], x),
                                         approximate=False))


def init_fast_mlp(key, embed_dim, mlp_ratio=4):
    k1, k2 = jax.random.split(key)
    h = int(embed_dim * mlp_ratio)
    return {"fc1": init_linear(k1, embed_dim, h),
            "fc2": init_linear(k2, h, embed_dim)}


def fast_mlp(p, x):
    return linear(p["fc2"], jax.nn.gelu(linear(p["fc1"], x),
                                        approximate=False))


def init_layer_norm_2d(c):
    return init_layer_norm(c)


def layer_norm_2d(p, x, eps=1e-6):
    """Channel-last LayerNorm over C for (B, H, W, C) maps (the reference's
    LayerNorm2d normalizes channels of NCHW maps)."""
    return layer_norm(p, x, eps=eps)

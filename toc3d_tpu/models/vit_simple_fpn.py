"""ViTSimpleFPN neck — ViTDet simple feature pyramid from a single-scale
ViT feature map.

Parity target: reference projects/mmdet3d_plugin/models/necks/
ViTsimpleFPN.py (registered alternative to CPFPN; not used by shipped
ToC3D configs — component inventory, SURVEY.md §2a).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ..layers import (init_conv, conv2d, init_conv_transpose,
                      conv_transpose2d, init_layer_norm, layer_norm)


@dataclass(frozen=True)
class ViTSimpleFPNConfig:
    in_channels: int = 1024
    out_channels: int = 256
    scale_factors: Tuple[float, ...] = (2.0, 1.0, 0.5)
    num_outs: int = 3
    start_level: int = 0


def init_vit_simple_fpn(key, cfg: ViTSimpleFPNConfig):
    dim = cfg.in_channels
    stages = []
    keys = jax.random.split(key, len(cfg.scale_factors))
    for idx, scale in enumerate(cfg.scale_factors):
        k = jax.random.split(keys[idx], 4)
        stage = {}
        out_dim = dim
        if scale == 4.0:
            stage["up1"] = init_conv_transpose(k[0], 2, 2, dim, dim // 2)
            stage["gn1"] = init_layer_norm(dim // 2)
            stage["up2"] = init_conv_transpose(k[1], 2, 2, dim // 2, dim // 4)
            out_dim = dim // 4
        elif scale == 2.0:
            stage["up1"] = init_conv_transpose(k[0], 2, 2, dim, dim // 2)
            out_dim = dim // 2
        elif scale == 0.25:
            stage["down_conv"] = init_conv(k[0], 3, 3, dim, dim)
            stage["gn1"] = init_layer_norm(dim)
        stage["conv1"] = init_conv(k[2], 1, 1, out_dim, cfg.out_channels)
        stage["conv3"] = init_conv(k[3], 3, 3, cfg.out_channels,
                                   cfg.out_channels)
        stages.append(stage)
    return {"stages": stages}


def _gn1(p, x):
    """torch GroupNorm(1, C): statistics over (H, W, C) per sample."""
    from ..layers import group_norm
    return group_norm(p, x, num_groups=1, eps=1e-6)


def vit_simple_fpn_forward(params, x, cfg: ViTSimpleFPNConfig):
    """x: (B, H, W, C) single-scale ViT features -> tuple of pyramid maps."""
    outs = []
    for stage, scale in zip(params["stages"], cfg.scale_factors):
        f = x
        if scale == 4.0:
            f = conv_transpose2d(stage["up1"], f, 2)
            f = jax.nn.gelu(_gn1(stage["gn1"], f), approximate=False)
            f = conv_transpose2d(stage["up2"], f, 2)
        elif scale == 2.0:
            f = conv_transpose2d(stage["up1"], f, 2)
        elif scale == 0.5:
            f = jax.lax.reduce_window(f, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        elif scale == 0.25:
            f = conv2d(stage["down_conv"], f, stride=2,
                       padding=[(1, 1), (1, 1)])
            f = jax.nn.gelu(_gn1(stage["gn1"], f), approximate=False)
            f = jax.lax.reduce_window(f, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        f = conv2d(stage["conv1"], f, padding="VALID")
        f = conv2d(stage["conv3"], f, padding=[(1, 1), (1, 1)])
        outs.append(f)
    while len(outs) < cfg.num_outs:
        outs.append(outs[-1][:, ::2, ::2, :])
    return tuple(outs)[cfg.start_level:]

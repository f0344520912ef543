"""CPFPN neck — checkpoint-friendly FPN.

Parity target: reference projects/mmdet3d_plugin/models/necks/cp_fpn.py
with the shipped config (in_channels=[1024], out_channels=256, num_outs=2,
no extra convs): out0 = conv3x3(conv1x1(x)); out1 = maxpool(out0, 1, s2).
Convs are plain (bias, no norm/act) like mmcv ConvModule defaults.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ..layers import init_conv, conv2d


@dataclass(frozen=True)
class CPFPNConfig:
    in_channels: Tuple[int, ...] = (1024,)
    out_channels: int = 256
    num_outs: int = 2


def init_cpfpn(key, cfg: CPFPNConfig):
    assert len(cfg.in_channels) == 1, "shipped configs use one level"
    k1, k2 = jax.random.split(key)
    return {
        "lateral0": init_conv(k1, 1, 1, cfg.in_channels[0], cfg.out_channels),
        "fpn0": init_conv(k2, 3, 3, cfg.out_channels, cfg.out_channels),
    }


def cpfpn_forward(params, x, cfg: CPFPNConfig):
    """x: (B, H, W, C_in) -> tuple of (B, H', W', out_channels)."""
    lat = conv2d(params["lateral0"], x, padding="VALID")
    out0 = conv2d(params["fpn0"], lat, padding=[(1, 1), (1, 1)])
    outs = [out0]
    for _ in range(cfg.num_outs - 1):
        # F.max_pool2d(kernel=1, stride=2) == stride-2 subsample
        outs.append(outs[-1][:, ::2, ::2, :])
    return tuple(outs)

"""VoVNet / VoVNetCP CNN backbone (V2, OSA modules with eSE + identity).

Parity target: reference projects/mmdet3d_plugin/models/backbones/
vovnetcp.py (registered alternative backbone for StreamPETR V2-99 configs;
not used by the shipped ToC3D configs but part of the component inventory,
SURVEY.md §2a).

BatchNorm runs in frozen (norm_eval) semantics — the reference trains with
norm_eval=True so BN is always an affine transform of stored statistics;
params carry (scale, bias, mean, var) and apply folds them.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..layers import init_conv, conv2d

STAGE_SPECS: Dict[str, Dict] = {
    "V-39-eSE": dict(stem=(64, 64, 128), stage_conv_ch=(128, 160, 192, 224),
                     stage_out_ch=(256, 512, 768, 1024), layer_per_block=5,
                     block_per_stage=(1, 1, 2, 2), eSE=True, dw=False),
    "V-57-eSE": dict(stem=(64, 64, 128), stage_conv_ch=(128, 160, 192, 224),
                     stage_out_ch=(256, 512, 768, 1024), layer_per_block=5,
                     block_per_stage=(1, 1, 4, 3), eSE=True, dw=False),
    "V-99-eSE": dict(stem=(64, 64, 128), stage_conv_ch=(128, 160, 192, 224),
                     stage_out_ch=(256, 512, 768, 1024), layer_per_block=5,
                     block_per_stage=(1, 3, 9, 3), eSE=True, dw=False),
}


@dataclass(frozen=True)
class VoVNetConfig:
    spec_name: str = "V-99-eSE"
    input_ch: int = 3
    out_features: Tuple[str, ...] = ("stage4", "stage5")

    @property
    def spec(self) -> Dict:
        return STAGE_SPECS[self.spec_name]


def init_bn(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def bn(p, x, eps=1e-5):
    """Frozen BatchNorm: affine with stored statistics."""
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    scale = (p["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    bias = (p["bias"].astype(jnp.float32)
            - p["mean"].astype(jnp.float32) * p["scale"].astype(jnp.float32)
            * inv).astype(x.dtype)
    return x * scale + bias


def _init_cbr(key, cin, cout, k):
    return {"conv": init_conv(key, k, k, cin, cout, bias=False),
            "norm": init_bn(cout)}


def _cbr(p, x, stride=1, k=3):
    pad = [(k // 2, k // 2), (k // 2, k // 2)] if k > 1 else "VALID"
    x = conv2d(p["conv"], x, stride=stride, padding=pad)
    return jax.nn.relu(bn(p["norm"], x))


def init_osa_module(key, in_ch, stage_ch, concat_ch, layer_per_block,
                    use_ese):
    keys = jax.random.split(key, layer_per_block + 2)
    p = {"layers": []}
    c = in_ch
    for i in range(layer_per_block):
        p["layers"].append(_init_cbr(keys[i], c, stage_ch, 3))
        c = stage_ch
    p["concat"] = _init_cbr(keys[-2], in_ch + layer_per_block * stage_ch,
                            concat_ch, 1)
    if use_ese:
        p["ese_fc"] = init_conv(keys[-1], 1, 1, concat_ch, concat_ch)
    return p


def osa_module(p, x, identity=False):
    """(vovnetcp.py:_OSA_module._forward)."""
    shortcut = x
    outs = [x]
    for lp in p["layers"]:
        x = _cbr(lp, x, 1, 3)
        outs.append(x)
    x = jnp.concatenate(outs, axis=-1)
    x = _cbr(p["concat"], x, 1, 1)
    if "ese_fc" in p:
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = conv2d(p["ese_fc"], g, padding="VALID")
        g = jnp.clip(g + 3.0, 0.0, 6.0) / 6.0       # hsigmoid
        x = x * g
    if identity:
        x = x + shortcut
    return x


def init_vovnet(key, cfg: VoVNetConfig):
    spec = cfg.spec
    stem_ch = spec["stem"]
    keys = jax.random.split(key, 8)
    params = {
        "stem1": _init_cbr(keys[0], cfg.input_ch, stem_ch[0], 3),
        "stem2": _init_cbr(keys[1], stem_ch[0], stem_ch[1], 3),
        "stem3": _init_cbr(keys[2], stem_ch[1], stem_ch[2], 3),
        "stages": [],
    }
    in_ch = stem_ch[2]
    for i in range(4):
        bks = jax.random.split(keys[3 + i], spec["block_per_stage"][i])
        blocks = []
        for b in range(spec["block_per_stage"][i]):
            # reference: SE only on the last block of a stage
            use_ese = spec["eSE"] and (b == spec["block_per_stage"][i] - 1)
            blocks.append(init_osa_module(
                bks[b], in_ch if b == 0 else spec["stage_out_ch"][i],
                spec["stage_conv_ch"][i], spec["stage_out_ch"][i],
                spec["layer_per_block"], use_ese))
        params["stages"].append(blocks)
        in_ch = spec["stage_out_ch"][i]
    return params


def _maxpool_ceil(x, k=3, s=2):
    """MaxPool2d(kernel=3, stride=2, ceil_mode=True) semantics."""
    h, w = x.shape[1], x.shape[2]
    import math
    out_h = math.ceil((h - k) / s) + 1
    out_w = math.ceil((w - k) / s) + 1
    pad_h = max((out_h - 1) * s + k - h, 0)
    pad_w = max((out_w - 1) * s + k - w, 0)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
        ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))


def vovnet_forward(params, x, cfg: VoVNetConfig):
    """x: (B, H, W, 3) -> list of requested stage features (stride 4..32)."""
    x = _cbr(params["stem1"], x, 2, 3)
    x = _cbr(params["stem2"], x, 1, 3)
    x = _cbr(params["stem3"], x, 2, 3)
    outs = []
    if "stem" in cfg.out_features:
        outs.append(x)
    for i, blocks in enumerate(params["stages"]):
        if i != 0:
            x = _maxpool_ceil(x)
        for b, bp in enumerate(blocks):
            x = osa_module(bp, x, identity=(b > 0))
        if f"stage{i + 2}" in cfg.out_features:
            outs.append(x)
    return outs

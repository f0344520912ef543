"""Functional neural-net building blocks (param pytrees + pure apply fns).

Parameters are plain nested dicts of jnp arrays so that torch-checkpoint
conversion, sharding annotation, and custom kernels stay trivial.

Conventions
-----------
* Linear weights are stored as ``(in, out)`` (note: transposed vs torch).
* LayerNorm computes statistics in float32 and casts back to the input dtype.
* ``init_*`` functions take a PRNG key and return the param pytree.

Reference behaviors mirrored (for capability parity, not line parity):
  SwiGLU w/ sub-LN           -> /root/reference/projects/mmdet3d_plugin/models/backbones/eva_vit.py:27-51
  MLN (meta LayerNorm)       -> .../models/utils/misc.py:154-188
  SELayer_Linear             -> .../models/utils/misc.py:139-151
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    """Truncated normal on [-2, 2] stddevs (matches torch.nn.init.trunc_normal_)."""
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def kaiming_uniform(key, shape, fan_in, dtype=jnp.float32):
    """torch nn.Linear / nn.Conv2d default weight init (kaiming_uniform a=sqrt(5))."""
    bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def xavier_uniform(key, shape, fan_in, fan_out, gain=1.0, dtype=jnp.float32):
    bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def uniform_bias(key, shape, fan_in, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def bias_init_with_prob(prior_prob: float) -> float:
    """Focal-loss classification bias init (mmcv.cnn.bias_init_with_prob)."""
    return float(-math.log((1 - prior_prob) / prior_prob))


# ---------------------------------------------------------------------------
# linear
# ---------------------------------------------------------------------------

def init_linear(key, d_in, d_out, bias=True, init="torch", std=0.02):
    kw, kb = jax.random.split(key)
    if init == "torch":
        w = kaiming_uniform(kw, (d_in, d_out), d_in)
    elif init == "trunc_normal":
        w = trunc_normal(kw, (d_in, d_out), std)
    elif init == "xavier_uniform":
        w = xavier_uniform(kw, (d_in, d_out), d_in, d_out)
    elif init == "zeros":
        w = jnp.zeros((d_in, d_out))
    else:
        raise ValueError(init)
    p = {"w": w}
    if bias:
        if init == "torch":
            p["b"] = uniform_bias(kb, (d_out,), d_in)
        else:
            p["b"] = jnp.zeros((d_out,))
    return p


def linear(p, x):
    if "w_scale" in p:                     # int8 serving path (quantize_linear)
        y = _int8_matmul(x, p["w"], p["w_scale"]).astype(x.dtype)
    else:
        y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def quantize_linear(p):
    """Symmetric per-output-channel int8 weight quantization of one linear.

    Serving-only (mirrors ops/pallas/vit_block.quantize_block_params for the
    XLA-side head linears): w -> int8 (in, out) + 'w_scale' f32 (out,) dequant
    row; bias untouched. `linear` detects 'w_scale' and runs the matmul as
    int8 x int8 -> int32 on the MXU with dynamic per-row activation
    quantization. Run ONCE outside the streaming program
    (detector._precast_backbone_params) — in-graph it would re-quantize every
    frame."""
    w = p["w"].astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-8) / 127.0
    wq = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    out = dict(p)
    out["w"] = wq
    out["w_scale"] = s
    return out


def _int8_matmul(x, wq, w_scale):
    """(..., in) @ int8 (in, out) -> f32 (..., out) via dynamic symmetric
    per-row activation quantization; the dot runs int8 x int8 -> int32 on
    the MXU (same scheme as vit_block._rowquant/_qmm)."""
    x32 = x.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True), 1e-6)
    xq = jnp.clip(jnp.round(x32 * (127.0 / amax)), -127.0,
                  127.0).astype(jnp.int8)
    y = jax.lax.dot_general(xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (amax * (1.0 / 127.0)) \
        * w_scale.astype(jnp.float32)


# ---------------------------------------------------------------------------
# layer norm
# ---------------------------------------------------------------------------

def init_layer_norm(d, affine=True):
    if not affine:
        return {}
    return {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}


def layer_norm(p, x, eps=1e-6):
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    if p:
        y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(dt)


def init_group_norm(num_channels):
    return {"scale": jnp.ones((num_channels,)), "bias": jnp.zeros((num_channels,))}


def group_norm(p, x, num_groups=32, eps=1e-5):
    """x: (..., C) channel-last. Matches torch.nn.GroupNorm semantics."""
    dt = x.dtype
    orig_shape = x.shape
    c = orig_shape[-1]
    x32 = x.astype(jnp.float32)
    # group over channels; stats over (spatial..., channels_in_group) per sample
    lead = orig_shape[0]
    xg = x32.reshape(lead, -1, num_groups, c // num_groups)
    mu = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.var(xg, axis=(1, 3), keepdims=True)
    xg = (xg - mu) * jax.lax.rsqrt(var + eps)
    y = xg.reshape(orig_shape)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(dt)


# ---------------------------------------------------------------------------
# conv2d (NHWC)
# ---------------------------------------------------------------------------

def init_conv(key, kh, kw, c_in, c_out, bias=True):
    k1, k2 = jax.random.split(key)
    fan_in = kh * kw * c_in
    p = {"w": kaiming_uniform(k1, (kh, kw, c_in, c_out), fan_in)}
    if bias:
        p["b"] = uniform_bias(k2, (c_out,), fan_in)
    return p


def conv2d(p, x, stride=1, padding="SAME"):
    """x: (B, H, W, C). padding: 'SAME', 'VALID' or explicit [(lo,hi),(lo,hi)]."""
    if isinstance(stride, int):
        stride = (stride, stride)
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def init_conv_transpose(key, kh, kw, c_in, c_out, bias=True):
    k1, k2 = jax.random.split(key)
    fan_in = kh * kw * c_in
    p = {"w": kaiming_uniform(k1, (kh, kw, c_in, c_out), fan_in)}
    if bias:
        p["b"] = uniform_bias(k2, (c_out,), fan_in)
    return p


def conv_transpose2d(p, x, stride=2):
    y = jax.lax.conv_transpose(
        x, p["w"].astype(x.dtype), strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# MLP stacks
# ---------------------------------------------------------------------------

def init_mlp(key, dims: Sequence[int], init="torch"):
    """Sequential Linear layers (activations applied by caller)."""
    keys = jax.random.split(key, len(dims) - 1)
    return {f"fc{i}": init_linear(keys[i], dims[i], dims[i + 1], init=init)
            for i in range(len(dims) - 1)}


def mlp_relu(p, x):
    """Linear->ReLU->...->Linear over init_mlp params."""
    n = len(p)
    for i in range(n):
        x = linear(p[f"fc{i}"], x)
        if i < n - 1:
            x = jax.nn.relu(x)
    return x


def mlp_gelu(p, x):
    n = len(p)
    for i in range(n):
        x = linear(p[f"fc{i}"], x)
        if i < n - 1:
            x = jax.nn.gelu(x, approximate=False)
    return x


# ---------------------------------------------------------------------------
# SwiGLU (EVA-02 FFN): act(w1 x) * (w2 x) -> sub-LN -> w3
# ---------------------------------------------------------------------------

def init_swiglu(key, d_in, d_hidden, d_out=None, subln=True):
    d_out = d_out or d_in
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "w1": init_linear(k1, d_in, d_hidden, init="trunc_normal"),
        "w2": init_linear(k2, d_in, d_hidden, init="trunc_normal"),
        "w3": init_linear(k3, d_hidden, d_out, init="trunc_normal"),
    }
    if subln:
        p["ffn_ln"] = init_layer_norm(d_hidden)
    return p


def swiglu(p, x, ln_eps=1e-6):
    x1 = linear(p["w1"], x)
    x2 = linear(p["w2"], x)
    hidden = jax.nn.silu(x1) * x2
    if "ffn_ln" in p:
        hidden = layer_norm(p["ffn_ln"], hidden, eps=ln_eps)
    return linear(p["w3"], hidden)


# ---------------------------------------------------------------------------
# MLN — meta layer norm: affine params predicted from a condition vector.
# ---------------------------------------------------------------------------

def init_mln(key, c_dim, f_dim=256):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "reduce": init_linear(k1, c_dim, f_dim),
        # gamma: zero weight, ones bias; beta: zero weight, zero bias
        "gamma": {"w": jnp.zeros((f_dim, f_dim)), "b": jnp.ones((f_dim,))},
        "beta": {"w": jnp.zeros((f_dim, f_dim)), "b": jnp.zeros((f_dim,))},
    }


def mln(p, x, c, eps=1e-5):
    x = layer_norm({}, x, eps=eps)  # elementwise_affine=False
    c = jax.nn.relu(linear(p["reduce"], c))
    gamma = linear(p["gamma"], c)
    beta = linear(p["beta"], c)
    return gamma * x + beta


# ---------------------------------------------------------------------------
# SELayer_Linear — featurized positional-encoding gate
# ---------------------------------------------------------------------------

def init_se_linear(key, channels):
    k1, k2 = jax.random.split(key)
    return {
        "conv_reduce": init_linear(k1, channels, channels),
        "conv_expand": init_linear(k2, channels, channels),
    }


def se_linear(p, x, x_se):
    g = jax.nn.relu(linear(p["conv_reduce"], x_se))
    g = linear(p["conv_expand"], g)
    return x * jax.nn.sigmoid(g)


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------

def inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1 - x, eps, None)
    return jnp.log(x1 / x2)

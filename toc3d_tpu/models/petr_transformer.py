"""PETR temporal transformer decoder — TPU-native.

Capability parity target: reference
  projects/mmdet3d_plugin/models/utils/petr_transformer.py
  (PETRTemporalTransformer:430, PETRTransformerDecoder:371,
   PETRTemporalDecoderLayer:520, PETRMultiheadAttention:194).

Design: batch-first throughout (no (N, B, C) transposes — torch's layout is a
cuDNN artifact). Post-norm layer order ('self_attn','norm','cross_attn',
'norm','ffn','norm'). Per-layer remat is applied by the train step.

Dropout (attn 0.1 / residual 0.1 in the reference train config) is applied
only when an rng is passed (training); eval is deterministic.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ..layers import init_layer_norm, layer_norm, init_linear, linear
from ..ops.attention import init_mha, mha

LN_EPS = 1e-5


@dataclass(frozen=True)
class DecoderConfig:
    embed_dims: int = 256
    num_heads: int = 8
    num_layers: int = 6
    feedforward_channels: int = 2048
    dropout: float = 0.1
    # Route attention cores through the Pallas flash kernel
    # (ops/pallas/cross_attn.py) whenever no mask/weights/dropout are
    # requested — i.e. the whole eval decoder. Cross-attention is the head's
    # hot op (900 q x 30k kv at 1600x800); the kernel keeps the f32 logits
    # in VMEM instead of ~864 MB/layer of HBM round trips.
    fused_attn: bool = True
    # A whole-decoder-layer megakernel was built and A/B'd in round 3:
    # MEASURED SLOWER than flash-attention + XLA glue at the ViT-L 1600x800
    # shapes (head program 9.3 -> 12.8 ms/frame) — removed; see PERF.md
    # "Kernel A/B history".
    # 'int8': serving-only per-channel int8 weights + dynamic per-row
    # activation quant for the decoder's linears (q/k/v/out projections +
    # FFN) — the XLA analogue of the backbone kernels' int8 path; applied
    # once in detector._precast_backbone_params. The flash-attention core
    # itself stays bf16/f32 (it is exp-bound, not matmul-bound).
    quant: str = "none"


def init_ffn(key, cfg: DecoderConfig):
    k1, k2 = jax.random.split(key)
    return {
        "fc0": init_linear(k1, cfg.embed_dims, cfg.feedforward_channels,
                           init="xavier_uniform"),
        "fc1": init_linear(k2, cfg.feedforward_channels, cfg.embed_dims,
                           init="xavier_uniform"),
    }


def ffn(p, x, rng=None, dropout=0.0):
    h = jax.nn.relu(linear(p["fc0"], x))
    h = _dropout(h, rng, dropout, 0)
    h = linear(p["fc1"], h)
    return x + _dropout(h, rng, dropout, 1)


def _dropout(x, rng, rate, salt):
    if rng is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(jax.random.fold_in(rng, salt), keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def init_decoder_layer(key, cfg: DecoderConfig):
    k = jax.random.split(key, 3)
    return {
        "self_attn": init_mha(k[0], cfg.embed_dims, cfg.num_heads),
        "cross_attn": init_mha(k[1], cfg.embed_dims, cfg.num_heads),
        "ffn": init_ffn(k[2], cfg),
        "norm0": init_layer_norm(cfg.embed_dims),
        "norm1": init_layer_norm(cfg.embed_dims),
        "norm2": init_layer_norm(cfg.embed_dims),
    }


def init_decoder(key, cfg: DecoderConfig):
    keys = jax.random.split(key, cfg.num_layers + 1)
    return {
        "layers": [init_decoder_layer(keys[i], cfg)
                   for i in range(cfg.num_layers)],
        "post_norm": init_layer_norm(cfg.embed_dims),
    }


def quantize_decoder_params(p):
    """Per-output-channel int8 quantization of every decoder-layer linear
    (self/cross-attn q/k/v/out projections + the two FFN matmuls); LNs and
    the post-norm stay f32. Serving-only — run once outside the streaming
    program (detector._precast_backbone_params). The attention cores are
    untouched: the flash kernel is exp/VPU-bound, quantizing its inputs
    buys nothing (PERF.md int8 section)."""
    from ..layers import quantize_linear

    def qmha(m):
        return {k: quantize_linear(v) for k, v in m.items()}

    layers = []
    for lp in p["layers"]:
        out = dict(lp)
        out["self_attn"] = qmha(lp["self_attn"])
        out["cross_attn"] = qmha(lp["cross_attn"])
        out["ffn"] = {"fc0": quantize_linear(lp["ffn"]["fc0"]),
                      "fc1": quantize_linear(lp["ffn"]["fc1"])}
        layers.append(out)
    out = dict(p)
    out["layers"] = layers
    return out


def decoder_layer_forward(p, cfg: DecoderConfig, query, key, value, query_pos,
                          key_pos, temp_memory, temp_pos, self_attn_mask,
                          rng=None, need_weights: bool = False,
                          fused_ok: bool = True):
    """One PETRTemporalDecoderLayer (petr_transformer.py:653-760).

    query: (B, Q, C); key/value: (B, K, C) image tokens; temp_memory /
    temp_pos: (B, M, C) propagated memory appended to self-attn keys.
    Returns (query, cross_attn_weights (B, Q, K) head-mean or None).
    need_weights: materializing the head-mean attention map forces the f32
    softmax tensor out to HBM and blocks XLA's fused-attention pattern —
    only request it when the caller collects attention (token vis).
    fused_ok: the train step threads False — a Pallas custom call compiled
    into the differentiated train program kernel-faults the axon TPU worker
    even when cfg.fused_attn is on and dropout is 0 (see
    runtime/train.compute_losses).
    """
    r = (lambda i: None if rng is None else jax.random.fold_in(rng, i))

    # self attention over query ⊕ temporal memory
    if temp_memory is not None:
        tk = jnp.concatenate([query, temp_memory], axis=1)
        tp = jnp.concatenate([query_pos, temp_pos], axis=1)
    else:
        tk, tp = query, query_pos
    out, _ = mha(p["self_attn"], query + query_pos, tk + tp, tk,
                 cfg.num_heads, attn_mask=self_attn_mask,
                 dropout_rate=cfg.dropout, dropout_rng=r(3),
                 fused=cfg.fused_attn and fused_ok)
    query = query + _dropout(out, r(0), cfg.dropout, 0)
    query = layer_norm(p["norm0"], query, eps=LN_EPS)

    # cross attention to image tokens
    out, attn_w = mha(p["cross_attn"], query + query_pos, key + key_pos, value,
                      cfg.num_heads, return_weights=need_weights,
                      dropout_rate=cfg.dropout, dropout_rng=r(4),
                      fused=cfg.fused_attn and fused_ok)
    query = query + _dropout(out, r(1), cfg.dropout, 1)
    query = layer_norm(p["norm1"], query, eps=LN_EPS)

    query = ffn(p["ffn"], query, r(2), cfg.dropout)
    query = layer_norm(p["norm2"], query, eps=LN_EPS)
    return query, attn_w


def init_encoder_layer(key, cfg: DecoderConfig):
    k = jax.random.split(key, 2)
    return {
        "self_attn": init_mha(k[0], cfg.embed_dims, cfg.num_heads),
        "ffn": init_ffn(k[1], cfg),
        "norm0": init_layer_norm(cfg.embed_dims),
        "norm1": init_layer_norm(cfg.embed_dims),
    }


def encoder_forward(p, cfg: DecoderConfig, x, pos, rng=None):
    """Plain post-norm transformer encoder (PETRTransformerEncoder,
    petr_transformer.py:342-368 — registered in the reference, unused by
    the shipped configs). p: {'layers': [...], 'post_norm': optional}."""
    for li, lp in enumerate(p["layers"]):
        r = None if rng is None else jax.random.fold_in(rng, li)
        out, _ = mha(lp["self_attn"], x + pos, x + pos, x, cfg.num_heads,
                     dropout_rate=cfg.dropout, dropout_rng=r)
        x = layer_norm(lp["norm0"], x + out, eps=LN_EPS)
        x = layer_norm(lp["norm1"], ffn(lp["ffn"], x, r, cfg.dropout),
                       eps=LN_EPS)
    if p.get("post_norm"):
        x = layer_norm(p["post_norm"], x, eps=LN_EPS)
    return x


def decoder_forward(p, cfg: DecoderConfig, tgt, memory, query_pos, pos_embed,
                    attn_mask, temp_memory=None, temp_pos=None, rng=None,
                    remat=False, collect_attn=False, fused_ok=True):
    """Full decoder stack, returns per-layer post-normed outputs.

    tgt: (B, Q, C); memory: (B, K, C) image tokens; pos_embed: (B, K, C).
    Returns (outs_dec (L, B, Q, C), cross_attn (L, B, Q, K) or None).
    """
    outs, attns = [], []
    query = tgt
    for li, lp in enumerate(p["layers"]):
        lrng = None if rng is None else jax.random.fold_in(rng, li)
        fwd = decoder_layer_forward
        if remat:
            fwd = jax.checkpoint(decoder_layer_forward,
                                 static_argnums=(1, 11, 12))
        query, attn_w = fwd(lp, cfg, query, memory, memory, query_pos,
                            pos_embed, temp_memory, temp_pos, attn_mask,
                            lrng, collect_attn, fused_ok)
        outs.append(layer_norm(p["post_norm"], query, eps=LN_EPS))
        if collect_attn:
            attns.append(attn_w)
    outs = jnp.stack(outs)
    return outs, (jnp.stack(attns) if collect_attn else None)

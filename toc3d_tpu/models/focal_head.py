"""FocalHead — per-view 2D auxiliary head producing focal-sampling token
ranking for the 3D decoder (train-time; configs set aux_2d_only=True so
inference skips it, petr3d.py:319-320).

Parity target: reference
  projects/mmdet3d_plugin/models/dense_heads/focal_head.py:119-193.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..layers import (init_conv, conv2d, init_group_norm, group_norm,
                      inverse_sigmoid, bias_init_with_prob)


@dataclass(frozen=True)
class FocalHeadConfig:
    num_classes: int = 10
    in_channels: int = 256
    embed_dims: int = 256
    stride: int = 16
    train_ratio: float = 1.0
    infer_ratio: float = 1.0


def init_focal_head(key, cfg: FocalHeadConfig):
    k = jax.random.split(key, 7)
    p = {
        "shared_cls_conv": init_conv(k[0], 3, 3, cfg.in_channels,
                                     cfg.embed_dims),
        "shared_cls_gn": init_group_norm(cfg.embed_dims),
        "shared_reg_conv": init_conv(k[1], 3, 3, cfg.in_channels,
                                     cfg.embed_dims),
        "shared_reg_gn": init_group_norm(cfg.embed_dims),
        "cls": init_conv(k[2], 1, 1, cfg.embed_dims, cfg.num_classes),
        "centerness": init_conv(k[3], 1, 1, cfg.embed_dims, 1),
        "ltrb": init_conv(k[4], 1, 1, cfg.embed_dims, 4),
        "center2d": init_conv(k[5], 1, 1, cfg.embed_dims, 2),
    }
    bias = bias_init_with_prob(0.01)
    p["cls"]["b"] = jnp.full_like(p["cls"]["b"], bias)
    p["centerness"]["b"] = jnp.full_like(p["centerness"]["b"], bias)
    return p


def apply_ltrb(locations, pred_ltrb):
    """locations: (h, w, 2) normalized; pred_ltrb: (BN, h, w, 4) sigmoid.
    Returns cxcywh boxes in [0,1] (misc.py:26-43)."""
    x1 = locations[..., 0] - pred_ltrb[..., 0]
    y1 = locations[..., 1] - pred_ltrb[..., 1]
    x2 = locations[..., 0] + pred_ltrb[..., 2]
    y2 = locations[..., 1] + pred_ltrb[..., 3]
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)
    boxes = jnp.clip(boxes, 0.0, 1.0)
    cx = (boxes[..., 0] + boxes[..., 2]) * 0.5
    cy = (boxes[..., 1] + boxes[..., 3]) * 0.5
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return jnp.stack([cx, cy, w, h], axis=-1)


def apply_center_offset(locations, center_offset):
    """(misc.py:45-56)."""
    loc = inverse_sigmoid(locations)
    out = jnp.stack([loc[..., 0] + center_offset[..., 0],
                     loc[..., 1] + center_offset[..., 1]], axis=-1)
    return jax.nn.sigmoid(out)


def focal_head_forward(params, cfg: FocalHeadConfig, feats, locations,
                       sample_ratio: float):
    """feats: (B, N, h, w, C) channel-last; locations: (h, w, 2) normalized.

    Returns dict with enc_cls_scores, enc_bbox_preds, pred_centers2d,
    centerness (all (B*N, h*w, ...)) and topk_indexes (B, K, 1).
    """
    b, n, h, w, c = feats.shape
    x = feats.reshape(b * n, h, w, c)
    num_tokens = n * h * w
    num_sample = int(num_tokens * sample_ratio)

    cls_feat = jax.nn.relu(group_norm(
        params["shared_cls_gn"],
        conv2d(params["shared_cls_conv"], x, padding=[(1, 1), (1, 1)])))
    cls = conv2d(params["cls"], cls_feat, padding="VALID")
    centerness = conv2d(params["centerness"], cls_feat, padding="VALID")
    cls_logits = cls.reshape(b * n, h * w, cfg.num_classes)
    centerness = centerness.reshape(b * n, h * w, 1)

    reg_feat = jax.nn.relu(group_norm(
        params["shared_reg_gn"],
        conv2d(params["shared_reg_conv"], x, padding=[(1, 1), (1, 1)])))
    ltrb = jax.nn.sigmoid(conv2d(params["ltrb"], reg_feat, padding="VALID"))
    c2d_off = conv2d(params["center2d"], reg_feat, padding="VALID")

    pred_bboxes = apply_ltrb(locations, ltrb).reshape(b * n, h * w, 4)
    pred_centers2d = apply_center_offset(locations, c2d_off).reshape(
        b * n, h * w, 2)

    cls_score = jnp.max(cls_logits, axis=-1).reshape(b, num_tokens)
    sample_weight = (jax.nn.sigmoid(jax.lax.stop_gradient(cls_score))
                     * jax.nn.sigmoid(jax.lax.stop_gradient(
                         centerness.reshape(b, num_tokens))))
    _, topk_indexes = jax.lax.top_k(sample_weight, num_sample)

    return {
        "enc_cls_scores": cls_logits,
        "enc_bbox_preds": pred_bboxes,
        "pred_centers2d": pred_centers2d,
        "centerness": centerness,
        "topk_indexes": topk_indexes[..., None],
    }

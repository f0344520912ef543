"""FocalHead 2D auxiliary losses.

Parity target: reference focal_head.py:195-531 (loss_single,
_get_heatmap_single, _get_target_single) with the shipped config weights
(QualityFocalLoss 2.0, GaussianFocalLoss centerness 1.0, L1 bbox 5.0,
GIoU 2.0, L1 centers 10.0).

GT is per-view padded: (V, G, ...) with a validity mask, V = B*num_views.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.assigner import assign_2d
from ..core.losses import (quality_focal_loss, gaussian_focal_loss, l1_loss,
                           giou_loss, clip_sigmoid, cxcywh_to_xyxy,
                           xyxy_to_cxcywh, bbox_overlaps_aligned)


def gaussian_heatmap_targets(centers, bboxes, valid, h, w, stride=16):
    """Vectorized max-combined gaussian splats (focal_head.py:372-385).

    centers: (V, G, 2) pixels; bboxes: (V, G, 4) xyxy pixels;
    valid: (V, G). Returns (V, h, w).
    """
    l = centers[..., 0] - bboxes[..., 0]
    t = centers[..., 1] - bboxes[..., 1]
    r = bboxes[..., 2] - centers[..., 0]
    b = bboxes[..., 3] - centers[..., 1]
    bound = jnp.stack([l, t, r, b], axis=-1)
    radius = jnp.ceil(jnp.min(bound, axis=-1) / stride)
    radius = jnp.maximum(radius, 1.0)                       # (V, G)
    diameter = 2 * radius + 1
    sigma = diameter / 6.0

    cx = jnp.floor(centers[..., 0] / stride)                # int() truncation
    cy = jnp.floor(centers[..., 1] / stride)
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    dx = xs[None, None, :] - cx[..., None]                  # (V, G, w)
    dy = ys[None, None, :] - cy[..., None]                  # (V, G, h)
    val = jnp.exp(-(dx[:, :, None, :] ** 2 + dy[:, :, :, None] ** 2)
                  / (2 * sigma[..., None, None] ** 2))      # (V, G, h, w)
    inside = ((jnp.abs(dx[:, :, None, :]) <= radius[..., None, None])
              & (jnp.abs(dy[:, :, :, None]) <= radius[..., None, None]))
    val = jnp.where(inside & valid[..., None, None], val, 0.0)
    return jnp.max(val, axis=1)


def _scatter_2d(matched, gt_labels, gt_cxcywh, gt_centers_n, valid, q,
                num_classes):
    v, g = matched.shape
    safe = jnp.where(matched >= 0, matched, q)
    vi = jnp.arange(v)[:, None]
    labels = jnp.full((v, q + 1), num_classes, jnp.int32)
    labels = labels.at[vi, safe].set(gt_labels.astype(jnp.int32))[:, :-1]
    boxes = jnp.zeros((v, q + 1, 4), jnp.float32)
    boxes = boxes.at[vi, safe].set(gt_cxcywh)[:, :-1]
    ctrs = jnp.zeros((v, q + 1, 2), jnp.float32)
    ctrs = ctrs.at[vi, safe].set(gt_centers_n)[:, :-1]
    pos_w = jnp.zeros((v, q + 1), jnp.float32)
    pos_w = pos_w.at[vi, safe].set(valid.astype(jnp.float32))[:, :-1]
    return labels, boxes, ctrs, pos_w


def focal_head_loss(cfg, outs, gt_bboxes2d, gt_labels2d, gt_centers2d,
                    gt_valid2d, pad_shape):
    """outs: focal_head_forward dict; GT per view padded (V, G, ...);
    pad_shape: (pad_h, pad_w)."""
    cls_scores = outs["enc_cls_scores"].astype(jnp.float32)   # (V, Q, C)
    bbox_preds = outs["enc_bbox_preds"].astype(jnp.float32)   # (V, Q, 4)
    centers_pred = outs["pred_centers2d"].astype(jnp.float32)
    centerness = outs["centerness"].astype(jnp.float32)

    v, q, c = cls_scores.shape
    ph, pw = pad_shape
    factor = jnp.asarray([pw, ph, pw, ph], jnp.float32)

    matched = assign_2d(bbox_preds, cls_scores, centers_pred, gt_bboxes2d,
                        gt_labels2d, gt_centers2d, gt_valid2d, (pw, ph))
    matched = jax.lax.stop_gradient(matched)

    gt_cxcywh = xyxy_to_cxcywh(gt_bboxes2d / factor)
    gt_ctr_n = gt_centers2d / factor[:2]
    labels, bbox_t, ctr_t, pos_w = _scatter_2d(
        matched, gt_labels2d, gt_cxcywh, gt_ctr_n, gt_valid2d, q,
        cfg.num_classes)

    num_pos = jnp.maximum(jnp.sum(pos_w), 1.0)

    pred_xyxy = cxcywh_to_xyxy(bbox_preds) * factor
    gt_xyxy = cxcywh_to_xyxy(bbox_t) * factor
    loss_iou = giou_loss(pred_xyxy, gt_xyxy, pos_w, num_pos, loss_weight=2.0)

    iou_score = jax.lax.stop_gradient(
        bbox_overlaps_aligned(gt_xyxy, pred_xyxy))
    label_w = jnp.ones((v, q), jnp.float32)
    loss_cls = quality_focal_loss(cls_scores, labels, iou_score, label_w,
                                  num_pos, cfg.num_classes, beta=2.0,
                                  loss_weight=2.0)

    fh, fw = ph // cfg.stride, pw // cfg.stride
    heat = gaussian_heatmap_targets(gt_centers2d, gt_bboxes2d, gt_valid2d,
                                    fh, fw, cfg.stride)
    loss_ctr = gaussian_focal_loss(
        clip_sigmoid(centerness[..., 0]), heat.reshape(v, -1),
        jnp.ones((v, fh * fw), jnp.float32), num_pos, loss_weight=1.0)

    loss_bbox = l1_loss(bbox_preds, bbox_t, pos_w[..., None], num_pos,
                        loss_weight=5.0)
    loss_centers = l1_loss(centers_pred, ctr_t, pos_w[..., None], num_pos,
                           loss_weight=10.0)

    return {
        "enc_loss_cls": jnp.nan_to_num(loss_cls),
        "enc_loss_bbox": jnp.nan_to_num(loss_bbox),
        "enc_loss_iou": jnp.nan_to_num(loss_iou),
        "centers2d_losses": jnp.nan_to_num(loss_centers),
        "centerness_losses": jnp.nan_to_num(loss_ctr),
    }
